#!/usr/bin/env bash
# Preprocess a video+caption dataset, then fine-tune.
set -euo pipefail

CKPT=${CKPT:-/path/to/Wan2.1-T2V-1.3B-Diffusers}
DATA=${DATA:-/path/to/videos}      # dir of .mp4 + .txt caption pairs
OUT=${OUT:-outputs/sft_data}

fastvideo preprocess --model-path "$CKPT" --data-path "$DATA" \
    --output-dir "$OUT"

sed "s#/path/to/Wan2.1-T2V-1.3B-Diffusers#$CKPT#; s#/path/to/preprocessed_parquet#$OUT#" \
    examples/training/sft.yaml > /tmp/sft_run.yaml
fastvideo train --config /tmp/sft_run.yaml
