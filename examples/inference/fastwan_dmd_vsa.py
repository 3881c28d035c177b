"""FastWan few-step sampling: 3-step DMD + video sparse attention.

The reference FastWan config (scripts/inference/
inference_wan_VSA_DMD_1_3B.yaml): VIDEO_SPARSE_ATTN at sparsity 0.8 over
a DMD-distilled Wan2.1-1.3B. On TPU the VSA trunk runs tile-major with
the tile permutation hoisted to patch-embed/unpatchify (docs/attention.md).
"""

import argparse
import os
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

from fastvideo_tpu import VideoGenerator  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True,
                   help="FastWan DMD-distilled diffusers checkpoint")
    p.add_argument("--prompt", default="a cinematic drone shot over a "
                   "coastal town at golden hour")
    p.add_argument("--sparsity", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    gen = VideoGenerator.from_pretrained(args.model_path, num_gpus=1,
                                         VSA_sparsity=args.sparsity)
    # warmup compiles; the second call is the honest number
    for tag in ("compile+first-run", "steady-state"):
        t0 = time.perf_counter()
        result = gen.generate_video(args.prompt, height=480, width=832,
                                    num_frames=81, seed=args.seed,
                                    save_video=(tag != "compile+first-run"))
        print(f"{tag}: {time.perf_counter() - t0:.2f}s "
              f"(stages: { {k: round(v, 3) for k, v in result['stage_times'].items()} })")
    print("saved:", result.get("video_path"))


if __name__ == "__main__":
    main()
