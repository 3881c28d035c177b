"""Realtime block-autoregressive stepping (causal Wan world models).

Reference analog: StreamingVideoGenerator reset/step/finalize
(entrypoints/streaming_generator.py). Each step denoises ONE block of
frames against the rolling KV cache and streams pixels back.
"""

import argparse
import time

from fastvideo_tpu.entrypoints.streaming_generator import (
    StreamingVideoGenerator)
from fastvideo_tpu.models.loader.component_loader import (
    load_model_component, load_scheduler)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True,
                   help="causal-Wan diffusers checkpoint dir")
    p.add_argument("--prompt", default="first-person walk through a "
                   "procedurally generated city")
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--output", default="outputs/stream.mp4")
    args = p.parse_args()

    import os
    mp = args.model_path
    gen = StreamingVideoGenerator(
        transformer=load_model_component(os.path.join(mp, "transformer")),
        vae=load_model_component(os.path.join(mp, "vae")),
        scheduler=load_scheduler(os.path.join(mp, "scheduler")),
    )
    gen.reset(args.prompt, output_path=args.output)
    for i in range(args.blocks):
        t0 = time.perf_counter()
        frames = gen.step()
        print(f"block {i}: {frames.shape[0]} frames in "
              f"{time.perf_counter() - t0:.2f}s")
    total = gen.finalize()
    print(f"wrote {total} frames to {args.output}")


if __name__ == "__main__":
    main()
