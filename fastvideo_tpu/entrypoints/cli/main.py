"""`fastvideo` CLI: generate / serve / bench.

Analog of /root/reference/fastvideo/entrypoints/cli/main.py:14-47.
"""

from __future__ import annotations

import argparse
import sys

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


def _add_generate(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("generate", help="Generate a video from a prompt")
    p.add_argument("--model-path", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num-frames", type=int, default=81)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--output-path", default="outputs/")
    p.add_argument("--num-gpus", type=int, default=1)
    p.add_argument("--sp-size", type=int, default=1)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--attention-backend", default=None)
    p.set_defaults(func=_cmd_generate)


def _cmd_generate(args: argparse.Namespace) -> int:
    from fastvideo_tpu import VideoGenerator

    gen = VideoGenerator.from_pretrained(
        args.model_path, num_gpus=args.num_gpus, sp_size=args.sp_size,
        tp_size=args.tp_size, attention_backend=args.attention_backend)
    kwargs = dict(height=args.height, width=args.width,
                  num_frames=args.num_frames,
                  num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale, seed=args.seed,
                  fps=args.fps, output_path=args.output_path)
    if args.negative_prompt:
        kwargs["negative_prompt"] = args.negative_prompt
    result = gen.generate_video(args.prompt, **kwargs)
    logger.info("Done: %s", result.get("video_path"))
    return 0


def _add_bench(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("bench", help="Benchmark generation throughput")
    p.add_argument("--model-path", default=None)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num-frames", type=int, default=81)
    p.add_argument("--num-inference-steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--repeat", type=int, default=3)
    p.set_defaults(func=_cmd_bench)


def _cmd_bench(args: argparse.Namespace) -> int:
    import runpy

    # repo-root bench.py is the canonical synthetic bench
    runpy.run_module("bench", run_name="__main__")
    return 0


def _add_serve(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("serve", help="Start the OpenAI-compatible server")
    p.add_argument("--model-path", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-gpus", type=int, default=1)
    p.set_defaults(func=_cmd_serve)


def _cmd_serve(args: argparse.Namespace) -> int:
    from fastvideo_tpu.entrypoints.openai.api_server import run_server

    run_server(model_path=args.model_path, host=args.host, port=args.port,
               num_gpus=args.num_gpus)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="fastvideo",
                                     description="fastvideo_tpu CLI")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_generate(sub)
    _add_bench(sub)
    _add_serve(sub)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
