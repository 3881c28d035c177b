"""Basic text-to-video (reference examples/inference/basic/basic.py)."""

import argparse

from fastvideo_tpu import VideoGenerator


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True,
                   help="diffusers-format checkpoint dir")
    p.add_argument("--prompt", default="A curious raccoon explores a "
                   "neon-lit alley, cinematic lighting")
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num-frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--num-gpus", type=int, default=1)
    p.add_argument("--sp-size", type=int, default=None)
    p.add_argument("--output-path", default="outputs/")
    args = p.parse_args()

    kwargs = {"num_gpus": args.num_gpus}
    if args.sp_size:
        kwargs["sp_size"] = args.sp_size
    gen = VideoGenerator.from_pretrained(args.model_path, **kwargs)
    result = gen.generate_video(
        args.prompt, negative_prompt=args.negative_prompt,
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.steps, guidance_scale=args.guidance_scale,
        seed=args.seed, output_path=args.output_path)
    print("saved:", result.get("video_path"))
    print("stage times:", {k: round(v, 3)
                           for k, v in result["stage_times"].items()})


if __name__ == "__main__":
    main()
