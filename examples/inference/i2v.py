"""Image-to-video (Wan I2V family)."""

import argparse

from fastvideo_tpu import VideoGenerator


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--image-path", required=True,
                   help="conditioning image (first frame)")
    p.add_argument("--prompt", default="the scene comes to life")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num-frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--seed", type=int, default=1024)
    args = p.parse_args()

    gen = VideoGenerator.from_pretrained(args.model_path, num_gpus=1)
    result = gen.generate_video(
        args.prompt, image_path=args.image_path, height=args.height,
        width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.steps, seed=args.seed)
    print("saved:", result.get("video_path"))


if __name__ == "__main__":
    main()
