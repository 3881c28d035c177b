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
    if args.model_path is None:
        # no model given: run the canonical repo-root synthetic bench
        # (fixed FastWan workload; its config is the driver contract and
        # ignores the geometry flags by design)
        import runpy

        runpy.run_module("bench", run_name="__main__")
        return 0
    # real checkpoint: honor every flag through the product path
    import json
    import time

    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    gen = VideoGenerator.from_pretrained(args.model_path, num_gpus=1)
    kwargs = dict(prompt="A curious raccoon explores a neon-lit alley",
                  height=args.height, width=args.width,
                  num_frames=args.num_frames,
                  num_inference_steps=args.num_inference_steps,
                  seed=1024, save_video=False)
    for _ in range(max(args.warmup, 0)):
        gen.generate_video(**kwargs)
    runs = []
    for _ in range(max(args.repeat, 1)):
        t0 = time.perf_counter()
        r = gen.generate_video(**kwargs)
        wall = time.perf_counter() - t0
        stages = r.get("stage_times") or {}
        runs.append(sum(stages.values()) or wall)
    print(json.dumps({
        "metric": f"e2e_{args.height}x{args.width}x{args.num_frames}f_"
                  f"{args.num_inference_steps}steps",
        "value": round(min(runs), 3), "unit": "s",
        "runs": [round(v, 3) for v in runs],
    }))
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


def _add_preprocess(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "preprocess",
        help="Encode a video+caption dataset into training parquet "
             "(reference `fastvideo preprocess` / v1_preprocess)")
    p.add_argument("--model-path", required=True,
                   help="diffusers checkpoint providing vae + text encoder")
    p.add_argument("--data-path", default=None,
                   help="dataset dir with videos.jsonl "
                        "({'path','caption'} per line) or video files + "
                        "<name>.txt captions")
    p.add_argument("--data-merge-path", default=None,
                   help="<folder>,<annotations.json> merge file driving the "
                        "staged VideoCaptionMergedDataset (validation + fps "
                        "resample + transform + CFG caption dropout; "
                        "reference preprocessing_datasets.py:363)")
    p.add_argument("--train-fps", type=float, default=16.0)
    p.add_argument("--max-height", type=int, default=480)
    p.add_argument("--max-width", type=int, default=832)
    p.add_argument("--training-cfg-rate", type=float, default=0.0)
    p.add_argument("--drop-short-ratio", type=float, default=0.0)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--num-frames", type=int, default=None)
    p.add_argument("--samples-per-file", type=int, default=64)
    p.add_argument("--fps", type=float, default=16.0)
    p.add_argument("--workload", choices=("t2v", "i2v", "ode"),
                   default="t2v",
                   help="t2v: video+caption records; i2v: + first-frame "
                        "CLIP feature and VAE latent; ode: teacher "
                        "denoising trajectories from text-only captions "
                        "(reference preprocess_pipeline_{i2v,ode_"
                        "trajectory}.py)")
    p.add_argument("--ode-steps", type=int, default=48,
                   help="teacher solver steps recorded per trajectory")
    p.add_argument("--ode-guidance-scale", type=float, default=6.0)
    p.add_argument("--ode-height", type=int, default=480)
    p.add_argument("--ode-width", type=int, default=832)
    p.add_argument("--ode-num-frames", type=int, default=81)
    p.set_defaults(func=_cmd_preprocess)


def _iter_preprocess_samples(data_path: str):
    import json
    import os

    jsonl = os.path.join(data_path, "videos.jsonl")
    if os.path.exists(jsonl):
        with open(jsonl) as fh:
            for line in fh:
                if not line.strip():
                    continue
                row = json.loads(line)
                path = row["path"]
                if not os.path.isabs(path):
                    path = os.path.join(data_path, path)
                yield {"id": row.get("id", os.path.basename(path)),
                       "video_path": path,
                       "caption": row.get("caption", "")}
        return
    exts = (".mp4", ".mkv", ".webm", ".avi", ".mov", ".npy")
    for name in sorted(os.listdir(data_path)):
        if not name.lower().endswith(exts):
            continue
        stem = os.path.splitext(name)[0]
        cap_file = os.path.join(data_path, stem + ".txt")
        caption = ""
        if os.path.exists(cap_file):
            with open(cap_file) as fh:
                caption = fh.read().strip()
        yield {"id": stem, "video_path": os.path.join(data_path, name),
               "caption": caption}


def _iter_text_samples(data_path: str):
    """Text-only records for ODE-trajectory collection: prompts.txt (one
    caption per line) or the captions of a videos.jsonl dataset."""
    import os

    txt = os.path.join(data_path, "prompts.txt")
    if os.path.exists(txt):
        with open(txt) as fh:
            for i, line in enumerate(fh):
                if line.strip():
                    yield {"id": f"prompt{i}", "caption": line.strip()}
        return
    for sample in _iter_preprocess_samples(data_path):
        yield {"id": sample["id"], "caption": sample.get("caption", "")}


def _cmd_preprocess(args: argparse.Namespace) -> int:
    import os

    from fastvideo_tpu.models.loader.component_loader import (
        PipelineComponentLoader, load_tokenizer)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    config_cls = get_pipeline_config_cls_for_name(args.model_path)
    if config_cls is None:
        from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig

        config_cls = WanT2V480PConfig
    pipeline_config = config_cls(model_path=args.model_path)
    vae = PipelineComponentLoader.load_module(
        "vae", os.path.join(args.model_path, "vae"), pipeline_config)
    text_encoder = PipelineComponentLoader.load_module(
        "text_encoder", os.path.join(args.model_path, "text_encoder"),
        pipeline_config)
    tokenizer = load_tokenizer(os.path.join(args.model_path, "tokenizer"))

    workload = getattr(args, "workload", "t2v")
    if workload == "i2v":
        from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline_i2v \
            import PreprocessPipelineI2V

        image_encoder = None
        ie_dir = os.path.join(args.model_path, "image_encoder")
        if os.path.isdir(ie_dir):
            image_encoder = PipelineComponentLoader.load_module(
                "image_encoder", ie_dir, pipeline_config)
        pipeline = PreprocessPipelineI2V(
            vae, text_encoder, tokenizer, image_encoder=image_encoder,
            samples_per_file=args.samples_per_file)
        samples = _iter_preprocess_samples(args.data_path)
    elif workload == "ode":
        from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline_ode \
            import PreprocessPipelineODE

        transformer = PipelineComponentLoader.load_module(
            "transformer", os.path.join(args.model_path, "transformer"),
            pipeline_config)
        arch = getattr(vae, "config", None)
        sf_t = getattr(arch, "scale_factor_temporal", 4)
        sf_s = getattr(arch, "scale_factor_spatial", 8)
        z_dim = getattr(arch, "z_dim", 16)
        latent_shape = (z_dim, (args.ode_num_frames - 1) // sf_t + 1,
                        args.ode_height // sf_s, args.ode_width // sf_s)
        pipeline = PreprocessPipelineODE(
            vae, text_encoder, tokenizer, transformer,
            num_inference_steps=args.ode_steps,
            guidance_scale=args.ode_guidance_scale,
            latent_shape=latent_shape,
            samples_per_file=args.samples_per_file)
        samples = _iter_text_samples(args.data_path)
    else:
        from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline import (
            PreprocessPipeline)

        pipeline = PreprocessPipeline(vae, text_encoder, tokenizer,
                                      samples_per_file=args.samples_per_file)
        samples = _iter_preprocess_samples(args.data_path)
    if getattr(args, "data_merge_path", None) and workload != "ode":
        from fastvideo_tpu.dataset.preprocessing import (
            PreprocessDatasetArgs, VideoCaptionMergedDataset)

        ds_args = PreprocessDatasetArgs(
            num_frames=args.num_frames or 81, train_fps=args.train_fps,
            max_height=args.max_height, max_width=args.max_width,
            training_cfg_rate=args.training_cfg_rate,
            drop_short_ratio=args.drop_short_ratio)
        samples = VideoCaptionMergedDataset(args.data_merge_path, ds_args,
                                            tokenizer=tokenizer)
    elif args.data_path is None:
        raise SystemExit("preprocess: --data-path or --data-merge-path "
                         "is required")
    n = pipeline.run(samples, args.output_dir, fps=args.fps)
    logger.info("Wrote %d %s samples to %s", n, workload, args.output_dir)
    return 0


def _add_train(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("train", help="Run YAML-configured training")
    p.add_argument("--config", required=True)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(func=_cmd_train)


def _cmd_train(args: argparse.Namespace) -> int:
    from fastvideo_tpu.entrypoints.cli.train import main as train_main

    argv = ["--config", args.config] + (["--resume"] if args.resume else [])
    return train_main(argv)


def _add_router_serve(sub: argparse._SubParsersAction) -> None:
    """``fastvideo router-serve`` (reference cli/router_serve.py:27-69)."""
    p = sub.add_parser(
        "router-serve",
        help="Start the streaming router (multi-replica load balancer)")
    p.add_argument("--config", required=True,
                   help="YAML/JSON with a top-level router: block")
    p.set_defaults(func=_cmd_router_serve)


def _cmd_router_serve(args: argparse.Namespace) -> int:
    from fastvideo_tpu.entrypoints.streaming.router import run_router

    run_router(args.config)
    return 0


def _add_dashboard(sub: argparse._SubParsersAction) -> None:
    """``fastvideo dashboard`` — local performance dashboard backend
    (reference performance_dashboard/__main__.py)."""
    p = sub.add_parser("dashboard",
                       help="Serve the performance dashboard API")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--tracking-root", default=None,
                   help="record store dir (default "
                   "~/.cache/fastvideo_tpu/perf_tracking)")
    p.set_defaults(func=_cmd_dashboard)


def _cmd_dashboard(args: argparse.Namespace) -> int:
    from fastvideo_tpu.performance.dashboard import run_dashboard

    logger.info("Performance dashboard on http://%s:%d", args.host,
                args.port)
    run_dashboard(args.host, args.port, args.tracking_root)
    return 0


def _add_studio(sub: argparse._SubParsersAction) -> None:
    """``fastvideo studio`` — training/inference job manager UI backend
    (reference apps/fastvideo_studio/server.py:624)."""
    p = sub.add_parser("studio", help="Serve the Studio job-manager API")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8234)
    p.add_argument("--data-dir", default="studio_data")
    p.set_defaults(func=_cmd_studio)


def _cmd_studio(args: argparse.Namespace) -> int:
    from fastvideo_tpu.apps.studio.server import StudioServer

    logger.info("Studio on http://%s:%d", args.host, args.port)
    StudioServer(args.data_dir, host=args.host,
                 port=args.port).serve_forever()
    return 0


def _add_dreamverse(sub: argparse._SubParsersAction) -> None:
    """``fastvideo dreamverse`` — interactive world-model streaming
    backend (reference apps/dreamverse/dreamverse/main.py)."""
    p = sub.add_parser("dreamverse",
                       help="Serve the Dreamverse streaming backend")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8766)
    p.add_argument("--worker", default="streaming",
                   choices=["mock", "streaming"])
    p.add_argument("--slots", type=int, default=1)
    p.set_defaults(func=_cmd_dreamverse)


def _cmd_dreamverse(args: argparse.Namespace) -> int:
    from fastvideo_tpu.apps.dreamverse.config import DreamverseConfig
    from fastvideo_tpu.apps.dreamverse.server import (DreamverseServer,
                                                      build_pool)

    cfg = DreamverseConfig.from_env()
    server = DreamverseServer(cfg, build_pool(cfg, args.worker,
                                              args.slots),
                              host=args.host, port=args.port)
    logger.info("Dreamverse on ws://%s:%d (%s workers)", args.host,
                args.port, args.worker)
    server.run_forever()
    return 0


def _add_eval(sub: argparse._SubParsersAction) -> None:
    """``fastvideo eval run|list`` (reference entrypoints/cli/eval.py:96)."""
    p = sub.add_parser("eval", help="Evaluate generated videos")
    esub = p.add_subparsers(dest="eval_command", required=True)

    run = esub.add_parser("run", help="Compute metrics over videos")
    run.add_argument("--videos", nargs="+", required=True,
                     help="generated video files (mp4) or glob patterns")
    run.add_argument("--reference", default=None,
                     help="reference video file/glob (paired by index)")
    run.add_argument("--metrics", default="common.psnr,common.ssim",
                     help="comma list of metric names or group prefixes "
                     "(common, vbench, optical_flow, audio, physics_iq) "
                     "or 'all'; bare legacy names (psnr/ssim/...) map to "
                     "common.*")
    run.add_argument("--prompt", default=None,
                     help="text prompt shared by text-conditioned metrics")
    run.add_argument("--fps", type=float, default=None,
                     help="frame rate override for fps-dependent metrics")
    run.add_argument("--workers", type=int, default=1,
                     help="parallel eval workers (threaded)")
    run.add_argument("--loader-threads", type=int, default=1,
                     help="background video-decode threads")
    run.add_argument("--output", default=None, help="write JSON here")
    run.set_defaults(func=_cmd_eval_run)

    lst = esub.add_parser("list", help="List available metrics")
    lst.set_defaults(func=_cmd_eval_list)

    refs = esub.add_parser(
        "refs", help="Manage SSIM reference videos (reference analog: "
        "tests/ssim/reference_videos_cli.py)")
    rsub = refs.add_subparsers(dest="refs_command", required=True)
    for name, fn in (("fetch", _cmd_refs_fetch), ("verify", _cmd_refs_verify),
                     ("copy-local", _cmd_refs_copy), ("list",
                                                      _cmd_refs_list)):
        rp = rsub.add_parser(name)
        rp.add_argument("--tier", default="fast")
        rp.add_argument("--device-key", default=None)
        if name == "fetch":
            rp.add_argument("--repo-id",
                            default="FastVideo/ssim-reference-videos")
        if name == "copy-local":
            rp.add_argument("--src", required=True,
                            help=".npy frames file to install")
            rp.add_argument("--case", required=True,
                            help="case name (test id) to register")
        rp.set_defaults(func=fn)


def _cmd_refs_fetch(args: argparse.Namespace) -> int:
    from fastvideo_tpu.eval import reference_videos as rv

    path = rv.fetch(args.repo_id, args.tier, args.device_key)
    print(f"fetched reference videos into {path}")
    return 0


def _cmd_refs_verify(args: argparse.Namespace) -> int:
    from fastvideo_tpu.eval import reference_videos as rv

    res = rv.verify(args.tier, args.device_key)
    print(f"reference dir: {rv.reference_dir(args.tier, args.device_key)}")
    print(f"  ok: {len(res.ok)}  corrupt: {res.corrupt}  "
          f"missing: {res.missing}  untracked: {res.untracked}")
    return 0 if not (res.corrupt or res.missing) else 1


def _cmd_refs_copy(args: argparse.Namespace) -> int:
    from fastvideo_tpu.eval import reference_videos as rv

    dst = rv.copy_local(args.src, args.case, args.tier, args.device_key)
    print(f"installed {args.case} -> {dst}")
    return 0


def _cmd_refs_list(args: argparse.Namespace) -> int:
    from fastvideo_tpu.eval import reference_videos as rv

    ref_dir = rv.reference_dir(args.tier, args.device_key)
    manifest = rv.load_manifest(ref_dir)
    print(f"reference dir: {ref_dir}")
    for case, meta in sorted(manifest.items()):
        print(f"  {case}: shape={meta.get('shape')} "
              f"sha256={meta.get('sha256', '')[:12]}…")
    if not manifest:
        print("  (empty — `fastvideo eval refs fetch` or copy-local)")
    return 0


def _cmd_eval_list(args: argparse.Namespace) -> int:
    """List suite metrics with availability (missing deps/weights)."""
    from fastvideo_tpu.eval.registry import (list_metric_classes,
                                             missing_dependencies)

    for name in list_metric_classes():
        missing = missing_dependencies(name)
        suffix = f"  [unavailable: {', '.join(missing)}]" if missing else ""
        print(f"{name}{suffix}")
    return 0


def _expand_globs(patterns: list[str]) -> list[str]:
    import glob as _glob

    out: list[str] = []
    for p in patterns:
        hits = sorted(_glob.glob(p))
        out.extend(hits if hits else [p])
    return out


_LEGACY_METRIC_ALIASES = {
    "psnr": "common.psnr", "ssim": "common.ssim", "mse": "common.mse",
    "temporal_consistency": "common.temporal_consistency",
    "lpips": "common.lpips", "fvd": "common.fvd",
}


def _cmd_eval_run(args: argparse.Namespace) -> int:
    import json

    from fastvideo_tpu.eval.evaluator import Evaluator
    from fastvideo_tpu.eval.types import Video

    if args.metrics == "all":
        metrics: list[str] | str = "all"
    else:
        metrics = [
            _LEGACY_METRIC_ALIASES.get(m.strip(), m.strip())
            for m in args.metrics.split(",") if m.strip()
        ]
    videos = _expand_globs(args.videos)
    refs = _expand_globs([args.reference]) if args.reference else None
    samples = []
    for i, vp in enumerate(videos):
        sample: dict = {"video": Video(source=vp)}
        if refs is not None:
            sample["reference"] = Video(
                source=refs[i] if i < len(refs) else refs[0])
        if args.prompt:
            sample["text_prompt"] = args.prompt
        if args.fps:
            sample["fps"] = args.fps
        samples.append(sample)
    ev = Evaluator(metrics, num_workers=args.workers,
                   loader_threads=args.loader_threads,
                   skip_missing_deps=True)
    results = ev.evaluate(samples=samples)
    per_video = [{
        "video": vp,
        "scores": {n: r.score for n, r in res.items()},
        "skipped": {n: r.details.get("skipped")
                    for n, r in res.items() if r.skipped},
    } for vp, res in zip(videos, results)]
    payload: dict = {"videos": per_video}
    if results.corpus:
        payload["corpus"] = {n: {"score": r.score, **r.details}
                             for n, r in results.corpus.items()}
    text = json.dumps(payload, indent=2)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(text)
        logger.info("Wrote results to %s", args.output)
    else:
        print(text)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="fastvideo",
                                     description="fastvideo_tpu CLI")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_generate(sub)
    _add_bench(sub)
    _add_serve(sub)
    _add_preprocess(sub)
    _add_train(sub)
    _add_eval(sub)
    _add_router_serve(sub)
    _add_dashboard(sub)
    _add_studio(sub)
    _add_dreamverse(sub)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
