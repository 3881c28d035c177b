"""Contract: no silent XLA recompiles across requests (reference analog:
fastvideo/tests/contract/ dynamo shape-capture tests).

On TPU a silent recompile IS the perf failure mode: a served request that
misses the jit cache stalls for seconds-to-minutes. With shape bucketing
on, any (height, width, frames, prompt-length, seed) sweep that stays
inside one bucket must hit the existing executables — zero new
"Compiling jit(...)" events. The counter itself is validated by a bucket
change, which MUST compile.
"""

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling jit("):
            self.events.append(msg.split(" with ")[0])


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_contract")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


def test_no_recompile_within_bucket(ckpt, monkeypatch):
    import jax

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    monkeypatch.setenv("FASTVIDEO_SHAPE_BUCKETS", "1")
    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)

    counter = _CompileCounter()
    jax_logger = logging.getLogger("jax")
    old_level = jax_logger.level
    jax.config.update("jax_log_compiles", True)
    jax_logger.addHandler(counter)
    jax_logger.setLevel(logging.DEBUG)
    try:
        base = dict(height=33, width=31, num_frames=3,
                    num_inference_steps=2, guidance_scale=1.0,
                    save_video=False, return_frames=True)
        # warm-up: all programs for the (64, 64, 3) bucket compile here
        gen.generate_video(prompt="w1 w2", seed=1, **base)
        counter.events.clear()

        # sweep inside the bucket: shapes snap to the same grid; prompt
        # length is static (tokenizer pads to max_length); seeds vary
        for kwargs, prompt, seed in [
            (dict(base, height=40, width=50), "w3", 2),
            (dict(base, height=64, width=64), "w1 w2 w3 w4 w5 w6", 3),
            (dict(base, height=33, width=31), "w9 w8", 4),
        ]:
            gen.generate_video(prompt=prompt, seed=seed, **kwargs)
        assert counter.events == [], (
            "in-bucket requests recompiled: " + ", ".join(counter.events))

        # counter sanity: a new bucket MUST compile fresh programs
        gen.generate_video(prompt="w1 w2", seed=5,
                           **dict(base, height=100, width=100,
                                  num_frames=5))
        assert counter.events, "bucket change did not trigger compilation" \
            " — the counter is not observing XLA"
    finally:
        jax.config.update("jax_log_compiles", False)
        jax_logger.removeHandler(counter)
        jax_logger.setLevel(old_level)
        par.destroy_mesh()
