"""Streaming long-tuning: schedule parsing + multi-stage streaming steps.

Reference behavior: train/methods/distribution_matching/
streaming_long_tuning.py (stage schedule, persistent streaming chunks).
"""

import numpy as np
import pytest


def test_schedule_parsing_compact_string():
    from fastvideo_tpu.training.streaming_long_pipeline import (
        parse_multi_phased_distill_schedule, select_distill_stage)

    stages = parse_multi_phased_distill_schedule(
        "700:4,3000:16", default_num_latent_t=4,
        default_streaming_chunk_size=4)
    assert len(stages) == 2
    assert stages[0].name == "self_forcing"
    assert not stages[0].streaming_training
    assert stages[0].end_step == 700 and stages[0].num_latent_t == 4
    assert stages[1].streaming_training
    assert stages[1].streaming_max_length == 16

    assert select_distill_stage(stages, 0) is stages[0]
    assert select_distill_stage(stages, 699) is stages[0]
    assert select_distill_stage(stages, 700) is stages[1]
    assert select_distill_stage(stages, 99999) is stages[1]


def test_schedule_parsing_dicts_and_validation():
    from fastvideo_tpu.training.streaming_long_pipeline import (
        parse_multi_phased_distill_schedule)

    stages = parse_multi_phased_distill_schedule(
        [{"stage": "self_forcing", "end_step": 10, "num_latent_t": 4},
         {"stage": "streaming_long", "streaming_max_length": 12,
          "streaming_chunk_size": 4, "streaming_min_new_frame": 2}],
        default_num_latent_t=4)
    assert stages[1].streaming_training
    assert stages[1].streaming_chunk_size == 4
    assert stages[1].streaming_min_new_frame == 2

    # default: one always-streaming stage
    default = parse_multi_phased_distill_schedule(
        None, default_num_latent_t=8, default_streaming_chunk_size=4)
    assert len(default) == 1 and default[0].streaming_training

    with pytest.raises(ValueError):
        parse_multi_phased_distill_schedule(
            [{"stage": "streaming_long"}], default_num_latent_t=4)
    with pytest.raises(ValueError):
        parse_multi_phased_distill_schedule(
            "10:4,5:8", default_num_latent_t=4,
            default_streaming_chunk_size=4)


def _make_pipe(stages):
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)
    from fastvideo_tpu.training.distillation_pipeline import DMDConfig
    from fastvideo_tpu.training.streaming_long_pipeline import (
        StreamingLongTuningPipeline)

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1,
                        num_frames_per_block=2, local_attn_size=4)

    def make(seed):
        return CausalWanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                           rngs=nnx.Rngs(seed))

    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=1e-3,
                        max_grad_norm=1.0, seed=0)
    return StreamingLongTuningPipeline(
        make(0), make(1), make(2), args, DMDConfig(dfake_gen_update_ratio=1),
        denoise_steps=(1000, 500), stages=stages)


def test_streaming_stage_steps():
    from fastvideo_tpu.training.streaming_long_pipeline import (
        parse_multi_phased_distill_schedule)

    # stage 1: short self-forcing for 1 step; then streaming to length 8
    stages = parse_multi_phased_distill_schedule(
        [{"stage": "self_forcing", "end_step": 1, "num_latent_t": 4},
         {"stage": "streaming_long", "streaming_max_length": 8,
          "streaming_chunk_size": 4,
          "streaming_fixed_overlap_latents": 2}],
        default_num_latent_t=4)
    pipe = _make_pipe(stages)

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 6, 16)).astype(np.float32)
    neg = rng.standard_normal((1, 6, 16)).astype(np.float32)
    shape = (1, 4, 8, 8, 8)

    m0 = pipe.train_one_step(embeds, neg, shape)  # short stage
    assert m0["distill_stage_index"] == 0
    assert "streaming_current_length" not in m0

    m1 = pipe.train_one_step(embeds, neg, shape)  # first streaming chunk
    assert m1["distill_stage_index"] == 1
    assert m1["streaming_new_frames"] == 4
    assert m1["streaming_current_length"] == 4
    assert np.isfinite(m1["critic_loss"])
    assert np.isfinite(m1["generator_loss"])

    m2 = pipe.train_one_step(embeds, neg, shape)  # fixed overlap => 2 new
    assert m2["streaming_new_frames"] == 2
    assert m2["streaming_current_length"] == 6

    m3 = pipe.train_one_step(embeds, neg, shape)
    assert m3["streaming_current_length"] == 8

    # stream exhausted -> state resets, next step starts a new sequence
    m4 = pipe.train_one_step(embeds, neg, shape)
    assert m4["streaming_current_length"] == 4


def test_method_registered():
    from fastvideo_tpu.training.methods import list_methods

    assert "streaming_long_tuning" in list_methods()
