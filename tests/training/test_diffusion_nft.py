"""DiffusionNFT RL method: rewards, advantages, sampler, full outer step.

Reference behavior: train/methods/rl/diffusion_nft.py + rewards/ +
common/sampling.py.
"""

import numpy as np
import pytest


def test_multi_reward_scorer_weighted_sum():
    from fastvideo_tpu.training.rl import (MultiRewardScorer,
                                           build_multi_reward_scorer,
                                           select_first_frame)

    def s1(media, prompts):
        return np.ones(len(prompts), np.float32)

    def s2(media, prompts):
        return np.full(len(prompts), 2.0, np.float32)

    scorer = MultiRewardScorer({"a": 1.0, "b": 0.5}, scorers={"a": s1,
                                                              "b": s2})
    media = np.zeros((3, 3, 2, 4, 4), np.float32)
    out = scorer(media, ["x", "y", "z"])
    np.testing.assert_allclose(out["avg"], [2.0, 2.0, 2.0])
    assert set(out) == {"a", "b", "avg"}

    with pytest.raises(ValueError):
        MultiRewardScorer({"missing": 1.0}, scorers={"a": s1})
    with pytest.raises(ValueError):
        build_multi_reward_scorer({})

    frames = select_first_frame(media)
    assert frames.shape == (3, 3, 4, 4)
    assert select_first_frame(frames).shape == (3, 3, 4, 4)


def test_group_advantages_and_decay():
    from fastvideo_tpu.training.rl import (compute_group_advantages,
                                           return_decay)

    prompts = ["a", "a", "a", "b", "b", "b"]
    rewards = np.array([1.0, 2.0, 3.0, 10.0, 10.0, 10.0])
    adv = compute_group_advantages(prompts, rewards)
    # group a: normalized; group b: zero std -> ~0 advantages
    assert adv[0] < 0 < adv[2]
    np.testing.assert_allclose(adv[3:], 0.0, atol=1e-3)
    # per-group mean ~ 0
    np.testing.assert_allclose(adv[:3].mean(), 0.0, atol=1e-6)

    assert return_decay(0, 0) == 0.0
    assert return_decay(100, 1) == pytest.approx(0.1)
    assert return_decay(10_000, 1) == 0.5
    assert return_decay(10, 2) == 0.0  # flat period
    with pytest.raises(ValueError):
        return_decay(0, 7)


def test_sampling_config_validation():
    from fastvideo_tpu.training.rl import SamplingConfig

    cfg = SamplingConfig.from_mapping({"num_steps": 3,
                                       "trajectory": "sde_reflow",
                                       "flow_shift": 3.0})
    assert cfg.num_steps == 3 and cfg.trajectory == "sde_reflow"
    with pytest.raises(ValueError):
        SamplingConfig.from_mapping({"bogus": 1})
    with pytest.raises(ValueError):
        SamplingConfig.from_mapping({"scheduler": "ddim"})
    with pytest.raises(ValueError):
        SamplingConfig.from_mapping({"timesteps": [500.0],
                                     "sigmas": [0.5, 0.1]})


def _tiny_wan():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)
    return WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(0))


def test_nft_outer_step_trains():
    import jax

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.training.rl import (DiffusionNFTConfig,
                                           DiffusionNFTPipeline,
                                           MultiRewardScorer,
                                           SamplingConfig)

    par.destroy_mesh()

    calls = {}

    def fake_reward(media, prompts):
        calls["media_shape"] = np.asarray(media).shape
        calls["prompts"] = list(prompts)
        rng = np.random.default_rng(0)
        return rng.standard_normal(len(prompts)).astype(np.float32)

    scorer = MultiRewardScorer({"fake": 1.0}, scorers={"fake": fake_reward})
    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=1e-3,
                        max_grad_norm=1.0, seed=0)
    pipe = DiffusionNFTPipeline(
        _tiny_wan(), args, scorer,
        DiffusionNFTConfig(num_video_per_prompt=2, decay_type=1),
        SamplingConfig(num_steps=2))

    rng = np.random.default_rng(1)
    embeds = rng.standard_normal((2, 6, 16)).astype(np.float32)
    before = np.asarray(jax.tree.leaves(pipe.student_params)[0]).copy()
    old_before = np.asarray(jax.tree.leaves(pipe.old_params)[0]).copy()

    m = pipe.train_one_step(["cat", "dog"], embeds, (4, 2, 8, 8))
    assert np.isfinite(m["total_loss"])
    assert np.isfinite(m["policy_loss"]) and np.isfinite(m["kl_div_loss"])
    assert "reward/fake" in m and "reward/avg" in m
    # 2 prompts x 2 repeats, grouped per prompt
    assert calls["prompts"] == ["cat", "cat", "dog", "dog"]
    assert calls["media_shape"][0] == 4

    after = np.asarray(jax.tree.leaves(pipe.student_params)[0])
    assert np.abs(after - before).max() > 0
    # reference stays frozen; old lerps toward student on later steps
    ref_now = np.asarray(jax.tree.leaves(pipe.ref_params)[0])
    np.testing.assert_array_equal(ref_now, before)
    m2 = pipe.train_one_step(["cat", "dog"], embeds, (4, 2, 8, 8))
    assert m2["old_decay"] > 0
    old_after = np.asarray(jax.tree.leaves(pipe.old_params)[0])
    assert np.abs(old_after - old_before).max() > 0


def test_method_registered():
    from fastvideo_tpu.training.methods import list_methods

    assert "diffusion_nft" in list_methods()
