"""Scheduler parity: FlowUniPC / FlowMatchEuler vs the reference torch impls."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402


@pytest.fixture(scope="module")
def ref_mods():
    try:
        unipc = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_flow_unipc_multistep")
        euler = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_flow_match_euler_discrete")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return unipc, euler


def _fake_denoise_torch(scheduler, timesteps, x0):
    import torch

    sample = torch.from_numpy(x0.copy())
    for t in timesteps:
        model_output = 0.3 * sample + float(t) * 1e-4
        sample = scheduler.step(model_output, t, sample,
                                return_dict=False)[0]
    return sample.numpy()


def _fake_denoise_jax(scheduler, timesteps, x0):
    import jax.numpy as jnp

    sample = jnp.asarray(x0.copy())
    for t in timesteps:
        model_output = 0.3 * sample + float(t) * 1e-4
        sample = scheduler.step(model_output, t, sample).prev_sample
    return np.asarray(sample)


@pytest.mark.parametrize("shift,steps", [(3.0, 10), (5.0, 7), (8.0, 4)])
def test_flow_unipc_parity(ref_mods, shift, steps):
    unipc_mod, _ = ref_mods
    from fastvideo_tpu.models.schedulers.flow_unipc import (
        FlowUniPCMultistepScheduler)

    ref = unipc_mod.FlowUniPCMultistepScheduler(shift=1.0)
    ours = FlowUniPCMultistepScheduler(shift=1.0)
    ref.set_timesteps(steps, shift=shift)
    ours.set_timesteps(steps, shift=shift)
    np.testing.assert_allclose(np.asarray(ref.sigmas), ours.sigmas,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.timesteps), ours.timesteps)

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    out_ref = _fake_denoise_torch(ref, [int(t) for t in ref.timesteps], x0)
    out_jax = _fake_denoise_jax(ours, [int(t) for t in ours.timesteps], x0)
    np.testing.assert_allclose(out_ref, out_jax, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift,steps", [(3.0, 10), (7.0, 5)])
def test_flow_match_euler_parity(ref_mods, shift, steps):
    _, euler_mod = ref_mods
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)

    ref = euler_mod.FlowMatchEulerDiscreteScheduler(shift=shift)
    ours = FlowMatchEulerDiscreteScheduler(shift=shift)
    ref.set_timesteps(steps)
    ours.set_timesteps(steps)
    np.testing.assert_allclose(np.asarray(ref.sigmas), ours.sigmas,
                               rtol=1e-6)

    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    out_ref = _fake_denoise_torch(ref, [float(t) for t in ref.timesteps], x0)
    out_jax = _fake_denoise_jax(ours, [float(t) for t in ours.timesteps], x0)
    np.testing.assert_allclose(out_ref, out_jax, rtol=2e-5, atol=2e-5)


def test_rcm_scheduler_parity():
    """rCM trajectory vs the reference scheduler (fixed v preds + seeds)."""
    import numpy as np
    import pytest

    try:
        import ref_loader
        mod = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_rcm")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    import jax.numpy as jnp

    from fastvideo_tpu.models.schedulers.scheduling_rcm import RCMScheduler

    ref = mod.RCMScheduler()
    ref.set_timesteps(4)
    ours = RCMScheduler()
    ours.set_timesteps(4)
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               ref.sigmas.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               ref.timesteps[:-1].numpy(), atol=1e-9)

    rng = np.random.default_rng(0)
    x_ref = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    x_ours = x_ref.copy()
    ours.set_noise_seed(123)
    for i, t in enumerate(np.asarray(ours.timesteps)):
        v = rng.standard_normal(x_ref.shape).astype(np.float32)
        gen = torch.Generator("cpu").manual_seed(123 + i + 1)
        ref_out = ref.step(torch.from_numpy(v), float(t),
                           torch.from_numpy(x_ref), generator=gen,
                           return_dict=False)[0].numpy()
        ours_out = np.asarray(
            ours.step(jnp.asarray(v), float(t), jnp.asarray(x_ours))
            .prev_sample)
        np.testing.assert_allclose(ours_out, ref_out, atol=2e-5)
        x_ref, x_ours = ref_out, ours_out


def test_self_forcing_flow_match_parity():
    """Trajectory + corruption parity vs the reference scheduler."""
    import numpy as np
    import pytest

    try:
        import ref_loader
        mod = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_self_forcing_flow_match")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    import jax.numpy as jnp

    from fastvideo_tpu.models.schedulers.scheduling_self_forcing_flow_match \
        import SelfForcingFlowMatchScheduler

    ref = mod.SelfForcingFlowMatchScheduler(
        num_inference_steps=8, shift=5.0, extra_one_step=True, training=True)
    ours = SelfForcingFlowMatchScheduler(
        num_inference_steps=8, shift=5.0, extra_one_step=True, training=True)
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               ref.sigmas.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               ref.timesteps.numpy(), atol=1e-3)
    # At few steps the reference's float32 exp underflows and its weights are
    # all-NaN; ours must stay finite (falls back to uniform).
    assert np.isnan(ref.linear_timesteps_weights.numpy()).all()
    assert np.isfinite(np.asarray(ours.linear_timesteps_weights)).all()
    # Weight parity in the reference's actual operating regime (1000 steps,
    # reference self-forcing training configs).
    ref_1k = mod.SelfForcingFlowMatchScheduler(
        num_inference_steps=1000, shift=5.0, extra_one_step=True,
        training=True)
    ours_1k = SelfForcingFlowMatchScheduler(
        num_inference_steps=1000, shift=5.0, extra_one_step=True,
        training=True)
    np.testing.assert_allclose(np.asarray(ours_1k.linear_timesteps_weights),
                               ref_1k.linear_timesteps_weights.numpy(),
                               atol=1e-4)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    v = rng.standard_normal(x.shape).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    t = np.asarray(ours.timesteps)[[1, 3]].astype(np.float32)

    ref_step = ref.step(torch.from_numpy(v), torch.from_numpy(t),
                        torch.from_numpy(x), return_dict=False)[0].numpy()
    ours_step = np.asarray(
        ours.step(jnp.asarray(v), jnp.asarray(t), jnp.asarray(x))
        .prev_sample)
    np.testing.assert_allclose(ours_step, ref_step, atol=1e-5)

    ref_noisy = ref.add_noise(torch.from_numpy(x), torch.from_numpy(noise),
                              torch.from_numpy(t)).numpy()
    ours_noisy = np.asarray(
        ours.add_noise(jnp.asarray(x), jnp.asarray(noise), jnp.asarray(t)))
    np.testing.assert_allclose(ours_noisy, ref_noisy, atol=1e-5)

    bt = np.asarray(ours.timesteps)[[0, 0]].astype(np.float32)
    ref_high = ref.add_noise_high(torch.from_numpy(x),
                                  torch.from_numpy(noise),
                                  torch.from_numpy(t),
                                  torch.from_numpy(bt)).numpy()
    ours_high = np.asarray(
        ours.add_noise_high(jnp.asarray(x), jnp.asarray(noise),
                            jnp.asarray(t), jnp.asarray(bt)))
    np.testing.assert_allclose(ours_high, ref_high, atol=1e-5)

    # training_weight parity at the finite (1000-step) operating point; at 8
    # steps the reference returns NaN (see above) while ours is uniform.
    t1k = np.asarray(ours_1k.timesteps)[[31, 500]].astype(np.float32)
    w_ref = ref_1k.training_weight(torch.from_numpy(t1k)).numpy()
    w_ours = np.asarray(ours_1k.training_weight(jnp.asarray(t1k)))
    np.testing.assert_allclose(w_ours, w_ref, atol=1e-4)
    assert np.isfinite(
        np.asarray(ours.training_weight(jnp.asarray(t)))).all()


def test_flow_map_euler_parity():
    """AnyFlow flow-map scheduler vs the reference."""
    import numpy as np
    import pytest

    try:
        import ref_loader
        mod = ref_loader.import_ref(
            "fastvideo.models.schedulers.scheduling_flow_map_euler_discrete")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    import jax.numpy as jnp

    from fastvideo_tpu.models.schedulers.scheduling_flow_map_euler import (
        FlowMapEulerDiscreteScheduler)

    ref = mod.FlowMapEulerDiscreteScheduler(shift=5.0)
    ref.set_timesteps(num_inference_steps=4)
    ours = FlowMapEulerDiscreteScheduler(shift=5.0)
    ours.set_timesteps(num_inference_steps=4)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               ref.timesteps.numpy(), atol=1e-3)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    u = rng.standard_normal(x.shape).astype(np.float32)
    t = np.array([999.0, 600.0], np.float32)
    r = np.array([400.0, 0.0], np.float32)
    ref_step = ref.step(torch.from_numpy(u), sample=torch.from_numpy(x),
                        timestep=torch.from_numpy(t),
                        r_timestep=torch.from_numpy(r)).numpy()
    ours_step = np.asarray(
        ours.step(jnp.asarray(u), jnp.asarray(t), jnp.asarray(x),
                  r_timestep=jnp.asarray(r)).prev_sample)
    np.testing.assert_allclose(ours_step, ref_step, atol=1e-6)

    w_ref = ref.get_train_weight(torch.from_numpy(t)).numpy()
    w_ours = np.asarray(ours.get_train_weight(jnp.asarray(t)))
    np.testing.assert_allclose(w_ours, w_ref, atol=1e-5)

    noisy_ref = ref.add_noise(torch.from_numpy(x), torch.from_numpy(u),
                              torch.from_numpy(t)).numpy()
    noisy_ours = np.asarray(
        ours.add_noise(jnp.asarray(x), jnp.asarray(u), jnp.asarray(t)))
    np.testing.assert_allclose(noisy_ours, noisy_ref, atol=1e-6)
