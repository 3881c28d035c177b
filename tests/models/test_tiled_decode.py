"""Tiled + mesh-parallel VAE decode approximates full decode."""

import numpy as np


def _tiny_vae():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    cfg = WanVAEArchConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                           num_res_blocks=1, attn_scales=(),
                           temperal_downsample=(True,),
                           latents_mean=tuple([0.0] * 4),
                           latents_std=tuple([1.0] * 4),
                           scale_factor_temporal=2, scale_factor_spatial=2)
    return AutoencoderKLWan(cfg, load_encoder=False,
                            param_dtype=jnp.float32, rngs=nnx.Rngs(0))


def test_spatial_tiled_decode_close_to_full():
    import jax.numpy as jnp

    vae = _tiny_vae()
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, 3, 24, 24)) * 0.3,
                    dtype=jnp.float32)
    full = np.asarray(vae.decode(z))
    tiled = np.asarray(vae.spatial_tiled_decode(
        z, tile_latent_min=(16, 16), tile_latent_stride=(8, 8)))
    assert tiled.shape == full.shape
    # tiles see truncated context; interior should still track closely
    err = np.abs(full - tiled).mean()
    assert err < 0.08, err


def test_parallel_tiled_decode_matches_serial():
    import jax
    import jax.numpy as jnp

    import fastvideo_tpu.parallel as par

    vae = _tiny_vae()
    par.destroy_mesh()
    mesh = par.init_mesh(par.MeshConfig(dp_size=2, sp_size=2, tp_size=1),
                         devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 4, 3, 24, 24)) * 0.3,
                    dtype=jnp.float32)
    serial = np.asarray(vae.spatial_tiled_decode(
        z, tile_latent_min=(16, 16), tile_latent_stride=(8, 8)))
    with par.mesh_context(mesh):
        parallel = np.asarray(vae.parallel_tiled_decode(
            z, tile_latent_min=(16, 16), tile_latent_stride=(8, 8)))
    par.destroy_mesh()
    np.testing.assert_allclose(serial, parallel, atol=1e-5)


def test_decode_dispatched_matches_decode():
    """The python-dispatched chunk loop (lag-1 settling, donated conv
    caches) is bit-identical to the fused decode()."""
    import jax.numpy as jnp

    vae = _tiny_vae()
    import jax

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 5, 8, 8),
                          jnp.float32)
    full = np.asarray(vae.decode(z))
    disp = np.asarray(vae.decode_dispatched(z, chunk_frames=2,
                                            decode_dtype=jnp.float32))
    np.testing.assert_allclose(disp, full, atol=1e-5, rtol=1e-5)
