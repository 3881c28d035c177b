"""SAGE_ATTN (int8 QK^T) backend: close to fp32 attention; selector wired."""

import numpy as np


def test_sage_close_to_fp32_attention():
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.attention.backends.sage import SageAttentionBackend
    from fastvideo_tpu.attention.backends.sdpa import SDPABackend

    b, s, h, d = 1, 64, 2, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    # large common-mode K offset: Sage's mean-smoothing must absorb it
    k = k + 5.0
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    ref = SDPABackend(h, d).forward(q, k, v)
    sage = SageAttentionBackend(h, d).forward(q, k, v)
    err = np.abs(np.asarray(ref) - np.asarray(sage)).max()
    assert err < 0.02, f"int8 attention err {err}"

    # kv_valid masking agrees too
    ref_m = SDPABackend(h, d).forward(q, k, v, kv_valid=40)
    sage_m = SageAttentionBackend(h, d).forward(q, k, v, kv_valid=40)
    err = np.abs(np.asarray(ref_m) - np.asarray(sage_m)).max()
    assert err < 0.02, f"masked int8 attention err {err}"


def test_sage_registered_in_selector():
    from fastvideo_tpu.attention.selector import resolve_backend_name

    assert resolve_backend_name("SAGE_ATTN") == "SAGE_ATTN"
    assert resolve_backend_name("SAGE_ATTN_THREE") == "SAGE_ATTN"
