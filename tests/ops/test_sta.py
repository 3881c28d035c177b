"""STA: windowed attention matches dense masked reference."""

import numpy as np


def test_sta_matches_dense_window_mask():
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.sta import sliding_tile_attention
    from fastvideo_tpu.ops.vsa import tile_layout

    rng = np.random.default_rng(0)
    dit_shape = (4, 6, 6)
    tile = (2, 2, 2)  # 8-token tiles, grid of (2,3,3) tiles
    s = 4 * 6 * 6
    B, H, D = 1, 2, 32
    q = jnp.asarray(rng.standard_normal((B, s, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, s, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, s, H, D)), dtype=jnp.float32)
    windows = ((1, 3, 3), (3, 1, 1))  # per-head

    out = sliding_tile_attention(q, k, v, dit_shape, windows, tile)

    # dense reference: token-level window mask over tile coords
    nt, nh, nw = 2, 3, 3
    tok = np.arange(s).reshape(dit_shape)
    tile_of = np.zeros(s, np.int64)
    coords = {}
    ti = 0
    for t in range(nt):
        for y in range(nh):
            for x in range(nw):
                blk = tok[t*2:(t+1)*2, y*2:(y+1)*2, x*2:(x+1)*2].ravel()
                tile_of[blk] = ti
                coords[ti] = (t, y, x)
                ti += 1

    def in_window(hq, a, b_):
        wt, wh, ww = windows[hq]
        ta, ya, xa = coords[a]
        tb, yb, xb = coords[b_]
        ok_t = max(0, ta - wt // 2) <= tb < min(nt, ta - wt // 2 + wt)
        ok_y = max(0, ya - wh // 2) <= yb < min(nh, ya - wh // 2 + wh)
        ok_x = max(0, xa - ww // 2) <= xb < min(nw, xa - ww // 2 + ww)
        return ok_t and ok_y and ok_x

    mask = np.zeros((H, s, s), bool)
    for hq in range(H):
        for i in range(s):
            for j in range(s):
                mask[hq, i, j] = in_window(hq, tile_of[i], tile_of[j])
    dense = jax.nn.dot_product_attention(q, k, v,
                                         mask=jnp.asarray(mask)[None])
    err = float(jnp.abs(out - dense).max())
    assert err < 2e-2, err
