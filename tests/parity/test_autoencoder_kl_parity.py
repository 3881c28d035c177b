"""AutoencoderKL (2D image VAE) parity vs an independent torch
implementation of the diffusers architecture (the reference wraps
diffusers' AutoencoderKL directly, which isn't installed here)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

TINY = dict(latent_channels=4, block_out_channels=(8, 16, 16),
            layers_per_block=1, norm_num_groups=4, scaling_factor=1.5,
            shift_factor=0.06)


class TResnet(nn.Module):
    def __init__(self, cin, cout, g):
        super().__init__()
        self.norm1 = nn.GroupNorm(g, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = nn.GroupNorm(g, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        r = x
        x = self.conv1(F.silu(self.norm1(x)))
        x = self.conv2(F.silu(self.norm2(x)))
        if self.conv_shortcut is not None:
            r = self.conv_shortcut(r)
        return x + r


class TAttn(nn.Module):
    def __init__(self, c, g):
        super().__init__()
        self.group_norm = nn.GroupNorm(g, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        r = x
        xs = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q = self.to_q(xs)[:, None]
        k = self.to_k(xs)[:, None]
        v = self.to_v(xs)[:, None]
        o = F.scaled_dot_product_attention(q, k, v)[:, 0]
        o = self.to_out[0](o)
        return o.reshape(b, h, w, c).permute(0, 3, 1, 2) + r


class TMid(nn.Module):
    def __init__(self, c, g):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c, g), TResnet(c, c, g)])
        self.attentions = nn.ModuleList([TAttn(c, g)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TDown(nn.Module):
    def __init__(self, cin, cout, n, g, down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if i == 0 else cout, cout, g) for i in range(n)])
        self.downsamplers = None
        if down:
            conv = nn.Conv2d(cout, cout, 3, 2, 0)
            mod = nn.Module()
            mod.conv = conv
            self.downsamplers = nn.ModuleList([mod])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class TUp(nn.Module):
    def __init__(self, cin, cout, n, g, up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if i == 0 else cout, cout, g) for i in range(n)])
        self.upsamplers = None
        if up:
            mod = nn.Module()
            mod.conv = nn.Conv2d(cout, cout, 3, 1, 1)
            self.upsamplers = nn.ModuleList([mod])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TEncoder(nn.Module):
    def __init__(self, ch, n, g, z):
        super().__init__()
        self.conv_in = nn.Conv2d(3, ch[0], 3, 1, 1)
        blocks, out_c = [], ch[0]
        for i in range(len(ch)):
            cin, out_c = out_c, ch[i]
            blocks.append(TDown(cin, out_c, n, g, i < len(ch) - 1))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(ch[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 2 * z, 3, 1, 1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(nn.Module):
    def __init__(self, ch, n, g, z):
        super().__init__()
        self.conv_in = nn.Conv2d(z, ch[-1], 3, 1, 1)
        self.mid_block = TMid(ch[-1], g)
        rev = list(reversed(ch))
        blocks, out_c = [], rev[0]
        for i in range(len(ch)):
            cin, out_c = out_c, rev[i]
            blocks.append(TUp(cin, out_c, n + 1, g, i < len(ch) - 1))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[0], 3, 3, 1, 1)

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVae(nn.Module):
    def __init__(self):
        super().__init__()
        ch = TINY["block_out_channels"]
        n, g, z = (TINY["layers_per_block"], TINY["norm_num_groups"],
                   TINY["latent_channels"])
        self.encoder = TEncoder(ch, n, g, z)
        self.decoder = TDecoder(ch, n, g, z)


@pytest.fixture(scope="module")
def pair():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AUTOENCODER_KL_PARAM_NAMES_MAPPING, AutoencoderKL,
        AutoencoderKLArchConfig)

    torch.manual_seed(0)
    tvae = TVae()
    with torch.no_grad():
        for p in tvae.parameters():
            nn.init.normal_(p, std=0.1)
    tvae.eval()

    cfg = AutoencoderKLArchConfig(**TINY)
    jvae = AutoencoderKL(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = tvae.state_dict()
    n = load_weights(jvae, ((k, v.numpy()) for k, v in sd.items()),
                     AUTOENCODER_KL_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return tvae, jvae


def test_autoencoder_kl_decode_parity(pair):
    import jax.numpy as jnp

    tvae, jvae = pair
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tvae.decoder(torch.from_numpy(z)).numpy()
    out = np.asarray(jvae.decode(jnp.asarray(z)))
    assert ref.shape == out.shape
    err = np.abs(ref - out).max()
    assert err < 3e-4, f"decode max err {err}"


def test_autoencoder_kl_encode_parity(pair):
    import jax.numpy as jnp

    tvae, jvae = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tvae.encoder(torch.from_numpy(x)).numpy()
    dist = jvae.encode(jnp.asarray(x))
    out = np.asarray(dist.parameters).transpose(0, 3, 1, 2)
    assert ref.shape == out.shape
    err = np.abs(ref - out).max()
    assert err < 3e-4, f"encode max err {err}"


def test_latent_normalization_roundtrip(pair):
    import jax.numpy as jnp

    _, jvae = pair
    z = jnp.ones((1, 4, 2, 2)) * 0.7
    back = jvae.denormalize_latents(jvae.normalize_latents(z))
    np.testing.assert_allclose(np.asarray(back), 0.7, atol=1e-6)
