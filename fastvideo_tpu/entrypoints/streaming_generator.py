"""StreamingVideoGenerator: interactive block-by-block generation.

Analog of /root/reference/fastvideo/entrypoints/streaming_generator.py
(:23-267): reset(prompt) -> step() yields frames per block -> finalize().
Built on the causal Wan rolling KV caches and the VAE streaming decode; the
mp4 writer appends in the background.
"""

from __future__ import annotations

import os
import queue
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)

logger = init_logger(__name__)


@jax.jit
def _to_uint8_frames(pixels):
    """[B, C, T, H, W] float -> [T, H, W, C] uint8, on device (batch 0)."""
    f = jnp.clip(pixels[0], -1.0, 1.0)
    f = jnp.round((f + 1.0) * 127.5).astype(jnp.uint8)
    return f.transpose(1, 2, 3, 0)


class IncrementalVideoWriter:
    """Background mp4 appender (reference streaming_generator.py:38-100)."""

    def __init__(self, path: str, fps: int = 16):
        self.path = path
        self.fps = fps
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        """TRUE incremental append: each chunk is written (and freed) as
        it arrives — a long session must not buffer hours of uint8 frames
        in RAM. Falls back to buffered-.npy only when no mp4 writer is
        importable."""
        writer = None
        fallback: list[np.ndarray] = []
        while True:
            item = self._q.get()
            if item is None:
                break
            if writer is None and not fallback:
                try:
                    import imageio.v2 as imageio

                    os.makedirs(os.path.dirname(self.path) or ".",
                                exist_ok=True)
                    writer = imageio.get_writer(self.path, fps=self.fps,
                                                macro_block_size=None)
                except Exception as e:  # pragma: no cover
                    logger.warning("mp4 writer unavailable (%s); buffering "
                                   "to .npy", e)
            if writer is not None:
                try:
                    for f in item:
                        writer.append_data(f)
                    continue
                except Exception as e:  # pragma: no cover
                    logger.warning("mp4 append failed: %s", e)
                    writer.close()
                    writer = None
            fallback.append(np.asarray(item))
        if writer is not None:
            writer.close()
        elif fallback:
            np.save(self.path + ".npy", np.concatenate(fallback))

    def add_frames(self, frames: np.ndarray) -> None:
        self._q.put(frames)

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()


class StreamingVideoGenerator:
    """reset/step/finalize over a causal pipeline (reference :102-217)."""

    def __init__(self, transformer, vae, text_encoder=None, tokenizer=None,
                 scheduler=None, num_inference_steps: int = 3,
                 height: int = 480, width: int = 832, seed: int = 1024,
                 dtype=jnp.bfloat16):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer
        self.scheduler = scheduler
        self.num_inference_steps = num_inference_steps
        self.height = height
        self.width = width
        self.seed = seed
        self.dtype = dtype
        self._writer: IncrementalVideoWriter | None = None
        self._fwd = None
        self._reset_state()

    def _reset_state(self) -> None:
        self.kv_caches = None
        self.vae_cache = None
        self.ctx = None
        self.ca_caches = None
        self.block_index = 0
        self.frames_emitted = 0

    def _get_fwd(self):
        if self._fwd is None:
            graphdef, state = nnx.split(self.transformer)

            # Denoise steps READ the KV caches but must not pay for the
            # cache update: returning only pred lets XLA dead-code-eliminate
            # the 30-layer rolled cache writeback (a full extra cache-sized
            # allocation per step — ~6 GB for 1.3B @480p — that made the
            # stream OOM on 16 GB when it was materialized and discarded).
            @jax.jit
            def fwd(state, latents, ctx, t, caches, freqs, ca_caches):
                m = nnx.merge(graphdef, state)
                pred, _ = m.forward_block(latents, ctx, t, caches,
                                          freqs_cis=freqs,
                                          crossattn_caches=ca_caches)
                return pred

            # The once-per-block context update DONATES the old caches so
            # XLA aliases them with the returned ones in place of holding
            # old + new (2x cache HBM) across the call.
            @partial(jax.jit, donate_argnums=(4,))
            def fwd_update(state, latents, ctx, t, caches, freqs,
                           ca_caches):
                m = nnx.merge(graphdef, state)
                return m.forward_block(latents, ctx, t, caches,
                                       freqs_cis=freqs,
                                       crossattn_caches=ca_caches)

            @jax.jit
            def precompute_ca(state, ctx):
                m = nnx.merge(graphdef, state)
                return m.precompute_crossattn_caches(ctx)

            self._fwd = (fwd, fwd_update, precompute_ca, state)
        return self._fwd

    def reset(self, prompt: str, output_path: str | None = None) -> None:
        cfg = self.transformer.config
        sr = self.vae.config.spatial_compression_ratio
        self.lat_h = self.height // sr
        self.lat_w = self.width // sr
        pt, ph, pw = cfg.patch_size
        self.frame_seqlen = (self.lat_h // ph) * (self.lat_w // pw)
        self._reset_state()
        self.kv_caches = self.transformer.init_caches(1, self.frame_seqlen,
                                                      self.dtype)
        if self.text_encoder is not None and self.tokenizer is not None:
            enc = self.tokenizer([prompt], padding="max_length",
                                 max_length=512, truncation=True,
                                 return_tensors="np")
            out = self.text_encoder(jnp.asarray(enc["input_ids"]),
                                    jnp.asarray(enc["attention_mask"]))
            self.ctx = out.last_hidden_state.astype(self.dtype)
        else:
            self.ctx = jnp.zeros((1, 512, cfg.text_dim), self.dtype)
        # text K/V once per prompt — constant across blocks and steps
        _, _, precompute_ca, state = self._get_fwd()
        self.ca_caches = precompute_ca(state, self.ctx)
        # close (flush) any writer from a previous stream before
        # replacing it — otherwise its file is never written
        if getattr(self, "_writer", None) is not None:
            self._writer.close()
            self._writer = None
        if output_path:
            self._writer = IncrementalVideoWriter(output_path)

    def step(self, keyboard_cond=None, mouse_cond=None) -> np.ndarray:
        """Generate one block of frames; returns [T, H, W, 3] uint8."""
        cfg = self.transformer.config
        nfpb = cfg.num_frames_per_block
        z_dim = self.vae.config.z_dim
        b = 1
        noise = randn_like_reference(
            (b, z_dim, nfpb, self.lat_h, self.lat_w),
            [self.seed + self.block_index])
        cur = jnp.asarray(noise)
        pt = cfg.patch_size[0]
        s = self.block_index * nfpb
        freqs = get_rotary_pos_embed_wan(
            (nfpb // pt, self.lat_h // cfg.patch_size[1],
             self.lat_w // cfg.patch_size[2]), cfg.attention_head_dim,
            cfg.rope_theta, start_frame=s)
        fwd, fwd_update, _, state = self._get_fwd()
        self.scheduler.set_timesteps(self.num_inference_steps)
        for t_cur in self.scheduler.timesteps:
            t_arr = jnp.full((b,), float(t_cur), jnp.float32)
            pred = fwd(state, cur.astype(self.dtype), self.ctx, t_arr,
                       self.kv_caches, freqs, self.ca_caches)
            cur = self.scheduler.step(pred.astype(jnp.float32), t_cur,
                                      cur.astype(jnp.float32)).prev_sample
        t_ctx = jnp.zeros((b,), jnp.float32)
        _, self.kv_caches = fwd_update(state, cur.astype(self.dtype),
                                       self.ctx, t_ctx, self.kv_caches,
                                       freqs, self.ca_caches)

        z = self.vae.denormalize_latents(cur)
        # Decode ONE latent frame at a time through the causal conv cache:
        # bitwise-identical to whole-chunk decode (the cache carries the
        # exact left context — pinned by test_streaming_decode_frame_split)
        # but peak decoder activations drop ~3x, which is what lets the
        # full 480p stream fit beside the 1.3B DiT + its ~6 GB rolling KV
        # on one 16 GB chip. uint8 conversion happens ON DEVICE so the
        # host fetch moves 1 byte/px instead of 4 (the tunnel D2H is the
        # steady-state bottleneck on this rig).
        chunks = []
        for i in range(z.shape[2]):
            pixels, self.vae_cache = self.vae.streaming_decode(
                z[:, :, i:i + 1].astype(jnp.bfloat16), self.vae_cache,
                is_first_chunk=self.block_index == 0 and i == 0)
            chunks.append(np.asarray(_to_uint8_frames(pixels)))
        self.block_index += 1
        frames = np.concatenate(chunks, axis=0)
        self.frames_emitted += frames.shape[0]
        if self._writer is not None:
            self._writer.add_frames(frames)
        return frames

    def finalize(self) -> int:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        return self.frames_emitted
