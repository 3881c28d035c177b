"""Self-forcing distillation: causal DMD with autoregressive rollout.

Analog of /root/reference/fastvideo/training/
self_forcing_distillation_pipeline.py: the causal generator rolls out
blocks autoregressively with its rolling KV caches (simulating streaming
inference), gradients flow only through a sampled gradient-window block,
and the DMD objective (teacher vs critic x0 scores) is applied to the
rolled-out video. Critic trains with flow matching on the rollout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.parallel import maybe_init_mesh, mesh_context
from fastvideo_tpu.training.distillation_pipeline import (DMDConfig,
                                                          shift_timestep)
from fastvideo_tpu.training.training_pipeline import build_optimizer
from fastvideo_tpu.training.training_utils import clip_grad_norm

logger = init_logger(__name__)

Array = jax.Array


class SelfForcingDistillationPipeline:
    def __init__(self, generator, real_score, fake_score,
                 training_args: TrainingArgs,
                 dmd_config: DMDConfig | None = None,
                 denoise_steps: tuple[int, ...] = (1000, 750, 500),
                 mesh=None):
        self.args = training_args
        self.dmd = dmd_config or DMDConfig()
        self.denoise_steps = denoise_steps
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())
        self.generator_model = generator
        self.graphdef, self.gen_params = nnx.split(generator)
        _, self.real_params = nnx.split(real_score)
        _, self.fake_params = nnx.split(fake_score)
        self.gen_tx = build_optimizer(training_args)
        self.fake_tx = build_optimizer(training_args)
        self.gen_opt = self.gen_tx.init(self.gen_params)
        self.fake_opt = self.fake_tx.init(self.fake_params)
        self.rng = jax.random.PRNGKey(training_args.seed)
        self.step = 0
        self._gen_step = None
        self._critic_step = None

    # -- rollout -------------------------------------------------------------

    def _rollout(self, gen_params, noise: Array, embeds: Array, key: Array,
                 grad_block: int) -> Array:
        """Block-autoregressive denoise; grads only through ``grad_block``."""
        model = nnx.merge(self.graphdef, gen_params)
        cfg = model.config
        b, c, t, h, w = noise.shape
        nfpb = cfg.num_frames_per_block
        pt, ph, pw = cfg.patch_size
        frame_seqlen = (h // ph) * (w // pw)
        caches = model.init_caches(b, frame_seqlen, jnp.float32)
        num_train = self.dmd.num_train_timestep

        out_blocks = []
        keys = jax.random.split(key, t // nfpb)
        for blk in range(t // nfpb):
            s = blk * nfpb
            freqs = get_rotary_pos_embed_wan(
                (nfpb // pt, h // ph, w // pw), cfg.attention_head_dim,
                cfg.rope_theta, start_frame=s)
            cur = jax.lax.dynamic_slice_in_dim(noise, s, nfpb, axis=2)
            sigmas = [ts / num_train for ts in self.denoise_steps] + [0.0]
            skeys = jax.random.split(keys[blk], len(self.denoise_steps))
            for i, ts in enumerate(self.denoise_steps):
                t_arr = jnp.full((b,), float(ts), jnp.float32)
                pred, _ = model.forward_block(cur.astype(jnp.bfloat16),
                                              embeds.astype(jnp.bfloat16),
                                              t_arr, caches,
                                              freqs_cis=freqs)
                x0 = cur - sigmas[i] * pred.astype(jnp.float32)
                last_step = i == len(self.denoise_steps) - 1
                if not (blk == grad_block and last_step):
                    x0 = jax.lax.stop_gradient(x0)
                if last_step:
                    cur = x0
                else:
                    nsig = sigmas[i + 1]
                    fresh = jax.random.normal(skeys[i], cur.shape, cur.dtype)
                    cur = (1 - nsig) * x0 + nsig * fresh
            out_blocks.append(cur)
            t_ctx = jnp.zeros((b,), jnp.float32)
            _, caches = model.forward_block(
                jax.lax.stop_gradient(cur).astype(jnp.bfloat16),
                embeds.astype(jnp.bfloat16), t_ctx, caches, freqs_cis=freqs)
            caches = jax.tree.map(jax.lax.stop_gradient, caches)
        return jnp.concatenate(out_blocks, axis=2)

    def _pred_x0_bidir(self, params, noisy, embeds, t):
        """Score model prediction on the full clip (teacher/critic are the
        same causal graph run block-parallel with fresh caches)."""
        model = nnx.merge(self.graphdef, params)
        cfg = model.config
        b, c, tt, h, w = noisy.shape
        pt, ph, pw = cfg.patch_size
        frame_seqlen = (h // ph) * (w // pw)
        caches = model.init_caches(b, frame_seqlen, jnp.float32)
        freqs = get_rotary_pos_embed_wan((tt // pt, h // ph, w // pw),
                                         cfg.attention_head_dim,
                                         cfg.rope_theta)
        pred, _ = model.forward_block(noisy.astype(jnp.bfloat16),
                                      embeds.astype(jnp.bfloat16), t,
                                      caches, freqs_cis=freqs)
        sigma = (t / self.dmd.num_train_timestep).reshape(
            -1, *([1] * (noisy.ndim - 1)))
        return noisy - sigma * pred.astype(jnp.float32)

    # -- updates -------------------------------------------------------------

    def _build_gen_step(self, num_blocks: int):
        dmd = self.dmd

        def loss_fn(gen_params, fake_params, real_params, noise, embeds,
                    neg_embeds, key, grad_block):
            k_roll, k_t, k_n = jax.random.split(key, 3)
            video = self._rollout(gen_params, noise, embeds, k_roll,
                                  grad_block)
            t = jax.random.randint(k_t, (1,), 0,
                                   dmd.num_train_timestep).astype(
                                       jnp.float32)
            t = jnp.broadcast_to(
                shift_timestep(t, dmd.timestep_shift,
                               dmd.num_train_timestep), (noise.shape[0],))
            sigma = (t / dmd.num_train_timestep).reshape(
                -1, *([1] * (noise.ndim - 1)))
            n = jax.random.normal(k_n, video.shape, jnp.float32)
            noisy = jax.lax.stop_gradient((1 - sigma) * video + sigma * n)
            x0_fake = jax.lax.stop_gradient(
                self._pred_x0_bidir(fake_params, noisy, embeds, t))
            x0_real_c = jax.lax.stop_gradient(
                self._pred_x0_bidir(real_params, noisy, embeds, t))
            x0_real_u = jax.lax.stop_gradient(
                self._pred_x0_bidir(real_params, noisy, neg_embeds, t))
            x0_real = x0_real_c + (x0_real_c -
                                   x0_real_u) * dmd.real_score_guidance_scale
            normalizer = jnp.maximum(jnp.mean(jnp.abs(video - x0_real)),
                                     1e-6)
            grad = jnp.nan_to_num((x0_fake - x0_real) / normalizer)
            target = jax.lax.stop_gradient(video - grad)
            return 0.5 * jnp.mean(jnp.square(video - target))

        def step(gen_params, gen_opt, fake_params, real_params, rng, noise,
                 embeds, neg_embeds, grad_block):
            rng, key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                gen_params, fake_params, real_params, noise, embeds,
                neg_embeds, key, grad_block)
            grads, gnorm = clip_grad_norm(grads, self.args.max_grad_norm)
            updates, gen_opt = self.gen_tx.update(grads, gen_opt,
                                                  gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
            return gen_params, gen_opt, rng, loss, gnorm

        return jax.jit(step, static_argnames=("grad_block",))

    def _build_critic_step(self):
        dmd = self.dmd

        def loss_fn(fake_params, gen_params, noise, embeds, key):
            k_roll, k_t, k_n = jax.random.split(key, 3)
            video = jax.lax.stop_gradient(
                self._rollout(gen_params, noise, embeds, k_roll, -1))
            t = jax.random.randint(k_t, (1,), 0,
                                   dmd.num_train_timestep).astype(
                                       jnp.float32)
            t = jnp.broadcast_to(
                shift_timestep(t, dmd.timestep_shift,
                               dmd.num_train_timestep), (noise.shape[0],))
            sigma = (t / dmd.num_train_timestep).reshape(
                -1, *([1] * (noise.ndim - 1)))
            n = jax.random.normal(k_n, video.shape, jnp.float32)
            noisy = (1 - sigma) * video + sigma * n
            model = nnx.merge(self.graphdef, fake_params)
            cfg = model.config
            b, c, tt, h, w = noisy.shape
            caches = model.init_caches(
                b, (h // cfg.patch_size[1]) * (w // cfg.patch_size[2]),
                jnp.float32)
            freqs = get_rotary_pos_embed_wan(
                (tt // cfg.patch_size[0], h // cfg.patch_size[1],
                 w // cfg.patch_size[2]), cfg.attention_head_dim,
                cfg.rope_theta)
            v_pred, _ = model.forward_block(noisy.astype(jnp.bfloat16),
                                            embeds.astype(jnp.bfloat16), t,
                                            caches, freqs_cis=freqs)
            return jnp.mean(jnp.square(v_pred.astype(jnp.float32) -
                                       (n - video)))

        def step(fake_params, fake_opt, gen_params, rng, noise, embeds):
            rng, key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(fake_params,
                                                      gen_params, noise,
                                                      embeds, key)
            grads, gnorm = clip_grad_norm(grads, self.args.max_grad_norm)
            updates, fake_opt = self.fake_tx.update(grads, fake_opt,
                                                    fake_params)
            fake_params = optax.apply_updates(fake_params, updates)
            return fake_params, fake_opt, rng, loss, gnorm

        return jax.jit(step)

    def train_one_step(self, embeds: np.ndarray, neg_embeds: np.ndarray,
                       latent_shape: tuple[int, ...]) -> dict:
        cfg = self.generator_model.config
        num_blocks = latent_shape[2] // cfg.num_frames_per_block
        if self._gen_step is None:
            self._gen_step = self._build_gen_step(num_blocks)
            self._critic_step = self._build_critic_step()
        with mesh_context(self.mesh):
            self.rng, k = jax.random.split(self.rng)
            noise = jax.random.normal(k, latent_shape, jnp.float32)
            embeds_j = jnp.asarray(embeds, jnp.float32)
            neg_j = jnp.asarray(neg_embeds, jnp.float32)
            metrics: dict = {}
            if self.step % self.dmd.dfake_gen_update_ratio == 0:
                grad_block = int(self.step // self.dmd.dfake_gen_update_ratio
                                 ) % num_blocks
                (self.gen_params, self.gen_opt, self.rng, g_loss,
                 g_norm) = self._gen_step(self.gen_params, self.gen_opt,
                                          self.fake_params,
                                          self.real_params, self.rng, noise,
                                          embeds_j, neg_j,
                                          grad_block=grad_block)
                metrics["generator_loss"] = float(g_loss)
                metrics["generator_grad_norm"] = float(g_norm)
            (self.fake_params, self.fake_opt, self.rng, c_loss,
             c_norm) = self._critic_step(self.fake_params, self.fake_opt,
                                         self.gen_params, self.rng, noise,
                                         embeds_j)
            metrics["critic_loss"] = float(c_loss)
        self.step += 1
        metrics["step"] = self.step
        return metrics

    def train(self, dataloader, max_steps: int | None = None,
              log_every: int = 10, callbacks=None) -> None:
        """Drive the alternating self-forcing loop from a (latents, embeds)
        dataloader (same contract as DMD2DistillationPipeline.train: the
        latents fix the rollout noise shape; embeds condition it)."""
        from fastvideo_tpu.training.callbacks import normalize_callbacks

        callbacks = normalize_callbacks(callbacks)
        self._callbacks = callbacks
        max_steps = max_steps or self.args.max_train_steps
        if callbacks is not None:
            callbacks.dispatch("on_train_start", self, self.step)
        it = iter(dataloader)
        while self.step < max_steps:
            try:
                latents, embeds = next(it)
            except StopIteration:
                it = iter(dataloader)
                latents, embeds = next(it)
            emb = np.asarray(embeds)[0]
            metrics = self.train_one_step(
                emb, np.zeros_like(emb), tuple(np.asarray(latents)[0].shape))
            if callbacks is not None:
                callbacks.dispatch("on_training_step_end", self, metrics,
                                   self.step)
            if self.step % log_every == 0:
                logger.info("self_forcing step %d %s", self.step,
                            {k: round(v, 4)
                             for k, v in metrics.items()
                             if isinstance(v, float)})
        if callbacks is not None:
            callbacks.dispatch("on_train_end", self, self.step)
