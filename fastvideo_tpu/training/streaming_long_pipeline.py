"""LongLive-style multi-stage streaming self-forcing distillation.

Behavior analog of /root/reference/fastvideo/train/methods/
distribution_matching/streaming_long_tuning.py: a multi-stage schedule
(``DistillStage``) where early stages run the ordinary short-horizon
self-forcing rollout and later stages train on a *persistent streaming
sequence* — the causal student generates chunk after chunk of a long
video and the DMD + critic losses are applied per chunk.

TPU design notes (deviations from the CUDA reference, intentional):

- The reference carries inter-chunk context two ways at once: a KV cache
  tagged per streaming sequence AND re-fed "overlap" latents at the head
  of each chunk window. Here context rides exclusively on the causal
  model's rolling KV caches — a functional pytree carried across steps —
  so every chunk program has a static shape (``new_frames`` latent
  frames) and one XLA compilation serves the whole stream regardless of
  stream position: the rope tables for the chunk's absolute positions
  are precomputed on host and passed in as arrays.
- The reference computes score-model predictions over the full visible
  window and masks the loss to the chunk
  (``_dmd_loss_masked`` / ``_critic_flow_matching_loss_for_x0``).
  Here the teacher / critic evaluate the chunk window directly (fresh
  caches, chunk-absolute rope), which is the same masked objective
  without re-running attention over frozen frames.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.parallel import mesh_context
from fastvideo_tpu.training.distillation_pipeline import (DMDConfig,
                                                          shift_timestep)
from fastvideo_tpu.training.self_forcing_pipeline import (
    SelfForcingDistillationPipeline)
from fastvideo_tpu.training.training_utils import clip_grad_norm

logger = init_logger(__name__)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DistillStage:
    """One resolved stage of the multi-phase distillation schedule.

    Mirrors the reference's ``DistillStage``
    (streaming_long_tuning.py:24-37)."""

    name: str
    start_step: int
    end_step: int | None
    num_latent_t: int
    streaming_training: bool
    streaming_chunk_size: int | None = None
    streaming_max_length: int | None = None
    streaming_min_new_frame: int | None = None
    streaming_fixed_overlap_latents: int | None = None


def parse_multi_phased_distill_schedule(
        raw, *, default_num_latent_t: int,
        default_streaming_chunk_size: int | None = None,
        default_streaming_max_length: int | None = None
) -> list[DistillStage]:
    """Parse the compact-string / list-of-dicts schedule forms.

    Accepted forms (reference streaming_long_tuning.py:78-255):
      - ``None`` / ``""``: one always-streaming stage
      - ``"700:21,3000:240"``: first stage plain self-forcing to step 700
        at 21 latent frames, then streaming to 240
      - list of dicts with stage/start_step/end_step/num_latent_t/
        streaming_* keys
    """
    if raw is None or raw == "":
        max_length = default_streaming_max_length or default_num_latent_t
        return [
            DistillStage(name="streaming_long", start_step=0, end_step=None,
                         num_latent_t=int(max_length),
                         streaming_training=True,
                         streaming_chunk_size=default_streaming_chunk_size,
                         streaming_max_length=int(max_length))
        ]

    stages: list[DistillStage] = []
    prev_end = 0
    if isinstance(raw, str):
        for idx, part in enumerate(p.strip() for p in raw.split(",")
                                   if p.strip()):
            fields = [f.strip() for f in part.split(":")]
            if len(fields) == 2:
                start, end, nt = prev_end, int(fields[0]), int(fields[1])
            elif len(fields) == 3:
                start, end, nt = (int(fields[0]), int(fields[1]),
                                  int(fields[2]))
            else:
                raise ValueError(
                    "schedule entries must be 'end:num_latent_t' or "
                    f"'start:end:num_latent_t', got {part!r}")
            streaming = idx > 0
            stages.append(DistillStage(
                name="streaming_long" if streaming else "self_forcing",
                start_step=start, end_step=end, num_latent_t=nt,
                streaming_training=streaming,
                streaming_chunk_size=(default_streaming_chunk_size
                                      if streaming else None),
                streaming_max_length=nt if streaming else None))
            prev_end = end
    elif isinstance(raw, (list, tuple)):
        for idx, entry in enumerate(raw):
            if not isinstance(entry, dict):
                raise ValueError("schedule list entries must be dicts")
            name = str(entry.get("stage", "") or entry.get("name",
                                                           "")).strip()
            streaming = entry.get("streaming_training")
            if streaming is None:
                streaming = name in {"streaming_long", "long", "streaming"}
            if not name:
                name = "streaming_long" if streaming else "self_forcing"
            start = int(entry.get("start_step", prev_end))
            end_raw = entry.get("end_step")
            end = None if end_raw is None else int(end_raw)
            nt = int(entry.get(
                "num_latent_t",
                entry.get("streaming_max_length",
                          entry.get("max_length", default_num_latent_t))))

            def opt_int(key):
                v = entry.get(key)
                return None if v is None else int(v)

            stages.append(DistillStage(
                name=name, start_step=start, end_step=end, num_latent_t=nt,
                streaming_training=bool(streaming),
                streaming_chunk_size=opt_int("streaming_chunk_size"),
                streaming_max_length=opt_int("streaming_max_length"),
                streaming_min_new_frame=opt_int("streaming_min_new_frame"),
                streaming_fixed_overlap_latents=opt_int(
                    "streaming_fixed_overlap_latents")))
            if end is not None:
                prev_end = end
    else:
        raise ValueError(
            "multi_phased_distill_schedule must be a list, string, or empty")

    if not stages:
        raise ValueError("multi_phased_distill_schedule produced no stages")
    prev_end = 0
    for st in stages:
        if st.start_step < prev_end:
            raise ValueError("stages must be ordered and non-overlapping")
        if st.end_step is not None and st.end_step <= st.start_step:
            raise ValueError("stage end_step must be > start_step")
        if st.num_latent_t <= 0:
            raise ValueError("stage num_latent_t must be positive")
        if st.streaming_training:
            chunk = st.streaming_chunk_size or default_streaming_chunk_size
            if chunk is None or chunk <= 0:
                raise ValueError("streaming_chunk_size must be positive")
            if (st.streaming_fixed_overlap_latents is not None
                    and not 0 <= st.streaming_fixed_overlap_latents < chunk):
                raise ValueError(
                    "streaming_fixed_overlap_latents must be in [0, chunk)")
        if st.end_step is not None:
            prev_end = st.end_step
    return stages


def select_distill_stage(stages: list[DistillStage],
                         iteration: int) -> DistillStage:
    """Active stage for ``iteration`` (reference :257-271)."""
    for st in stages:
        if st.end_step is None:
            if iteration >= st.start_step:
                return st
        elif st.start_step <= iteration < st.end_step:
            return st
    return stages[-1]


class _StreamState:
    """Functional streaming carry: caches pytree + host-side counters."""

    def __init__(self, stage: DistillStage, caches):
        self.stage = stage
        self.caches = caches
        self.current_length = 0


class StreamingLongTuningPipeline(SelfForcingDistillationPipeline):
    """Self-forcing pipeline with the streaming long-tuning stages."""

    def __init__(self, generator, real_score, fake_score,
                 training_args: TrainingArgs,
                 dmd_config: DMDConfig | None = None,
                 denoise_steps: tuple[int, ...] = (1000, 750, 500),
                 stages: list[DistillStage] | None = None,
                 default_chunk_size: int | None = None, mesh=None):
        super().__init__(generator, real_score, fake_score, training_args,
                         dmd_config, denoise_steps, mesh)
        nt = generator.config.num_frames_per_block
        self.stages = stages or parse_multi_phased_distill_schedule(
            None, default_num_latent_t=nt * 4,
            default_streaming_chunk_size=nt * 2)
        self.default_chunk_size = default_chunk_size
        self._stream: _StreamState | None = None
        self._stream_steps: dict = {}

    # -- chunk program -------------------------------------------------------

    def _rollout_chunk(self, gen_params, caches, noise: Array, embeds: Array,
                       key: Array, freqs_list) -> tuple[Array, list]:
        """AR-denoise ``noise`` [b,c,nf,h,w] block by block on live caches.

        Unlike the short-horizon ``_rollout`` (which samples one
        grad-window block), gradients flow through the final denoise step
        of *every* block in the chunk — the chunk IS the gradient window
        of the streaming stage."""
        from flax import nnx

        model = nnx.merge(self.graphdef, gen_params)
        cfg = model.config
        b, c, t, h, w = noise.shape
        nfpb = cfg.num_frames_per_block
        num_train = self.dmd.num_train_timestep
        sigmas = [ts / num_train for ts in self.denoise_steps] + [0.0]

        out_blocks = []
        keys = jax.random.split(key, t // nfpb)
        for blk in range(t // nfpb):
            freqs = freqs_list[blk]
            cur = jax.lax.dynamic_slice_in_dim(noise, blk * nfpb, nfpb,
                                               axis=2)
            skeys = jax.random.split(keys[blk], len(self.denoise_steps))
            for i, ts in enumerate(self.denoise_steps):
                t_arr = jnp.full((b,), float(ts), jnp.float32)
                pred, _ = model.forward_block(cur.astype(jnp.bfloat16),
                                              embeds.astype(jnp.bfloat16),
                                              t_arr, caches, freqs_cis=freqs)
                x0 = cur - sigmas[i] * pred.astype(jnp.float32)
                if i == len(self.denoise_steps) - 1:
                    cur = x0
                else:
                    x0 = jax.lax.stop_gradient(x0)
                    nsig = sigmas[i + 1]
                    fresh = jax.random.normal(skeys[i], cur.shape, cur.dtype)
                    cur = (1 - nsig) * x0 + nsig * fresh
            out_blocks.append(cur)
            t_ctx = jnp.zeros((b,), jnp.float32)
            _, caches = model.forward_block(
                jax.lax.stop_gradient(cur).astype(jnp.bfloat16),
                embeds.astype(jnp.bfloat16), t_ctx, caches, freqs_cis=freqs)
            caches = jax.tree.map(jax.lax.stop_gradient, caches)
        return jnp.concatenate(out_blocks, axis=2), caches

    def _pred_x0_chunk(self, params, noisy, embeds, t, freqs):
        """Score-model x0 on the chunk window at its absolute positions."""
        from flax import nnx

        model = nnx.merge(self.graphdef, params)
        cfg = model.config
        b, c, tt, h, w = noisy.shape
        frame_seqlen = (h // cfg.patch_size[1]) * (w // cfg.patch_size[2])
        caches = model.init_caches(b, frame_seqlen, jnp.float32)
        pred, _ = model.forward_block(noisy.astype(jnp.bfloat16),
                                      embeds.astype(jnp.bfloat16), t,
                                      caches, freqs_cis=freqs)
        sigma = (t / self.dmd.num_train_timestep).reshape(
            -1, *([1] * (noisy.ndim - 1)))
        return noisy - sigma * pred.astype(jnp.float32)

    def _build_stream_step(self, num_blocks: int, update_student: bool):
        dmd = self.dmd

        def merge_freqs(freqs_list):
            cos = jnp.concatenate([f[0] for f in freqs_list], axis=0)
            sin = jnp.concatenate([f[1] for f in freqs_list], axis=0)
            return cos, sin

        def gen_loss_fn(gen_params, fake_params, real_params, caches, noise,
                        embeds, neg_embeds, key, freqs_flat):
            freqs_list = [(freqs_flat[2 * i], freqs_flat[2 * i + 1])
                          for i in range(num_blocks)]
            k_roll, k_t, k_n = jax.random.split(key, 3)
            video, new_caches = self._rollout_chunk(
                gen_params, caches, noise, embeds, k_roll, freqs_list)
            wfreqs = merge_freqs(freqs_list)
            t = jax.random.randint(k_t, (1,), 0,
                                   dmd.num_train_timestep).astype(jnp.float32)
            t = jnp.broadcast_to(
                shift_timestep(t, dmd.timestep_shift, dmd.num_train_timestep),
                (noise.shape[0],))
            sigma = (t / dmd.num_train_timestep).reshape(
                -1, *([1] * (noise.ndim - 1)))
            n = jax.random.normal(k_n, video.shape, jnp.float32)
            noisy = jax.lax.stop_gradient((1 - sigma) * video + sigma * n)
            x0_fake = jax.lax.stop_gradient(
                self._pred_x0_chunk(fake_params, noisy, embeds, t, wfreqs))
            x0_real_c = jax.lax.stop_gradient(
                self._pred_x0_chunk(real_params, noisy, embeds, t, wfreqs))
            x0_real_u = jax.lax.stop_gradient(
                self._pred_x0_chunk(real_params, noisy, neg_embeds, t,
                                    wfreqs))
            x0_real = x0_real_c + (x0_real_c -
                                   x0_real_u) * dmd.real_score_guidance_scale
            normalizer = jnp.maximum(jnp.mean(jnp.abs(video - x0_real)), 1e-6)
            grad = jnp.nan_to_num((x0_fake - x0_real) / normalizer)
            target = jax.lax.stop_gradient(video - grad)
            loss = 0.5 * jnp.mean(jnp.square(video - target))
            return loss, (video, new_caches)

        def critic_loss_fn(fake_params, video, embeds, key, freqs_flat):
            freqs_list = [(freqs_flat[2 * i], freqs_flat[2 * i + 1])
                          for i in range(num_blocks)]
            wfreqs = merge_freqs(freqs_list)
            k_t, k_n = jax.random.split(key)
            t = jax.random.randint(k_t, (1,), 0,
                                   dmd.num_train_timestep).astype(jnp.float32)
            t = jnp.broadcast_to(
                shift_timestep(t, dmd.timestep_shift, dmd.num_train_timestep),
                (video.shape[0],))
            sigma = (t / dmd.num_train_timestep).reshape(
                -1, *([1] * (video.ndim - 1)))
            n = jax.random.normal(k_n, video.shape, jnp.float32)
            noisy = (1 - sigma) * video + sigma * n
            from flax import nnx

            model = nnx.merge(self.graphdef, fake_params)
            cfg = model.config
            b, c, tt, h, w = noisy.shape
            caches = model.init_caches(
                b, (h // cfg.patch_size[1]) * (w // cfg.patch_size[2]),
                jnp.float32)
            v_pred, _ = model.forward_block(noisy.astype(jnp.bfloat16),
                                            embeds.astype(jnp.bfloat16), t,
                                            caches, freqs_cis=wfreqs)
            return jnp.mean(jnp.square(v_pred.astype(jnp.float32) -
                                       (n - video)))

        def step(gen_params, gen_opt, fake_params, fake_opt, real_params,
                 caches, rng, noise, embeds, neg_embeds, *freqs_flat):
            rng, k_gen, k_crit = jax.random.split(rng, 3)
            if update_student:
                (g_loss, (video, new_caches)), grads = jax.value_and_grad(
                    gen_loss_fn, has_aux=True)(
                        gen_params, fake_params, real_params, caches, noise,
                        embeds, neg_embeds, k_gen, freqs_flat)
                grads, g_norm = clip_grad_norm(grads, self.args.max_grad_norm)
                updates, gen_opt = self.gen_tx.update(grads, gen_opt,
                                                      gen_params)
                gen_params = optax.apply_updates(gen_params, updates)
            else:
                g_loss, (video, new_caches) = gen_loss_fn(
                    gen_params, fake_params, real_params, caches, noise,
                    embeds, neg_embeds, k_gen, freqs_flat)
                g_norm = jnp.zeros(())
            video = jax.lax.stop_gradient(video)
            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
                fake_params, video, embeds, k_crit, freqs_flat)
            c_grads, _ = clip_grad_norm(c_grads, self.args.max_grad_norm)
            updates, fake_opt = self.fake_tx.update(c_grads, fake_opt,
                                                    fake_params)
            fake_params = optax.apply_updates(fake_params, updates)
            return (gen_params, gen_opt, fake_params, fake_opt, new_caches,
                    rng, g_loss, g_norm, c_loss)

        return jax.jit(step)

    # -- driver --------------------------------------------------------------

    def _stage_max_length(self, stage: DistillStage) -> int:
        return int(stage.streaming_max_length or stage.num_latent_t)

    def _stage_chunk(self, stage: DistillStage) -> int:
        chunk = stage.streaming_chunk_size or self.default_chunk_size
        nfpb = self.generator_model.config.num_frames_per_block
        if chunk is None:
            chunk = nfpb * 2
        if chunk % nfpb:
            raise ValueError(
                f"streaming_chunk_size {chunk} must be divisible by "
                f"num_frames_per_block {nfpb}")
        return int(chunk)

    def _select_new_frames(self, stage: DistillStage, remaining: int,
                           first: bool) -> int:
        """Sampled new-frame count, block-rounded (reference :1202-1255)."""
        nfpb = self.generator_model.config.num_frames_per_block

        def aligned(n: int) -> int:
            # ALWAYS block-aligned: a ragged tail would be silently
            # dropped by num_blocks = nf // nfpb while current_length
            # still advanced by nf
            return int(max(nfpb, (n // nfpb) * nfpb))

        chunk = self._stage_chunk(stage)
        if first:
            return aligned(min(chunk, remaining))
        lo = stage.streaming_min_new_frame or nfpb
        if stage.streaming_fixed_overlap_latents is not None:
            return aligned(min(chunk - stage.streaming_fixed_overlap_latents,
                               remaining))
        hi = min(chunk, remaining)
        lo = min(lo, hi)
        rng = np.random.default_rng(self.args.seed * 100003 + self.step)
        blocks = rng.integers(lo // nfpb, hi // nfpb + 1)
        return int(max(nfpb, blocks * nfpb))

    def train_one_step(self, embeds: np.ndarray, neg_embeds: np.ndarray,
                       latent_shape: tuple[int, ...]) -> dict:
        stage = select_distill_stage(self.stages, self.step)
        stage_idx = self.stages.index(stage)
        if not stage.streaming_training:
            shape = (latent_shape[:2] +
                     (min(stage.num_latent_t, latent_shape[2]),) +
                     latent_shape[3:])
            metrics = super().train_one_step(embeds, neg_embeds, shape)
            metrics["distill_stage_index"] = stage_idx
            return metrics

        cfg = self.generator_model.config
        max_len = self._stage_max_length(stage)
        st = self._stream
        if (st is None or st.stage != stage
                or st.current_length >= max_len):
            b, c = latent_shape[0], latent_shape[1]
            h, w = latent_shape[3], latent_shape[4]
            frame_seqlen = (h // cfg.patch_size[1]) * (w // cfg.patch_size[2])
            st = _StreamState(stage,
                              self.generator_model.init_caches(
                                  b, frame_seqlen, jnp.float32))
            self._stream = st

        remaining = max_len - st.current_length
        nf = self._select_new_frames(stage, remaining,
                                     first=st.current_length == 0)
        nfpb = cfg.num_frames_per_block
        num_blocks = nf // nfpb
        update_student = self.step % self.dmd.dfake_gen_update_ratio == 0
        key = (num_blocks, update_student)
        if key not in self._stream_steps:
            self._stream_steps[key] = self._build_stream_step(*key)

        b, c, _, h, w = latent_shape
        pt, ph, pw = cfg.patch_size
        freqs_flat = []
        for blk in range(num_blocks):
            start = st.current_length + blk * nfpb
            cos, sin = get_rotary_pos_embed_wan(
                (nfpb // pt, h // ph, w // pw), cfg.attention_head_dim,
                cfg.rope_theta, start_frame=start)
            freqs_flat += [cos, sin]

        with mesh_context(self.mesh):
            self.rng, k = jax.random.split(self.rng)
            noise = jax.random.normal(k, (b, c, nf, h, w), jnp.float32)
            (self.gen_params, self.gen_opt, self.fake_params, self.fake_opt,
             st.caches, self.rng, g_loss, g_norm,
             c_loss) = self._stream_steps[key](
                 self.gen_params, self.gen_opt, self.fake_params,
                 self.fake_opt, self.real_params, st.caches, self.rng, noise,
                 jnp.asarray(embeds, jnp.float32),
                 jnp.asarray(neg_embeds, jnp.float32), *freqs_flat)

        st.current_length += nf
        self.step += 1
        metrics = {
            "critic_loss": float(c_loss),
            "step": self.step,
            "distill_stage_index": stage_idx,
            "streaming_current_length": st.current_length,
            "streaming_max_length": max_len,
            "streaming_new_frames": nf,
        }
        if update_student:
            metrics["generator_loss"] = float(g_loss)
            metrics["generator_grad_norm"] = float(g_norm)
        return metrics
