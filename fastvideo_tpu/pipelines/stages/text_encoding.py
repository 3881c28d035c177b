"""Text encoding stage.

Analog of /root/reference/fastvideo/pipelines/stages/text_encoding.py: runs
each (tokenizer, encoder) pair, applies the per-family postprocess fn, and
fills prompt_embeds / negative_prompt_embeds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


class TextEncodingStage(PipelineStage):
    def __init__(self, text_encoders, tokenizers, postprocess_funcs=(),
                 max_length: int = 512, preprocess_funcs=(),
                 max_lengths=(), encoder_kwargs=()):
        self.text_encoders = list(text_encoders)
        self.tokenizers = list(tokenizers)
        self.postprocess_funcs = list(postprocess_funcs)
        self.preprocess_funcs = list(preprocess_funcs)
        self.max_length = max_length
        self.max_lengths = list(max_lengths)
        self.encoder_kwargs = list(encoder_kwargs)

    def _jitted_encoder(self, idx: int, kwargs: dict):
        """One jitted program per encoder: eager per-op dispatch costs one
        host round-trip per XLA op (seconds-per-prompt on a remote-tunnel
        TPU; also forfeits fusion on any host)."""
        cache = getattr(self, "_encode_fns", None)
        if cache is None:
            cache = self._encode_fns = {}
        if idx not in cache:
            import jax
            from flax import nnx

            graphdef, state = nnx.split(self.text_encoders[idx])

            @jax.jit
            def encode_fn(state, ids, mask):
                return nnx.merge(graphdef, state)(ids, mask, **kwargs)

            cache[idx] = (encode_fn, state)
        return cache[idx]

    def _encode_one(self, prompts: list[str], idx: int,
                    max_length_override: int | None = None):
        tokenizer = self.tokenizers[idx]
        encoder = self.text_encoders[idx]
        if tokenizer is None:
            raise RuntimeError("No tokenizer available for text encoding")
        if idx < len(self.preprocess_funcs):
            prompts = [self.preprocess_funcs[idx](p) for p in prompts]
        max_length = max_length_override or (
            self.max_lengths[idx]
            if idx < len(self.max_lengths) else self.max_length)
        enc = tokenizer(prompts, padding="max_length",
                        max_length=max_length, truncation=True,
                        return_tensors="np")
        ids = jnp.asarray(np.asarray(enc["input_ids"]))
        mask = jnp.asarray(np.asarray(enc["attention_mask"]))
        kwargs = (self.encoder_kwargs[idx]
                  if idx < len(self.encoder_kwargs) else {})
        from flax import nnx

        if isinstance(encoder, nnx.Module):
            encode_fn, state = self._jitted_encoder(idx, kwargs)
            outputs = encode_fn(state, ids, mask)
        else:  # non-nnx callable conditioners
            outputs = encoder(ids, mask, **kwargs)
        if idx < len(self.postprocess_funcs):
            embeds = self.postprocess_funcs[idx](outputs)
        else:
            embeds = outputs.last_hidden_state
        return (embeds, mask, getattr(outputs, "pooler_output", None),
                getattr(outputs, "audio_hidden_state", None))

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        # per-request text-length override (typed API
        # sampling.max_sequence_length) — passed per call, NEVER stored on
        # the long-lived stage (a served request must not change the next
        # request's tokenization)
        msl = batch.extra.get("max_sequence_length")
        msl = int(msl) if msl else None
        prompts = batch.prompt if isinstance(batch.prompt,
                                             list) else [batch.prompt]
        pooled_list = batch.extra.setdefault("pooled_embeds", [])
        for i in range(len(self.text_encoders)):
            embeds, mask, pooled, audio = self._encode_one(
                [p or "" for p in prompts], i, max_length_override=msl)
            batch.prompt_embeds.append(embeds)
            batch.prompt_attention_mask.append(mask)
            pooled_list.append(pooled)
            if audio is not None:
                # dual-stream conditioning (LTX-2 Gemma connector)
                batch.extra["audio_text_embeds"] = audio
        if batch.do_classifier_free_guidance:
            neg = batch.negative_prompt or ""
            negs = [neg] * len(prompts)
            neg_pooled_list = batch.extra.setdefault(
                "negative_pooled_embeds", [])
            for i in range(len(self.text_encoders)):
                embeds, mask, pooled, audio = self._encode_one(
                    negs, i, max_length_override=msl)
                batch.negative_prompt_embeds.append(embeds)
                batch.negative_attention_mask.append(mask)
                neg_pooled_list.append(pooled)
                if audio is not None:
                    batch.extra["negative_audio_text_embeds"] = audio
        return batch
