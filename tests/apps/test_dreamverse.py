"""Dreamverse backend: prompt pipeline, pool leasing, session state
machine (reference apps/dreamverse/dreamverse/)."""

import queue

import pytest


def test_prompt_safety_rules_and_batch():
    from fastvideo_tpu.apps.dreamverse import (BlockedPrompt,
                                               PromptSafetyFilter)

    f = PromptSafetyFilter(classifier_path=None)
    assert f.get_prompt_safety_error("a cat on a beach") is None
    assert f.get_prompt_safety_error("nsfw scene") is not None
    blocked = f.get_first_blocked_prompt(["ok", "explicit stuff", "also"])
    assert isinstance(blocked, BlockedPrompt)
    assert blocked.index == 1
    assert f.get_first_blocked_prompt(["a", "b"]) is None


def test_enhancer_parsing_shapes():
    from fastvideo_tpu.apps.dreamverse.prompt_enhancer import (
        extract_numbered_prompts_from_text, parse_enhance_response,
        parse_rewrite_response)

    # JSON segment_prompts
    assert parse_rewrite_response(
        '{"segment_prompts": ["a", "b"]}', 2) == ["a", "b"]
    # fenced JSON
    assert parse_rewrite_response(
        '```json\n{"segment_prompts": ["x", "y", "z"]}\n```', 3) == \
        ["x", "y", "z"]
    # indexed keys
    assert parse_rewrite_response(
        '{"segment_1": "a", "segment_2": {"prompt": "b"}}', 2) == \
        ["a", "b"]
    # numbered plain text with continuation lines
    text = "1: first shot\nmore detail\n2) second shot"
    assert extract_numbered_prompts_from_text(text, 2) == \
        ["first shot more detail", "second shot"]
    assert parse_rewrite_response(text, 2)[0].startswith("first")
    # wrong count -> None
    assert parse_rewrite_response('{"segment_prompts": ["a"]}', 2) is None

    assert parse_enhance_response('{"prompt": "cinematic cat"}') == \
        "cinematic cat"
    assert parse_enhance_response("plain text prompt") == \
        "plain text prompt"
    assert parse_enhance_response('{"nope": 1}') is None


def test_enhancer_staged_fallback():
    from fastvideo_tpu.apps.dreamverse import PromptEnhancer

    calls = []

    def bad(system, user, timeout):
        calls.append("bad")
        raise RuntimeError("down")

    def good(system, user, timeout):
        calls.append("good")
        return '{"prompt": "enhanced!"}'

    enh = PromptEnhancer()
    enh.add_provider("primary", bad, stage=0)
    enh.add_provider("backup", good, stage=1)
    res = enh.enhance("a cat")
    assert res.prompt == "enhanced!"
    assert res.source == "backup" and not res.fallback_used
    assert calls == ["bad", "good"]
    assert enh.provider_success_counts()["backup"] == 1

    # no providers -> pass-through fallback
    res2 = PromptEnhancer().enhance("  raw idea  ")
    assert res2.prompt == "raw idea" and res2.fallback_used

    rw = PromptEnhancer().rewrite_window("story", "go left", 3)
    assert rw.segment_prompts == ["go left"] * 3 and rw.fallback_used


def test_pool_lease_step_and_status():
    from fastvideo_tpu.apps.dreamverse import DevicePool
    from fastvideo_tpu.apps.dreamverse.messages import (MediaChunk,
                                                        MediaComplete,
                                                        MediaInit)

    pool = DevicePool(num_slots=2, max_users_per_slot=1)
    try:
        q1 = pool.register_stream_queue("u1")
        s1 = pool.acquire("u1")
        assert s1 is not None and s1.client_count == 1
        pool.register_stream_queue("u2")
        s2 = pool.acquire("u2")
        assert s2.slot_id != s1.slot_id  # least-loaded spread
        pool.register_stream_queue("u3")
        assert pool.acquire("u3") is None  # saturated

        pool.submit_step("u1", "hello world")
        init = q1.get(timeout=5)
        chunk = q1.get(timeout=5)
        done = q1.get(timeout=5)
        assert isinstance(init, MediaInit) and init.segment_idx == 0
        assert isinstance(chunk, MediaChunk)
        assert chunk.chunk == b"hello world"  # echo worker
        assert isinstance(done, MediaComplete) and done.chunks == 1

        pool.submit_step("u1", "next")
        assert q1.get(timeout=5).segment_idx == 1  # segment idx advances

        status = pool.get_status()
        assert status["total_users"] == 2
        pool.release("u1")
        assert pool.acquire("u3") is not None  # slot freed
    finally:
        pool.shutdown()


def test_session_controller_flow():
    from fastvideo_tpu.apps.dreamverse import (DevicePool, DreamverseConfig,
                                               SessionController)
    from fastvideo_tpu.apps.dreamverse.session import SessionError

    pool = DevicePool(num_slots=1)
    cfg = DreamverseConfig(generation_segment_cap=2,
                           prompt_auto_timeout_ms=50)
    try:
        sess = SessionController(pool, cfg)
        with pytest.raises(SessionError):
            sess.submit_prompt("")
        with pytest.raises(SessionError):
            sess.submit_prompt("nsfw thing")

        ready = sess.submit_prompt("a red balloon")
        assert ready.prompt == "a red balloon"  # fallback enhancer
        adv = sess.advance(wait_ms=200)
        assert adv.prompt == "a red balloon"
        assert sess.segments_generated == 1
        # stream produced events
        assert sess.events.get(timeout=5).segment_idx == 0

        # empty queue -> auto prompt repeats the last one
        auto = sess.advance(wait_ms=10)
        assert auto.source == "auto" and auto.prompt == "a red balloon"

        with pytest.raises(SessionError):  # segment cap
            sess.advance(wait_ms=10)

        snap = sess.snapshot()
        assert snap["segments_generated"] == 2
        sess.close()
        with pytest.raises(SessionError):
            sess.submit_prompt("after close")

        # capacity error when the only slot is taken
        s2 = SessionController(pool, cfg)
        with pytest.raises(SessionError):
            SessionController(pool, cfg)
        s2.close()
    finally:
        pool.shutdown()


def test_causal_lm_provider_with_tiny_lm():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.apps.dreamverse.prompt_enhancer import (
        CausalLMProvider, PromptEnhancer)
    from fastvideo_tpu.models.encoders.llama import (LlamaArchConfig,
                                                     LlamaEncoderModel)
    from fastvideo_tpu.models.lm import CausalLM

    class CharTok:
        eos_token_id = 3

        def __call__(self, text, return_tensors=None):
            import numpy as np

            ids = np.asarray([[min(ord(c) % 64, 63) for c in text[:16]]])
            return {"input_ids": ids}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(65 + (int(i) % 26)) for i in ids)

    cfg = LlamaArchConfig(vocab_size=64, hidden_size=16,
                          intermediate_size=32, num_hidden_layers=1,
                          num_attention_heads=2, num_key_value_heads=1)
    trunk = LlamaEncoderModel(cfg, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))
    provider = CausalLMProvider(
        CausalLM(trunk, tie_word_embeddings=True), CharTok(),
        max_new_tokens=4)
    # generous deadline: the first call pays the jit compile of the
    # prefill+decode programs (tens of seconds on a loaded 1-CPU box)
    out = provider("system", "user prompt", 120.0)
    assert isinstance(out, str) and len(out) <= 4

    # wired through the enhancer: plain-text output counts as enhanced
    enh = PromptEnhancer()
    enh.add_provider("local", provider)
    res = enh.enhance("a cat")
    assert res.source == "local" and not res.fallback_used

    # gating error without weights
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        CausalLMProvider.from_checkpoint("/nonexistent")


def test_session_event_logger(tmp_path):
    from fastvideo_tpu.apps.dreamverse import (DevicePool, DreamverseConfig,
                                               SessionController)
    from fastvideo_tpu.apps.dreamverse.session import SessionError
    from fastvideo_tpu.apps.dreamverse.session_logger import (
        SessionEventLogger)

    log = SessionEventLogger(tmp_path)
    pool = DevicePool(num_slots=1)
    try:
        sess = SessionController(pool, DreamverseConfig(), event_logger=log)
        sess.submit_prompt("a dog")
        with pytest.raises(SessionError):
            sess.submit_prompt("nsfw")
        sess.advance(wait_ms=100)
        sess.close()
        events = [e["event"] for e in log.read_events()]
        assert events == ["session_start", "prompt_ready",
                          "prompt_blocked", "segment_advance",
                          "session_end"]
        assert all(e["client_id"] == sess.user_id
                   for e in log.read_events())
    finally:
        pool.shutdown()


def test_pool_reload_and_lora_commands():
    import threading

    from fastvideo_tpu.apps.dreamverse import DevicePool

    calls = []
    built = []

    class Worker:
        def __init__(self):
            built.append(1)
            self.done = threading.Event()

        def reset(self, **kw):
            pass

        def step(self, prompt, **kw):
            return prompt.encode()

        def reload_model(self, **kw):
            calls.append(("reload", kw))
            self.done.set()

        def apply_lora(self, **kw):
            calls.append(("lora", kw))
            self.done.set()

    pool = DevicePool(num_slots=1, worker_factory=Worker)
    try:
        q = pool.register_stream_queue("u")
        pool.acquire("u")
        pool.apply_lora(path="/lora/a", alpha=0.7)
        pool.reload_model(model_path="/new")
        # drain through a step to guarantee ordering
        pool.submit_step("u", "ping")
        assert q.get(timeout=5)  # MediaInit arrives after the commands ran
        assert ("lora", {"path": "/lora/a", "alpha": 0.7}) in calls
        assert ("reload", {"model_path": "/new"}) in calls
    finally:
        pool.shutdown()
