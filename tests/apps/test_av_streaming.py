"""Dreamverse AV streaming: event protocol + jpeg mode + fmp4 gating."""

import numpy as np
import pytest


def _frames(n=4, h=16, w=16):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_stream_jpeg_events():
    from fastvideo_tpu.apps.dreamverse.av_streaming import (StreamChunk,
                                                            StreamComplete,
                                                            StreamInit,
                                                            stream_jpeg)

    events = []
    ok, err = stream_jpeg(frames=_frames(4), stream_id="s1",
                          publish=events.append, head_trim_frames=1)
    assert ok and err is None
    assert isinstance(events[0], StreamInit)
    assert events[0].mime == "image/jpeg"
    chunks = [e for e in events if isinstance(e, StreamChunk)]
    assert len(chunks) == 3  # 4 frames, 1 trimmed
    assert all(c.chunk.startswith(b"\xff\xd8") for c in chunks)  # JPEG SOI
    assert isinstance(events[-1], StreamComplete)
    assert events[-1].chunks == 3

    ok2, err2 = stream_jpeg(frames=[], stream_id="s", publish=events.append)
    assert not ok2 and "no frames" in err2
    ok3, err3 = stream_jpeg(frames=_frames(2), stream_id="s",
                            publish=events.append, head_trim_frames=2)
    assert not ok3 and "removes all" in err3


def test_normalize_audio_shapes():
    from fastvideo_tpu.apps.dreamverse.av_streaming import normalize_audio

    mono = np.sin(np.linspace(0, 10, 1000)).astype(np.float32)
    pcm, ch = normalize_audio(mono, 16000)
    assert pcm.shape == (1000, 1) and ch == 1 and pcm.dtype == np.int16
    stereo = np.stack([mono, mono])  # [2, N] channel-first
    pcm2, ch2 = normalize_audio(stereo, 16000)
    assert pcm2.shape == (1000, 2) and ch2 == 2
    assert normalize_audio(np.zeros((2, 2, 2)), 16000) is None
    assert normalize_audio(None, 16000) is None


def test_stream_segment_dispatch_and_fallback():
    from fastvideo_tpu.apps.dreamverse import av_streaming as av

    events = []
    ok, err = av.stream_segment("legacy_jpeg", frames=_frames(2),
                                stream_id="a", publish=events.append)
    assert ok

    if av.FFMPEG_BIN is None:
        # av_fmp4 degrades to jpeg in this container
        events2 = []
        ok2, _ = av.stream_segment("av_fmp4", frames=_frames(2),
                                   stream_id="b", publish=events2.append,
                                   audio=None, audio_sample_rate=None)
        assert ok2
        assert events2[0].mime == "image/jpeg"

    ok3, err3 = av.stream_segment("nope", frames=_frames(2),
                                  stream_id="c", publish=events.append)
    assert not ok3 and "unknown STREAM_MODE" in err3


@pytest.mark.skipif("fastvideo_tpu.apps.dreamverse.av_streaming" and
                    __import__("shutil").which("ffmpeg") is None,
                    reason="ffmpeg not installed")
def test_stream_fmp4_real():
    from fastvideo_tpu.apps.dreamverse.av_streaming import (StreamChunk,
                                                            stream_fmp4)

    events = []
    ok, err = stream_fmp4(frames=_frames(8, 64, 64), stream_id="f",
                          publish=events.append)
    assert ok, err
    payload = b"".join(e.chunk for e in events
                       if isinstance(e, StreamChunk))
    assert b"ftyp" in payload[:64]
