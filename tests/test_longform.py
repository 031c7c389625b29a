"""Long-form chunk planning, stride merge, and the batched Transcriber."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.config import TranscriptionConfig
from turbo_whisper_workspace_tpu.decode import longform
from turbo_whisper_workspace_tpu.ops.mel import SAMPLE_RATE


def test_plan_short_clip():
    plans = longform.plan_chunks(10 * SAMPLE_RATE)
    assert len(plans) == 1
    assert plans[0].start == 0
    assert plans[0].core_start_s == 0.0
    assert abs(plans[0].core_end_s - 10.0) < 1e-6


def test_plan_long_clip_covers_everything():
    n = 95 * SAMPLE_RATE
    plans = longform.plan_chunks(n, chunk_s=30.0, stride_s=5.0)
    # windows advance by 20 s: starts 0, 20, 40, 60, 65(clamped)
    assert plans[0].start == 0
    assert plans[1].start == 20 * SAMPLE_RATE
    # cores tile [0, 95] without gaps or overlaps
    cores = [(p.core_start_s, p.core_end_s) for p in plans]
    assert cores[0][0] == 0.0
    assert abs(cores[-1][1] - 95.0) < 1e-6
    for (a_s, a_e), (b_s, b_e) in zip(cores, cores[1:]):
        assert a_e <= b_s + 1e-6 or abs(a_e - b_s) < 1.0  # contiguous-ish
    # every moment of audio is inside ≥1 window
    for t in np.linspace(0, 94.9, 50):
        assert any(
            p.start_s <= t < p.start_s + 30.0 for p in plans
        ), f"uncovered t={t}"


def test_merge_dedups_stride_overlap():
    plans = longform.plan_chunks(50 * SAMPLE_RATE, chunk_s=30.0, stride_s=5.0)
    assert len(plans) == 2
    # same event appears in both windows (t=22s abs): window0 rel 22,
    # window1 (starts at 20s) rel 2
    w0 = [{"start": 22.0, "end": 23.0, "text": "dup"},
          {"start": 1.0, "end": 2.0, "text": "a"}]
    w1 = [{"start": 2.0, "end": 3.0, "text": "dup"},
          {"start": 28.0, "end": 29.0, "text": "b"}]
    merged = longform.merge_chunk_segments([w0, w1], plans, 50.0)
    texts = [s["text"] for s in merged]
    assert texts == ["a", "dup", "b"]
    # absolute times
    assert merged[1]["start"] == 22.0
    assert merged[2]["start"] == 48.0


def test_transcriber_end_to_end_smoke(rng):
    """Random tiny model on noise: schema, determinism, multi-file batching."""
    import jax

    from turbo_whisper_workspace_tpu.models import whisper
    from turbo_whisper_workspace_tpu.pipeline import transcriber as tr

    dims = whisper.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=517, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = whisper.init_params(dims, jax.random.PRNGKey(0))
    cfg = TranscriptionConfig(
        batch_size=4, max_decode_len=12, beam_size=1, language="en"
    )
    t = tr.load_transcriber(params, dims, cfg)

    audios = [
        (rng.standard_normal(35 * SAMPLE_RATE) * 0.1).astype(np.float32),
        (rng.standard_normal(5 * SAMPLE_RATE) * 0.1).astype(np.float32),
    ]
    res = t.transcribe(audios)
    assert len(res) == 2
    for r, a in zip(res, audios):
        assert set(r) >= {"text", "chunks", "segments", "language", "duration"}
        assert abs(r["duration"] - len(a) / SAMPLE_RATE) < 1e-6
        for c in r["chunks"]:
            assert len(c["timestamp"]) == 2

    res2 = t.transcribe(audios)
    assert [r["text"] for r in res] == [r["text"] for r in res2]


def test_compression_ratio():
    from turbo_whisper_workspace_tpu.pipeline.transcriber import compression_ratio

    assert compression_ratio("a" * 1000) > 2.4
    assert compression_ratio("the quick brown fox") < 2.4
    assert compression_ratio("") == 0.0
