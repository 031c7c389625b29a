"""Diarization: models, VAD, clustering, turns, and the transcript merge."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.config import DiarizationConfig
from turbo_whisper_workspace_tpu.models import embedding as emb_mod
from turbo_whisper_workspace_tpu.models import segmentation as seg_mod
from turbo_whisper_workspace_tpu.pipeline.diarizer import (
    SR, DiarizationSegment, SpeakerDiarizer, energy_vad,
)


def _voice(f0: float, seconds: float, rng, brightness: float = 1.0):
    """Synthetic 'speaker': harmonic stack + shaped noise."""
    t = np.arange(int(seconds * SR)) / SR
    sig = sum(
        (0.5 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
        for k in range(1, 9)
    )
    sig = sig + 0.02 * rng.standard_normal(len(t)) * brightness
    env = np.minimum(1.0, 10 * np.minimum(t, t[::-1]))  # fade in/out
    return (0.3 * sig * env).astype(np.float32)


def _two_speaker_audio(rng):
    """A(3s) sil(1s) B(3s) sil(1s) A(3s) sil(1s) B(3s)."""
    a1 = _voice(110, 3, rng)
    b1 = _voice(280, 3, rng, brightness=4.0)
    sil = np.zeros(SR, np.float32)
    return np.concatenate([a1, sil, b1, sil, _voice(110, 3, rng), sil,
                           _voice(280, 3, rng, brightness=4.0)])


def test_energy_vad():
    rng = np.random.default_rng(0)
    audio = _two_speaker_audio(rng)
    mask = energy_vad(audio)
    # speech ≈ 12 s of 15 s
    assert 0.6 < mask.mean() < 0.95
    # the first silence gap (3.0-4.0 s) is mostly non-speech
    assert mask[32:38].mean() < 0.5


def test_diarizer_separates_two_speakers():
    rng = np.random.default_rng(1)
    audio = _two_speaker_audio(rng)
    d = SpeakerDiarizer(DiarizationConfig())
    turns = d.process_audio(audio, num_speakers=2)
    assert len(turns) >= 2
    speakers = {t.speaker for t in turns}
    assert len(speakers) == 2
    # same voice at [0,3] and [8,11] must get the same label,
    # different from the voice at [4,7]
    def label_at(t):
        for seg in turns:
            if seg.start <= t <= seg.end:
                return seg.speaker
        return None
    assert label_at(1.5) == label_at(9.5)
    assert label_at(5.5) == label_at(13.5)
    assert label_at(1.5) != label_at(5.5)


def test_auto_speaker_estimate():
    d = SpeakerDiarizer(DiarizationConfig())
    assert d.estimate_num_speakers(np.zeros(10 * SR)) == 2
    assert d.estimate_num_speakers(np.zeros(95 * SR)) == 3
    assert d.estimate_num_speakers(np.zeros(1000 * SR)) == 10  # cap


def test_merge_max_overlap():
    diar = [
        DiarizationSegment(0.0, 5.0, "Speaker 0"),
        DiarizationSegment(5.0, 10.0, "Speaker 1"),
    ]
    transcript = [
        {"text": "hello", "start": 0.5, "end": 2.0},
        {"text": "world", "start": 4.0, "end": 6.5},   # 1.0s in spk0, 1.5s in spk1
        {"text": "bye", "start": 8.0, "end": 9.0},
    ]
    merged = SpeakerDiarizer.create_transcript_with_speakers(transcript, diar)
    assert [m["speaker"] for m in merged] == ["Speaker 0", "Speaker 1", "Speaker 1"]
    assert merged[0]["text"] == "hello"


def test_merge_alternating_fallback():
    transcript = [{"text": t, "start": i, "end": i + 1} for i, t in
                  enumerate("abcd")]
    merged = SpeakerDiarizer.create_transcript_with_speakers(transcript, [])
    assert [m["speaker"] for m in merged] == [
        "Speaker 0", "Speaker 1", "Speaker 0", "Speaker 1"
    ]


def test_format_as_conversation_groups_consecutive():
    segs = [
        {"speaker": "Alice", "text": "hi"},
        {"speaker": "Alice", "text": "there"},
        {"speaker": "Bob", "text": "hey"},
    ]
    out = SpeakerDiarizer.format_as_conversation(segs)
    assert out == "**Alice**: hi there\n\n**Bob**: hey"


def test_smoothing_min_durations():
    cfg = DiarizationConfig(min_duration_on=0.3, min_duration_off=0.5)
    d = SpeakerDiarizer(cfg)
    turns = [(0.0, 1.0, 0), (1.2, 2.0, 0), (2.0, 2.1, 1), (3.0, 4.0, 1)]
    sm = d._smooth(turns)
    # first two merge (0.2s gap < 0.5), 0.1s turn dropped
    assert sm[0] == (0.0, 2.0, 0)
    assert (2.0, 2.1, 1) not in sm
    assert (3.0, 4.0, 1) in sm


def test_segmentation_model_shapes():
    import jax

    dims = seg_mod.SegmentationDims(d_model=64, n_head=2, n_layer=2)
    params = seg_mod.init_params(dims, jax.random.PRNGKey(0))
    mel = np.zeros((2, 80, 1000), np.float32)
    logits = np.asarray(seg_mod.forward(params, dims, mel))
    assert logits.shape == (2, 100, seg_mod.N_CLASSES)


def test_powerset_decode():
    logits = np.full((1, 3, seg_mod.N_CLASSES), -10.0)
    logits[0, 0, 0] = 0    # ∅
    logits[0, 1, 2] = 0    # {B}
    logits[0, 2, 4] = 0    # {A,B}
    act = seg_mod.powerset_to_activity(logits)
    assert act[0, 0].tolist() == [False, False, False]
    assert act[0, 1].tolist() == [False, True, False]
    assert act[0, 2].tolist() == [True, True, False]


def test_embedding_model_shapes_and_norm():
    import jax

    dims = emb_mod.EmbeddingDims(channels=64, n_blocks=2, embed_dim=64)
    params = emb_mod.init_params(dims, jax.random.PRNGKey(0))
    mel = np.random.default_rng(0).standard_normal((3, 80, 200)).astype(np.float32)
    emb = np.asarray(emb_mod.forward(params, dims, mel))
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
