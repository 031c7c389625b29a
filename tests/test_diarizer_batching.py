"""Batched/bucketed diarization stage: O(1) compiled shapes for N files.

VERDICT r2 weak #2: diarization used to run file-by-file with
content-dependent batch shapes (a retrace per distinct shape — fatal
with multi-minute remote compiles). Now all files' segmentation windows
and embedding crops flatten into power-of-two-bucketed device batches;
these tests pin the trace count and the single-file/batch parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import turbo_whisper_workspace_tpu.pipeline.diarizer as dz
from turbo_whisper_workspace_tpu.config import DiarizationConfig
from turbo_whisper_workspace_tpu.models import embedding as emb_mod
from turbo_whisper_workspace_tpu.models import segmentation as seg_mod

SR = 16000


def _speech_like(seconds, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t + seed)
    return (0.3 * np.sin(2 * np.pi * f0 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def neural_diarizer():
    seg_dims = seg_mod.SegmentationDims(d_model=64, n_head=2, n_layer=1)
    emb_dims = emb_mod.EmbeddingDims(channels=64, n_blocks=1, embed_dim=32)
    return dz.SpeakerDiarizer(
        DiarizationConfig(seg_batch=64, emb_batch=64),
        seg_params=seg_mod.init_params(seg_dims, jax.random.PRNGKey(0)),
        seg_dims=seg_dims,
        emb_params=emb_mod.init_params(emb_dims, jax.random.PRNGKey(1)),
        emb_dims=emb_dims,
    )


def _counting(monkeypatch, d):
    seg_shapes, emb_shapes = [], []

    def seg_fwd(params, dims, mels):
        seg_shapes.append(tuple(mels.shape))
        return seg_mod.forward(params, dims, mels)

    def emb_fwd(params, dims, mels):
        emb_shapes.append(tuple(mels.shape))
        return emb_mod.forward(params, dims, mels)

    monkeypatch.setattr(
        dz, "_seg_forward", jax.jit(seg_fwd, static_argnames=("dims",)))
    monkeypatch.setattr(
        dz, "_emb_forward", jax.jit(emb_fwd, static_argnames=("dims",)))
    return seg_shapes, emb_shapes


def test_process_batch_traces_once_for_many_files(monkeypatch, neural_diarizer):
    seg_shapes, emb_shapes = _counting(monkeypatch, neural_diarizer)
    # 4 files with different durations AND different speech content —
    # window/crop counts differ per file, shapes must not
    audios = [_speech_like(s, i) for i, s in enumerate((12, 15, 20, 9))]
    out = neural_diarizer.process_batch(audios, num_speakers=2)
    assert len(out) == 4
    # the jitted fns trace once per UNIQUE bucketed shape only
    assert len(seg_shapes) == len(set(seg_shapes)) <= 2
    assert len(emb_shapes) == len(set(emb_shapes)) <= 2

    # a second batch with different file count / durations reuses buckets
    n_seg, n_emb = len(seg_shapes), len(emb_shapes)
    out2 = neural_diarizer.process_batch(
        [_speech_like(18, 7), _speech_like(11, 8)], num_speakers=2)
    assert len(out2) == 2
    new = [s for s in seg_shapes[n_seg:] if s in seg_shapes[:n_seg]]
    assert not new, "re-traced an already-compiled segmentation shape"
    new = [s for s in emb_shapes[n_emb:] if s in emb_shapes[:n_emb]]
    assert not new, "re-traced an already-compiled embedding shape"


def test_single_file_equals_batch_row(neural_diarizer):
    a = _speech_like(14, 3)
    b = _speech_like(9, 4)
    solo = neural_diarizer.process_audio(a, num_speakers=2)
    batch = neural_diarizer.process_batch([a, b], num_speakers=2)[0]
    assert [(s.start, s.end, s.speaker) for s in solo] == [
        (s.start, s.end, s.speaker) for s in batch
    ]


def test_sliding_windows_cover_whole_file(neural_diarizer):
    starts = neural_diarizer._seg_window_starts(int(30 * SR))
    # 10 s window / 1 s step over 30 s → starts 0..20 (21 windows,
    # the load bench.py prices in)
    assert len(starts) == 21
    assert starts[0] == 0 and starts[-1] == 20 * SR


def test_powerset_speech_prob():
    # logit mass on ∅ (class 0) → low speech prob; on a speaker → high
    logits = np.zeros((1, 2, seg_mod.N_CLASSES), np.float32)
    logits[0, 0, 0] = 10.0   # ∅
    logits[0, 1, 1] = 10.0   # speaker A
    p = seg_mod.powerset_speech_prob(logits)
    assert p[0, 0] < 0.01 and p[0, 1] > 0.99


def test_fallback_path_unchanged():
    # no seg params → energy VAD host path, no device batching
    d = dz.SpeakerDiarizer(DiarizationConfig())
    audio = np.concatenate([
        _speech_like(4, 0), np.zeros(4 * SR, np.float32), _speech_like(4, 1)])
    segs = d.process_audio(audio, num_speakers=2)
    assert segs, "fallback diarization produced no turns"
    assert all(s.end <= len(audio) / SR + 1 for s in segs)
