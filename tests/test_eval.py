"""Accuracy-gate runner (utils/evaluate.py): WER/DER on synthetic fixtures.

Injects a fake pipeline at the same boundary the serving layer uses so
the gate arithmetic is verified exactly without trained weights.
"""

import json
import os

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio.io import write_wav
from turbo_whisper_workspace_tpu.utils import evaluate, metrics


class FakePipeline:
    """Returns canned transcripts/diarizations keyed by file stem."""

    def __init__(self, canned):
        self.canned = canned

    def process_batch(self, files, **kw):
        out = []
        for path in files:
            stem = os.path.splitext(os.path.basename(path))[0]
            out.append(self.canned[stem])
        return out


def _result(text, diar, duration=10.0):
    return {
        "text": text,
        "segments": [],
        "diarization_segments": diar,
        "duration": duration,
    }


@pytest.fixture
def fixture_dir(tmp_path):
    audio = tmp_path / "audio"
    ref = tmp_path / "ref"
    rttm = tmp_path / "rttm"
    for d in (audio, ref, rttm):
        d.mkdir()
    sr = 16000
    for stem in ("a", "b"):
        write_wav(str(audio / f"{stem}.wav"),
                  np.zeros(sr, np.float32), sr)
    (ref / "a.txt").write_text("the quick brown fox jumps")
    (ref / "b.txt").write_text("hello world")
    # a: speaker X [0,5), speaker Y [5,10)
    (rttm / "a.rttm").write_text(
        "SPEAKER a 1 0.00 5.00 <NA> <NA> X <NA> <NA>\n"
        "SPEAKER a 1 5.00 5.00 <NA> <NA> Y <NA> <NA>\n"
    )
    (rttm / "b.rttm").write_text(
        "SPEAKER b 1 0.00 10.00 <NA> <NA> Z <NA> <NA>\n"
    )
    return audio, ref, rttm


def test_parse_rttm(fixture_dir):
    _, _, rttm = fixture_dir
    segs = evaluate.parse_rttm(str(rttm / "a.rttm"))
    assert segs == [
        {"start": 0.0, "end": 5.0, "speaker": "X"},
        {"start": 5.0, "end": 10.0, "speaker": "Y"},
    ]


def test_corpus_wer_aggregation(fixture_dir):
    audio, ref, _ = fixture_dir
    # a: 1 sub in 5 ref words; b: perfect (2 words) → corpus 1/7
    pipe = FakePipeline({
        "a": _result("the quick brown cat jumps", []),
        "b": _result("hello world", []),
    })
    rep = evaluate.evaluate_corpus(str(audio), ref_dir=str(ref), pipeline=pipe)
    assert rep["wer"] == round(1 / 7, 4)
    assert rep["files"]["a"]["wer"] == round(1 / 5, 4)
    assert rep["files"]["b"]["wer"] == 0.0
    assert rep["wer_ref_words"] == 7


def test_corpus_der(fixture_dir):
    audio, _, rttm = fixture_dir
    # a: perfect under label permutation; b: second half missed
    pipe = FakePipeline({
        "a": _result("", [
            {"start": 0.0, "end": 5.0, "speaker": "Speaker 1"},
            {"start": 5.0, "end": 10.0, "speaker": "Speaker 0"},
        ]),
        "b": _result("", [{"start": 0.0, "end": 5.0, "speaker": "Speaker 0"}]),
    })
    rep = evaluate.evaluate_corpus(str(audio), rttm_dir=str(rttm),
                                   pipeline=pipe, collar_s=0.0)
    assert rep["files"]["a"]["der"] == 0.0
    assert rep["files"]["b"]["der"] == pytest.approx(0.5, abs=0.02)
    # speech-time weighted: (0*10 + 0.5*10) / 20
    assert rep["der"] == pytest.approx(0.25, abs=0.01)
    assert rep["missed"] == pytest.approx(0.25, abs=0.01)


def test_wer_counts_symmetry():
    edits, n = metrics.wer_counts("a b c", "a x c")
    assert (edits, n) == (1, 3)
    edits, n = metrics.wer_counts("", "one two")
    assert (edits, n) == (2, 0)


def test_cli_eval(fixture_dir, capsys, monkeypatch):
    audio, ref, rttm = fixture_dir
    pipe = FakePipeline({
        "a": _result("the quick brown fox jumps", []),
        "b": _result("hello world", []),
    })
    monkeypatch.setattr(
        "turbo_whisper_workspace_tpu.pipeline.audio_pipeline.get_pipeline",
        lambda *a, **k: pipe,
    )
    evaluate.main(["--audio", str(audio), "--ref", str(ref)])
    rep = json.loads(capsys.readouterr().out)
    assert rep["wer"] == 0.0
    assert rep["n_files"] == 2


def test_missing_reference_is_warned_not_fatal(fixture_dir):
    audio, ref, _ = fixture_dir
    os.remove(str(ref / "b.txt"))
    pipe = FakePipeline({
        "a": _result("the quick brown fox jumps", []),
        "b": _result("hello world", []),
    })
    rep = evaluate.evaluate_corpus(str(audio), ref_dir=str(ref), pipeline=pipe)
    assert rep["files"]["b"]["wer"] is None
    assert rep["wer"] == 0.0
