"""WER and DER scorers."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.utils.metrics import der, normalize_text, wer


def test_wer_basic():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the cat") == pytest.approx(1 / 3)
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert wer("the cat sat", "the cat sat down") == pytest.approx(1 / 3)
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0


def test_wer_normalization():
    assert wer("Hello, World!", "hello world") == 0.0
    assert wer("it's [noise] fine", "it's fine") == 0.0


def test_der_perfect():
    segs = [
        {"speaker": "A", "start": 0.0, "end": 5.0},
        {"speaker": "B", "start": 5.0, "end": 10.0},
    ]
    r = der(segs, segs, 10.0, collar_s=0.0)
    assert r["der"] == 0.0


def test_der_label_permutation_invariant():
    ref = [
        {"speaker": "A", "start": 0.0, "end": 5.0},
        {"speaker": "B", "start": 5.0, "end": 10.0},
    ]
    hyp = [
        {"speaker": "X", "start": 0.0, "end": 5.0},
        {"speaker": "Y", "start": 5.0, "end": 10.0},
    ]
    assert der(ref, hyp, 10.0, collar_s=0.0)["der"] == 0.0


def test_der_components():
    ref = [{"speaker": "A", "start": 0.0, "end": 8.0}]
    # hyp misses [6,8] and hallucinates [8,10]
    hyp = [{"speaker": "Z", "start": 0.0, "end": 6.0},
           {"speaker": "Z", "start": 8.0, "end": 10.0}]
    r = der(ref, hyp, 10.0, collar_s=0.0)
    assert r["missed"] == pytest.approx(0.25, abs=0.01)
    assert r["false_alarm"] == pytest.approx(0.25, abs=0.01)
    assert r["confusion"] == 0.0


def test_der_confusion():
    ref = [{"speaker": "A", "start": 0.0, "end": 4.0},
           {"speaker": "B", "start": 4.0, "end": 8.0}]
    hyp = [{"speaker": "C", "start": 0.0, "end": 8.0}]  # one speaker only
    r = der(ref, hyp, 8.0, collar_s=0.0)
    # optimal map C→A or C→B: half the speech is confused
    assert r["confusion"] == pytest.approx(0.5, abs=0.01)
    assert r["der"] == pytest.approx(0.5, abs=0.01)


def test_der_collar_forgives_boundaries():
    ref = [{"speaker": "A", "start": 0.0, "end": 5.0}]
    hyp = [{"speaker": "A", "start": 0.1, "end": 5.1}]
    strict = der(ref, hyp, 6.0, collar_s=0.0)["der"]
    forgiving = der(ref, hyp, 6.0, collar_s=0.25)["der"]
    assert forgiving < strict
    assert forgiving == 0.0
