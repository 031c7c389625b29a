"""Transcriber temperature-escalation fallback behavior (host logic)."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.config import TranscriptionConfig
from turbo_whisper_workspace_tpu.decode.greedy import DecodeResult
from turbo_whisper_workspace_tpu.pipeline import transcriber as tr


class ScriptedTranscriber(tr.Transcriber):
    """Overrides the device encode/decode with scripted per-temperature
    results. The encode seam returns the window batch wrapped with a
    leading axis so the production retry gather (`_gather_kv`, batch on
    axis 1) works on it unchanged."""

    def __init__(self, script, **kw):
        super().__init__(**kw)
        self.script = script          # temperature → (avg_lp, no_sp, text)
        self.calls = []

    def _encode_windows(self, audio_batch):
        return {"win": np.asarray(audio_batch)[None]}

    def _decode_batch(self, cross_kv, languages, temperature=0.0,
                      beam_size=None, prefix=None):
        self.calls.append(float(temperature))
        self.prefixes = getattr(self, "prefixes", []) + [prefix]
        n = int(np.asarray(cross_kv["win"]).shape[1])
        avg_lp, no_sp, text = self.script[round(float(temperature), 1)]
        toks = self.tokenizer.encode(text)
        sp = self.tokenizer.specials
        prompt_len = 3
        tokens = np.full((n, prompt_len + len(toks) + 4), sp.eot, np.int64)
        tokens[:, prompt_len : prompt_len + len(toks)] = toks
        return DecodeResult(
            tokens=tokens,
            lengths=np.full(n, len(toks)),
            sum_logprobs=np.full(n, avg_lp * 10),
            avg_logprobs=np.full(n, avg_lp),
            no_speech_probs=np.full(n, no_sp),
        ), prompt_len


def _mk(script):
    import jax

    from turbo_whisper_workspace_tpu.decode.tokenizer import WhisperTokenizer
    from turbo_whisper_workspace_tpu.models import whisper as wm

    dims = wm.WhisperDims(80, 1500, 64, 2, 2, 51865, 448, 64, 2, 2)
    return ScriptedTranscriber(
        script,
        params=None, dims=dims,
        tokenizer=WhisperTokenizer.for_model(dims.n_vocab),
        config=TranscriptionConfig(batch_size=2, max_decode_len=16,
                                   language="en", return_timestamps=False),
    )


def test_good_first_pass_no_retry():
    t = _mk({0.0: (-0.3, 0.1, "all good here")})
    res = t.transcribe([np.zeros(16000, np.float32)])
    assert res[0]["text"].strip() == "all good here"
    assert t.calls == [0.0]


def test_low_logprob_escalates_temperature():
    t = _mk({
        0.0: (-2.5, 0.1, "garbage"),
        0.2: (-2.5, 0.1, "garbage"),
        0.4: (-0.4, 0.1, "recovered text"),
    })
    res = t.transcribe([np.zeros(16000, np.float32)])
    assert t.calls == [0.0, 0.2, 0.4]
    assert res[0]["text"].strip() == "recovered text"


def test_silent_window_yields_empty(monkeypatch):
    t = _mk({0.0: (-2.0, 0.9, "hallucinated words")})
    res = t.transcribe([np.zeros(16000, np.float32)])
    assert t.calls == [0.0]          # silence: no retries
    assert res[0]["text"] == ""


def test_repetitive_output_triggers_retry():
    t = _mk({
        0.0: (-0.2, 0.1, "la " * 200),   # compression ratio >> 2.4
        0.2: (-0.2, 0.1, "normal sentence"),
    })
    res = t.transcribe([np.zeros(16000, np.float32)])
    assert t.calls == [0.0, 0.2]
    assert res[0]["text"].strip() == "normal sentence"


def test_initial_prompt_threaded_to_decode():
    """initial_prompt → <|startofprev|> prefix reaches every decode
    attempt, including temperature-escalation retries (reference ladder
    re-passes initial_prompt per attempt, dynamic_bar_audio.py:513-525)."""
    t = _mk({
        0.0: (-2.5, 0.1, "garbage"),
        0.2: (-0.3, 0.1, "fine"),
    })
    res = t.transcribe([np.zeros(16000, np.float32)],
                       initial_prompt="Names: Alexandra, Veronica.")
    sp = t.tokenizer.specials
    assert len(t.prefixes) == 2                   # initial + one retry
    for pref in t.prefixes:
        assert pref[0] == sp.sot_prev
        assert len(pref) > 1                      # encoded text present
        assert len(pref) <= t.dims.n_text_ctx // 2
    assert res[0]["text"].strip() == "fine"


def test_initial_prompt_prefix_capped():
    t = _mk({0.0: (-0.3, 0.1, "ok")})
    pref = t._prompt_prefix("word " * 2000)
    cap = min(t.dims.n_text_ctx // 2 - 1,
              t.dims.n_text_ctx - t.config.max_decode_len - 8)
    assert len(pref) == 1 + cap
    assert t._prompt_prefix(None) == []
    assert t._prompt_prefix("") == []
