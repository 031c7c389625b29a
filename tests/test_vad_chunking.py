"""VAD-gated chunk planning (BASELINE config #2: batched greedy + VAD
chunking). Silent 30 s windows are dropped before batching instead of
being decoded at full cost and discarded post-hoc."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.config import TranscriptionConfig
from turbo_whisper_workspace_tpu.decode import longform
from turbo_whisper_workspace_tpu.pipeline.diarizer import FRAME_HZ, energy_vad

SR = 16000


def _mostly_silent(total_s=150.0, speech_s=8.0, seed=0):
    rng = np.random.default_rng(seed)
    audio = np.zeros(int(total_s * SR), np.float32)
    n = int(speech_s * SR)
    audio[:n] = (rng.standard_normal(n) * 0.3).astype(np.float32)
    return audio


def test_gate_drops_silent_windows():
    audio = _mostly_silent()
    plans = longform.plan_chunks(len(audio))
    assert len(plans) >= 6
    mask = energy_vad(audio)
    kept = longform.gate_plans_by_vad(plans, mask, frame_hz=FRAME_HZ)
    # >=4x fewer windows on a mostly-silent file (VERDICT #6 criterion)
    assert len(kept) * 4 <= len(plans)
    # the speech-bearing first window survives
    assert kept[0].start == 0


def test_gate_keeps_everything_on_speech_dense():
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(int(95 * SR)) * 0.3).astype(np.float32)
    plans = longform.plan_chunks(len(audio))
    mask = energy_vad(audio)
    assert longform.gate_plans_by_vad(plans, mask, frame_hz=FRAME_HZ) == plans


def test_gate_all_silent_keeps_one():
    audio = np.zeros(int(120 * SR), np.float32)
    plans = longform.plan_chunks(len(audio))
    mask = energy_vad(audio)
    kept = longform.gate_plans_by_vad(plans, mask, frame_hz=FRAME_HZ)
    assert len(kept) == 1


@pytest.fixture(scope="module")
def tiny_transcriber():
    import jax
    import jax.numpy as jnp

    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.pipeline.transcriber import load_transcriber

    dims = wm.WHISPER_CONFIGS["tiny"]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)

    def make(**kw):
        return load_transcriber(params, dims, TranscriptionConfig(
            batch_size=4, max_decode_len=8, language="en", **kw))

    return make


def test_transcriber_decodes_fewer_windows(tiny_transcriber):
    audio = _mostly_silent(total_s=95.0)
    gated = tiny_transcriber(vad_filter=True)
    full = tiny_transcriber(vad_filter=False)
    res_gated = gated.transcribe([audio])[0]
    res_full = full.transcribe([audio])[0]
    assert gated.last_n_windows * 2 <= full.last_n_windows
    # merged output from the surviving speech window is unchanged
    assert res_gated["text"] == res_full["text"]
    assert res_gated["duration"] == res_full["duration"]


def test_transcriber_identical_on_speech_dense(tiny_transcriber):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(int(65 * SR)) * 0.3).astype(np.float32)
    gated = tiny_transcriber(vad_filter=True)
    full = tiny_transcriber(vad_filter=False)
    res_gated = gated.transcribe([audio])[0]
    res_full = full.transcribe([audio])[0]
    assert gated.last_n_windows == full.last_n_windows
    assert res_gated["chunks"] == res_full["chunks"]
