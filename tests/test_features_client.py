"""Audio features (MFCC/split/silence) + API client self-boot."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import features


def test_mfcc_shape_and_stability(rng):
    x = rng.standard_normal(2 * 16000).astype(np.float32) * 0.2
    m = features.mfcc(x)
    assert m.shape[0] == 13 and m.shape[1] > 10
    np.testing.assert_allclose(m, features.mfcc(x))


def test_mfcc_distinguishes_content(rng):
    t = np.arange(16000) / 16000
    low = np.sin(2 * np.pi * 150 * t).astype(np.float32)
    noise = rng.standard_normal(16000).astype(np.float32)
    d = np.abs(features.mfcc(low).mean(1) - features.mfcc(noise).mean(1))
    assert d.max() > 1.0


def test_extract_audio_features_schema(rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.2
    f = features.extract_audio_features(x)
    assert len(f["mfcc_mean"]) == 13
    assert len(f["chroma_mean"]) == 12
    assert f["duration"] == pytest.approx(1.0)


def test_split_audio():
    x = np.arange(16000, dtype=np.float32)
    parts = features.split_audio(x, [{"start": 0.0, "end": 0.5},
                                     {"start": 0.5, "end": 2.0}])
    assert len(parts[0]) == 8000
    assert len(parts[1]) == 8000  # clamped to end
    assert parts[0][0] == 0.0


def test_detect_silence(rng):
    loud = (0.5 * rng.standard_normal(16000)).astype(np.float32)
    quiet = np.zeros(16000, np.float32)
    x = np.concatenate([loud, quiet, loud])
    regions = features.detect_silence(x, min_silence_s=0.3)
    assert len(regions) == 1
    assert abs(regions[0]["start"] - 1.0) < 0.15
    assert abs(regions[0]["end"] - 2.0) < 0.15


def test_api_client_self_boot(tmp_path):
    from turbo_whisper_workspace_tpu.audio.io import write_wav
    from turbo_whisper_workspace_tpu.serve import api as api_mod
    from turbo_whisper_workspace_tpu.serve.client import ensure_api_server_running

    class FakePipeline:
        def process_audio(self, path, **kw):
            return {"text": "fake", "merged_segments": [], "segments": [],
                    "chunks": [], "diarization_segments": [], "duration": 1.0,
                    "processing_times": {}}

    api_mod.set_pipeline(FakePipeline())
    try:
        client = ensure_api_server_running(port=18765)
        assert client.health()["name"] == "turbo-whisper-workspace-tpu"
        p = str(tmp_path / "x.wav")
        write_wav(p, np.zeros(1600, np.float32))
        res = client.transcribe(p, num_speakers=1)
        assert res["text"] == "fake"
        assert "whisper_models" in client.models()
        # second call reuses the live server
        client2 = ensure_api_server_running(port=18765)
        assert client2.health() is not None
    finally:
        api_mod.set_pipeline(None)
        api_mod._singletons.clear()
