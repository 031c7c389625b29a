"""Full pipeline orchestration: schema, merge, enrichment, batching.

Fake engines are injected below the same boundary the reference's mock
harness uses (bar_security_monitor.py:522-560); one test runs the real
(random-weight) tiny transcriber end-to-end from a WAV on disk.
"""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio
from turbo_whisper_workspace_tpu.config import PipelineConfig, TranscriptionConfig
from turbo_whisper_workspace_tpu.llm import llm_helper
from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import AudioProcessingPipeline
from tests.test_diarization import _two_speaker_audio


class FakeTranscriber:
    def __init__(self, segments_per_file):
        self.segments_per_file = segments_per_file

    def transcribe(self, audios, languages=None, initial_prompt=None):
        out = []
        for segs in self.segments_per_file[: len(audios)]:
            out.append({
                "text": "".join(s["text"] for s in segs),
                "segments": segs,
                "chunks": [
                    {"timestamp": [s["start"], s["end"]], "text": s["text"]}
                    for s in segs
                ],
                "language": "en",
                "processing_times": {"transcription": 0.0},
            })
        return out


@pytest.fixture(autouse=True)
def no_real_llm():
    llm_helper.set_llm(llm_helper.DummyLLM())
    yield
    llm_helper.set_llm(None)


def _write_two_speaker_wav(tmp_path, name="conv.wav"):
    rng = np.random.default_rng(7)
    audio = _two_speaker_audio(rng)
    p = str(tmp_path / name)
    aio.write_wav(p, audio, 16000)
    return p, audio


def test_process_audio_schema_and_merge(tmp_path):
    path, audio = _write_two_speaker_wav(tmp_path)
    segs = [
        {"text": " Hi there, I'm Chris.", "start": 0.2, "end": 2.8},
        {"text": " Hey Chris, my name is Alex.", "start": 4.2, "end": 6.8},
        {"text": " Good to see you Alex.", "start": 8.2, "end": 10.8},
        {"text": " Likewise!", "start": 12.2, "end": 14.5},
    ]
    pipe = AudioProcessingPipeline(
        PipelineConfig(), transcriber=FakeTranscriber([segs])
    )
    res = pipe.process_audio(path, num_speakers=2)

    assert set(res) >= {
        "text", "segments", "diarization_segments", "merged_segments",
        "duration", "processing_times",
    }
    assert abs(res["duration"] - len(audio) / 16000) < 0.01
    pt = res["processing_times"]
    assert {"transcription", "diarization", "merge", "total"} <= set(pt)

    merged = res["merged_segments"]
    assert len(merged) == 4
    # alternating synthetic voices → segments 0/2 same speaker, 1/3 same,
    # 0 != 1 (names may have been substituted by enrichment)
    assert merged[0]["speaker"] == merged[2]["speaker"]
    assert merged[1]["speaker"] == merged[3]["speaker"]
    assert merged[0]["speaker"] != merged[1]["speaker"]

    # rule-based naming found Chris and Alex (LLM is a dummy here)
    assert res.get("speaker_names")
    assert set(res["speaker_names"].values()) == {"Chris", "Alex"}
    assert isinstance(res["summary"], str) and res["summary"]
    assert isinstance(res["topics"], list)


def test_process_batch_multiple_files(tmp_path):
    p1, _ = _write_two_speaker_wav(tmp_path, "a.wav")
    p2, _ = _write_two_speaker_wav(tmp_path, "b.wav")
    segs = [{"text": " hello world.", "start": 0.5, "end": 2.0}]
    pipe = AudioProcessingPipeline(
        PipelineConfig(),
        transcriber=FakeTranscriber([segs, segs]),
    )
    out = pipe.process_batch([p1, p2], num_speakers=2, enrich=False)
    assert len(out) == 2
    assert out[0]["audio_path"] == p1
    assert "speaker_names" not in out[0]


def test_auto_speaker_count(tmp_path):
    path, _ = _write_two_speaker_wav(tmp_path)
    segs = [{"text": " hi.", "start": 0.5, "end": 1.5}]
    pipe = AudioProcessingPipeline(
        PipelineConfig(), transcriber=FakeTranscriber([segs])
    )
    res = pipe.process_audio(path, num_speakers=0, enrich=False)
    assert len(res["diarization_segments"]) >= 1


def test_real_tiny_transcriber_through_pipeline(tmp_path):
    """Random-weight tiny whisper end-to-end from disk (schema only)."""
    import jax

    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.pipeline.transcriber import load_transcriber

    dims = wm.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=517, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    tr = load_transcriber(
        params, dims,
        TranscriptionConfig(batch_size=2, max_decode_len=10, language="en"),
    )
    rng = np.random.default_rng(0)
    p = str(tmp_path / "noise.wav")
    aio.write_wav(p, (rng.standard_normal(5 * 16000) * 0.1).astype(np.float32))

    pipe = AudioProcessingPipeline(PipelineConfig(), transcriber=tr)
    res = pipe.process_audio(p, num_speakers=2, enrich=False)
    assert "text" in res and "merged_segments" in res
    assert res["processing_times"]["transcription"] > 0


def test_device_memory_info():
    info = AudioProcessingPipeline.get_device_memory_info()
    assert "device" in info and "platform" in info
