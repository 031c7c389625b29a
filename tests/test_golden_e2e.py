"""Golden end-to-end regression: committed audio fixture + expected
result, the analogue of the reference's `examples/Test1/` anchor
(`ChrisAndAlexDiTest.flac` + `output.json`, SURVEY §4.2;
/root/reference/examples/Test1/). Re-runs the full pipeline on the
checked-in WAV with deterministic tiny models and asserts the result
dict still matches the committed expectation — schema exactly,
diarization timeline within ±0.5 s, speaker-turn structure exactly.
"""

import json
import pathlib

import jax
import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "examples" / "golden"


@pytest.fixture(scope="module")
def golden_result():
    from turbo_whisper_workspace_tpu.config import (PipelineConfig,
                                                    TranscriptionConfig)
    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import (
        AudioProcessingPipeline)
    from turbo_whisper_workspace_tpu.pipeline.transcriber import load_transcriber

    dims = wm.WHISPER_CONFIGS["tiny"]
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    transcriber = load_transcriber(
        params, dims,
        TranscriptionConfig(batch_size=2, max_decode_len=24, language="en"))
    pipe = AudioProcessingPipeline(PipelineConfig(), transcriber=transcriber)
    result = pipe.process_audio(
        str(GOLDEN / "conversation.wav"), num_speakers=2, enrich=False)
    expected = json.loads((GOLDEN / "expected.json").read_text())
    return result, expected


def test_fixture_files_committed():
    assert (GOLDEN / "conversation.wav").exists()
    assert (GOLDEN / "expected.json").exists()


def test_result_schema(golden_result):
    result, expected = golden_result
    assert sorted(result.keys()) == expected["result_keys"]
    assert sorted(result["processing_times"].keys()) == \
        expected["processing_time_keys"]
    if result["segments"]:
        assert sorted(result["segments"][0].keys()) == expected["segment_keys"]


def test_diarization_timeline(golden_result):
    result, expected = golden_result
    got = result["diarization_segments"]
    want = expected["diarization_segments"]
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g["speaker"] == w["speaker"]
        assert abs(float(g["start"]) - w["start"]) <= 0.5, (g, w)
        assert abs(float(g["end"]) - w["end"]) <= 0.5, (g, w)
    speakers = {s["speaker"] for s in got}
    assert len(speakers) == expected["num_speakers_detected"]


def test_speaker_turns_alternate(golden_result):
    result, _ = golden_result
    segs = result["diarization_segments"]
    # the committed clip alternates voices with 1 s gaps: consecutive
    # segments must never share a speaker
    for a, b in zip(segs, segs[1:]):
        assert a["speaker"] != b["speaker"]
