"""Regression tests for the reference's latent defects (SURVEY.md §2.6).

The build fixes these rather than porting them; each test pins the
*intended* behavior.
"""

import numpy as np
import pytest


def test_defect1_utils_importable_from_package():
    """Reference: vocalis/ui + api import vocalis.utils.audio_info /
    visualizer which don't exist (broken imports). Ours are real."""
    from turbo_whisper_workspace_tpu.analysis import audio_info, visualizer

    assert callable(audio_info.get_audio_info)
    assert callable(visualizer.plot_waveform)


def test_defect2_visualizer_takes_arrays_and_api_passes_arrays(tmp_path):
    """Reference: package UI/API call plot_waveform(path) but the function
    takes (audio, sr) — signature mismatch. Our API route decodes first."""
    from turbo_whisper_workspace_tpu.analysis.visualizer import plot_waveform
    from turbo_whisper_workspace_tpu.serve.api import route_analyze
    from turbo_whisper_workspace_tpu.audio.io import write_wav

    fig = plot_waveform(np.zeros(1600, np.float32), 16000)
    assert fig is not None
    p = str(tmp_path / "x.wav")
    write_wav(p, np.zeros(3200, np.float32))
    with open(p, "rb") as f:
        res = route_analyze(f.read(), "x.wav", {})
    assert "waveform" in res["plots"]  # array path exercised end-to-end


def test_defect3_get_llm_returns_instance():
    """Reference: legacy get_llm() falls through without returning the
    instance (return landed in monitor_gpu_usage). Ours always returns."""
    from turbo_whisper_workspace_tpu.llm import llm_helper

    llm_helper.set_llm(None)
    llm = llm_helper.get_llm()
    assert llm is not None
    assert llm is llm_helper.get_llm()  # cached
    llm_helper.set_llm(None)


def test_defect4_process_audio_rejects_typos_loudly(tmp_path):
    """Reference: normalize_bar_audio passes audio_file= (wrong kwarg) and
    extra kwargs the pipeline silently mishandles via a TypeError path.
    Ours raises immediately on unknown kwargs."""
    from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import (
        AudioProcessingPipeline,
    )

    pipe = AudioProcessingPipeline()
    with pytest.raises(TypeError):
        pipe.process_audio(audio_file="x.wav")  # typo'd kwarg
    with pytest.raises(TypeError):
        pipe.process_audio("x.wav", vad_filter=True, beam_size=10)


def test_defect5_diarizer_cache_keys_include_config():
    """Reference: diarizer cache ignores use_gpu in its key
    (model.py:436). Our pipeline cache keys on the model config."""
    from turbo_whisper_workspace_tpu.config import PipelineConfig, TranscriptionConfig
    from turbo_whisper_workspace_tpu.pipeline import audio_pipeline as ap

    ap._PIPELINE_CACHE.clear()
    c1 = PipelineConfig(transcription=TranscriptionConfig(model="tiny"))
    c2 = PipelineConfig(transcription=TranscriptionConfig(model="base"))
    p1 = ap.get_pipeline(c1)
    p2 = ap.get_pipeline(c2)
    assert p1 is not p2
    assert p1 is ap.get_pipeline(c1)
    ap._PIPELINE_CACHE.clear()


def test_defect6_alternating_fallback_documented_two_speaker_only():
    """Reference: UI alternating-speaker fallback mislabels >2 speakers
    (vocalis/ui/app.py:182). Ours only alternates when diarization is
    empty, and real diarization output is used otherwise."""
    from turbo_whisper_workspace_tpu.pipeline.diarizer import (
        DiarizationSegment, SpeakerDiarizer,
    )

    transcript = [{"text": t, "start": i * 1.0, "end": i + 1.0}
                  for i, t in enumerate("abc")]
    diar = [DiarizationSegment(0.0, 3.0, "Speaker 2")]
    merged = SpeakerDiarizer.create_transcript_with_speakers(transcript, diar)
    # with diarization present, NO alternation is invented
    assert all(m["speaker"] == "Speaker 2" for m in merged)
