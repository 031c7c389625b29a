"""Generate the checked-in golden end-to-end fixture.

Mirrors the reference's regression anchor
(`examples/Test1/ChrisAndAlexDiTest.flac` + `output.json`, SURVEY §4.2):
a deterministic synthetic two-speaker clip plus the expected pipeline
result, committed to `examples/golden/`. `tests/test_golden_e2e.py`
re-runs the pipeline on the committed WAV and asserts the result still
matches (schema exactly; timestamps within tolerance).

    python scripts/make_golden.py
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def synth_voice(f0, seconds, phase=0.0, sr=16000):
    """Deterministic harmonic 'voice' burst with attack/release envelope."""
    t = np.arange(int(seconds * sr)) / sr
    sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + phase * k)
              for k in range(1, 9))
    env = np.minimum(1.0, 8 * np.minimum(t, t[::-1]))
    return (0.3 * sig * env).astype(np.float32)


def build_clip():
    sil = np.zeros(16000, np.float32)
    return np.concatenate([
        synth_voice(110, 3, 0.3), sil, synth_voice(280, 3, 1.1), sil,
        synth_voice(110, 3, 2.2), sil, synth_voice(280, 3, 0.7),
    ])


def main():
    root = pathlib.Path(__file__).resolve().parent.parent
    out_dir = root / "examples" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from turbo_whisper_workspace_tpu.audio.io import write_wav
    from turbo_whisper_workspace_tpu.config import (PipelineConfig,
                                                    TranscriptionConfig)
    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import (
        AudioProcessingPipeline)
    from turbo_whisper_workspace_tpu.pipeline.transcriber import load_transcriber

    clip = build_clip()
    wav = out_dir / "conversation.wav"
    write_wav(str(wav), clip)

    dims = wm.WHISPER_CONFIGS["tiny"]
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    transcriber = load_transcriber(
        params, dims,
        TranscriptionConfig(batch_size=2, max_decode_len=24, language="en"))
    pipe = AudioProcessingPipeline(PipelineConfig(), transcriber=transcriber)
    result = pipe.process_audio(str(wav), num_speakers=2, enrich=False)

    golden = {
        "result_keys": sorted(result.keys()),
        "processing_time_keys": sorted(result["processing_times"].keys()),
        "segment_keys": sorted(result["segments"][0].keys())
        if result["segments"] else [],
        "diarization_segments": [
            {"start": round(float(s["start"]), 2),
             "end": round(float(s["end"]), 2),
             "speaker": s["speaker"]}
            for s in result["diarization_segments"]
        ],
        "num_speakers_detected": len(
            {s["speaker"] for s in result["diarization_segments"]}),
        "duration_s": round(len(clip) / 16000, 2),
        "text": result["text"],
        "note": (
            "random-init tiny whisper decodes synthetic tones to empty/"
            "garbage text by design — the golden pins the PIPELINE "
            "(schema, diarization timeline, speaker turns), the trained "
            "toy-ASR e2e test pins accuracy (tests/test_toy_asr_e2e.py)"
        ),
    }
    (out_dir / "expected.json").write_text(json.dumps(golden, indent=2) + "\n")
    print(json.dumps(golden["diarization_segments"]))
    print(f"golden fixture written to {out_dir}")


if __name__ == "__main__":
    main()
