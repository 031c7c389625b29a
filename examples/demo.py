#!/usr/bin/env python
"""End-to-end demo on synthetic audio (no checkpoints, no network).

Synthesizes a two-voice conversation, writes it to WAV, runs the full
pipeline (random-weight tiny Whisper + DSP diarizer + rule-based
enrichment), prints the speaker-attributed conversation, the diarization
timeline, and a security scan of an injected transcript.

    python examples/demo.py [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_voice(f0, seconds, rng, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
              for k in range(1, 9))
    env = np.minimum(1.0, 8 * np.minimum(t, t[::-1]))
    return (0.3 * sig * env).astype(np.float32)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "demo_output"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    import jax

    # tiny model — CPU by default so the demo never queues behind TPU jobs
    # (the session sitecustomize pins JAX_PLATFORMS=axon, so env vars alone
    # don't override; use DEMO_PLATFORM=axon to run on the chip)
    jax.config.update("jax_platforms", os.environ.get("DEMO_PLATFORM", "cpu"))

    from turbo_whisper_workspace_tpu.audio.io import write_wav
    from turbo_whisper_workspace_tpu.config import PipelineConfig, TranscriptionConfig
    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import AudioProcessingPipeline
    from turbo_whisper_workspace_tpu.pipeline.diarizer import SpeakerDiarizer
    from turbo_whisper_workspace_tpu.pipeline.transcriber import load_transcriber

    # --- synthesize a 2-speaker conversation
    sil = np.zeros(16000, np.float32)
    audio = np.concatenate([
        synth_voice(110, 3, rng), sil, synth_voice(280, 3, rng), sil,
        synth_voice(110, 3, rng), sil, synth_voice(280, 3, rng),
    ])
    wav = os.path.join(out_dir, "conversation.wav")
    write_wav(wav, audio)
    print(f"synthesized {len(audio) / 16000:.1f}s two-voice clip -> {wav}")

    # --- full pipeline (tiny random weights: structure demo, not accuracy)
    dims = wm.WHISPER_CONFIGS["tiny"]
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    transcriber = load_transcriber(
        params, dims, TranscriptionConfig(batch_size=2, max_decode_len=24,
                                          language="en"))
    pipe = AudioProcessingPipeline(PipelineConfig(), transcriber=transcriber)
    result = pipe.process_audio(wav, num_speakers=2, enrich=False)

    print("\n--- diarization timeline ---")
    for seg in result["diarization_segments"]:
        print(f"  {seg['start']:5.1f}-{seg['end']:5.1f}s  {seg['speaker']}")
    print(f"\nprocessing_times: "
          f"{ {k: round(v, 2) for k, v in result['processing_times'].items()} }")

    # --- enrichment + security on a realistic injected transcript
    # (the reference's own mock pattern, bar_security_monitor.py:522-560)
    transcript = [
        {"speaker": "Speaker 0", "text": "Hey, I'm Chris. How's the bar tonight?",
         "start": 0.0, "end": 3.0},
        {"speaker": "Speaker 1", "text": "Hi Chris, I'm Alex. Pretty rowdy — "
         "one guy is totally wasted and can't walk straight.",
         "start": 4.0, "end": 7.0},
        {"speaker": "Speaker 0", "text": "And that kid by the door showed a "
         "fake ID, he's definitely underage.", "start": 8.0, "end": 11.0},
        {"speaker": "Speaker 1", "text": "I'll get security to check on both.",
         "start": 12.0, "end": 15.0},
    ]
    from turbo_whisper_workspace_tpu.analysis.bar_security_monitor import BarSecurityMonitor
    from turbo_whisper_workspace_tpu.llm import llm_helper

    names = llm_helper.identify_speaker_names(transcript)
    print(f"\nspeaker names (rule-based): {names}")
    print(f"summary: {llm_helper.summarize_conversation(transcript)}")
    print(f"topics: {llm_helper.extract_topics(transcript)}")

    mon = BarSecurityMonitor(output_dir=out_dir)
    incident = mon._analyze_transcript(transcript, wav)
    print(f"\n--- security scan ---\n{incident}")
    print(f"\nconversation markdown:\n"
          f"{SpeakerDiarizer.format_as_conversation(transcript)}")


if __name__ == "__main__":
    main()
