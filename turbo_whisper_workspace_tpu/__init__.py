"""Turbo-Whisper-Workspace TPU — a TPU-native audio-intelligence framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
crmorton/Turbo-Whisper-Workspace ("Vocalis"): batch Whisper transcription,
speaker diarization, transcript/diarization merge, LLM enrichment
(speaker naming / summary / topics), security monitoring, audio
preprocessing and diagnostics, plus serving (API/UI/CLI) — all designed
TPU-first (SPMD meshes, jit-compiled fixed-shape compute, Pallas kernels
for hot ops) rather than translated from the reference's CUDA/C++ stack.

Layering (see SURVEY.md §7):
    ops/       Pallas + XLA kernels (mel frontend, flash attention, top-k)
    models/    pure-function JAX models (Whisper, Llama, segmentation, embedding)
    decode/    KV-cached greedy/beam decode with Whisper token rules, long-form
    pipeline/  process_audio orchestration (transcribe→diarize→merge→LLM)
    parallel/  mesh/sharding setup + multi-host batch driver
    llm/       LLM enrichment helpers with rule-based fallbacks
    analysis/  security monitors, preprocessing, diagnostics, visualization
    audio/     first-party audio decode (WAV/FLAC), resampling, utils
    serve/     HTTP API + UI + CLI entry points
"""

__version__ = "0.1.0"
