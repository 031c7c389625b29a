"""End-to-end audio pipeline: transcribe → diarize → merge → enrich.

Rebuild of the reference's orchestration layer
(vocalis/core/audio_pipeline.py:34-726). Public surface and result
schema are kept exactly:

    AudioProcessingPipeline.process_audio(audio_path, task,
        segmentation_model, embedding_model, num_speakers, threshold)
    → {"text", "segments", "diarization_segments", "merged_segments",
       "duration", "processing_times"[, "speaker_names", "summary",
       "topics"]}            (vocalis/core/audio_pipeline.py:666-683)

plus transcribe / diarize / identify_speaker_names / generate_summary /
extract_topics stage methods and a module-level pipeline cache
(_PIPELINE_CACHE at vocalis/core/audio_pipeline.py:28-32).

TPU-native differences: models are JAX pytrees resident on the chip (no
GPU memory-fraction / TF32 fiddling — _setup_gpu at `:49-114` becomes
device introspection via memory_stats); every stage is batched; the
whole thing accepts lists of files so directory jobs share one compiled
batch (the serial reference loop at security_monitor.py:371-381 is the
anti-pattern being replaced).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Sequence

import numpy as np

from ..audio import io as audio_io
from ..config import PipelineConfig
from ..llm import llm_helper
from .diarizer import SpeakerDiarizer
from .transcriber import Transcriber

logger = logging.getLogger(__name__)

_PIPELINE_CACHE: dict = {}


def get_pipeline(config: PipelineConfig | None = None) -> "AudioProcessingPipeline":
    """Module-level cache keyed on the transcription model
    (reference _PIPELINE_CACHE semantics)."""
    config = config or PipelineConfig()
    key = (config.transcription.model, config.transcription.beam_size)
    if key not in _PIPELINE_CACHE:
        _PIPELINE_CACHE[key] = AudioProcessingPipeline(config)
    return _PIPELINE_CACHE[key]


class AudioProcessingPipeline:
    """The L4 orchestrator. Engines are lazy-loaded and injectable
    (tests inject fakes below the same boundary the reference's mock
    harness uses, bar_security_monitor.py:522-560)."""

    def __init__(
        self,
        config: PipelineConfig | None = None,
        transcriber: Transcriber | None = None,
        diarizer: SpeakerDiarizer | None = None,
    ):
        self.config = config or PipelineConfig()
        self._transcriber = transcriber
        self._diarizer = diarizer

    # -- engine loading ---------------------------------------------------
    def load_transcription_model(self) -> Transcriber:
        """Whisper weights: local converted checkpoint when present,
        random-init otherwise (functional but untrained — offline
        degrade-and-continue; the reference instead downloads from HF at
        vocalis/core/audio_pipeline.py:195-200)."""
        if self._transcriber is not None:
            return self._transcriber
        import jax
        import jax.numpy as jnp

        from ..models import convert, whisper as wm

        name = self.config.transcription.model
        dims = wm.WHISPER_CONFIGS.get(name)
        params = None
        for cand in (
            os.path.join(self.config.models_dir, f"whisper-{name}.npz"),
            os.path.join(self.config.models_dir, f"whisper-{name}"),
        ):
            try:
                if cand.endswith(".npz") and os.path.exists(cand):
                    params = convert.load_params(cand, dtype=jnp.bfloat16)
                    break
                if os.path.isdir(cand):
                    params, dims = convert.load_hf_snapshot(cand, dtype=jnp.bfloat16)
                    break
            except Exception as e:
                logger.warning("checkpoint load failed from %s: %s", cand, e)
        if params is None:
            if dims is None:
                raise ValueError(f"unknown whisper model {name!r}")
            logger.warning(
                "no local weights for %s — random init (untrained)", name
            )
            params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        from .transcriber import load_transcriber

        self._transcriber = load_transcriber(
            params, dims, self.config.transcription,
            vocab_dir=os.path.join(self.config.models_dir, "tokenizer"),
        )
        return self._transcriber

    def load_diarizer(
        self,
        segmentation_model: str | None = None,
        embedding_model: str | None = None,
    ) -> SpeakerDiarizer:
        """Diarizer for the requested model pair, cached per (seg, emb).

        The reference rebuilds its sherpa diarizer whenever the request
        selects different models (vocalis/core/audio_pipeline.py:210-306,
        keyed cache at vocalis/core/model.py:429-441); an injected
        diarizer (tests) always wins."""
        if self._diarizer is not None and segmentation_model is None \
                and embedding_model is None:
            return self._diarizer
        cfg = self.config.diarization
        seg = segmentation_model or cfg.segmentation_model
        emb = embedding_model or cfg.embedding_model
        if self._diarizer is not None:
            # injected diarizer requested with explicit models: honor the
            # injection only when the names match what it was built for
            if (getattr(self._diarizer, "segmentation_model", seg) == seg
                    and getattr(self._diarizer, "embedding_model", emb) == emb):
                return self._diarizer
        key = (seg, emb)
        cache = self.__dict__.setdefault("_diarizer_cache", {})
        if key not in cache:
            cache[key] = SpeakerDiarizer.from_names(
                cfg, segmentation_model=seg, embedding_model=emb,
                models_dir=self.config.models_dir,
            )
        return cache[key]

    # -- device introspection (reference _get_gpu_memory_info :124-169) --
    @staticmethod
    def get_device_memory_info() -> dict:
        import jax

        dev = jax.devices()[0]
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        return {
            "device": str(dev),
            "platform": dev.platform,
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }

    # -- stages -----------------------------------------------------------
    def transcribe(self, audio_path: str, task: str = "transcribe",
                   initial_prompt: str | None = None) -> dict:
        """Single-file ASR (vocalis/core/audio_pipeline.py:323-369).
        initial_prompt → <|startofprev|> conditioning, the knob the
        reference's retry ladder passes (dynamic_bar_audio.py:513-525)."""
        t = self.load_transcription_model()
        audio, _ = audio_io.read_audio_file(audio_path)
        return t.transcribe([audio], initial_prompt=initial_prompt)[0]

    def diarize(self, audio_path: str, num_speakers: int = 2,
                threshold: float | None = None,
                segmentation_model: str | None = None,
                embedding_model: str | None = None) -> list[dict]:
        """Speaker turns (vocalis/core/audio_pipeline.py:371-430);
        num_speakers=0 → auto-estimate (`:393-397`)."""
        d = self.load_diarizer(segmentation_model=segmentation_model,
                               embedding_model=embedding_model)
        audio, _ = audio_io.read_audio_file(audio_path)
        if num_speakers == 0:
            num_speakers = d.estimate_num_speakers(audio)
        segs = d.process_audio(audio, num_speakers=num_speakers,
                               threshold=threshold)
        return [s.to_dict() for s in segs]

    def identify_speaker_names(self, merged_segments) -> dict:
        return llm_helper.identify_speaker_names(
            merged_segments, config=self.config.llm
        )

    def generate_summary(self, merged_segments) -> str:
        return llm_helper.summarize_conversation(
            merged_segments, config=self.config.llm
        )

    def extract_topics(self, merged_segments) -> list[str]:
        return llm_helper.extract_topics(merged_segments, config=self.config.llm)

    # -- master flow ------------------------------------------------------
    def process_audio(
        self,
        audio_path: str,
        task: str = "transcribe",
        segmentation_model: str | None = None,
        embedding_model: str | None = None,
        num_speakers: int = 2,
        threshold: float = 0.5,
        enrich: bool | None = None,
        initial_prompt: str | None = None,
    ) -> dict:
        """The six-step master flow (vocalis/core/audio_pipeline.py:567-688)."""
        results = self.process_batch(
            [audio_path], task=task, num_speakers=num_speakers,
            threshold=threshold, enrich=enrich, initial_prompt=initial_prompt,
            segmentation_model=segmentation_model,
            embedding_model=embedding_model,
        )
        return results[0]

    def process_batch(
        self,
        audio_paths: Sequence[str],
        task: str = "transcribe",
        num_speakers: int = 2,
        threshold: float = 0.5,
        enrich: bool | None = None,
        initial_prompt: str | None = None,
        segmentation_model: str | None = None,
        embedding_model: str | None = None,
    ) -> list[dict]:
        """Batched master flow: all files' windows share one compiled
        transcription batch; diarization crops batch likewise."""
        enrich = self.config.llm.enabled if enrich is None else enrich
        times_total0 = time.time()

        audios = []
        for p in audio_paths:
            audio, _ = audio_io.read_audio_file(p)
            audios.append(audio)

        # 1) transcription (all files at once)
        t0 = time.time()
        transcriber = self.load_transcription_model()
        asr = transcriber.transcribe(audios, initial_prompt=initial_prompt)
        t_transcribe = time.time() - t0

        # 2) diarization — one batched call: all files' segmentation
        # windows and embedding crops share bucketed device batches
        t0 = time.time()
        diarizer = self.load_diarizer(
            segmentation_model=segmentation_model,
            embedding_model=embedding_model,
        )
        diar_all = [
            [s.to_dict() for s in segs]
            for segs in diarizer.process_batch(
                audios, num_speakers=num_speakers, threshold=threshold
            )
        ]
        t_diarize = time.time() - t0

        # 3) merge + 4-6) enrich, per file
        out = []
        for path, audio, asr_res, diar in zip(audio_paths, audios, asr, diar_all):
            t0 = time.time()
            merged = SpeakerDiarizer.create_transcript_with_speakers(
                asr_res["segments"], diar
            )
            t_merge = time.time() - t0

            result = {
                "audio_path": path,
                "text": asr_res["text"],
                "segments": asr_res["segments"],
                "chunks": asr_res["chunks"],
                "language": asr_res.get("language"),
                "diarization_segments": diar,
                "merged_segments": merged,
                "duration": len(audio) / audio_io.TARGET_SR,
                "processing_times": {
                    "transcription": t_transcribe,
                    "diarization": t_diarize,
                    "merge": t_merge,
                },
            }

            if enrich and merged:
                t0 = time.time()
                names = self.identify_speaker_names(merged)
                if names:
                    result["speaker_names"] = names
                    for seg in merged:
                        if seg["speaker"] in names:
                            seg["speaker"] = names[seg["speaker"]]
                result["summary"] = self.generate_summary(merged)
                result["topics"] = self.extract_topics(merged)
                result["processing_times"]["llm"] = time.time() - t0

            result["processing_times"]["total"] = time.time() - times_total0
            out.append(result)
        return out
