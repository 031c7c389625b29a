"""Batched Whisper transcriber: files → chunks → one compiled batch path.

Replaces the reference's HF ASR pipeline call (hot loop #1,
vocalis/core/audio_pipeline.py:323-369). All 30 s windows from all input
files are flattened into fixed-size device batches (padded with silence
so shapes never change → zero recompiles), run through one jitted
mel→encoder→cross-KV step and one jitted decode loop, then merged back
per file. Quality fallbacks follow openai/whisper's long-form logic:
temperature escalation when a window's avg logprob or compression ratio
fails thresholds, silence skip via no-speech probability — these mirror
the reference's retry ladder (dynamic_bar_audio.py:513-560) but batch
the retries instead of looping per file.
"""

from __future__ import annotations

import functools
import time
import zlib
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TranscriptionConfig
from ..decode import beam as beam_mod
from ..decode import greedy as greedy_mod
from ..decode import longform
from ..decode.rules import DecodeRules
from ..decode.tokenizer import WhisperTokenizer
from ..models import whisper as wm
from ..ops import mel as mel_ops

LOGPROB_THRESHOLD = -1.0
COMPRESSION_RATIO_THRESHOLD = 2.4
NO_SPEECH_THRESHOLD = 0.6
FALLBACK_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@functools.partial(
    jax.jit, static_argnames=("dims", "num_mels", "quantize_kv")
)
def _encode_batch(params, dims: wm.WhisperDims, audio: jax.Array,
                  num_mels: int, quantize_kv: bool = False):
    """waveform batch (B, 480000) → decoder cross-KV (+ mel time)."""
    mels = mel_ops.log_mel_spectrogram(audio, num_mels=num_mels)
    feats = wm.encoder_forward(params, dims, mels)
    return wm.precompute_cross_kv(params, dims, feats, quantize=quantize_kv)


@functools.partial(
    jax.jit, static_argnames=("dims", "sot", "lang_start", "n_languages")
)
def _detect_lang_jit(params, dims, cross_kv, sot, lang_start, n_languages):
    return greedy_mod.detect_language_features(
        params, dims, cross_kv, sot, lang_start, n_languages
    )


def _gather_kv(cross_kv, rows: np.ndarray):
    """Gather batch rows (axis 1 of every (L, B, ...) leaf) of a
    precomputed cross-KV pytree — temperature retries re-decode failed
    rows without re-running the encoder."""
    idx = jnp.asarray(rows)
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=1), cross_kv)


@dataclass
class Transcriber:
    params: wm.Params
    dims: wm.WhisperDims
    tokenizer: WhisperTokenizer
    config: TranscriptionConfig = field(default_factory=TranscriptionConfig)

    def __post_init__(self):
        self.rules = DecodeRules(
            specials=self.tokenizer.specials,
            timestamps=self.config.return_timestamps,
        )

    # -- prompts ----------------------------------------------------------
    def _prompt_prefix(self, initial_prompt: str | None) -> list[int]:
        """<|startofprev|> + encoded prompt text, capped at half the text
        context (openai/whisper's prompt window). Conditioned on during
        prefill but never scored: decode rules only govern SAMPLED
        positions, and no_speech is read at the SOT index, so prefix
        tokens are invisible to suppression/loss. Reference analogue:
        initial_prompt in the retry ladder (dynamic_bar_audio.py:513-525)."""
        if not initial_prompt:
            return []
        sp = self.tokenizer.specials
        toks = self.tokenizer.encode(" " + initial_prompt.strip())
        # openai/whisper's half-context prompt window, further capped so
        # prefix + SOT sequence + max_decode_len fits n_text_ctx
        cap = min(
            self.dims.n_text_ctx // 2 - 1,
            self.dims.n_text_ctx - self.config.max_decode_len - 8,
        )
        return [sp.sot_prev] + toks[-max(cap, 0):]

    def _prompt_row(
        self, language: str | None, prefix: list[int] | None = None
    ) -> list[int]:
        return (prefix or []) + self.tokenizer.specials.sot_sequence(
            language=language or self.config.language or "en",
            task=self.config.task,
            timestamps=self.config.return_timestamps,
        )

    # -- decode one fixed-shape batch of windows --------------------------
    def _encode_windows(self, audio_batch: np.ndarray):
        """waveforms (B, N_SAMPLES) → cross-KV (encoded ONCE per bucket;
        language detection and every temperature retry reuse it).

        Audio ships host→device as int16 PCM (the decoders' native
        format; f32 convert happens on device inside the mel frontend) —
        half the wire bytes, and the host feed is what bounds multi-host
        scaling (docs/SCALING.json). Accepts an already-device_put int16
        array (the batched transcribe pre-stages all buckets so uploads
        overlap compute)."""
        import os as _os
        import time as _time
        _t0 = _time.time()
        if isinstance(audio_batch, np.ndarray):
            audio_batch = np.clip(
                audio_batch * 32768.0, -32768, 32767).astype(np.int16)
        kv = _encode_batch(
            self.params, self.dims, jnp.asarray(audio_batch),
            self.dims.n_mels, quantize_kv=self.config.quantize_cross_kv,
        )
        if _os.environ.get("TWW_STAGE_TIMES"):
            jax.block_until_ready(kv)
            print(f"[stage] encode {_time.time() - _t0:.2f}s", flush=True)
        return kv

    def _decode_batch(
        self,
        cross_kv,
        languages: Sequence[str | None],
        temperature: float = 0.0,
        beam_size: int | None = None,
        prefix: list[int] | None = None,
    ):
        import os as _os
        import time as _time
        _t0 = _time.time()
        beam_size = beam_size if beam_size is not None else self.config.beam_size
        prompt = np.array(
            [self._prompt_row(l, prefix) for l in languages], np.int32
        )
        sot_index = len(prefix) if prefix else 0
        if beam_size > 1 and temperature == 0.0:
            res = beam_mod.beam_decode_features(
                self.params, self.dims, cross_kv, jnp.asarray(prompt),
                rules=self.rules, beam_size=beam_size,
                max_len=self.config.max_decode_len, sot_index=sot_index,
                quantize_cache=self.config.quantize_self_kv,
            )
        else:
            res = greedy_mod.greedy_decode_features(
                self.params, self.dims, cross_kv, jnp.asarray(prompt),
                rules=self.rules, max_len=self.config.max_decode_len,
                temperature=float(temperature), sot_index=sot_index,
                key=jax.random.PRNGKey(int(temperature * 1000) + 1)
                if temperature > 0 else None,
            )
        if _os.environ.get("TWW_STAGE_TIMES"):
            jax.block_until_ready(res.tokens)
            print(f"[stage] decode {_time.time() - _t0:.2f}s", flush=True)
        return res, prompt.shape[1]

    # -- window postprocess ----------------------------------------------
    def _window_segments(self, sampled_tokens: np.ndarray) -> list[dict]:
        tk = self.tokenizer
        if self.config.return_timestamps:
            segs = tk.split_timestamps(sampled_tokens)
            for s in segs:
                s["text"] = tk.decode_text(s.pop("tokens"))
            return segs
        text = tk.decode_text(sampled_tokens)
        return [{"start": 0.0, "end": None, "text": text}] if text else []

    def _detect_language_rows(self, cross_kv) -> list[str]:
        """Language ID for every row of an already-encoded bucket (one
        decoder step on the cached cross-KV — the encoder is NOT re-run;
        the reference's HF pipeline likewise detects from the encoded
        first window)."""
        sp = self.tokenizer.specials
        probs = np.asarray(_detect_lang_jit(
            self.params, self.dims, cross_kv, sp.sot, sp.sot + 1,
            sp.n_languages,
        ))
        from ..decode.tokenizer import LANGUAGES

        return [LANGUAGES[int(i)] for i in probs.argmax(-1)]

    def detect_languages(self, first_windows: np.ndarray) -> list[str]:
        """Batched language ID on each file's first window."""
        sp = self.tokenizer.specials
        if not sp.multilingual:
            return ["en"] * len(first_windows)
        return self._detect_language_rows(self._encode_windows(first_windows))

    # -- public API -------------------------------------------------------
    def transcribe(
        self,
        audios: Sequence[np.ndarray],
        languages: Sequence[str] | None = None,
        initial_prompt: str | None = None,
    ) -> list[dict]:
        """Transcribe a list of waveforms (16 kHz mono float32).

        Returns one result dict per file: {"text", "chunks", "segments",
        "language", "duration", "processing_times"} — the reference's
        result keys (vocalis/core/audio_pipeline.py:666-683 subset).
        initial_prompt conditions the decoder via <|startofprev|> tokens
        (reference retry ladder: dynamic_bar_audio.py:513-525).
        """
        t0 = time.time()
        cfg = self.config
        sp = self.tokenizer.specials
        prefix = self._prompt_prefix(
            initial_prompt if initial_prompt is not None else cfg.initial_prompt
        )

        plans: list[longform.ChunkPlan] = []
        for fi, audio in enumerate(audios):
            f_plans = longform.plan_chunks(
                len(audio), fi, chunk_s=cfg.chunk_length_s,
                stride_s=cfg.stride_length_s,
            )
            if cfg.vad_filter and len(f_plans) > 1:
                from .diarizer import FRAME_HZ, energy_vad

                f_plans = longform.gate_plans_by_vad(
                    f_plans, energy_vad(audio), frame_hz=FRAME_HZ,
                    chunk_s=cfg.chunk_length_s,
                )
            plans.extend(f_plans)
        self.last_n_windows = len(plans)  # observability (tests/bench)
        windows = np.stack(
            [longform.slice_chunk(audios[p.file_index], p) for p in plans]
        )

        # per-file language: pinned > detected. Detection is fused into
        # the bucket loop below: each bucket is encoded ONCE and the
        # language read from that cached cross-KV with one decoder step
        # (the r1/r2 version ran a separate encoder pass over every
        # file's first window — 2x encoder work at the default
        # language=None).
        detect = languages is None and cfg.language is None and sp.multilingual
        if languages is None:
            languages = ([cfg.language or "en"] * len(audios) if not detect
                         else [None] * len(audios))
        languages = list(languages)

        # first window index of each file (plan order: file-major, so a
        # file's first window always precedes its later windows)
        first_win = {}
        for wi, p in enumerate(plans):
            first_win.setdefault(p.file_index, wi)

        # fixed-size batches, padded with silence. The batch is bucketed
        # to the next power of two ≥ the window count (capped at the
        # configured size) so a single short file doesn't pay for a full
        # 32-row decode; each bucket size compiles once and is reused.
        n_win = len(plans)
        bsz = min(cfg.batch_size, 1 << (n_win - 1).bit_length() if n_win else 1)
        window_results: list[dict | None] = [None] * n_win
        # pre-issue ALL bucket uploads as ASYNC int16 device_puts before
        # the compute loop: the host→device transfers then overlap the
        # previous buckets' encode/decode instead of serializing (the
        # host link is the pipeline's largest non-compute term —
        # docs/SCALING.json)
        staged = []
        for lo in range(0, n_win, bsz):
            hi = min(lo + bsz, n_win)
            batch = windows[lo:hi]
            if hi - lo < bsz:
                pad = bsz - (hi - lo)
                batch = np.concatenate(
                    [batch, np.zeros((pad, batch.shape[1]), np.float32)]
                )
            pcm = np.clip(batch * 32768.0, -32768, 32767).astype(np.int16)
            staged.append((lo, hi, jax.device_put(pcm)))
        for lo, hi, pcm_dev in staged:
            cross_kv = self._encode_windows(pcm_dev)
            if detect and any(
                languages[plans[w].file_index] is None for w in range(lo, hi)
            ):
                row_langs = self._detect_language_rows(cross_kv)
                for w in range(lo, hi):
                    fi = plans[w].file_index
                    if languages[fi] is None and first_win[fi] == w:
                        languages[fi] = row_langs[w - lo]
            langs = [languages[plans[w].file_index] or "en"
                     for w in range(lo, hi)]
            langs += ["en"] * (bsz - (hi - lo))
            self._decode_windows_with_fallback(
                cross_kv, langs, lo, hi, window_results, prefix=prefix
            )

        # merge windows per file
        out = []
        elapsed = time.time() - t0
        for fi, audio in enumerate(audios):
            f_plans = [p for p in plans if p.file_index == fi]
            f_idx = [i for i, p in enumerate(plans) if p.file_index == fi]
            duration = len(audio) / mel_ops.SAMPLE_RATE
            segs = longform.merge_chunk_segments(
                [window_results[i]["segments"] for i in f_idx], f_plans, duration
            )
            result = longform.segments_to_result(segs, duration)
            result["segments"] = segs
            result["language"] = languages[fi]
            result["processing_times"] = {"transcription": elapsed}
            out.append(result)
        return out

    def _decode_windows_with_fallback(
        self, cross_kv, langs, lo, hi, window_results, prefix=None
    ) -> None:
        """Decode one fixed batch; re-decode failing rows at escalating
        temperatures (openai/whisper §4.5 fallback; reference analogue:
        dynamic_bar_audio.py:528-543). The initial_prompt prefix rides
        every retry, as the reference's ladder re-passes it per attempt.
        Retries GATHER the already-encoded cross-KV rows instead of
        re-running mel+encoder on the re-packed batch."""
        bsz = len(langs)
        pending = np.arange(hi - lo)
        cur_kv, cur_langs = cross_kv, langs
        for t_i, temp in enumerate(FALLBACK_TEMPERATURES):
            res, p_len = self._decode_batch(
                cur_kv, cur_langs, temperature=temp, prefix=prefix
            )
            tokens = np.asarray(res.tokens)[:, p_len:]
            lengths = np.asarray(res.lengths)
            avg_lp = np.asarray(res.avg_logprobs)
            no_sp = np.asarray(res.no_speech_probs)

            still_failed = []
            for row, win_i in enumerate(pending):
                sampled = tokens[row, : lengths[row]]
                segs = self._window_segments(sampled)
                text = "".join(s["text"] for s in segs)
                silent = (
                    no_sp[row] > NO_SPEECH_THRESHOLD
                    and avg_lp[row] < LOGPROB_THRESHOLD
                )
                failed = (
                    not silent
                    and t_i < len(FALLBACK_TEMPERATURES) - 1
                    and (
                        avg_lp[row] < LOGPROB_THRESHOLD
                        or compression_ratio(text) > COMPRESSION_RATIO_THRESHOLD
                    )
                )
                if failed:
                    still_failed.append((row, win_i))
                    continue
                window_results[lo + win_i] = {
                    "segments": [] if silent else segs,
                    "avg_logprob": float(avg_lp[row]),
                    "no_speech_prob": float(no_sp[row]),
                    "temperature": temp,
                }
            if not still_failed:
                return
            # keep batch shape fixed: re-decode with the failed rows'
            # cross-KV gathered to the front (the rest repeats row 0 as
            # padding); row i of the next decode corresponds to window
            # pending[i]
            rows = np.array([r for r, _ in still_failed])
            gather_rows = np.zeros(bsz, np.int64)
            gather_rows[: len(rows)] = rows
            cur_langs = [cur_langs[r] for r in rows] + ["en"] * (
                bsz - len(rows)
            )
            cur_kv = _gather_kv(cur_kv, gather_rows)
            pending = np.array([w for _, w in still_failed])


def load_transcriber(
    params, dims, config: TranscriptionConfig | None = None, vocab_dir=None
) -> Transcriber:
    tk = WhisperTokenizer.for_model(dims.n_vocab, vocab_dir)
    return Transcriber(
        params=params, dims=dims, tokenizer=tk,
        config=config or TranscriptionConfig(),
    )
