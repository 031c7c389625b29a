"""Whisper log-mel spectrogram frontend, TPU-native.

Replaces the reference's CPU/torch feature extraction inside the HF ASR
pipeline (created at vocalis/core/audio_pipeline.py:195-200; parameters:
n_fft=400, hop=160, Hann window, reflect padding, 80/128 slaney-normalized
mel filters, log10 with 1e-10 clamp, per-clip dynamic-range floor at
max-8 dB, and (x+4)/4 scaling).

TPU-first design: there is no FFT unit on a TPU — the MXU is a 128x128
systolic matmul array — so the STFT is expressed as dense matmuls with a
Hann-windowed DFT basis (402 output channels = 201 real + 201 imaginary
bins). Because the hop (160) does not divide the window (400), the basis
is split into three hop-aligned pieces and the STFT computed as
Σ_i chunks[t+i] @ K_i — three (hop=160)-deep MXU matmuls over a
(B, frames, hop) reshape of the waveform. (The obvious alternative — a
1-input-channel 400-tap strided conv — lowers so badly in XLA that it
measured 15.75 ms at batch 32; the matmul form is ~1 ms.) The mel
projection is one more matmul, and the pointwise log / clamp / normalize
fuses into it.

Numerical parity with the reference extractor (transformers
WhisperFeatureExtractor, itself matching openai/whisper) is enforced by
tests/test_mel.py to ~1e-4 absolute in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S        # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH              # 3_000
N_FREQS = N_FFT // 2 + 1                        # 201


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz→mel (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = mels * f_sp
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


@functools.lru_cache(maxsize=4)
def mel_filter_bank(
    num_mels: int = 80,
    num_freqs: int = N_FREQS,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Same construction as librosa.filters.mel(norm="slaney",
    htk=False), which is what the reference model's preprocessor uses
    (80 mels for tiny…large-v2, 128 for large-v3/turbo). Returns
    (num_mels, num_freqs) float32.
    """
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, num_freqs)
    mel_min = _hz_to_mel_slaney(np.array(fmin))
    mel_max = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _windowed_dft_kernel(n_fft: int = N_FFT) -> np.ndarray:
    """Hann-windowed real-DFT basis as a conv kernel.

    Shape (2 * n_freqs, 1, n_fft): first n_freqs output channels are the
    cosine (real) projections, the rest the -sine (imaginary). The Hann
    window is folded into the basis so the STFT is one conv.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    # periodic Hann, as used by torch.hann_window / np.hanning equivalent
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    k = np.arange(n_freqs, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n[None, :] / n_fft
    cos_basis = np.cos(angle) * window[None, :]
    sin_basis = -np.sin(angle) * window[None, :]
    kernel = np.concatenate([cos_basis, sin_basis], axis=0)[:, None, :]
    return kernel.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _chunked_dft_bases(n_fft: int = N_FFT, hop: int = HOP_LENGTH):
    """The windowed DFT basis split into hop-aligned chunks.

    A frame starting at t*hop covers chunks t, t+1, …, so the STFT
    matmul decomposes as  Y[t] = Σ_i  chunk[t+i] @ K_i  with
    K_i = basis[:, i*hop:(i+1)*hop]ᵀ zero-padded to (hop, 2*n_freqs).
    Each K_i has contraction depth `hop` — a dense MXU matmul, unlike
    the 1-channel 400-tap strided conv XLA lowers this to otherwise
    (measured 15.75 ms vs <1 ms for the matmul form at batch 32).
    """
    kernel = _windowed_dft_kernel(n_fft)[:, 0, :]        # (402, n_fft)
    n_chunks = -(-n_fft // hop)
    bases = []
    for i in range(n_chunks):
        piece = kernel[:, i * hop : (i + 1) * hop]       # (402, <=hop)
        if piece.shape[1] < hop:
            piece = np.pad(piece, ((0, 0), (0, hop - piece.shape[1])))
        bases.append(piece.T.copy())                     # (hop, 402)
    return tuple(bases)


def _stft_power_tf(
    audio: jax.Array,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Power spectrogram in (B, frames, n_freqs) layout.

    The STFT is Σ_i chunk[t+i] @ K_i over hop-aligned waveform chunks
    (see _chunked_dft_bases) — three dense MXU matmuls instead of a
    1-channel 400-tap strided conv. Final frame dropped, matching the
    reference extractor's ``magnitudes[..., :-1]``.
    """
    if audio.ndim == 1:
        audio = audio[None]
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    b, p = x.shape
    n_frames = (p - n_fft) // hop_length + 1
    bases = _chunked_dft_bases(n_fft, hop_length)
    # tail zero-pad: the last < hop excess samples only ever meet the
    # zero rows of the final basis piece
    total = (n_frames - 1 + len(bases)) * hop_length
    if total > p:
        x = jnp.pad(x, ((0, 0), (0, total - p)))
    c = x.reshape(b, -1, hop_length)
    acc = None
    for i, basis in enumerate(bases):
        ci = c[:, i : i + n_frames]
        y = jnp.einsum(
            "bth,hf->btf", ci, jnp.asarray(basis), precision=precision
        )
        acc = y if acc is None else acc + y
    acc = acc[:, :-1]  # drop the final (n+1)th frame
    n_freqs = n_fft // 2 + 1
    real, imag = acc[..., :n_freqs], acc[..., n_freqs:]
    return real * real + imag * imag


def stft_power(
    audio: jax.Array,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Power spectrogram |STFT|^2, (B, n_freqs, frames) layout."""
    return _stft_power_tf(audio, n_fft, hop_length, precision).transpose(0, 2, 1)


def log_mel_spectrogram(
    audio: jax.Array,
    num_mels: int = 80,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Whisper log-mel features. audio (B, T) or (T,) → (B, num_mels, T//hop).

    Matches the reference extractor: power spectrogram → slaney mel →
    log10 clamped at 1e-10 → floor at per-clip max-8 → (x+4)/4.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    if jnp.issubdtype(audio.dtype, jnp.integer):
        # int16 PCM straight off the decoders: convert ON DEVICE so the
        # host→device feed ships half the bytes of float32 (the H2D link
        # is the scaling bottleneck — docs/SCALING.json)
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    power = _stft_power_tf(audio, precision=precision)
    mel_w = jnp.asarray(mel_filter_bank(num_mels))
    mel = jnp.einsum("mf,btf->bmt", mel_w, power, precision=precision)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Zero-pad or truncate a waveform to exactly `length` samples
    (whisper's pad_or_trim; the HF extractor does the same before STFT)."""
    audio = np.asarray(audio)
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad_width = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad_width)
