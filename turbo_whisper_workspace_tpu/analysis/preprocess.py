"""Audio preprocessing: dynamic normalization, filters/EQ, denoising.

Rebuilds the reference's preprocessing sidecar:

* `dynamic_normalize` — dynamic_bar_audio.py:212-369: Hann windows
  (default 30 s) with 50% overlap-add, per-window gain toward a target
  RMS dB, gain clamped to [0.1, 10], clip guard. Expressed as framed
  array ops under jit (the reference's per-window Python loop is the
  CPU hot loop flagged in SURVEY.md §3.5).
* `rms_normalize` — normalize_bar_audio.py:64-137: global RMS gain with
  clip guard.
* `highpass/lowpass/peaking_eq` — dynamic_bar_audio.py:371-488:
  Butterworth HP 80 Hz / LP 12 kHz (filtfilt) and a +3 dB peaking EQ at
  2 kHz (RBJ biquad).
* `spectral_denoise` — the DeepFilterNet stage's role
  (dynamic_bar_audio.py:90-210) as spectral gating in JAX, with the
  same VAD-adaptive mix: speech regions get half strength (`:160-182`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SR = 16_000


# ---------------------------------------------------------------------------
# Normalization


def rms_normalize(audio: np.ndarray, target_db: float = -16.0) -> np.ndarray:
    """Global RMS → target dBFS with clip guard
    (normalize_bar_audio.py:64-137)."""
    audio = np.asarray(audio, np.float32)
    rms = float(np.sqrt(np.mean(audio**2))) if audio.size else 0.0
    if rms <= 1e-9:
        return audio
    gain = 10 ** (target_db / 20.0) / rms
    out = audio * gain
    peak = np.abs(out).max()
    if peak > 0.99:
        out *= 0.99 / peak
    return out.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("window", "target_db"))
def _dynamic_normalize_jit(audio: jax.Array, window: int, target_db: float):
    hop = window // 2
    n = audio.shape[0]
    n_win = (n + hop - 1) // hop  # windows starting every hop
    pad_len = (n_win - 1) * hop + window
    x = jnp.pad(audio, (0, pad_len - n))

    idx = jnp.arange(window)[None, :] + (jnp.arange(n_win) * hop)[:, None]
    frames = x[idx]                                    # (n_win, window)

    rms = jnp.sqrt(jnp.mean(frames**2, axis=1) + 1e-12)
    target = 10.0 ** (target_db / 20.0)
    gain = jnp.clip(target / jnp.maximum(rms, 1e-6), 0.1, 10.0)
    # silent windows keep unity gain instead of max boost
    gain = jnp.where(rms < 1e-4, 1.0, gain)

    hann = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(window) / window))
    shaped = frames * gain[:, None] * hann[None, :]

    out = jnp.zeros(pad_len)
    wsum = jnp.zeros(pad_len)
    out = out.at[idx].add(shaped)
    wsum = wsum.at[idx].add(jnp.broadcast_to(hann[None, :], shaped.shape))
    out = out / jnp.maximum(wsum, 1e-6)
    out = out[:n]
    # clip guard
    peak = jnp.max(jnp.abs(out))
    return jnp.where(peak > 0.99, out * (0.99 / peak), out)


def dynamic_normalize(
    audio: np.ndarray, window_s: float = 30.0, target_db: float = -16.0,
    sr: int = SR,
) -> np.ndarray:
    """Rolling-window loudness normalization (50% overlap-add Hann)."""
    window = int(window_s * sr)
    window = min(window, max(len(audio), 2))
    if window % 2:
        window += 1
    return np.asarray(
        _dynamic_normalize_jit(jnp.asarray(audio, jnp.float32), window,
                               float(target_db))
    )


# ---------------------------------------------------------------------------
# Filters / EQ (host-side scipy IIR, zero-phase like the reference filtfilt)


def highpass(audio: np.ndarray, cutoff_hz: float = 80.0, sr: int = SR,
             order: int = 4) -> np.ndarray:
    from scipy.signal import butter, filtfilt

    b, a = butter(order, cutoff_hz / (sr / 2), btype="high")
    return filtfilt(b, a, audio).astype(np.float32)


def lowpass(audio: np.ndarray, cutoff_hz: float = 12000.0, sr: int = SR,
            order: int = 4) -> np.ndarray:
    from scipy.signal import butter, filtfilt

    cutoff_hz = min(cutoff_hz, sr / 2 * 0.999)
    b, a = butter(order, cutoff_hz / (sr / 2), btype="low")
    return filtfilt(b, a, audio).astype(np.float32)


def peaking_eq(audio: np.ndarray, center_hz: float = 2000.0,
               gain_db: float = 3.0, q: float = 1.0, sr: int = SR) -> np.ndarray:
    """RBJ peaking biquad (the reference's +3 dB presence boost at 2 kHz)."""
    from scipy.signal import filtfilt

    a_g = 10 ** (gain_db / 40.0)
    w0 = 2 * np.pi * center_hz / sr
    alpha = np.sin(w0) / (2 * q)
    b = np.array([1 + alpha * a_g, -2 * np.cos(w0), 1 - alpha * a_g])
    a = np.array([1 + alpha / a_g, -2 * np.cos(w0), 1 - alpha / a_g])
    return filtfilt(b / a[0], a / a[0], audio).astype(np.float32)


def apply_audio_effects(audio: np.ndarray, sr: int = SR,
                        hp_hz: float = 80.0, lp_hz: float = 12000.0,
                        eq_gain_db: float = 3.0) -> np.ndarray:
    """HP → LP → presence EQ chain (dynamic_bar_audio.py:371-488)."""
    out = highpass(audio, hp_hz, sr)
    out = lowpass(out, lp_hz, sr)
    return peaking_eq(out, 2000.0, eq_gain_db, sr=sr)


# ---------------------------------------------------------------------------
# Denoising (spectral gating with VAD-adaptive strength)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def _spectral_gate_jit(audio: jax.Array, strength: jax.Array,
                       n_fft: int = 512, hop: int = 128):
    n = audio.shape[0]
    n_frames = max((n - n_fft) // hop + 1, 1)
    idx = jnp.arange(n_fft)[None, :] + (jnp.arange(n_frames) * hop)[:, None]
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    frames = audio[idx] * window[None, :]
    spec = jnp.fft.rfft(frames, axis=1)                 # (F, n_fft//2+1)
    mag = jnp.abs(spec)

    # smooth |S| over time (5 frames) and frequency (3 bins) — raw
    # single-frame magnitudes are Rayleigh-spread and gate unreliably
    def avg1d(x, k, axis):
        kernel = jnp.ones(k) / k
        return jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode="same"), axis, x
        )

    mag_s = avg1d(avg1d(mag, 5, 0), 3, 1)
    # noise profile: per-bin lower quartile of the smoothed magnitude
    noise = jnp.quantile(mag_s, 0.25, axis=0, keepdims=True)
    snr = mag_s / jnp.maximum(noise, 1e-9)
    gate = jnp.clip((snr - 1.8) / 1.2, 0.0, 1.0)
    gain = 1.0 - strength[:, None] * (1.0 - gate)
    spec = spec * gain

    rec = jnp.fft.irfft(spec, n=n_fft, axis=1) * window[None, :]
    out = jnp.zeros(n)
    wsum = jnp.zeros(n)
    out = out.at[idx].add(rec)
    wsum = wsum.at[idx].add(jnp.broadcast_to(window[None, :] ** 2,
                                             rec.shape))
    return out / jnp.maximum(wsum, 1e-3)


def spectral_denoise(audio: np.ndarray, strength: float = 0.3,
                     sr: int = SR) -> np.ndarray:
    """Spectral-gating noise suppression with the reference's adaptive
    mix: frames classified as speech get strength/2 so voices stay
    untouched (dynamic_bar_audio.py:160-182)."""
    from ..pipeline.diarizer import energy_vad

    audio = np.asarray(audio, np.float32)
    n_fft, hop = 512, 128
    n_frames = max((len(audio) - n_fft) // hop + 1, 1)
    vad = energy_vad(audio)                              # 10 Hz frames
    frame_t = (np.arange(n_frames) * hop + n_fft // 2) / sr
    vad_idx = np.minimum((frame_t * 10).astype(int), max(len(vad) - 1, 0))
    speech = vad[vad_idx] if len(vad) else np.zeros(n_frames, bool)
    per_frame_strength = np.where(speech, strength / 2.0, strength)
    out = np.asarray(
        _spectral_gate_jit(
            jnp.asarray(audio), jnp.asarray(per_frame_strength, jnp.float32),
            n_fft, hop,
        )
    )
    return out.astype(np.float32)
