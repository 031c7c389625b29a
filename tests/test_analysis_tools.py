"""Preprocessing, diagnostics, audio info, visualizer."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.analysis import (
    audio_info, diagnostics, preprocess, visualizer,
)
from turbo_whisper_workspace_tpu.audio import io as aio


def _speechy(rng, seconds=8, sr=16000):
    """Bursty tone+noise signal with silence gaps."""
    t = np.arange(sr) / sr
    burst = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.02 * rng.standard_normal(sr)).astype(np.float32)
    sil = (0.0005 * rng.standard_normal(sr)).astype(np.float32)
    parts = [burst if i % 2 == 0 else sil for i in range(seconds)]
    return np.concatenate(parts)


def test_rms_normalize_hits_target(rng):
    x = (0.005 * rng.standard_normal(16000)).astype(np.float32)
    y = preprocess.rms_normalize(x, target_db=-16.0)
    got = 20 * np.log10(np.sqrt((y**2).mean()))
    assert abs(got - (-16.0)) < 1.0


def test_dynamic_normalize_evens_levels(rng):
    quiet = (0.01 * rng.standard_normal(4 * 16000)).astype(np.float32)
    loud = (0.5 * rng.standard_normal(4 * 16000)).astype(np.float32)
    x = np.concatenate([quiet, loud])
    y = preprocess.dynamic_normalize(x, window_s=2.0, target_db=-16.0)
    r_quiet = np.sqrt((y[: 3 * 16000] ** 2).mean())
    r_loud = np.sqrt((y[5 * 16000 :] ** 2).mean())
    before_ratio = 0.5 / 0.01
    after_ratio = r_loud / r_quiet
    assert after_ratio < before_ratio / 5      # dynamics compressed
    assert np.abs(y).max() <= 0.9901           # clip guard


def test_filters_shape_spectrum(rng):
    sr = 16000
    t = np.arange(2 * sr) / sr
    low = np.sin(2 * np.pi * 40 * t)
    mid = np.sin(2 * np.pi * 1000 * t)
    x = (low + mid).astype(np.float32)
    y = preprocess.highpass(x, 80.0, sr)

    def band_power(sig, f):
        spec = np.abs(np.fft.rfft(sig))
        bin_ = int(f * len(sig) / sr)
        return spec[bin_ - 2 : bin_ + 3].max()

    assert band_power(y, 40) < 0.05 * band_power(x, 40)
    assert band_power(y, 1000) > 0.9 * band_power(x, 1000)

    z = preprocess.peaking_eq(x, 1000.0, gain_db=6.0, sr=sr)
    assert band_power(z, 1000) > 1.5 * band_power(x, 1000)


def test_spectral_denoise_raises_band_snr(rng):
    sr = 16000
    t = np.arange(4 * sr) / sr
    # bursty tone (1 s on / 1 s off) — speech-like; a constant tone is
    # stationary and correctly treated as noise by the median profile
    envelope = (np.floor(t) % 2 == 0).astype(np.float32)
    clean = 0.3 * np.sin(2 * np.pi * 300 * t) * envelope
    noisy = (clean + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    out = preprocess.spectral_denoise(noisy, strength=0.8)

    def band_power(sig, lo_hz, hi_hz):
        spec = np.abs(np.fft.rfft(sig)) ** 2
        freqs = np.fft.rfftfreq(len(sig), 1 / sr)
        return spec[(freqs >= lo_hz) & (freqs < hi_hz)].sum()

    tone_keep = band_power(out, 280, 320) / band_power(noisy, 280, 320)
    noise_keep = band_power(out, 2000, 7000) / band_power(noisy, 2000, 7000)
    assert tone_keep > 0.7          # tone survives
    assert noise_keep < 0.6         # far-band noise floor drops
    # noise-only floor drops substantially
    noise_only = (0.05 * rng.standard_normal(2 * sr)).astype(np.float32)
    dn = preprocess.spectral_denoise(noise_only, strength=0.8)
    assert np.sqrt((dn**2).mean()) < 0.8 * np.sqrt((noise_only**2).mean())


def test_diagnostics_report(rng):
    rep = diagnostics.diagnose(_speechy(rng))
    assert 0.3 < rep.speech_pct < 0.9
    assert rep.snr_db > 10
    assert "AUDIO DIAGNOSTIC REPORT" in str(rep)
    quiet = diagnostics.diagnose((1e-3 * rng.standard_normal(16000)).astype(np.float32))
    assert any("low level" in r for r in quiet.recommendations)


def test_vad_methods(rng):
    x = _speechy(rng)
    for fn in (diagnostics.vad_energy, diagnostics.vad_zcr,
               diagnostics.vad_combined):
        mask = fn(x)
        assert mask.dtype == bool and len(mask) > 0


def test_strength_sweep(rng):
    x = _speechy(rng, seconds=4)
    best, results = diagnostics.denoise_strength_sweep(x, strengths=(0.0, 0.5))
    assert len(results) == 2
    assert best in (0.0, 0.5)


def test_audio_info(tmp_path, rng):
    p = str(tmp_path / "x.wav")
    aio.write_wav(p, _speechy(rng, 3), 16000)
    info = audio_info.get_audio_info(p)
    assert info["format"] == "wav"
    assert abs(info["duration"] - 3.0) < 0.01
    assert info["sample_rate"] == 16000
    assert info["spectral_centroid"] > 0
    assert 0 < info["rms"] < 1


def test_visualizer_figures(rng):
    import matplotlib

    matplotlib.use("Agg")
    x = _speechy(rng, 2)
    figs = [
        visualizer.plot_waveform(x),
        visualizer.plot_spectrogram(x),
        visualizer.plot_pitch_track(x),
        visualizer.plot_chromagram(x),
        visualizer.plot_speaker_diarization(
            [{"speaker": "Speaker 0", "start": 0.0, "end": 1.0},
             {"speaker": "Speaker 1", "start": 1.0, "end": 2.0}], 2.0
        ),
    ]
    for f in figs:
        assert f is not None
    # pitch tracker finds the 220 Hz tone
    times, pitches = visualizer.pitch_track(x)
    voiced = pitches[pitches > 0]
    assert len(voiced) and abs(np.median(voiced) - 220) < 30
