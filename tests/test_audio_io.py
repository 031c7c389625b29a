"""First-party audio decode: WAV round-trips, native FLAC vs STREAMINFO MD5."""

import os

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio

REF_FLAC = "/root/reference/examples/Test1/ChrisAndAlexDiTest.flac"


def test_wav_roundtrip(tmp_path, rng):
    audio = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "x.wav")
    aio.write_wav(p, audio, 16000)
    back, sr = aio.read_audio_file(p, normalize=False)
    assert sr == 16000
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=2.5 / 32768)


def test_wav_stereo_mixdown(tmp_path, rng):
    stereo = (rng.standard_normal((8000, 2)) * 0.2).astype(np.float32)
    p = str(tmp_path / "st.wav")
    aio.write_wav(p, stereo, 16000)
    mono, sr = aio.read_audio_file(p, normalize=False)
    np.testing.assert_allclose(mono, stereo.mean(1), atol=2 / 32768)


def test_resample_tone():
    sr_in = 48000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = aio.resample(tone, sr_in, 16000)
    assert abs(len(out) - 16000) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - 440) < 5


def test_normalize_audio_rms():
    x = np.ones(1000, np.float32) * 0.001
    y = aio.normalize_audio(x, target_db=-20.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(y**2)))
    assert abs(rms_db - (-20.0)) < 0.5


def test_decode_failure_degrades_to_silence(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"not audio at all")
    audio, sr = aio.read_audio_file(p)
    assert sr == 16000
    assert len(audio) == 1600
    assert np.all(audio == 0)


@pytest.mark.skipif(not os.path.exists(REF_FLAC), reason="reference asset absent")
def test_native_flac_md5_verified():
    with open(REF_FLAC, "rb") as f:
        data = f.read()
    info = aio.flac_stream_info(data)
    assert info["sample_rate"] == 192000
    assert info["channels"] == 1
    # decode_flac raises if the decoded PCM MD5 mismatches STREAMINFO
    samples, sr = aio.decode_flac(data, verify_md5=True)
    assert samples.shape[0] == info["total_samples"]


@pytest.mark.skipif(not os.path.exists(REF_FLAC), reason="reference asset absent")
def test_flac_duration_probe():
    d = aio.get_audio_duration(REF_FLAC)
    assert abs(d - 3788416 / 192000) < 1e-6


def test_convert_audio_format(tmp_path, rng):
    audio = (rng.standard_normal(32000) * 0.2).astype(np.float32)
    src = str(tmp_path / "in.wav")
    aio.write_wav(src, audio, 16000)
    out = aio.convert_audio_format(src, str(tmp_path / "out.wav"), 8000, 1)
    back, sr = aio.read_audio_file(out, target_sr=8000, normalize=False)
    assert sr == 8000
    assert abs(len(back) - 16000) <= 1
