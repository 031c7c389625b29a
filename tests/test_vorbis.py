"""First-party Ogg Vorbis decoder (native/vorbis_decoder.cpp) validation.

The reference decodes ogg via third-party ffmpeg (cascade at
vocalis/core/audio_utils.py:17-76). Our decoder is first-party (Ogg
demux + Vorbis I core); these tests validate it two ways:

* against a REFERENCE DECODER ORACLE (system libavcodec via the
  native/av_oracle.cpp shim) on vectors produced by the reference
  encoder (libvorbis — the encoder behind essentially every .ogg file
  in the wild) across sampling rates, mono/stereo and bitrates — the
  decoders must agree to float rounding (max abs diff < 1e-4);
* through the pipeline's own decode path (`read_audio_file`).

Known corner: streams from ffmpeg's NATIVE experimental "vorbis"
encoder (requires -strict -2; not produced by default toolchains)
decode with correct length/energy but imperfect stereo imaging —
tracked as xfail below.

The oracle/encoder libraries are TEST-ONLY dependencies (skipped when
absent); the production path uses only our native decoder.
"""

import ctypes

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio
from turbo_whisper_workspace_tpu.utils.native import load_native


def _oracle():
    try:
        lib = load_native(
            "av_oracle",
            extra_flags=["-I/usr/include/x86_64-linux-gnu",
                         "-lavformat", "-lavcodec", "-lavutil"])
    except Exception:
        return None
    lib.av_encode_audio.restype = ctypes.c_long
    lib.av_encode_audio.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p]
    lib.av_decode_file.restype = ctypes.c_long
    lib.av_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


_AV = _oracle()

needs_av = pytest.mark.skipif(
    _AV is None, reason="libavcodec/libavformat oracle libraries not present")


def synth(sr, ch, secs=2.0):
    t = np.arange(int(sr * secs)) / sr
    base = [0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 1321 * t),
            0.3 * np.sin(2 * np.pi * 660 * t)
            + 0.1 * np.sin(2 * np.pi * 220 * t)]
    pcm = np.stack(base[:ch], 1).astype(np.float32)
    w = pcm[sr // 2:sr // 2 + 200]
    w += np.random.default_rng(0).normal(0, .3, w.shape).astype(np.float32)
    return np.clip(np.ascontiguousarray(pcm), -1, 1)


def encode(tmp_path, pcm, sr, codec=b"libvorbis", brate=96000):
    path = str(tmp_path / "fixture.ogg").encode()
    rc = _AV.av_encode_audio(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pcm),
        pcm.shape[1], sr, path, codec, b"ogg", brate, b"")
    if rc != 0:
        pytest.skip(f"encoder {codec} unavailable (rc={rc})")
    return path.decode()


def oracle_decode(path, cap, ch):
    out = np.zeros(cap * ch, np.float32)
    sr = ctypes.c_int()
    c = ctypes.c_int()
    n = _AV.av_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, ctypes.byref(sr), ctypes.byref(c))
    assert n > 0, n
    return out[:n * c.value].reshape(-1, c.value), sr.value


@needs_av
@pytest.mark.parametrize("sr,ch,brate", [
    (44100, 2, 96000),
    (44100, 2, 256000),
    (48000, 1, 64000),
    (22050, 1, 48000),
    (16000, 1, 32000),
    (8000, 2, 24000),
])
def test_decode_matches_libav_oracle(tmp_path, sr, ch, brate):
    pcm = synth(sr, ch)
    path = encode(tmp_path, pcm, sr, brate=brate)
    with open(path, "rb") as f:
        data = f.read()
    ours, our_sr = aio.decode_vorbis(data)
    assert our_sr == sr
    assert ours.shape[1] == ch
    ref, ref_sr = oracle_decode(path, len(pcm) + 65536, ch)
    assert ref_sr == sr
    assert abs(len(ours) - len(ref)) <= 8192
    m = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[:m], ref[:m], atol=1e-4)


@needs_av
@pytest.mark.xfail(reason="ffmpeg's native experimental vorbis encoder "
                   "(-strict -2 only; not a default toolchain) produces "
                   "streams whose stereo imaging we do not yet reproduce",
                   strict=False)
def test_decode_ffmpeg_native_encoder(tmp_path):
    pcm = synth(44100, 2)
    path = encode(tmp_path, pcm, 44100, codec=b"vorbis", brate=128000)
    with open(path, "rb") as f:
        data = f.read()
    ours, _ = aio.decode_vorbis(data)
    ref, _ = oracle_decode(path, len(pcm) + 65536, 2)
    m = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[:m], ref[:m], atol=1e-4)


@needs_av
def test_stream_info_and_duration(tmp_path):
    pcm = synth(44100, 2, secs=3.0)
    path = encode(tmp_path, pcm, 44100)
    with open(path, "rb") as f:
        info = aio.vorbis_stream_info(f.read())
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert abs(info["total_samples"] - len(pcm)) <= 8192
    assert abs(aio.get_audio_duration(path) - 3.0) < 0.3


@needs_av
def test_read_audio_file_ogg(tmp_path):
    sr = 44100
    t = np.arange(int(sr * 1.5)) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = np.ascontiguousarray(np.stack([tone, tone], 1))
    path = encode(tmp_path, pcm, sr)
    audio, got_sr = aio.read_audio_file(path)
    assert got_sr == 16000
    assert len(audio) > 16000
    spec = np.abs(np.fft.rfft(audio[2048:2048 + 8192]))
    peak_hz = np.argmax(spec) * 16000 / 8192
    assert abs(peak_hz - 440) < 5, peak_hz


def test_corrupt_ogg_degrades_to_silence(tmp_path):
    import os
    p = tmp_path / "bad.ogg"
    p.write_bytes(b"OggS" + os.urandom(200))
    audio, sr = aio.read_audio_file(str(p))
    assert sr == 16000
    assert len(audio) == 1600
    assert not audio.any()
