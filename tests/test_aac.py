"""First-party AAC-LC decoder (native/aac_decoder.cpp) validation.

The reference decodes m4a/aac via third-party ffmpeg (cascade at
vocalis/core/audio_utils.py:17-76). Our decoder is first-party (MP4
demux + AAC-LC core); these tests validate it two ways:

* against a REFERENCE DECODER ORACLE (system libavcodec via the
  native/av_oracle.cpp shim) on vectors produced by a reference
  encoder (libavcodec's native AAC encoder) across sampling rates,
  mono/stereo, MP4 and ADTS containers, and encoder tool toggles
  (TNS on/off) — the decoders must agree to float rounding
  (max abs diff < 1e-4 on [-1, 1] output);
* through the pipeline's own decode path (`read_audio_file`)
  recovering the original tone within codec tolerance.

The oracle/encoder libraries are TEST-ONLY dependencies (skipped when
absent); the production path uses only our native decoder. Same
pattern as tests/test_mp3.py's libmpg123 oracle.
"""

import ctypes
import os

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
    lib.av_encode_aac.restype = ctypes.c_long
    lib.av_encode_aac.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p]
    lib.av_decode_file.restype = ctypes.c_long
    lib.av_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


_AV = _oracle()

needs_av = pytest.mark.skipif(
    _AV is None, reason="libavcodec/libavformat oracle libraries not present")


def synth(sr, ch, secs=2.0, transient=True):
    """Harmonic tones + an optional transient (forces short windows)."""
    t = np.arange(int(sr * secs)) / sr
    base = [0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 1321 * t),
            0.3 * np.sin(2 * np.pi * 660 * t)
            + 0.1 * np.sin(2 * np.pi * 220 * t)]
    pcm = np.stack(base[:ch], 1).astype(np.float32)
    if transient:
        w = pcm[sr // 2:sr // 2 + 200]
        w += np.random.default_rng(0).normal(0, .3, w.shape).astype(np.float32)
    return np.clip(pcm, -1, 1)


def encode(tmp_path, pcm, sr, container=b"mp4", opts=b"aac_pns=0",
           brate=96000):
    ext = "m4a" if container == b"mp4" else "aac"
    path = str(tmp_path / f"fixture.{ext}").encode()
    pcm = np.ascontiguousarray(pcm)
    rc = _AV.av_encode_aac(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pcm),
        pcm.shape[1], sr, path, container, brate, opts)
    assert rc == 0, rc
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
@pytest.mark.parametrize("sr,ch,container,opts", [
    (44100, 2, b"mp4", b"aac_pns=0"),
    (44100, 2, b"mp4", b"aac_pns=0:aac_tns=1"),
    (48000, 1, b"mp4", b"aac_pns=0"),
    (16000, 1, b"mp4", b"aac_pns=0"),
    (8000, 2, b"mp4", b"aac_pns=0"),
    (44100, 2, b"adts", b"aac_pns=0"),
    (22050, 1, b"adts", b"aac_pns=0:aac_tns=1"),
    (44100, 2, b"mp4", b""),  # encoder defaults
])
def test_decode_matches_libav_oracle(tmp_path, sr, ch, container, opts):
    pcm = synth(sr, ch)
    path = encode(tmp_path, pcm, sr, container, opts)
    with open(path, "rb") as f:
        data = f.read()
    ours, our_sr = aio.decode_aac(data)
    assert our_sr == sr
    assert ours.shape[1] == ch
    ref, ref_sr = oracle_decode(path, len(pcm) + 16384, ch)
    assert ref_sr == sr
    # containers may trim tail padding differently; priming must match
    assert abs(len(ours) - len(ref)) <= 2048
    m = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[:m], ref[:m], atol=1e-4)


@needs_av
def test_stream_info(tmp_path):
    pcm = synth(44100, 2)
    path = encode(tmp_path, pcm, 44100)
    with open(path, "rb") as f:
        info = aio.aac_stream_info(f.read())
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    # AU-grid bound: within one frame of the actual length + priming
    assert abs(info["total_samples"] - len(pcm)) <= 4096


@needs_av
def test_read_audio_file_m4a(tmp_path):
    """Pipeline decode path: m4a → mono 16 kHz float, tone recovered."""
    sr = 44100
    t = np.arange(int(sr * 1.5)) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = encode(tmp_path, np.stack([tone, tone], 1), sr)
    audio, got_sr = aio.read_audio_file(path)
    assert got_sr == 16000
    assert len(audio) > 16000
    # dominant frequency stays 440 Hz through decode + resample
    spec = np.abs(np.fft.rfft(audio[2048:2048 + 8192]))
    peak_hz = np.argmax(spec) * 16000 / 8192
    assert abs(peak_hz - 440) < 5, peak_hz


@needs_av
def test_duration_probe(tmp_path):
    pcm = synth(44100, 1, secs=3.0)
    path = encode(tmp_path, pcm, 44100)
    dur = aio.get_audio_duration(path)
    assert abs(dur - 3.0) < 0.2, dur


@needs_av
def test_id3_tagged_adts_routes_to_aac(tmp_path):
    """ID3v2-fronted .aac files must not be eaten by the MP3 scanner
    (its frame sync can false-positive on AAC payload bytes)."""
    pcm = synth(44100, 1, secs=1.0)
    path = encode(tmp_path, pcm, 44100, b"adts")
    raw = open(path, "rb").read()
    body = b"\x00" * 16
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(body)]) + body
    tagged = tmp_path / "tagged.aac"
    tagged.write_bytes(id3 + raw)
    audio, sr = aio.read_audio_file(str(tagged))
    assert sr == 16000
    assert len(audio) > 14000          # ~1 s decoded, not 0.1 s silence
    assert np.abs(audio).max() > 0.01


def test_corrupt_m4a_degrades_to_silence(tmp_path):
    """Cascade degrade-and-continue (vocalis/core/audio_utils.py:76)."""
    p = tmp_path / "bad.m4a"
    p.write_bytes(b"\x00\x00\x00\x20ftypM4A " + os.urandom(64))
    audio, sr = aio.read_audio_file(str(p))
    assert sr == 16000
    assert len(audio) == 1600  # 0.1 s of silence
    assert not audio.any()
