"""First-party MP3 decoder (native/mp3_decoder.cpp) validation.

The reference decodes mp3 via third-party ffmpeg (cascade at
vocalis/core/audio_utils.py:17-76). Our decoder is first-party; these
tests validate it two ways:

* against a REFERENCE DECODER ORACLE (system libmpg123, ctypes) on
  vectors produced by a reference encoder (system libmp3lame) across
  MPEG-1 (32/44.1/48 kHz), MPEG-2 LSF (16/22.05/24 kHz) and MPEG-2.5
  (8 kHz), mono + stereo + joint (MS) stereo — the decoders must agree
  essentially bit-faithfully (relative error < 1e-3);
* round-trip through the pipeline's own decode path (`read_audio_file`)
  recovering the original tone within codec tolerance.

The oracle/encoder libraries are TEST-ONLY dependencies (skipped when
absent); the production path uses only our native decoder.
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio


def _find(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_LAME = _find("libmp3lame.so.0", "libmp3lame.so")
_MPG = _find("libmpg123.so.0", "libmpg123.so")

needs_codec_libs = pytest.mark.skipif(
    _LAME is None or _MPG is None,
    reason="libmp3lame/libmpg123 oracle libraries not present",
)


def encode_mp3(pcm: np.ndarray, sr: int, stereo=False, brate=128, mode=None):
    """Reference-encode int16 PCM → mp3 bytes (libmp3lame)."""
    lame = _LAME
    lame.lame_init.restype = ctypes.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_brate", "lame_set_mode", "lame_set_quality",
              "lame_set_bWriteVbrTag", "lame_set_out_samplerate"):
        getattr(lame, f).argtypes = [ctypes.c_void_p, ctypes.c_int]
    lame.lame_init_params.argtypes = [ctypes.c_void_p]
    lame.lame_encode_buffer.restype = ctypes.c_int
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    lame.lame_encode_flush.restype = ctypes.c_int
    lame.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    gfp = lame.lame_init()
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_out_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 2 if stereo else 1)
    lame.lame_set_brate(gfp, brate)
    lame.lame_set_mode(gfp, (1 if stereo else 3) if mode is None else mode)
    lame.lame_set_quality(gfp, 2)
    lame.lame_set_bWriteVbrTag(gfp, 0)
    assert lame.lame_init_params(gfp) >= 0
    left = (pcm[:, 0] if stereo else pcm).astype(np.int16)
    right = (pcm[:, 1] if stereo else pcm).astype(np.int16)
    buf = ctypes.create_string_buffer(len(left) * 4 + 16384)
    n = lame.lame_encode_buffer(gfp, left.ctypes.data, right.ctypes.data,
                                len(left), buf, len(buf))
    assert n >= 0
    out = buf.raw[:n]
    n2 = lame.lame_encode_flush(gfp, buf, len(buf))
    return out + buf.raw[:n2]


def mpg123_decode(data: bytes):
    """Oracle decode → (float32 pcm [n] or [n,2], sr, channels)."""
    mpg = _MPG
    mpg.mpg123_init()
    mpg.mpg123_new.restype = ctypes.c_void_p
    mpg.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    err = ctypes.c_int()
    h = ctypes.c_void_p(mpg.mpg123_new(None, ctypes.byref(err)))
    assert mpg.mpg123_open_feed(h) == 0
    mpg.mpg123_format_none(h)
    for rate in (8000, 11025, 12000, 16000, 22050, 24000,
                 32000, 44100, 48000):
        mpg.mpg123_format(h, ctypes.c_long(rate), 3, 0x200)  # FLOAT_32
    mpg.mpg123_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_size_t]
    assert mpg.mpg123_feed(h, data, len(data)) == 0
    out = b""
    buf = ctypes.create_string_buffer(65536)
    done = ctypes.c_size_t()
    rate = ctypes.c_long()
    ch = ctypes.c_int()
    enc = ctypes.c_int()
    while True:
        rc = mpg.mpg123_read(h, buf, 65536, ctypes.byref(done))
        if rc == -11:  # MPG123_NEW_FORMAT
            mpg.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch),
                                 ctypes.byref(enc))
            continue
        out += buf.raw[: done.value]
        if rc != 0:
            break
    mpg.mpg123_delete(h)
    pcm = np.frombuffer(out, np.float32)
    if ch.value == 2:
        pcm = pcm.reshape(-1, 2)
    return pcm, rate.value, ch.value


def rel_error(ref: np.ndarray, got: np.ndarray) -> float:
    n = min(len(ref), len(got))
    r, g = ref[:n].ravel(), got[:n].ravel()
    return float(np.linalg.norm(r - g) / (np.linalg.norm(r) + 1e-12))


def _tone(sr, secs=1.5, f=440.0, amp=0.55):
    t = np.arange(int(sr * secs)) / sr
    return (np.sin(2 * np.pi * f * t) * 32767 * amp).astype(np.int16)


@needs_codec_libs
@pytest.mark.parametrize("sr", [8000, 16000, 22050, 24000, 32000, 44100, 48000])
def test_matches_reference_decoder_mono(sr):
    """MPEG-1 + LSF + 2.5 mono: our decode ≡ libmpg123 decode."""
    mp3 = encode_mp3(_tone(sr), sr, brate=64 if sr < 32000 else 128)
    ref, rsr, rch = mpg123_decode(mp3)
    got, gsr = aio.decode_mp3(mp3)
    got = got[:, 0]
    assert gsr == rsr == sr and rch == 1
    assert abs(len(ref) - len(got)) <= 1152
    assert rel_error(ref, got) < 1e-3


@needs_codec_libs
@pytest.mark.parametrize("mode", [0, 1])  # plain stereo / joint (MS)
def test_matches_reference_decoder_stereo(mode):
    sr = 44100
    t = np.arange(int(sr * 1.5)) / sr
    left = (np.sin(2 * np.pi * 440 * t) * 32767 * 0.5).astype(np.int16)
    right = (np.sin(2 * np.pi * 554 * t) * 32767 * 0.5).astype(np.int16)
    mp3 = encode_mp3(np.stack([left, right], 1), sr, stereo=True, mode=mode)
    ref, rsr, rch = mpg123_decode(mp3)
    got, gsr = aio.decode_mp3(mp3)
    assert gsr == rsr and rch == 2 and got.shape[1] == 2
    assert rel_error(ref[:, 0], got[:, 0]) < 1e-3
    assert rel_error(ref[:, 1], got[:, 1]) < 1e-3


@needs_codec_libs
def test_matches_reference_on_noise():
    """Broadband content exercises every Huffman table / linbits escape."""
    rng = np.random.default_rng(0)
    sr = 44100
    pcm = (rng.standard_normal(sr * 2) * 8000).astype(np.int16)
    mp3 = encode_mp3(pcm, sr, brate=320)  # high rate → big spectral values
    ref, *_ = mpg123_decode(mp3)
    got, _ = aio.decode_mp3(mp3)
    assert rel_error(ref, got[:, 0]) < 1e-3


@needs_codec_libs
def test_read_audio_file_mp3(tmp_path):
    """Pipeline decode path: .mp3 → 16 kHz mono float; tone survives."""
    sr = 44100
    mp3 = encode_mp3(_tone(sr, secs=2.0, f=440.0), sr)
    p = str(tmp_path / "tone.mp3")
    with open(p, "wb") as f:
        f.write(mp3)
    audio, out_sr = aio.read_audio_file(p)
    assert out_sr == 16000
    assert len(audio) > 16000  # not the 0.1 s silence fallback
    # dominant frequency is the encoded tone
    spec = np.abs(np.fft.rfft(audio[8000:24000] * np.hanning(16000)))
    peak_hz = np.argmax(spec) * 16000 / 16000
    assert abs(peak_hz - 440.0) < 5.0
    # duration probe close to 2 s
    assert abs(aio.get_audio_duration(p) - 2.0) < 0.2


@needs_codec_libs
def test_batch_driver_accepts_mp3(tmp_path):
    from turbo_whisper_workspace_tpu.parallel.batch_driver import AUDIO_EXTS

    assert ".mp3" in AUDIO_EXTS


def test_synth_state_isolation():
    """Native invariant: identical inputs through both channels' synth
    filterbanks produce identical outputs (guards the uninitialized-
    window-tap class of bug)."""
    from turbo_whisper_workspace_tpu.utils.native import load_native

    lib = load_native("mp3_decoder")
    lib.mp3_synth_selftest.restype = ctypes.c_double
    assert lib.mp3_synth_selftest() == 0.0


def test_garbage_rejected():
    with pytest.raises(aio.AudioDecodeError):
        aio.decode_mp3(b"\x00" * 4096)


def test_system_fixture_decodes():
    """The one real-world mp3 on this system (a silent MPEG-2 clip)."""
    path = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")
    if not os.path.exists(path):
        pytest.skip("system fixture not present")
    with open(path, "rb") as f:
        data = f.read()
    pcm, sr = aio.decode_mp3(data)
    assert sr == 22050 and len(pcm) > 20000
    if _MPG is not None:
        ref, rsr, _ = mpg123_decode(data)
        assert rsr == sr
        assert abs(len(ref) - len(pcm)) <= 1152
        assert float(np.abs(pcm).max()) <= float(np.abs(ref).max()) + 1e-4
