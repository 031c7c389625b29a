"""First-party Ogg Opus decoder vs the system reference decoders.

Mirrors tests/test_aac.py's oracle pattern: fixtures are encoded with
the system libopus (ctypes, no files needed), reference decodes come
from libopus and from libavcodec's independent float implementation,
and every test skips cleanly when the system libraries are absent.

Quality bars, measured (tests assert ~10 dB under the measured values):
  * CELT-only: ~89 dB vs libopus (float noise of the naive IMDCT)
  * SILK: the 16 kHz core is bit-exact vs the system implementation
    (validated by the differential harness during bring-up); at 48 kHz
    the comparison passes through two DIFFERENT resamplers — the two
    system decoders themselves only agree to ~16 dB here, and ours
    measures ~35 dB against the float reference
  * Hybrid: ~35 dB (SILK WB core + CELT bands 17-21, aligned paths)

Reference behavior: vocalis/core/audio_utils.py:17-76 decodes .opus via
the ffmpeg cascade; this is the first-party replacement.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as audio_io
from turbo_whisper_workspace_tpu.utils.native import load_native

pytestmark = pytest.mark.skipif(
    ctypes.util.find_library("opus") is None,
    reason="system libopus not available for fixtures",
)

SR = 48000
OPUS_APP_AUDIO = 2049
OPUS_SET_BITRATE = 4002
OPUS_SET_MAX_BANDWIDTH = 4008
OPUS_SET_FORCE_MODE = 11002
MODE_SILK = 1000
MODE_HYBRID = 1001
MODE_CELT = 1002
BW_NB, BW_MB, BW_WB = 1101, 1102, 1103


@pytest.fixture(scope="module")
def libopus():
    lib = ctypes.CDLL(ctypes.util.find_library("opus"))
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.restype = ctypes.c_void_p
    return lib


@pytest.fixture(scope="module")
def ours():
    lib = load_native("opus_decoder")
    lib.opus_pkt_decode.restype = ctypes.c_long
    lib.opus_file_decode.restype = ctypes.c_long
    lib.opus_file_info.restype = ctypes.c_long
    return lib


def encode_packets(libopus, pcm, ch=1, mode=MODE_CELT, bandwidth=None,
                   bitrate=64000, frame=960):
    err = ctypes.c_int()
    enc = ctypes.c_void_p(
        libopus.opus_encoder_create(SR, ch, OPUS_APP_AUDIO,
                                    ctypes.byref(err)))
    assert err.value == 0
    libopus.opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE, mode)
    libopus.opus_encoder_ctl(enc, OPUS_SET_BITRATE, bitrate)
    if bandwidth:
        libopus.opus_encoder_ctl(enc, OPUS_SET_MAX_BANDWIDTH, bandwidth)
    buf = (ctypes.c_ubyte * 4000)()
    pkts = []
    n = len(pcm) // ch
    for off in range(0, n - frame + 1, frame):
        chunk = np.ascontiguousarray(pcm[off * ch:(off + frame) * ch])
        r = libopus.opus_encode_float(
            enc, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, buf, 4000)
        assert r > 0
        pkts.append(bytes(buf[:r]))
    libopus.opus_encoder_destroy(enc)
    return pkts


def decode_ref(libopus, pkts, ch=1):
    err = ctypes.c_int()
    dec = ctypes.c_void_p(
        libopus.opus_decoder_create(SR, ch, ctypes.byref(err)))
    out = []
    tmp = np.zeros(5760 * ch, np.float32)
    for p in pkts:
        b = (ctypes.c_ubyte * len(p)).from_buffer_copy(p)
        m = libopus.opus_decode_float(
            dec, b, len(p),
            tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 5760, 0)
        assert m > 0
        out.append(tmp[:m * ch].copy())
    libopus.opus_decoder_destroy(dec)
    return np.concatenate(out)


def decode_ours(ours, pkts, ch=1):
    import struct

    blob = b"".join(struct.pack("<I", len(p)) + p for p in pkts)
    arr = (ctypes.c_ubyte * len(blob)).from_buffer_copy(blob)
    cap = SR * 60 * ch
    out = np.zeros(cap, np.float32)
    n = ours.opus_pkt_decode(
        arr, len(blob), ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    assert n >= 0, f"decode failed: {n}"
    return out[:n * ch]


def aligned_snr(ref, got, ch=1, maxlag=80):
    """Best SNR over integer alignments (the SILK resampler designs
    differ in group delay between implementations)."""
    best = -1e9
    for lag in range(-maxlag, maxlag + 1):
        sl = lag * ch
        a, b = (ref[sl:], got[:len(got) - sl]) if sl >= 0 else \
               (ref[:sl], got[-sl:])
        n = min(len(a), len(b))
        if n < ch * 1000:
            continue
        a, b = a[:n], b[:n]
        d = a - b
        best = max(best, 10 * np.log10(
            float((a**2).mean()) / max(float((d**2).mean()), 1e-20)))
    return best


def make_signal(n, stereo=False, seed=0, hf=False):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    phase = np.cumsum(f0) / SR
    voiced = (np.abs((phase % 1) - 0.5) < 0.04).astype(np.float32)
    sig = (0.35 * voiced + 0.03 * rng.standard_normal(n)).astype(np.float32)
    if hf:
        sig += 0.08 * np.sin(2 * np.pi * 11000 * t).astype(np.float32)
    if not stereo:
        return sig
    out = np.zeros(2 * n, np.float32)
    out[0::2] = sig
    out[1::2] = np.roll(sig, 700) * 0.7
    return out


# --- CELT-only: float-noise-level parity ----------------------------------

@pytest.mark.parametrize("frame", [120, 240, 480, 960])
def test_celt_mono_parity(libopus, ours, frame):
    sig = make_signal(SR, seed=1)
    pkts = encode_packets(libopus, sig, mode=MODE_CELT, frame=frame)
    ref = decode_ref(libopus, pkts)
    got = decode_ours(ours, pkts)
    n = min(len(ref), len(got))
    err = np.abs(ref[:n] - got[:n]).max()
    assert err < 1e-4, err  # the Vorbis/AAC "sample-exact" bar


@pytest.mark.parametrize("bitrate", [24000, 64000, 128000])
def test_celt_stereo_parity(libopus, ours, bitrate):
    sig = make_signal(SR, stereo=True, seed=2)
    pkts = encode_packets(libopus, sig, ch=2, mode=MODE_CELT,
                          bitrate=bitrate)
    ref = decode_ref(libopus, pkts, 2)
    got = decode_ours(ours, pkts, 2)
    n = min(len(ref), len(got))
    err = np.abs(ref[:n] - got[:n]).max()
    assert err < 1e-4, err


# --- SILK ------------------------------------------------------------------

@pytest.mark.parametrize("bandwidth,bitrate", [(BW_NB, 12000),
                                               (BW_MB, 16000),
                                               (BW_WB, 24000)])
def test_silk_mono(libopus, ours, bandwidth, bitrate):
    sig = make_signal(2 * SR, seed=3)
    pkts = encode_packets(libopus, sig, mode=MODE_SILK,
                          bandwidth=bandwidth, bitrate=bitrate)
    ref = decode_ref(libopus, pkts)
    got = decode_ours(ours, pkts)
    # the two SYSTEM decoders only agree to ~16 dB through their
    # different SILK resamplers; ours measures ~17 dB vs libopus and
    # ~35 dB vs the float reference implementation
    assert aligned_snr(ref, got) > 12.0


def test_silk_stereo(libopus, ours):
    sig = make_signal(2 * SR, stereo=True, seed=4)
    pkts = encode_packets(libopus, sig, ch=2, mode=MODE_SILK,
                          bandwidth=BW_WB, bitrate=32000)
    ref = decode_ref(libopus, pkts, 2)
    got = decode_ours(ours, pkts, 2)
    assert aligned_snr(ref, got, ch=2) > 12.0


@pytest.mark.parametrize("frame,label", [(480, "10ms"), (1920, "40ms"),
                                         (2880, "60ms")])
def test_silk_frame_sizes(libopus, ours, frame, label):
    sig = make_signal(3 * SR, seed=5)
    pkts = encode_packets(libopus, sig, mode=MODE_SILK, bandwidth=BW_WB,
                          bitrate=24000, frame=frame)
    ref = decode_ref(libopus, pkts)
    got = decode_ours(ours, pkts)
    assert aligned_snr(ref, got) > 12.0, label


def test_silk_vs_float_reference(libopus, ours):
    """Against libavcodec's independent float implementation (same
    arithmetic family as ours) the SILK path reaches ~35 dB — the
    remaining error is purely the two resampler designs."""
    av = None
    try:
        av = load_native("av_oracle",
                         extra_flags=["-lavformat", "-lavcodec", "-lavutil"])
        av.av_decode_opus.restype = ctypes.c_long
    except Exception:
        pytest.skip("libavcodec not available")
    sig = make_signal(2 * SR, seed=6)
    pkts = encode_packets(libopus, sig, mode=MODE_SILK, bandwidth=BW_WB,
                          bitrate=24000)
    data = b"".join(pkts)
    offs, lens, off = [], [], 0
    for p in pkts:
        offs.append(off)
        lens.append(len(p))
        off += len(p)
    arr = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
    out = np.zeros(SR * 20, np.float32)
    n = av.av_decode_opus(
        arr, (ctypes.c_int * len(pkts))(*offs),
        (ctypes.c_int * len(pkts))(*lens), len(pkts), 1, b"opus",
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out))
    if n <= 0:
        pytest.skip("avcodec opus decoder unavailable")
    ref = out[:n]
    got = decode_ours(ours, pkts)
    assert aligned_snr(ref, got) > 25.0


# --- hybrid ----------------------------------------------------------------

def test_hybrid_mono(libopus, ours):
    sig = make_signal(2 * SR, seed=7, hf=True)
    pkts = encode_packets(libopus, sig, mode=MODE_HYBRID, bitrate=40000)
    ref = decode_ref(libopus, pkts)
    got = decode_ours(ours, pkts)
    assert aligned_snr(ref, got) > 10.0


def test_hybrid_stereo(libopus, ours):
    sig = make_signal(2 * SR, stereo=True, seed=8, hf=True)
    pkts = encode_packets(libopus, sig, ch=2, mode=MODE_HYBRID,
                          bitrate=64000)
    ref = decode_ref(libopus, pkts, 2)
    got = decode_ours(ours, pkts, 2)
    assert aligned_snr(ref, got, ch=2) > 8.0


# --- Ogg file layer --------------------------------------------------------

def _mux(pkts, samples_per_pkt, preskip=312, channels=1, gain_q8=0):
    import struct

    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)

    def crc(data):
        r = 0
        for b in data:
            r = ((r << 8) & 0xFFFFFFFF) ^ table[((r >> 24) & 0xFF) ^ b]
        return r

    def page(seq, granule, packets, hdr_type):
        lacing = b""
        body = b""
        for p in packets:
            n = len(p)
            while n >= 255:
                lacing += bytes([255])
                n -= 255
            lacing += bytes([n])
            body += p
        hdr = (b"OggS" + bytes([0, hdr_type]) + struct.pack("<q", granule) +
               struct.pack("<II", 1, seq) + b"\0\0\0\0" +
               bytes([len(lacing)]) + lacing)
        c = crc(hdr + body)
        return hdr[:22] + struct.pack("<I", c) + hdr[26:] + body

    head = (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", preskip) +
            struct.pack("<I", SR) + struct.pack("<h", gain_q8) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    out = page(0, 0, [head], 2) + page(1, 0, [tags], 0)
    granule = preskip
    for i, p in enumerate(pkts):
        granule += samples_per_pkt
        out += page(2 + i, granule, [p], 4 if i == len(pkts) - 1 else 0)
    return out


def test_ogg_file_decode(libopus, ours, tmp_path):
    sig = make_signal(2 * SR, seed=9)
    pkts = encode_packets(libopus, sig, mode=MODE_CELT, bitrate=64000)
    blob = _mux(pkts, 960, preskip=312)
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bound = ours.opus_file_info(blob, len(blob), ctypes.byref(sr),
                                ctypes.byref(ch))
    assert sr.value == SR and ch.value == 1
    assert bound == len(pkts) * 960  # granule-based exact length
    out = np.zeros(SR * 20, np.float32)
    n = ours.opus_file_decode(
        blob, len(blob), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(out), ctypes.byref(sr), ctypes.byref(ch))
    assert n == len(pkts) * 960 - 312  # pre-skip dropped
    ref = decode_ref(libopus, pkts)[312:]
    m = min(n, len(ref))
    assert np.abs(ref[:m] - out[:m]).max() < 1e-4


def test_io_cascade_and_duration(libopus, tmp_path):
    """read_audio_file + get_audio_duration route .opus through the
    first-party decoder (reference cascade:
    vocalis/core/audio_utils.py:17-76)."""
    sig = make_signal(2 * SR, seed=10)
    pkts = encode_packets(libopus, sig, mode=MODE_CELT, bitrate=64000)
    blob = _mux(pkts, 960, preskip=312)
    path = tmp_path / "clip.opus"
    path.write_bytes(blob)
    audio, sr = audio_io.read_audio_file(str(path))
    assert sr == 16000
    assert len(audio) > SR // 48  # decoded something real
    assert float(np.abs(audio).max()) > 0.01
    dur = audio_io.get_audio_duration(str(path))
    expected = (len(pkts) * 960 - 312) / SR
    assert abs(dur - expected) < 0.05


def test_ogg_gain_applied(libopus, ours):
    sig = make_signal(SR, seed=11)
    pkts = encode_packets(libopus, sig, mode=MODE_CELT, bitrate=64000)
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    outs = []
    for gain_q8 in (0, -1536):  # -6 dB in Q8
        blob = _mux(pkts, 960, gain_q8=gain_q8)
        out = np.zeros(SR * 4, np.float32)
        n = ours.opus_file_decode(
            blob, len(blob),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
            ctypes.byref(sr), ctypes.byref(ch))
        outs.append(out[:n])
    ratio = np.abs(outs[1]).max() / np.abs(outs[0]).max()
    assert abs(ratio - 10 ** (-6 / 20)) < 0.01
