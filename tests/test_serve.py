"""HTTP API server: all four routes over a real socket, multipart parsing."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio
from turbo_whisper_workspace_tpu.serve import api as api_mod


class FakePipeline:
    def process_audio(self, path, **kw):
        audio, sr = aio.read_audio_file(path)
        return {
            "text": " hello world",
            "segments": [{"text": " hello world", "start": 0.0, "end": 1.0}],
            "chunks": [{"timestamp": [0.0, 1.0], "text": " hello world"}],
            "merged_segments": [
                {"speaker": "Speaker 0", "text": " hello world",
                 "start": 0.0, "end": 1.0}
            ],
            "diarization_segments": [],
            "duration": len(audio) / sr,
            "processing_times": {"total": 0.1},
            "kwargs_seen": kw,
        }

    def process_batch(self, paths, **kw):
        return [self.process_audio(p, **kw) for p in paths]


@pytest.fixture(scope="module")
def server():
    api_mod.set_pipeline(FakePipeline())
    httpd = api_mod.serve("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    api_mod.set_pipeline(None)
    api_mod._singletons.clear()


def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = "testboundary123"
    out = b""
    for name, val in fields.items():
        out += f"--{boundary}\r\n".encode()
        if isinstance(val, bytes):
            out += (
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="t.wav"\r\n\r\n'
            ).encode() + val + b"\r\n"
        else:
            out += (
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n{val}\r\n'
            ).encode()
    out += f"--{boundary}--\r\n".encode()
    return out, f"multipart/form-data; boundary={boundary}"


def _wav_bytes():
    import io as _io
    import wave

    rng = np.random.default_rng(0)
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            (rng.standard_normal(16000) * 3000).astype("<i2").tobytes()
        )
    return buf.getvalue()


def _post(url, fields):
    body, ctype = _multipart(fields)
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_root_and_models(server):
    with urllib.request.urlopen(server + "/") as r:
        root = json.loads(r.read())
    assert "/api/transcribe" in root["endpoints"]
    with urllib.request.urlopen(server + "/api/models") as r:
        models = json.loads(r.read())
    assert "large-v3-turbo" in models["whisper_models"]
    assert "3dspeaker" in models["embedding_models"]


def test_transcribe_route(server):
    res = _post(server + "/api/transcribe",
                {"file": _wav_bytes(), "num_speakers": "3"})
    assert res["text"] == " hello world"
    assert res["kwargs_seen"]["num_speakers"] == 3


def test_security_route(server):
    res = _post(server + "/api/security/analyze",
                {"file": _wav_bytes(), "bar_specific": "false"})
    assert res["incident_detected"] is False


def test_analyze_route(server):
    res = _post(server + "/api/analyze", {"file": _wav_bytes()})
    assert "audio_info" in res
    assert set(res["plots"]) == {"waveform", "spectrogram", "pitch",
                                 "chromagram"}
    assert res["audio_info"]["sample_rate"] == 16000


def test_missing_file_is_400(server):
    body, ctype = _multipart({"task": "transcribe"})
    req = urllib.request.Request(server + "/api/transcribe", data=body,
                                 headers={"Content-Type": ctype})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_ui_page(server):
    with urllib.request.urlopen(server + "/ui") as r:
        html = r.read().decode()
    assert "Turbo-Whisper" in html and "/api/transcribe" in html


def test_multipart_parser_roundtrip():
    body, ctype = _multipart({"a": "1", "file": b"\x00\x01bytes"})
    fields = api_mod.parse_multipart(body, ctype)
    assert fields["a"] == "1"
    assert fields["file"] == b"\x00\x01bytes"
    assert fields["file__filename"] == "t.wav"
