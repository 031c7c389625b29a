"""Host-side thread safety: concurrent API requests, singleton creation,
manifest updates (SURVEY.md §5.2 — the reference's unsynchronized module
caches are a documented hazard; ours are locked and stress-tested)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


def test_concurrent_singleton_creation():
    from turbo_whisper_workspace_tpu.serve import api as api_mod

    class FakePipeline:
        def process_audio(self, path, **kw):
            return {"ok": True}

    api_mod._singletons.clear()
    api_mod.set_pipeline(FakePipeline())
    monitors = []
    errs = []

    def grab():
        try:
            monitors.append(api_mod.get_monitor(False))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=grab) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert all(m is monitors[0] for m in monitors)  # one instance
    api_mod._singletons.clear()


def test_concurrent_api_requests(tmp_path):
    from turbo_whisper_workspace_tpu.audio.io import write_wav
    from turbo_whisper_workspace_tpu.serve import api as api_mod

    class SlowPipeline:
        def process_audio(self, path, **kw):
            import time

            time.sleep(0.05)
            return {"text": "x", "merged_segments": [], "segments": [],
                    "chunks": [], "diarization_segments": [], "duration": 1.0,
                    "processing_times": {}}

    api_mod._singletons.clear()
    api_mod.set_pipeline(SlowPipeline())
    httpd = api_mod.serve("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    p = str(tmp_path / "x.wav")
    write_wav(p, np.zeros(1600, np.float32))
    from turbo_whisper_workspace_tpu.serve.client import APIClient

    client = APIClient(f"http://127.0.0.1:{port}")
    results, errs = [], []

    def call():
        try:
            results.append(client.transcribe(p))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    httpd.shutdown()
    assert not errs
    assert len(results) == 8 and all(r["text"] == "x" for r in results)
    api_mod._singletons.clear()


def test_llm_cache_thread_safety():
    from turbo_whisper_workspace_tpu.llm import llm_helper

    llm_helper.set_llm(None)
    got = []

    def grab():
        got.append(llm_helper.get_llm())

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(g is got[0] for g in got)
    llm_helper.set_llm(None)
