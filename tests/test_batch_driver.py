"""Batch driver: sharding, manifest resume, failure isolation."""

import json
import os

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.audio import io as aio
from turbo_whisper_workspace_tpu.parallel.batch_driver import BatchDriver


class CountingPipeline:
    def __init__(self, fail_on=None):
        self.calls = []
        self.fail_on = fail_on or set()

    def process_batch(self, paths, **kw):
        self.calls.append(list(paths))
        for p in paths:
            if os.path.basename(p) in self.fail_on:
                raise RuntimeError(f"boom on {p}")
        return [{"duration": 2.0, "text": "ok", "audio_path": p}
                for p in paths]


def _make_files(tmp_path, n):
    for i in range(n):
        aio.write_wav(str(tmp_path / f"f{i}.wav"),
                      np.zeros(16000, np.float32))
    return tmp_path


def test_batch_processes_and_writes_artifacts(tmp_path):
    _make_files(tmp_path, 5)
    pipe = CountingPipeline()
    d = BatchDriver(pipeline=pipe, output_dir=str(tmp_path / "out"),
                    files_per_call=2)
    stats = d.run_directory(str(tmp_path))
    assert stats.processed == 5
    assert stats.audio_seconds == 10.0
    outs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".json")
            and not f.startswith("manifest")]
    assert len(outs) == 5
    assert len(pipe.calls) == 3  # 2+2+1


def test_manifest_resume_skips_done(tmp_path):
    _make_files(tmp_path, 4)
    out = str(tmp_path / "out")
    d1 = BatchDriver(pipeline=CountingPipeline(), output_dir=out)
    d1.run_directory(str(tmp_path))

    pipe2 = CountingPipeline()
    d2 = BatchDriver(pipeline=pipe2, output_dir=out)
    stats = d2.run_directory(str(tmp_path))
    assert stats.processed == 0
    assert stats.skipped == 4
    assert pipe2.calls == []


def test_failure_isolation(tmp_path):
    _make_files(tmp_path, 3)
    pipe = CountingPipeline(fail_on={"f1.wav"})
    d = BatchDriver(pipeline=pipe, output_dir=str(tmp_path / "out"),
                    files_per_call=3, max_retries=0)
    stats = d.run_directory(str(tmp_path))
    assert stats.processed == 2
    assert stats.failed == 1
    assert stats.failures and "f1.wav" in stats.failures[0]
    # the failed file is NOT in the manifest → retried next run
    manifest = json.load(open(d._manifest_path()))
    assert not any("f1.wav" in p for p in manifest["done"])


def test_shard_files_single_host():
    files = [f"x{i}" for i in range(5)]
    assert BatchDriver.shard_files(files) == files  # process_count()==1
