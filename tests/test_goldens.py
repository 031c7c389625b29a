"""Golden-schema checks against the reference's example artifacts.

examples/Test1/output.json in the reference tree is the only recorded
pipeline output (SURVEY.md §4 item 2): {"speakers": [], "chunks":
[{"timestamp": [s, e], "text": ...}], "text": ...}. Our result schema
must remain a superset so reference users can consume it unchanged.
"""

import json
import os

import pytest

from turbo_whisper_workspace_tpu.decode import longform

REF_GOLDEN = "/root/reference/examples/Test1/output.json"


def test_segments_to_result_matches_reference_shape():
    segs = [
        {"start": 0.0, "end": 6.24, "text": " Hey, how are you?"},
        {"start": 6.24, "end": 9.0, "text": " Good, thanks."},
    ]
    res = longform.segments_to_result(segs, 9.0)
    assert res["text"] == " Hey, how are you? Good, thanks."
    assert res["chunks"][0]["timestamp"] == [0.0, 6.24]
    assert res["chunks"][0]["text"] == " Hey, how are you?"


@pytest.mark.skipif(not os.path.exists(REF_GOLDEN), reason="reference absent")
def test_reference_golden_keys_are_covered():
    with open(REF_GOLDEN) as f:
        golden = json.load(f)
    # every chunk key in the reference golden exists in our chunks
    res = longform.segments_to_result(
        [{"start": 0.0, "end": 1.0, "text": "x"}], 1.0
    )
    for chunk in golden.get("chunks", [])[:1]:
        assert set(chunk) <= set(res["chunks"][0])
    assert "text" in res


def test_stage_timer_and_roofline():
    import time

    from turbo_whisper_workspace_tpu.utils.profiling import (
        KernelRoofline, StageTimer,
    )

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    times = t.finish()
    assert times["a"] >= 0.01 and "total" in times
    assert t.realtime_factor(10.0) > 0

    r = KernelRoofline(name="k", seconds=1e-3, flops=100e9,
                       bytes_accessed=100e6)
    assert abs(r.achieved_flops - 100e12) < 1e9
    assert 0 < r.sol_fraction <= 1.01
    assert "TF/s" in r.report()
