"""Security monitors: pattern scan, threat scoring, typing, reports."""

import json
import os

import pytest

from turbo_whisper_workspace_tpu.analysis.bar_security_monitor import (
    BarSecurityMonitor, run_mock_analysis,
)
from turbo_whisper_workspace_tpu.analysis.security_monitor import SecurityMonitor
from turbo_whisper_workspace_tpu.llm import llm_helper


@pytest.fixture(autouse=True)
def dummy_llm():
    llm_helper.set_llm(llm_helper.DummyLLM())
    yield
    llm_helper.set_llm(None)


def _segs(*texts):
    return [
        {"speaker": f"Speaker {i % 2}", "text": t, "start": float(i),
         "end": float(i + 1)}
        for i, t in enumerate(texts)
    ]


def test_benign_transcript_no_incident(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("Nice weather today.", "Yes, lovely!"), "x.wav"
    )
    assert inc is None


def test_weapon_threat_detected(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("He has a gun in his jacket.", "Call the police now."), "x.wav"
    )
    assert inc is not None
    assert inc.incident_type == "weapon_threat"
    assert inc.threat_level >= 3
    assert "weapon" in inc.matched_patterns


def test_threat_level_additive_and_capped(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("Give me the money or I'll kill you, I have a gun and "
              "some cocaine to sell, want to fight?"),
        "x.wav",
    )
    assert inc.threat_level == 5


def test_relevant_segments_context(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("First line.", "Second line.", "He pulled a knife!",
              "Fourth line.", "Fifth line."),
        "x.wav",
    )
    texts = [s["text"] for s in inc.relevant_segments]
    assert "He pulled a knife!" in texts
    assert "Second line." in texts and "Fourth line." in texts
    assert "First line." not in texts


def test_incident_report_files(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(_segs("I'll kill you."), "x.wav")
    jp, tp = mon._save_incident_report(inc)
    assert os.path.exists(jp) and os.path.exists(tp)
    data = json.load(open(jp))
    assert data["incident_type"] == inc.incident_type
    text = open(tp).read()
    assert "SECURITY INCIDENT REPORT" in text


def test_incident_reports_never_collide(tmp_path):
    # two incidents in the same second must not overwrite each other
    # (reference flaw fixed per SURVEY §7.4)
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(_segs("I'll kill you."), "x.wav")
    paths = {mon._save_incident_report(inc)[0] for _ in range(3)}
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p)


def test_fallback_summary_without_llm(tmp_path):
    mon = SecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(_segs("He has a knife."), "x.wav")
    assert "weapon" in inc.summary or "threat" in inc.summary


def test_bar_underage_priority(tmp_path):
    mon = BarSecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("That kid used a fake ID, he's underage."), "bar.wav"
    )
    assert inc.incident_type == "underage_drinking"
    assert inc.threat_level >= 3


def test_bar_intoxication_bump(tmp_path):
    mon = BarSecurityMonitor(output_dir=str(tmp_path))
    inc = mon._analyze_transcript(
        _segs("He's totally wasted and can't walk straight.",
              "Yeah he's been slurring and stumbling all night."),
        "bar.wav",
    )
    assert inc is not None
    assert inc.incident_type == "severe_intoxication"


def test_mock_analysis_harness():
    inc = run_mock_analysis()
    assert inc is not None
    assert inc.audio_file == "<mock>"
    assert inc.incident_type == "underage_drinking"


def test_mock_analysis_from_json(tmp_path):
    p = str(tmp_path / "mock.json")
    json.dump(_segs("All quiet tonight."), open(p, "w"))
    assert run_mock_analysis(p) is None


def test_monitor_directory_batches(tmp_path, monkeypatch):
    """Directory mode goes through ONE process_batch call."""
    import numpy as np

    from turbo_whisper_workspace_tpu.audio import io as aio

    calls = []

    class FakePipeline:
        def process_batch(self, files, **kw):
            calls.append(list(files))
            return [
                {"merged_segments": _segs("He has a gun.")} for _ in files
            ]

    for name in ("a.wav", "b.wav"):
        aio.write_wav(str(tmp_path / name), np.zeros(1600, np.float32))
    mon = SecurityMonitor(pipeline=FakePipeline(),
                          output_dir=str(tmp_path / "out"))
    incidents = mon.monitor_directory(str(tmp_path))
    assert len(calls) == 1 and len(calls[0]) == 2
    assert len(incidents) == 2
