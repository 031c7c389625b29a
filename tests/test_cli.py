"""CLI surface: parser coverage + the pure-host subcommands."""

import json

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.__main__ import main


def test_info_command(tmp_path, capsys):
    from turbo_whisper_workspace_tpu.audio.io import write_wav

    p = str(tmp_path / "x.wav")
    write_wav(p, np.zeros(16000, np.float32))
    main(["info", "-i", p])
    out = json.loads(capsys.readouterr().out)
    assert out["duration"] == pytest.approx(1.0)


def test_diagnose_command(tmp_path, capsys):
    from turbo_whisper_workspace_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)
    p = str(tmp_path / "x.wav")
    write_wav(p, (0.2 * rng.standard_normal(16000)).astype(np.float32))
    main(["diagnose", "-i", p])
    assert "AUDIO DIAGNOSTIC REPORT" in capsys.readouterr().out


def test_preprocess_command(tmp_path, capsys):
    from turbo_whisper_workspace_tpu.audio.io import read_audio_file, write_wav

    rng = np.random.default_rng(0)
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    write_wav(src, (0.01 * rng.standard_normal(32000)).astype(np.float32))
    main(["preprocess", "-i", src, "-o", dst, "--normalize"])
    audio, _ = read_audio_file(dst, normalize=False)
    rms_db = 20 * np.log10(np.sqrt((audio**2).mean()))
    assert abs(rms_db - (-16.0)) < 1.5


def test_models_command(capsys):
    main(["models", "list"])
    out = json.loads(capsys.readouterr().out)
    assert "3dspeaker" in out["embedding"]


def test_security_mock_command(tmp_path, capsys, monkeypatch):
    from turbo_whisper_workspace_tpu.llm import llm_helper

    llm_helper.set_llm(llm_helper.DummyLLM())
    monkeypatch.chdir(tmp_path)
    main(["security", "-i", "ignored", "--bar", "--test",
          "-o", str(tmp_path)])
    out = capsys.readouterr().out
    assert "underage" in out
    llm_helper.set_llm(None)


def test_unknown_command_exits():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
