"""LLM enrichment helpers: fallbacks, JSON repair, fake-LLM injection."""

import pytest

from turbo_whisper_workspace_tpu.llm import llm_helper as lh


@pytest.fixture(autouse=True)
def reset_llm():
    lh.set_llm(None)
    yield
    lh.set_llm(None)


SEGMENTS = [
    {"speaker": "Speaker 0", "text": "Hey Alex, how was the weekend?"},
    {"speaker": "Speaker 1", "text": "Pretty good! I'm Alex by the way, "
                                     "we met at the studio."},
    {"speaker": "Speaker 0", "text": "Right! My name is Chris. We talked "
                                     "about the new microphone setup."},
    {"speaker": "Speaker 1", "text": "Yes, the audio quality on the "
                                     "recording was great. The microphone "
                                     "really helped."},
]


def test_fallback_self_intro_names():
    names = lh.identify_speaker_names_fallback(SEGMENTS)
    assert names.get("Speaker 1") == "Alex"
    assert names.get("Speaker 0") == "Chris"


def test_fallback_no_duplicate_names():
    segs = [
        {"speaker": "Speaker 0", "text": "I'm Sam."},
        {"speaker": "Speaker 1", "text": "I'm Sam too!"},
    ]
    names = lh.identify_speaker_names_fallback(segs)
    assert len(set(names.values())) == len(names)


def test_fallback_gates_on_common_names():
    segs = [{"speaker": "Speaker 0", "text": "My name is Zxqwv."}]
    assert lh.identify_speaker_names_fallback(segs) == {}


def test_json_repair_ladder():
    assert lh._extract_json('junk {"a": "b"} junk') == {"a": "b"}
    assert lh._extract_json("{'a': 'b'}") == {"a": "b"}
    assert lh._extract_json('{"a": "b",}') == {"a": "b"}
    assert lh._extract_json("no json here") is None


def test_extract_json_nested_and_strings():
    # nested objects (the old single-level regex failed here)
    assert lh._extract_json('x {"a": {"b": 1}, "c": 2} y') == {
        "a": {"b": 1}, "c": 2}
    # braces inside string values must not unbalance the scan
    assert lh._extract_json('{"a": "curly } brace", "b": "{"}') == {
        "a": "curly } brace", "b": "{"}
    # escaped quotes inside strings
    assert lh._extract_json('{"a": "say \\"hi\\""}') == {"a": 'say "hi"'}
    assert lh._extract_json("{ unterminated") is None


class FakeLLM:
    is_dummy = False

    def __init__(self, reply):
        self.reply = reply
        self.prompts = []

    def generate(self, prompt, **kw):
        self.prompts.append(prompt)
        return self.reply


def test_llm_naming_with_fake_llm():
    fake = FakeLLM('Here you go: {"Speaker 0": "Chris", "Speaker 1": "Alex"}')
    names = lh.identify_speaker_names_llm(SEGMENTS, llm=fake)
    assert names == {"Speaker 0": "Chris", "Speaker 1": "Alex"}
    assert "Speaker 0" in fake.prompts[0]


def test_llm_naming_filters_unknown_names():
    fake = FakeLLM('{"Speaker 0": "Zxqwv", "Speaker 9": "Alex"}')
    names = lh.identify_speaker_names_llm(SEGMENTS, llm=fake)
    assert names == {}


def test_identify_falls_back_when_llm_fails():
    names = lh.identify_speaker_names(SEGMENTS, llm=lh.DummyLLM())
    assert names.get("Speaker 0") == "Chris"


def test_summary_extractive_fallback():
    out = lh.summarize_conversation(SEGMENTS, llm=lh.DummyLLM())
    assert "Speaker" in out and len(out) > 20


def test_summary_uses_llm_when_available():
    fake = FakeLLM("They discussed weekend plans and studio gear.")
    out = lh.summarize_conversation(SEGMENTS, llm=fake)
    assert out == "They discussed weekend plans and studio gear."


def test_topics_numbered_list_parse():
    fake = FakeLLM(" Microphones\n2. Weekend plans\n3. Audio quality")
    topics = lh.extract_topics(SEGMENTS, llm=fake)
    assert topics == ["Microphones", "Weekend plans", "Audio quality"]


def test_topics_keyword_fallback():
    topics = lh.extract_topics(SEGMENTS, llm=lh.DummyLLM())
    assert "microphone" in topics


def test_dummy_llm_from_get_llm(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no models/ dir → DummyLLM
    llm = lh.get_llm()
    assert llm.is_dummy
    assert llm.generate("anything") == ""
