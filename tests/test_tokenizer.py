"""Tokenizer: special-token layouts, BPE codec, timestamp splitting."""

import pytest

from turbo_whisper_workspace_tpu.decode import tokenizer as tk


def test_multilingual_v2_layout():
    sp = tk.special_tokens_for_vocab(51865)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.n_languages == 99
    assert sp.translate == 50358
    assert sp.transcribe == 50359
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.language_tokens["en"] == 50259


def test_v3_layout():
    sp = tk.special_tokens_for_vocab(51866)
    assert sp.n_languages == 100
    assert sp.timestamp_begin == 50365
    assert sp.language_tokens["yue"] == 50358


def test_english_only_layout():
    sp = tk.special_tokens_for_vocab(51864)
    assert sp.eot == 50256
    assert not sp.multilingual
    assert sp.timestamp_begin == 50363
    assert sp.sot_sequence() == [sp.sot]


def test_sot_sequence_multilingual():
    sp = tk.special_tokens_for_vocab(51865)
    assert sp.sot_sequence("fr", "transcribe") == [
        sp.sot, sp.language_tokens["fr"], sp.transcribe
    ]
    assert sp.sot_sequence("en", "translate", timestamps=False) == [
        sp.sot, sp.language_tokens["en"], sp.translate, sp.no_timestamps
    ]


def test_timestamp_token_math():
    sp = tk.special_tokens_for_vocab(51865)
    assert sp.timestamp_token(0.0) == sp.timestamp_begin
    assert sp.timestamp_token(1.0) == sp.timestamp_begin + 50
    assert sp.timestamp_seconds(sp.timestamp_token(12.34)) == pytest.approx(
        12.34, abs=0.02
    )


def test_byte_fallback_roundtrip():
    t = tk.ByteFallbackTokenizer()
    for text in ("hello world", "naïve café — ümlaut", ""):
        assert t.decode(t.encode(text)) == text


def test_bpe_with_tiny_vocab():
    # byte-level vocab for "abc " + merges building "ab" and "ab+c"
    enc = tk._byte_encoder()
    vocab = {enc[ord(c)]: i for i, c in enumerate("abc ")}
    vocab[enc[ord("a")] + enc[ord("b")]] = 4
    vocab[enc[ord("a")] + enc[ord("b")] + enc[ord("c")]] = 5
    merges = [(enc[ord("a")], enc[ord("b")]),
              (enc[ord("a")] + enc[ord("b")], enc[ord("c")])]
    bpe = tk.BPETokenizer(vocab, merges)
    ids = bpe.encode("abc")
    assert ids == [5]
    assert bpe.decode(ids) == "abc"
    assert bpe.encode("ab") == [4]
    assert bpe.encode("cb a") and bpe.decode(bpe.encode("cb a")) == "cb a"


def test_split_timestamps():
    sp = tk.special_tokens_for_vocab(51865)
    wt = tk.WhisperTokenizer(specials=sp)
    ids = [sp.timestamp_token(0.0), 104, 105, sp.timestamp_token(2.0),
           sp.timestamp_token(2.0), 106, sp.timestamp_token(3.5)]
    segs = wt.split_timestamps(ids)
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == 2.0
    assert segs[0]["tokens"] == [104, 105]
    assert segs[1]["start"] == 2.0 and segs[1]["end"] == 3.5


def test_tokenizer_json_format(tmp_path):
    # HF fast-tokenizer format with both merge encodings
    import json
    enc = tk._byte_encoder()
    vocab = {enc[ord(c)]: i for i, c in enumerate("abc ")}
    vocab[enc[ord("a")] + enc[ord("b")]] = 4
    blob = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": [f'{enc[ord("a")]} {enc[ord("b")]}'],
        },
        "added_tokens": [{"id": 50257, "content": "<|endoftext|>"}],
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(blob))
    bpe = tk.BPETokenizer.from_tokenizer_json(str(path))
    assert bpe.encode("ab") == [4]
    assert bpe.decode([4]) == "ab"
    assert bpe.encoder["<|endoftext|>"] == 50257

    # list-of-pairs merge encoding (newer tokenizers versions)
    blob["model"]["merges"] = [[enc[ord("a")], enc[ord("b")]]]
    path.write_text(json.dumps(blob))
    bpe2 = tk.BPETokenizer.from_tokenizer_json(str(path))
    assert bpe2.encode("ab") == [4]


def test_tiktoken_format(tmp_path):
    import base64

    ranks = {b"a": 0, b"b": 1, b"c": 2, b" ": 3, b"ab": 4, b"abc": 5}
    lines = [
        base64.b64encode(t) + b" " + str(r).encode() for t, r in ranks.items()
    ]
    path = tmp_path / "multilingual.tiktoken"
    path.write_bytes(b"\n".join(lines) + b"\n")
    tt = tk.TiktokenTokenizer.from_file(str(path))
    assert tt.encode("abc") == [5]
    assert tt.encode("ab") == [4]
    assert tt.decode(tt.encode("cb a")) == "cb a"
    # unicode text survives the byte-level path
    assert tt.decode([0, 1]) == "ab"


def test_for_model_resolution_ladder(tmp_path):
    import base64
    import json

    # empty dir → byte fallback
    wt = tk.WhisperTokenizer.for_model(51865, str(tmp_path))
    assert isinstance(wt.codec, tk.ByteFallbackTokenizer)

    # .tiktoken present → tiktoken codec
    (tmp_path / "multilingual.tiktoken").write_bytes(
        base64.b64encode(b"a") + b" 0\n"
    )
    wt = tk.WhisperTokenizer.for_model(51865, str(tmp_path))
    assert isinstance(wt.codec, tk.TiktokenTokenizer)

    # tokenizer.json outranks tiktoken
    enc = tk._byte_encoder()
    blob = {"model": {"vocab": {enc[ord("a")]: 0}, "merges": []}}
    (tmp_path / "tokenizer.json").write_text(json.dumps(blob))
    wt = tk.WhisperTokenizer.for_model(51865, str(tmp_path))
    assert isinstance(wt.codec, tk.BPETokenizer)

    # corrupt vocab.json falls through to the next loader
    (tmp_path / "vocab.json").write_text("{not json")
    wt = tk.WhisperTokenizer.for_model(51865, str(tmp_path))
    assert isinstance(wt.codec, tk.BPETokenizer)
