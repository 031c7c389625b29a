"""Greedy decode: torch parity (rules as data) + timestamp-grammar validity."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.decode import greedy, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import convert, whisper


def _tiny_dims():
    return whisper.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=517, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )


@pytest.fixture(scope="module")
def setup():
    import torch
    from transformers import WhisperForConditionalGeneration

    dims = _tiny_dims()
    cfg = convert.hf_config_from_dims(dims)
    torch.manual_seed(1)
    model = WhisperForConditionalGeneration(cfg).eval()
    params = convert.params_from_hf_state_dict(model.state_dict(), dims)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    return model, params, dims, sp


def test_greedy_matches_torch_loop(setup, rng):
    """Our jitted while-loop greedy == a reference torch argmax loop with
    the same (data-driven) masks applied."""
    import torch

    model, params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=False)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]] * 2, np.int32)
    max_len = 12

    res = greedy.greedy_decode(
        params, dims, mel, prompt, rules=drules, max_len=max_len
    )
    ours = np.asarray(res.tokens)[:, 2:]

    static_mask = np.asarray(drules.static_mask())
    begin_mask = np.asarray(drules.begin_mask())
    ts_mask = np.zeros_like(static_mask)
    ts_mask[sp.timestamp_begin :] = rules_mod.NEG_INF

    with torch.no_grad():
        enc = model.model.encoder(torch.from_numpy(mel)).last_hidden_state
        toks = torch.from_numpy(prompt.astype(np.int64))
        finished = np.zeros(2, bool)
        theirs = []
        for step in range(max_len):
            logits = model(
                decoder_input_ids=toks, encoder_outputs=(enc,)
            ).logits[:, -1].numpy()
            logits = logits + static_mask + ts_mask
            if step == 0:
                logits = logits + begin_mask
            nxt = logits.argmax(-1)
            nxt = np.where(finished, sp.eot, nxt)
            finished |= nxt == sp.eot
            theirs.append(nxt)
            toks = torch.cat([toks, torch.from_numpy(nxt[:, None])], dim=1)
        theirs = np.stack(theirs, axis=1)

    np.testing.assert_array_equal(ours, theirs)


def test_timestamp_grammar_validity(setup, rng):
    """With timestamp rules on, sampled streams obey the whisper grammar."""
    _, params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((3, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]] * 3, np.int32)

    res = greedy.greedy_decode(params, dims, mel, prompt, rules=drules, max_len=24)
    for b in range(3):
        toks = [int(t) for t in np.asarray(res.tokens)[b, 2:]]
        toks = toks[: int(res.lengths[b])]
        # first token is an initial timestamp within max_initial (1.0 s)
        assert toks[0] >= sp.timestamp_begin
        assert toks[0] <= sp.timestamp_begin + 50
        last_ts = sp.timestamp_begin
        for i, t in enumerate(toks):
            is_ts = t >= sp.timestamp_begin
            # whisper pairing convention over sampled tokens: with fewer
            # than two sampled, the penultimate counts as a timestamp
            last_was = i >= 1 and toks[i - 1] >= sp.timestamp_begin
            penult_was = i < 2 or toks[i - 2] >= sp.timestamp_begin
            if is_ts:
                assert t >= last_ts, "timestamps must be non-decreasing"
                assert not (last_was and penult_was), "three ts in a row"
                last_ts = t
            else:
                assert t < sp.eot, f"special token {t} leaked into output"
                assert not (last_was and not penult_was), (
                    "text after a segment-end timestamp"
                )


def test_language_detection_shape(setup, rng):
    _, params, dims, sp = setup
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    probs = np.asarray(greedy.detect_language(params, dims, mel, sp))
    assert probs.shape == (2, sp.n_languages)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_finished_sequences_stay_eot(setup, rng):
    _, params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=False)
    mel = rng.standard_normal((1, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]], np.int32)
    res = greedy.greedy_decode(params, dims, mel, prompt, rules=drules, max_len=30)
    toks = np.asarray(res.tokens)[0, 2:]
    length = int(res.lengths[0])
    if length < 30:
        assert (toks[length:] == sp.eot).all()


def test_sot_prev_prompt_conditioning(setup, rng):
    """initial_prompt prefix: <|startofprev|> + text tokens ride the
    prompt untouched by suppression (rules govern SAMPLED positions
    only), no_speech is read at the true SOT index, and the sampled
    region still obeys the grammar."""
    _, params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=False)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    # prefix tokens deliberately include ids the static mask suppresses
    # (sot_prev itself and a language token) — legal in the prompt
    prefix = [sp.sot_prev, sp.sot + 1, 5, 6, 7]
    sot_seq = [sp.sot, sp.transcribe]
    prompt = np.array([prefix + sot_seq] * 2, np.int32)
    res = greedy.greedy_decode(
        params, dims, mel, prompt, rules=drules, max_len=12,
        sot_index=len(prefix),
    )
    p_len = prompt.shape[1]
    toks = np.asarray(res.tokens)
    # prompt (incl. suppressed ids) preserved verbatim
    np.testing.assert_array_equal(toks[:, :p_len], prompt)
    # sampled region never contains statically suppressed ids
    suppressed = set(int(i) for i in drules._static_suppress_ids())
    for b in range(2):
        sampled = toks[b, p_len : p_len + int(res.lengths[b])]
        assert not (set(int(t) for t in sampled) & suppressed)
    # no_speech prob read at the SOT position is a valid probability
    assert np.all((res.no_speech_probs >= 0) & (res.no_speech_probs <= 1))


def test_sot_prev_prompt_changes_distribution(setup, rng):
    """The decoder actually CONDITIONS on the prefix: different prefix
    tokens change the next-token logits at the sampling position (the
    prompt is attended to, not ignored)."""
    _, params, dims, sp = setup
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    sot_seq = [sp.sot, sp.transcribe]
    p1 = np.asarray([[sp.sot_prev, 11, 12, 13] + sot_seq] * 2, np.int32)
    p2 = np.asarray([[sp.sot_prev, 201, 202, 203] + sot_seq] * 2, np.int32)
    l1 = np.asarray(whisper.forward(params, dims, mel, p1))[:, -1]
    l2 = np.asarray(whisper.forward(params, dims, mel, p2))[:, -1]
    assert np.abs(l1 - l2).max() > 1e-3
