"""Beam search properties: beam-1 ≡ greedy, beam-5 grammar validity."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.decode import beam, greedy, rules as rules_mod, tokenizer
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
    torch.manual_seed(2)
    model = WhisperForConditionalGeneration(cfg).eval()
    params = convert.params_from_hf_state_dict(model.state_dict(), dims)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    return params, dims, sp


@pytest.mark.parametrize("timestamps", [False, True])
def test_beam1_equals_greedy(setup, rng, timestamps):
    params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=timestamps)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]] * 2, np.int32)

    g = greedy.greedy_decode(params, dims, mel, prompt, rules=drules, max_len=16)
    b = beam.beam_decode(
        params, dims, mel, prompt, rules=drules, beam_size=1, max_len=16
    )
    for i in range(2):
        glen, blen = int(g.lengths[i]), int(b.lengths[i])
        assert glen == blen
        np.testing.assert_array_equal(
            np.asarray(g.tokens)[i, : 2 + glen], np.asarray(b.tokens)[i, : 2 + blen]
        )
    np.testing.assert_allclose(
        np.asarray(g.sum_logprobs), np.asarray(b.sum_logprobs), atol=1e-3
    )


def test_beam5_valid_and_ranked(setup, rng):
    params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]] * 2, np.int32)

    res = beam.beam_decode(
        params, dims, mel, prompt, rules=drules, beam_size=5, max_len=20
    )
    assert res.all_tokens.shape == (2, 5, 22)
    scores = np.asarray(res.all_scores)
    # finished set sorted descending by construction
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # best hypothesis obeys the timestamp grammar
    for i in range(2):
        toks = [int(t) for t in np.asarray(res.tokens)[i, 2:]][: int(res.lengths[i])]
        assert toks[0] >= sp.timestamp_begin
        last_ts = sp.timestamp_begin
        for j, t in enumerate(toks):
            if t >= sp.timestamp_begin:
                assert t >= last_ts
                last_ts = t
            else:
                assert t < sp.eot


def test_beam_batch_independence(setup, rng):
    """Each batch item's beam search is independent of its neighbors."""
    params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    prompt2 = np.array([[sp.sot, sp.transcribe]] * 2, np.int32)
    prompt1 = prompt2[:1]

    both = beam.beam_decode(
        params, dims, mel, prompt2, rules=drules, beam_size=3, max_len=12
    )
    solo = beam.beam_decode(
        params, dims, mel[:1], prompt1, rules=drules, beam_size=3, max_len=12
    )
    np.testing.assert_array_equal(
        np.asarray(both.tokens)[0], np.asarray(solo.tokens)[0]
    )


def test_beam_quantized_self_kv(setup, rng):
    """int8 self-KV cache (the beam-reorder traffic halver): decode runs
    the same grammar and tracks the bf16-cache decode closely — on an
    HF-init tiny model the quantization perturbation must not change
    the selected hypotheses."""
    params, dims, sp = setup
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    prompt = np.array([[sp.sot, sp.transcribe]] * 2, np.int32)

    from turbo_whisper_workspace_tpu.models import whisper as wm

    audio = wm.encoder_forward(params, dims, mel)
    ckv = wm.precompute_cross_kv(params, dims, audio)
    ref = beam.beam_decode_features(
        params, dims, ckv, prompt, rules=drules, beam_size=3, max_len=12,
    )
    q = beam.beam_decode_features(
        params, dims, ckv, prompt, rules=drules, beam_size=3, max_len=12,
        quantize_cache=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(q.tokens))
    np.testing.assert_allclose(
        np.asarray(ref.sum_logprobs), np.asarray(q.sum_logprobs),
        atol=0.05, rtol=0.05,
    )


def test_self_attention_int8_matches_mha(rng):
    """Quantized-cache attention vs the bf16 oracle: per-(position,
    head) int8 K/V keeps the attention output within ~1%.

    Exercises ops.attention.self_attention_int8_xla (the XLA twin used
    for CPU/prefill) against models.whisper.mha with head-major inputs."""
    import jax.numpy as jnp

    from turbo_whisper_workspace_tpu.models import whisper as wm
    from turbo_whisper_workspace_tpu.ops.attention import self_attention_int8_xla

    b, tq, tk, h, dh = 3, 1, 17, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((b, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, d)), jnp.float32)
    mask = jnp.ones((1, 1, tq, tk), bool)
    ref = wm.mha(q, k, v, h, mask=mask)
    kq, ks = wm._quantize_kv_rows(k, h)      # (B,H,Tk,Dh) int8, (B,H,Tk)
    vq, vs = wm._quantize_kv_rows(v, h)

    def head_major(x):
        return x.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

    out_hm = self_attention_int8_xla(head_major(q), kq, ks, vq, vs, mask)
    out = out_hm.transpose(0, 2, 1, 3).reshape(b, tq, d)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 0.02, err
