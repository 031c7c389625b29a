"""Pallas kernels exercised through the MODEL path in interpret mode.

Off-TPU, the model routes attention to plain-XLA fallbacks, so a
kernel-call-site regression (shape plumbing, scale layout, seq-len
masking) would only surface on the real TPU at bench time. These tests
force TWW_PALLAS=interpret so `flash_attention` (encoder self-attention,
models/whisper.py mha routing) and `cross_attention_int8` (decode-step
cross-attention, models/whisper.py decoder_forward) run as real
pallas_call's through their production call sites, and assert numerics
against the XLA fallback path.

Reference analogue: the reference's attention runs inside torch/cuDNN
(vocalis/core/audio_pipeline.py:195-200) with no kernel-level tests at
all; this is part of the build's §4 test pyramid (kernel tier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbo_whisper_workspace_tpu.models import whisper


def _dims():
    return whisper.WhisperDims(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=517,
        n_text_ctx=448,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )


@pytest.fixture()
def model():
    dims = _dims()
    params = whisper.init_params(dims, jax.random.PRNGKey(0))
    return params, dims


def _encode(params, dims, mel, mode, monkeypatch):
    monkeypatch.setenv("TWW_PALLAS", mode)
    jax.clear_caches()  # routing is trace-time; drop any cached lowering
    try:
        return np.asarray(whisper.encoder_forward(params, dims, mel))
    finally:
        monkeypatch.delenv("TWW_PALLAS")
        jax.clear_caches()


def test_encoder_flash_attention_interpret_matches_xla(model, monkeypatch):
    params, dims = model
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, dims.n_mels, 3000)), jnp.float32
    )
    ref = _encode(params, dims, mel, "off", monkeypatch)
    out = _encode(params, dims, mel, "interpret", monkeypatch)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def _decode_step(params, dims, ckv, tokens, mode, monkeypatch):
    monkeypatch.setenv("TWW_PALLAS", mode)
    jax.clear_caches()
    try:
        cache = whisper.init_kv_cache(dims, tokens.shape[0], max_len=8,
                                      dtype=jnp.float32)
        logits, _ = whisper.decoder_forward(
            params, dims, tokens, ckv, kv_cache=cache, pos=0
        )
        return np.asarray(logits)
    finally:
        monkeypatch.delenv("TWW_PALLAS")
        jax.clear_caches()


def test_decoder_int8_cross_attention_interpret_matches_xla(model, monkeypatch):
    params, dims = model
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, dims.n_audio_ctx,
                                               dims.n_audio_state)) * 0.3,
        jnp.float32,
    )
    ckv = whisper.precompute_cross_kv(params, dims, feats, quantize=True)
    assert "k_q" in ckv  # the int8 path, not bf16
    tokens = jnp.array([[11], [42]], jnp.int32)
    ref = _decode_step(params, dims, ckv, tokens, "off", monkeypatch)
    out = _decode_step(params, dims, ckv, tokens, "interpret", monkeypatch)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


# --- quantized SELF-KV cache through decoder_forward ------------------
# Round-3 regression: cache_len was read from leaf axis 2 — the HEAD
# axis of the (L, B, H, T, Dh) quantized layout — so the causal mask had
# width H instead of max_len and prefill crashed at trace time. These
# tests drive decoder_forward with quantize=True caches where
# n_text_head != max_len, for both the t>1 prefill (XLA twin) and the
# t==1 Pallas kernel call site (whisper.py decoder_forward body).


def _cross_kv(params, dims, seed=1):
    feats = jnp.asarray(
        np.random.default_rng(seed).normal(size=(2, dims.n_audio_ctx,
                                                  dims.n_audio_state)) * 0.3,
        jnp.float32,
    )
    return whisper.precompute_cross_kv(params, dims, feats)


def test_decoder_quant_self_kv_prefill_matches_bf16(model):
    """t>1 prefill through the XLA int8 self-attention twin vs the bf16
    cache path. max_len(8) != n_text_head(2) so an axis mix-up in
    cache_len breaks the mask width (the exact round-3 bug)."""
    params, dims = model
    ckv = _cross_kv(params, dims)
    tokens = jnp.array([[11, 3, 7, 500, 2], [42, 9, 1, 15, 300]], jnp.int32)

    cache_bf16 = whisper.init_kv_cache(dims, 2, max_len=8, dtype=jnp.float32)
    ref, _ = whisper.decoder_forward(
        params, dims, tokens, ckv, kv_cache=cache_bf16, pos=0)

    cache_q = whisper.init_kv_cache(dims, 2, max_len=8, quantize=True)
    out, new_cache = whisper.decoder_forward(
        params, dims, tokens, ckv, kv_cache=cache_q, pos=0)
    assert new_cache["k_q"].shape == (dims.n_text_layer, 2,
                                      dims.n_text_head, 8,
                                      dims.n_text_state // dims.n_text_head)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2)


def test_decoder_quant_self_kv_step_interpret_matches_xla(model, monkeypatch):
    """t==1 decode step at pos>0: the Pallas self_attention_int8 kernel
    (interpret) vs the XLA twin (mode=off), through decoder_forward with
    a partially-filled quantized cache — the call site that had zero
    model-path coverage in round 3."""
    params, dims = model
    ckv = _cross_kv(params, dims)
    prefill = jnp.array([[11, 3, 7], [42, 9, 1]], jnp.int32)
    step_tok = jnp.array([[500], [300]], jnp.int32)

    def run(mode):
        monkeypatch.setenv("TWW_PALLAS", mode)
        jax.clear_caches()
        try:
            cache = whisper.init_kv_cache(dims, 2, max_len=8, quantize=True)
            # prefill always routes t>1 to the XLA twin regardless of mode
            _, cache = whisper.decoder_forward(
                params, dims, prefill, ckv, kv_cache=cache, pos=0)
            logits, _ = whisper.decoder_forward(
                params, dims, step_tok, ckv, kv_cache=cache, pos=3)
            return np.asarray(logits)
        finally:
            monkeypatch.delenv("TWW_PALLAS")
            jax.clear_caches()

    ref = run("off")
    out = run("interpret")
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_decoder_lane_cache_step_interpret_matches_xla(model, monkeypatch):
    """Beam lane-cache decode step (beam>1, 6-D quantized cache +
    lane_map) through decoder_forward: the Pallas lane kernel
    (self_attention_int8_lanes, interpret) vs the XLA twin — the call
    site bench's beam pipeline takes every step."""
    params, dims = model
    ckv = _cross_kv(params, dims)
    beam = 3
    b = 2
    prefill = jnp.array([[11, 3, 7], [42, 9, 1]], jnp.int32)
    step_tok = jnp.array([[500], [300], [12], [7], [99], [1]], jnp.int32)
    # beams share one cross-KV per batch row → ckv stays at B=2
    lane_map = jnp.zeros((b, beam, 8), jnp.int32).at[:, :, 3].set(
        jnp.arange(beam)[None, :])

    def run(mode):
        monkeypatch.setenv("TWW_PALLAS", mode)
        jax.clear_caches()
        try:
            cache = whisper.init_kv_cache(dims, b, max_len=8, quantize=True)
            _, cache = whisper.decoder_forward(
                params, dims, prefill, ckv, kv_cache=cache, pos=0)
            cache = whisper.beam_lane_cache(cache, beam)
            logits, new_cache = whisper.decoder_forward(
                params, dims, step_tok, ckv, kv_cache=cache, pos=3,
                beam=beam, lane_map=lane_map)
            return np.asarray(logits), new_cache
        finally:
            monkeypatch.delenv("TWW_PALLAS")
            jax.clear_caches()

    ref, ref_cache = run("off")
    out, out_cache = run("interpret")
    # panel layouts: k_p (L, B, H·Dh, K, T)
    assert ref_cache["k_p"].shape == (
        dims.n_text_layer, b, dims.n_text_state, beam, 8)
    # new rows land in each beam's own lane at pos=3
    kp = np.asarray(ref_cache["k_p"])
    assert np.abs(kp[:, :, :, :, 3]).sum() > 0
    assert np.abs(kp[:, :, :, 1:, :3]).sum() == 0  # prefix only in lane 0
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
