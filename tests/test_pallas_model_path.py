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
