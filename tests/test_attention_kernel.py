"""Pallas one-pass attention kernel vs the einsum oracle (interpret mode
on CPU; the same code compiles with Mosaic on the TPU)."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.ops import attention as att


@pytest.mark.parametrize("t", [128, 300])  # 300 exercises pad+mask
def test_flash_matches_reference(rng, t):
    b, h, d = 2, 3, 64
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    ref = np.asarray(att.attention_reference(q, k, v))
    out = np.asarray(att.flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_flash_bf16(rng):
    import jax.numpy as jnp

    b, h, t, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    ref = np.asarray(att.attention_reference(q, q, q), np.float32)
    out = np.asarray(
        att.flash_attention(q, q, q, block_q=128, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_cross_attention_int8_matches_reference(rng):
    import jax.numpy as jnp

    from turbo_whisper_workspace_tpu.ops.attention import (
        cross_attention_int8, quantize_cross_kv_int8,
    )

    l, b, h, t, dh = 2, 2, 4, 300, 64
    k = rng.standard_normal((l, b, h, t, dh)).astype(np.float32)
    v = rng.standard_normal((l, b, h, t, dh)).astype(np.float32)
    q = rng.standard_normal((b, h, 3, dh)).astype(np.float32)

    qkv = quantize_cross_kv_int8(jnp.asarray(k), jnp.asarray(v))
    out = np.asarray(cross_attention_int8(
        jnp.asarray(q), qkv["k_q"][0], qkv["v_q"][0],
        qkv["k_scale"][0], qkv["v_scale"][0], seq_len=t, interpret=True,
    ))
    ref = np.asarray(att.attention_reference(q, k[0], v[0]))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_quantized_decode_matches_dense(rng):
    """Full tiny-model decode with int8 cross-KV ≈ dense decode."""
    import jax
    import jax.numpy as jnp

    from turbo_whisper_workspace_tpu.decode import greedy, rules, tokenizer
    from turbo_whisper_workspace_tpu.models import whisper as wm

    dims = wm.WhisperDims(80, 1500, 64, 2, 2, 517, 448, 64, 2, 2)
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    prompt = np.tile(np.array([[sp.sot, sp.transcribe]], np.int32), (2, 1))

    feats = wm.encoder_forward(params, dims, mel)
    dense = greedy.greedy_decode_features(
        params, dims, wm.precompute_cross_kv(params, dims, feats),
        jnp.asarray(prompt), rules=drules, max_len=10,
    )
    quant = greedy.greedy_decode_features(
        params, dims, wm.precompute_cross_kv(params, dims, feats,
                                             quantize=True),
        jnp.asarray(prompt), rules=drules, max_len=10,
    )
    # random-weight logits are diffuse; require mostly-identical tokens
    agree = (np.asarray(dense.tokens) == np.asarray(quant.tokens)).mean()
    assert agree > 0.7, f"token agreement {agree}"


def test_self_attention_lanes_matches_gathered(rng):
    """Lane-cache beam attention (no physical reorder) == ordinary
    attention over the PHYSICALLY GATHERED cache: for every beam k,
    selecting lane lane_map[b,k,t] at position t must reproduce the
    classic regathered-cache result. Runs the Pallas kernel in interpret
    mode and the XLA twin, both against the dense oracle."""
    import jax.numpy as jnp

    b, h, k, t, dh = 2, 3, 4, 16, 64
    valid = 11
    kq = rng.integers(-127, 128, (b, h, k, t, dh)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, h, k, t, dh)).astype(np.int8)
    ks = (rng.random((b, h, k, t)) * 0.02 + 0.01).astype(np.float32)
    vs = (rng.random((b, h, k, t)) * 0.02 + 0.01).astype(np.float32)
    q = rng.standard_normal((b, h, k, dh)).astype(np.float32)
    lane_map = rng.integers(0, k, (b, k, t)).astype(np.int32)

    # dense oracle: gather each beam's K/V rows by lane_map, run plain
    # softmax attention over the valid prefix
    ref = np.zeros((b, h, k, dh), np.float32)
    for bi in range(b):
        for ki in range(k):
            lanes = lane_map[bi, ki, :valid]
            kk = (kq[bi, :, lanes, np.arange(valid)]
                  * ks[bi, :, lanes, np.arange(valid), None])
            vv = (vq[bi, :, lanes, np.arange(valid)]
                  * vs[bi, :, lanes, np.arange(valid), None])
            # kk/vv: (valid, h, dh) → (h, valid, dh)
            kk = kk.transpose(1, 0, 2)
            vv = vv.transpose(1, 0, 2)
            logits = np.einsum("hd,htd->ht", q[bi, :, ki], kk) * dh**-0.5
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            ref[bi, :, ki] = np.einsum("ht,htd->hd", w, vv)

    # panel layouts: K panel (B, H·Dh, K·T), V panel (B, K·T, H·Dh),
    # scales (B, H, K·T) — column j = lane·T + t
    kp = kq.transpose(0, 1, 4, 2, 3).reshape(b, h * dh, k * t)
    vp = vq.transpose(0, 2, 3, 1, 4).reshape(b, k * t, h * dh)
    kps = ks.reshape(b, h, k * t)
    vps = vs.reshape(b, h, k * t)

    xla = np.asarray(att.self_attention_int8_lanes_xla(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(kps),
        jnp.asarray(vp), jnp.asarray(vps), jnp.asarray(lane_map), valid,
    ))
    np.testing.assert_allclose(xla, ref, atol=2e-2, rtol=2e-2)

    pall = np.asarray(att.self_attention_int8_lanes(
        jnp.asarray(q, jnp.float32), jnp.asarray(kp), jnp.asarray(kps),
        jnp.asarray(vp), jnp.asarray(vps), jnp.asarray(lane_map), valid,
        interpret=True,
    ))
    np.testing.assert_allclose(pall, ref, atol=2e-2, rtol=2e-2)


def test_cross_attention_s8_matches_int8(rng):
    """EXPERIMENTAL s8×s8 cross kernel (TWW_CROSS_S8 opt-in) tracks the
    shipping bf16-dequant kernel within its documented ~1% activation/
    softmax-weight quantization noise (docs/KERNELS.md beam-step
    decomposition)."""
    import jax.numpy as jnp

    from turbo_whisper_workspace_tpu.ops.attention import (
        cross_attention_int8, cross_attention_s8)

    b, h, tq, dh, t = 2, 4, 5, 64, 256
    q = jnp.asarray(rng.standard_normal((b, h, tq, dh)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (b, h, dh, t)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (b, t, h * dh)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, h)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, h)), jnp.float32)
    ref = np.asarray(cross_attention_int8(q, kq, vq, ks, vs, seq_len=t,
                                          interpret=True), np.float32)
    got = np.asarray(cross_attention_s8(q, kq, vq, ks, vs, seq_len=t,
                                        interpret=True), np.float32)
    denom = max(np.abs(ref).mean(), 1e-9)
    rel = np.abs(got - ref).mean() / denom
    assert rel < 0.03, rel
