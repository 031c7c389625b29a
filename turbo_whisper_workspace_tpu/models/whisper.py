"""Whisper encoder-decoder in pure-function JAX.

The reference runs Whisper through the HF torch/CUDA pipeline
(vocalis/core/audio_pipeline.py:195-200, model="openai/whisper-large-v3",
fp16). This is a from-scratch TPU-native implementation:

* parameters are a plain pytree; per-layer tensors are **stacked along a
  leading layer axis and scanned** (`jax.lax.scan`) — one compiled layer
  body regardless of depth, which keeps XLA compile times flat from
  tiny (4 layers) to large-v3 (32 layers) and gives the sharding layer
  a single leaf per weight to annotate;
* attention is batched einsum onto the MXU with f32 softmax
  accumulation (a Pallas flash-attention kernel in ops/attention.py
  serves the long-sequence encoder path);
* decoding uses a preallocated fixed-shape KV cache updated with
  `lax.dynamic_update_slice` so the whole autoregressive loop stays
  inside one `jit` (no retracing, no dynamic shapes);
* cross-attention K/V are precomputed once per 30 s window.

Model-dimension table matches openai/whisper's ModelDimensions for
tiny → large-v3-turbo.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # pytree of arrays


@dataclass(frozen=True)
class WhisperDims:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


def _dims(mels, astate, ahead, alayer, vocab, tstate, thead, tlayer):
    return WhisperDims(
        n_mels=mels,
        n_audio_ctx=1500,
        n_audio_state=astate,
        n_audio_head=ahead,
        n_audio_layer=alayer,
        n_vocab=vocab,
        n_text_ctx=448,
        n_text_state=tstate,
        n_text_head=thead,
        n_text_layer=tlayer,
    )


# openai/whisper ModelDimensions per checkpoint family.
WHISPER_CONFIGS: dict[str, WhisperDims] = {
    "tiny.en": _dims(80, 384, 6, 4, 51864, 384, 6, 4),
    "tiny": _dims(80, 384, 6, 4, 51865, 384, 6, 4),
    "base.en": _dims(80, 512, 8, 6, 51864, 512, 8, 6),
    "base": _dims(80, 512, 8, 6, 51865, 512, 8, 6),
    "small.en": _dims(80, 768, 12, 12, 51864, 768, 12, 12),
    "small": _dims(80, 768, 12, 12, 51865, 768, 12, 12),
    "medium.en": _dims(80, 1024, 16, 24, 51864, 1024, 16, 24),
    "medium": _dims(80, 1024, 16, 24, 51865, 1024, 16, 24),
    "large-v2": _dims(80, 1280, 20, 32, 51865, 1280, 20, 32),
    "large-v3": _dims(128, 1280, 20, 32, 51866, 1280, 20, 32),
    "large-v3-turbo": _dims(128, 1280, 20, 32, 51866, 1280, 20, 4),
}


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Fixed sinusoidal positions for the audio encoder."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Initialization


def _init_linear(key, d_in, d_out, bias=True):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * (d_in**-0.5)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_attn(key, d, cross=False):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_linear(ks[0], d, d),
        "k": _init_linear(ks[1], d, d, bias=False),
        "v": _init_linear(ks[2], d, d),
        "out": _init_linear(ks[3], d, d),
    }


def _init_block(key, d, cross: bool):
    ks = jax.random.split(key, 4)
    block = {
        "attn_ln": _init_ln(d),
        "attn": _init_attn(ks[0], d),
        "mlp_ln": _init_ln(d),
        "mlp": {
            "fc1": _init_linear(ks[1], d, 4 * d),
            "fc2": _init_linear(ks[2], 4 * d, d),
        },
    }
    if cross:
        block["cross_ln"] = _init_ln(d)
        block["cross"] = _init_attn(ks[3], d)
    return block


def _stack_blocks(blocks: list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(dims: WhisperDims, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (layer-stacked blocks)."""
    k = jax.random.split(key, 8)
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    enc_blocks = [
        _init_block(kk, d_a, cross=False)
        for kk in jax.random.split(k[0], dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(kk, d_t, cross=True)
        for kk in jax.random.split(k[1], dims.n_text_layer)
    ]
    params = {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(k[2], (d_a, dims.n_mels, 3)) * 0.02,
                "b": jnp.zeros((d_a,)),
            },
            "conv2": {
                "w": jax.random.normal(k[3], (d_a, d_a, 3)) * 0.02,
                "b": jnp.zeros((d_a,)),
            },
            "pos_emb": jnp.asarray(sinusoids(dims.n_audio_ctx, d_a)),
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": _init_ln(d_a),
        },
        "decoder": {
            "token_emb": jax.random.normal(k[4], (dims.n_vocab, d_t)) * 0.02,
            "pos_emb": jax.random.normal(k[5], (dims.n_text_ctx, d_t)) * 0.02,
            "blocks": _stack_blocks(dec_blocks),
            "ln": _init_ln(d_t),
        },
    }
    return jax.tree.map(lambda x: x.astype(dtype), params)


# ---------------------------------------------------------------------------
# Forward pieces


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    # LN statistics in f32 regardless of activation dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def linear(x: jax.Array, p: Params) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _pallas_mode() -> str:
    """Kernel routing, resolved at trace time.

    "compiled" — Pallas kernels (TPU); "interpret" — Pallas in interpret
    mode (CI coverage of the real kernel call sites off-TPU, env
    TWW_PALLAS=interpret); "off" — plain-XLA fallbacks (CPU default:
    interpret-mode Pallas per decode step is pathologically slow).
    """
    import os

    forced = os.environ.get("TWW_PALLAS")
    if forced in ("compiled", "interpret", "off"):
        return forced
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    return "compiled" if on_tpu else "off"


def _use_flash() -> bool:
    return _pallas_mode() != "off"


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    causal: bool = False,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention, (B, Tq, D) x (B, Tk, D) → (B, Tq, D).

    f32 logits/softmax; MXU matmuls in the activation dtype. Long
    non-causal self-attention (the encoder's 1500-frame windows) routes
    to the Pallas one-pass kernel in ops/attention.py, which keeps the
    (Tq, Tk) score matrix in VMEM instead of materializing it in HBM.
    """
    b, tq, d = q.shape
    tk = k.shape[1]
    mode = _pallas_mode()
    if (not causal and mask is None and tq == tk and tq >= 256
            and mode != "off"):
        from ..ops.attention import flash_attention

        to_heads = lambda x: x.reshape(b, tq, n_head, d // n_head).transpose(
            0, 2, 1, 3
        )
        out = flash_attention(
            to_heads(q), to_heads(k), to_heads(v),
            interpret=(mode == "interpret"),
        )
        return out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    scale = (d // n_head) ** -0.5
    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        causal_mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal_mask[None, None], logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
    return out.reshape(b, tq, d)


def _attn_block(x, p, n_head, causal=False):
    h = layer_norm(x, p["attn_ln"])
    q = linear(h, p["attn"]["q"])
    k = linear(h, p["attn"]["k"])
    v = linear(h, p["attn"]["v"])
    return x + linear(mha(q, k, v, n_head, causal=causal), p["attn"]["out"])


def _mlp_block(x, p):
    h = layer_norm(x, p["mlp_ln"])
    h = linear(h, p["mlp"]["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    return x + linear(h, p["mlp"]["fc2"])


# ---------------------------------------------------------------------------
# Encoder


def encoder_forward(params: Params, dims: WhisperDims, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, 3000) → audio features (B, 1500, d)."""
    enc = params["encoder"]
    dtype = enc["conv1"]["w"].dtype
    x = mel.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"], (1,), [(1, 1)], dimension_numbers=("NCH", "OIH", "NCH")
    ) + enc["conv1"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"], (2,), [(1, 1)], dimension_numbers=("NCH", "OIH", "NCH")
    ) + enc["conv2"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, D)
    x = x + enc["pos_emb"].astype(dtype)

    n_head = dims.n_audio_head

    def body(carry, block):
        h = _attn_block(carry, block, n_head, causal=False)
        h = _mlp_block(h, block)
        return h, None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# Cross-attention KV precompute + decoder


def precompute_cross_kv(
    params: Params, dims: WhisperDims, audio_features: jax.Array,
    quantize: bool = False,
):
    """K/V of every decoder layer's cross-attention over the encoder output.

    Returns a pytree {"k","v"} of (L, B, H, 1500, Dh) — computed once per
    window, already in head-major layout so the per-step cross-attention
    reads it with NO transposes (a (B,T,D)→(B,H,T,Dh) transpose of ~1 GB
    per decode step was the single largest decode cost).

    quantize=True stores int8 K/V with per-(layer,batch,head) scales —
    half the HBM traffic of the dominant decode-step read — consumed by
    the Pallas kernel in ops/attention.cross_attention_int8.
    """
    blocks = params["decoder"]["blocks"]
    h = dims.n_text_head
    b, t, d = audio_features.shape

    def body(_, block):
        k = linear(audio_features, block["cross"]["k"])
        v = linear(audio_features, block["cross"]["v"])
        k = k.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)
        return None, {"k": k, "v": v}

    _, kv = jax.lax.scan(body, None, blocks)
    if quantize:
        from ..ops.attention import quantize_cross_kv_int8

        return quantize_cross_kv_int8(kv["k"], kv["v"])
    return kv


def init_kv_cache(
    dims: WhisperDims, batch: int, max_len: int | None = None,
    dtype=jnp.bfloat16, quantize: bool = False,
):
    """Preallocated self-attention cache.

    quantize=False: {"k","v"} (L, B, max_len, D) in `dtype`.
    quantize=True: int8 payload with per-(position, head) scales, head-
    major — {"k_q","v_q"} (L, B, H, max_len, Dh) int8 + {"k_s","v_s"}
    (L, B, H, max_len) bf16. Beam search physically reorders this cache
    every step; int8 halves that traffic (measured 4.2x faster reorder
    than the bf16 jnp.take baseline, scripts/profile_beam_ops.py), the
    head-major layout feeds the Pallas decode kernel with no transposes,
    and keeping the position axis off the minor dim avoids the 6x lane
    padding a (…, H=20) minor axis costs in the reorder copies."""
    max_len = max_len or dims.n_text_ctx
    if not quantize:
        shape = (dims.n_text_layer, batch, max_len, dims.n_text_state)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    h = dims.n_text_head
    dh = dims.n_text_state // h
    qshape = (dims.n_text_layer, batch, h, max_len, dh)
    sshape = (dims.n_text_layer, batch, h, max_len)
    return {
        "k_q": jnp.zeros(qshape, jnp.int8),
        "v_q": jnp.zeros(qshape, jnp.int8),
        "k_s": jnp.zeros(sshape, jnp.bfloat16),
        "v_s": jnp.zeros(sshape, jnp.bfloat16),
    }


def beam_lane_cache(cache_b: Params, beam: int) -> Params:
    """Quantized (L, B, H, T, Dh) prefill cache → beam "lane" PANEL
    layout for the block-diagonal lane kernel
    (ops/attention.self_attention_int8_lanes):

      k_p  (L, B, H·Dh, K, T) int8 — per-(b) K-score panel, flattens
                                      free to (H·Dh, K·T)
      v_p  (L, B, K, T, H·Dh) int8 — V output panel, flattens to
                                      (K·T, H·Dh)
      k_ps / v_ps (L, B, H, K, T)  — per-(head, position) scales

    The shared prompt prefix lives in lane 0 ONLY (lane_map starts
    all-zero, so every beam reads it from there — no K× duplication).
    Lanes 1..K-1 start zeroed and fill as beams write their own rows."""
    l, b, h, t, dh = cache_b["k_q"].shape
    kq0 = cache_b["k_q"].transpose(0, 1, 2, 4, 3).reshape(l, b, h * dh, t)
    vq0 = cache_b["v_q"].transpose(0, 1, 3, 2, 4).reshape(l, b, t, h * dh)

    k_p = jnp.zeros((l, b, h * dh, beam, t), jnp.int8)
    k_p = k_p.at[:, :, :, 0].set(kq0)
    v_p = jnp.zeros((l, b, beam, t, h * dh), jnp.int8)
    v_p = v_p.at[:, :, 0].set(vq0)
    sdtype = cache_b["k_s"].dtype
    k_ps = jnp.zeros((l, b, h, beam, t), sdtype)
    k_ps = k_ps.at[:, :, :, 0].set(cache_b["k_s"])
    v_ps = jnp.zeros((l, b, h, beam, t), sdtype)
    v_ps = v_ps.at[:, :, :, 0].set(cache_b["v_s"])
    return {"k_p": k_p, "v_p": v_p, "k_ps": k_ps, "v_ps": v_ps}


def _quantize_kv_rows(x: jax.Array, n_head: int):
    """(B, T, D) → head-major int8 payload (B, H, T, Dh) + per-(B, H, T)
    bf16 scales."""
    b, t, d = x.shape
    xh = x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)
    xh = xh.astype(jnp.float32)                          # (B, H, T, Dh)
    s = jnp.max(jnp.abs(xh), axis=-1) / 127.0            # (B, H, T)
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(xh / s[..., None]), -127, 127).astype(jnp.int8)
    return xq, s.astype(jnp.bfloat16)


def decoder_forward(
    params: Params,
    dims: WhisperDims,
    tokens: jax.Array,
    cross_kv: Params,
    kv_cache: Params | None = None,
    pos: jax.Array | int = 0,
    beam: int = 1,
    lane_map: jax.Array | None = None,
):
    """Decoder forward.

    tokens (B, T): full-sequence (prefill / teacher-forcing) when
    kv_cache covers positions [pos, pos+T); incremental when T == 1.
    Returns (logits (B, T, vocab), updated kv_cache).

    beam > 1 (static): tokens/kv_cache carry B·K flattened beam rows
    (B-major: row = b*K + k) while cross_kv stays at batch B — every
    decode step reads ONE cross-KV copy per batch element and feeds K
    query rows through it, instead of physically tiling the (dominant)
    int8 cross-KV traffic K×. Requires T == 1 (single-step decode).

    lane_map (B, K, T) int32 (with beam > 1 and a 6-D quantized "lane"
    cache (L, B, H, K, T, Dh) from beam_lane_cache): the self-KV cache
    is never physically reordered across steps; lane_map names, per
    current beam k and position t, the lane that wrote that position.
    Beam row b·K+k always writes its new KV row into lane k.
    """
    dec = params["decoder"]
    dtype = dec["token_emb"].dtype
    b, t = tokens.shape
    n_head = dims.n_text_head

    x = dec["token_emb"][tokens].astype(dtype)
    pos_ids = pos + jnp.arange(t)
    x = x + dec["pos_emb"][pos_ids].astype(dtype)

    use_cache = kv_cache is not None
    if not use_cache:
        kv_cache = init_kv_cache(dims, b, max_len=t, dtype=dtype)
        pos = 0
    lane_cache = "k_p" in kv_cache
    quant_cache = lane_cache or "k_q" in kv_cache
    if lane_cache:
        assert lane_map is not None and beam == kv_cache["k_p"].shape[3]
        assert t == 1, "lane cache is single-step decode only"

    # Cache length = position axis: quant layout is (L, B, H, T, Dh)
    # (lane panels put T last), bf16 layout is (L, B, T, D) — indexing
    # a fixed leaf axis 2 would read the head axis of the quant cache
    # (the round-3 prefill crash).
    cache_len = (kv_cache["k_p"].shape[-1] if lane_cache
                 else kv_cache["k_q"].shape[-2] if "k_q" in kv_cache
                 else kv_cache["k"].shape[2])
    # positions < pos + t are valid keys
    key_pos = jnp.arange(cache_len)
    q_pos = pos + jnp.arange(t)
    attn_mask = key_pos[None, :] <= q_pos[:, None]  # (t, cache_len)

    # The full stacked (L, B, T, D) cache rides the scan CARRY and is
    # updated in place with per-layer dynamic_update_slice — carrying it
    # as scan ys would rewrite the entire cache (~170 MB/step at batch
    # 32) every decode step instead of the one-token slice.
    def _dus(cache, upd, li):
        return jax.lax.dynamic_update_slice(
            cache, upd[None].astype(cache.dtype), (li, 0, pos, 0))

    def _ds(cache, li):
        return jax.lax.dynamic_slice(
            cache, (li,) + (0,) * (cache.ndim - 1),
            (1,) + cache.shape[1:])[0]

    def body(carry, layer):
        x, cache = carry
        block, ckv, li = layer
        # self-attention with cache
        h = layer_norm(x, block["attn_ln"])
        q = linear(h, block["attn"]["q"])
        k = linear(h, block["attn"]["k"])
        v = linear(h, block["attn"]["v"])
        if lane_cache:
            br = b // beam
            dh = dims.n_text_state // n_head
            d_full = dims.n_text_state
            kt = beam * cache_len
            kq_new, ks_new = _quantize_kv_rows(k, n_head)   # (BK,H,1,Dh)
            vq_new, vs_new = _quantize_kv_rows(v, n_head)
            # beam row b·K+k writes lane k of batch b, at position pos:
            # one dynamic_update_slice per panel (T is the minor axis of
            # the k/scale panels, so a single traced `pos` indexes it)
            knew = kq_new[:, :, 0].reshape(br, beam, d_full)  # (B,K,H·Dh)
            vnew = vq_new[:, :, 0].reshape(br, beam, d_full)
            ksnew = ks_new[:, :, 0].reshape(br, beam, n_head)
            vsnew = vs_new[:, :, 0].reshape(br, beam, n_head)
            cache = {
                "k_p": jax.lax.dynamic_update_slice(
                    cache["k_p"],
                    knew.transpose(0, 2, 1)[None, :, :, :, None],
                    (li, 0, 0, 0, pos)),
                "v_p": jax.lax.dynamic_update_slice(
                    cache["v_p"], vnew[None, :, :, None, :],
                    (li, 0, 0, pos, 0)),
                "k_ps": jax.lax.dynamic_update_slice(
                    cache["k_ps"],
                    ksnew.transpose(0, 2, 1)[None, :, :, :, None].astype(
                        cache["k_ps"].dtype),
                    (li, 0, 0, 0, pos)),
                "v_ps": jax.lax.dynamic_update_slice(
                    cache["v_ps"],
                    vsnew.transpose(0, 2, 1)[None, :, :, :, None].astype(
                        cache["v_ps"].dtype),
                    (li, 0, 0, 0, pos)),
            }
            qh_self = q[:, 0].reshape(br, beam, n_head, dh).transpose(
                0, 2, 1, 3)                                 # (br,H,K,Dh)
            kp = _ds(cache["k_p"], li).reshape(br, d_full, kt)
            vp = _ds(cache["v_p"], li).reshape(br, kt, d_full)
            kps = _ds(cache["k_ps"], li).reshape(br, n_head, kt)
            vps = _ds(cache["v_ps"], li).reshape(br, n_head, kt)
            mode = _pallas_mode()
            if mode == "off":
                from ..ops.attention import self_attention_int8_lanes_xla

                attn_h = self_attention_int8_lanes_xla(
                    qh_self, kp, kps, vp, vps, lane_map, pos + 1,
                )
            else:
                from ..ops.attention import self_attention_int8_lanes

                attn_h = self_attention_int8_lanes(
                    qh_self, kp, kps, vp, vps, lane_map, pos + 1,
                    interpret=(mode == "interpret"),
                )
            attn = attn_h.transpose(0, 2, 1, 3).reshape(
                b, t, dims.n_text_state)
        elif quant_cache:
            kq_new, ks_new = _quantize_kv_rows(k, n_head)   # (B,H,t,Dh)
            vq_new, vs_new = _quantize_kv_rows(v, n_head)
            cache = {
                "k_q": jax.lax.dynamic_update_slice(
                    cache["k_q"], kq_new[None], (li, 0, 0, pos, 0)),
                "k_s": jax.lax.dynamic_update_slice(
                    cache["k_s"], ks_new[None], (li, 0, 0, pos)),
                "v_q": jax.lax.dynamic_update_slice(
                    cache["v_q"], vq_new[None], (li, 0, 0, pos, 0)),
                "v_s": jax.lax.dynamic_update_slice(
                    cache["v_s"], vs_new[None], (li, 0, 0, pos)),
            }
            qh_self = q.reshape(
                b, t, n_head, dims.n_text_state // n_head
            ).transpose(0, 2, 1, 3)
            mode = _pallas_mode()
            if t == 1 and mode != "off":
                from ..ops.attention import self_attention_int8

                attn_h = self_attention_int8(
                    qh_self, _ds(cache["k_q"], li), _ds(cache["k_s"], li),
                    _ds(cache["v_q"], li), _ds(cache["v_s"], li),
                    pos + 1, interpret=(mode == "interpret"),
                )
            else:
                from ..ops.attention import self_attention_int8_xla

                attn_h = self_attention_int8_xla(
                    qh_self, _ds(cache["k_q"], li), _ds(cache["k_s"], li),
                    _ds(cache["v_q"], li), _ds(cache["v_s"], li),
                    attn_mask[None, None],
                )
            attn = attn_h.transpose(0, 2, 1, 3).reshape(
                b, t, dims.n_text_state)
        else:
            cache = {
                "k": _dus(cache["k"], k, li),
                "v": _dus(cache["v"], v, li),
            }
            attn = mha(
                q,
                _ds(cache["k"], li).astype(q.dtype),
                _ds(cache["v"], li).astype(q.dtype),
                n_head,
                mask=attn_mask[None, None],
            )
        x = x + linear(attn, block["attn"]["out"])
        # cross-attention over head-major precomputed K/V (no transposes)
        h = layer_norm(x, block["cross_ln"])
        cq = linear(h, block["cross"]["q"])
        bq, tq, dd = cq.shape
        if beam > 1:
            # (B*K, 1, D) → (B, H, K, Dh): beams ride the query-seq axis
            # so K rows share one cross-KV read (and deepen the skinny
            # tq=1 MXU shape for free)
            assert tq == 1, "beam-shared cross-attention is single-step"
            qh = cq.reshape(bq // beam, beam, n_head, dd // n_head)
            qh = qh.transpose(0, 2, 1, 3)
        else:
            qh = cq.reshape(bq, tq, n_head, dd // n_head).transpose(0, 2, 1, 3)
        if "k_q" in ckv:  # int8 K/V via the Pallas kernel
            mode = _pallas_mode()
            if mode == "off":
                from ..ops.attention import cross_attention_int8_xla

                cattn = cross_attention_int8_xla(
                    qh, ckv["k_q"], ckv["v_q"],
                    ckv["k_scale"], ckv["v_scale"],
                    seq_len=dims.n_audio_ctx,
                )
            else:
                from ..ops.attention import cross_attention_int8, cross_attention_s8

                import os as _os

                _xk = (cross_attention_s8
                       if _os.environ.get("TWW_CROSS_S8") == "1"
                       else cross_attention_int8)
                cattn = _xk(
                    qh, ckv["k_q"], ckv["v_q"],
                    ckv["k_scale"], ckv["v_scale"],
                    seq_len=dims.n_audio_ctx,
                    interpret=(mode == "interpret"),
                )
        else:
            ck_h = ckv["k"].astype(cq.dtype)      # (B, H, Tk, Dh)
            cv_h = ckv["v"].astype(cq.dtype)
            clogits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, ck_h,
                preferred_element_type=jnp.float32,
            ) * ((dd // n_head) ** -0.5)
            cw = jax.nn.softmax(clogits, axis=-1).astype(cq.dtype)
            cattn = jnp.einsum("bhqk,bhkd->bhqd", cw, cv_h)
        # beam>1: (B, H, K, Dh) → (B·K, 1, D); else (B, H, T, Dh) → (B, T, D)
        cattn = cattn.transpose(0, 2, 1, 3).reshape(bq, tq, dd)
        x = x + linear(cattn, block["cross"]["out"])
        x = _mlp_block(x, block)
        return (x, cache), None

    # t==1 decode steps fully unroll the (shallow: 4 for turbo) layer
    # loop: the per-iteration scan overhead is pure latency on a
    # single-token step and unrolling lets XLA schedule across layers;
    # prefill/teacher-forcing keeps the rolled scan (program size).
    (x, new_cache), _ = jax.lax.scan(
        body,
        (x, kv_cache),
        (dec["blocks"], cross_kv, jnp.arange(dims.n_text_layer)),
        unroll=dims.n_text_layer if t == 1 else 1,
    )
    x = layer_norm(x, dec["ln"])
    logits = jnp.einsum(
        "btd,vd->btv", x, dec["token_emb"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, (new_cache if use_cache else None)


def forward(params: Params, dims: WhisperDims, mel: jax.Array, tokens: jax.Array):
    """Full teacher-forced forward: (mel, tokens) → logits. Test/entry path."""
    audio = encoder_forward(params, dims, mel)
    cross_kv = precompute_cross_kv(params, dims, audio)
    logits, _ = decoder_forward(params, dims, tokens, cross_kv)
    return logits


def cast_params(params: Params, dtype) -> Params:
    """Cast all floating-point leaves (LN stays accurate via f32 compute)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, params)


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
