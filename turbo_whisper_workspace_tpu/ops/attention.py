"""Pallas TPU attention kernels.

The reference's attention runs inside torch/cuDNN (Whisper forward at
vocalis/core/audio_pipeline.py:195-200). Here the encoder's self-attention
— the single biggest HBM consumer in the whole pipeline (a materialized
B·H·1500·1500 f32 score tensor is ~6 GB per direction at batch 32) — is
a first-party Pallas kernel.

Design for Whisper's shape regime (T ≤ 1536, D = 64): the ENTIRE K and V
for one (batch, head) fit comfortably in VMEM (192 KB each), so instead
of the classic multi-pass online-softmax flash attention we run a
**one-pass kernel**: each grid step loads a Q block plus full K/V, forms
the (BQ, T) scores in VMEM, softmaxes in f32, and writes only the (BQ, D)
output — the score matrix never touches HBM. Grid = (B·H, T/BQ).
Padding to a 128-lane multiple is masked with an iota comparison.

For decode-time shapes (tq = 1) the einsum path is already
bandwidth-optimal, so models/whisper.py routes only long-sequence
non-causal self-attention here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _one_pass_kernel(q_ref, kt_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0]                       # (BQ, D)
    kt = kt_ref[0]                     # (D, Tpad) — pre-transposed K
    v = v_ref[0]                       # (Tpad, D)
    # scale folds in log2(e): softmax via exp2, the cheaper transcendental
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # (BQ, Tpad) f32, lives in VMEM only
    if seq_len < v.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    w = (p * pl.reciprocal(s, approx=False)).astype(v.dtype)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jax.Array,      # (B, H, T, D)
    k: jax.Array,      # (B, H, T, D)
    v: jax.Array,
    block_q: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal full attention, softmax in f32. Returns (B, H, T, D)."""
    import math

    b, h, t, d = q.shape
    scale = (d**-0.5) * math.log2(math.e)
    tpad = -(-t // 128) * 128
    if tpad != t:
        pad = [(0, 0), (0, 0), (0, tpad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bq = min(block_q, tpad)
    if tpad % bq:
        bq = tpad
    qf = q.reshape(b * h, tpad, d)
    ktf = k.reshape(b * h, tpad, d).transpose(0, 2, 1)  # (BH, D, Tpad)
    vf = v.reshape(b * h, tpad, d)

    grid = (b * h, tpad // bq)
    out = pl.pallas_call(
        functools.partial(_one_pass_kernel, seq_len=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, tpad, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, i: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, tpad), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tpad, d), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, i: (bh, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tpad * tpad * d,
            bytes_accessed=(3 * b * h * tpad * d * 2 + b * h * tpad * d * 2),
            transcendentals=b * h * tpad * tpad,
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    out = out.reshape(b, h, tpad, d)
    return out[:, :, :t] if tpad != t else out


def _cross_int8_kernel(q_ref, kq_ref, vq_ref, ks_ref, vs_ref, o_ref,
                       *, seq_len: int, scale: float):
    """Decode-time cross-attention over int8 K/V for ONE batch element.

    Blocks: q (H, Tq, Dh) bf16 — Tq is 1 for greedy decode and the beam
    width for beam search (all K beams of a batch row share ONE KV read);
    kq/vq (H, Dh, Tpad) int8 (transposed so the int8 lane dim is T, a
    128-multiple); ks/vs (H, 1) f32 per-head scales. Scales are scalars
    per head, so they commute out of the matmuls: K's into q, V's onto
    the output — the int8 payload is only ever cast, never multiplied
    elementwise.
    """
    q = q_ref[0].astype(jnp.float32)               # (H, Tq, Dh)
    kq = kq_ref[0].astype(jnp.bfloat16)            # (H, Dh, Tpad)
    vq = vq_ref[0].astype(jnp.bfloat16)
    ks = ks_ref[0]                                 # (H, 1)
    vs = vs_ref[0]
    qs = (q * (ks[:, :, None] * scale)).astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        qs, kq, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (H, Tq, Tpad)
    if seq_len < kq.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = (p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False))
    out = jax.lax.dot_general(
        w.astype(jnp.bfloat16), vq, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (H, Tq, Dh)
    o_ref[0] = (out * vs[:, :, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "interpret"))
def cross_attention_int8(
    q: jax.Array,        # (B, H, Tq, Dh) activation dtype (Tq = 1 or beam K)
    kq: jax.Array,       # (B, H, Dh, Tpad) int8
    vq: jax.Array,       # (B, H, Dh, Tpad) int8
    k_scale: jax.Array,  # (B, H) f32
    v_scale: jax.Array,  # (B, H) f32
    seq_len: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode-step cross-attention reading quantized K/V (half the HBM
    traffic of bf16 — the dominant decode-step cost). Returns (B, H, Tq, Dh)."""
    import math

    b, h, one, dh = q.shape
    tpad = kq.shape[-1]
    seq_len = seq_len if seq_len is not None else tpad
    scale = (dh**-0.5) * math.log2(math.e)
    out = pl.pallas_call(
        functools.partial(_cross_int8_kernel, seq_len=seq_len, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, one, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, one, dh), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, dh, tpad), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, dh, tpad), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, one, dh), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * one * tpad * dh,
            bytes_accessed=2 * b * h * dh * tpad + 2 * b * h * one * dh * 2,
            transcendentals=b * h * one * tpad,
        ),
        interpret=interpret,
    )(q, kq, vq, k_scale[..., None], v_scale[..., None])
    return out


def _self_int8_kernel(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
                      *, scale: float):
    """Decode-time SELF-attention over the quantized KV cache for ONE
    beam/batch row. Unlike the cross kernel, scales vary per (head,
    position) — K's multiply the score columns, V's the attention
    weights — and the valid key length is DYNAMIC (scalar-prefetched
    `len_ref`): positions ≥ len are masked.

    Blocks: q (H, Tq, Dh) bf16; kq/vq (H, T, Dh) int8; ks/vs (H, T).
    Reading the int8 payload directly in-kernel avoids the bf16
    dequant materialization XLA emits for the einsum path (measured
    1.3 ms/step of pure convert traffic at beam-5 batch 32)."""
    valid = len_ref[0]
    q = q_ref[0]                                    # (H, Tq, Dh) bf16
    kq = kq_ref[0].astype(jnp.bfloat16)             # (H, T, Dh)
    vq = vq_ref[0].astype(jnp.bfloat16)
    ks = ks_ref[0].astype(jnp.float32)              # (H, T)
    vs = vs_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, kq, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # (H, Tq, T)
    scores = scores * (ks[:, None, :] * scale)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(col < valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False)
    w = (w * vs[:, None, :]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        w, vq, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # (H, Tq, Dh)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_int8(
    q: jax.Array,         # (B, H, Tq, Dh) bf16
    kq: jax.Array,        # (B, H, T, Dh) int8
    ks: jax.Array,        # (B, H, T) scales
    vq: jax.Array,        # (B, H, T, Dh) int8
    vs: jax.Array,        # (B, H, T)
    valid_len,            # scalar int32: keys at positions < valid_len count
    interpret: bool = False,
) -> jax.Array:
    """Single-step decode self-attention over the int8 cache.
    Returns (B, H, Tq, Dh) in q's dtype."""
    import math

    b, h, tq, dh = q.shape
    t = kq.shape[2]
    scale = (dh**-0.5) * math.log2(math.e)
    vl = jnp.full((1,), valid_len, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, tq, dh), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, t, dh), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, t), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, h, t, dh), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, t), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, tq, dh), lambda i, *_: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_self_int8_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * t * dh,
            bytes_accessed=2 * b * h * t * dh + 2 * b * h * tq * dh * 2,
            transcendentals=b * h * tq * t,
        ),
        interpret=interpret,
    )(vl, q, kq, ks, vq, vs)


def _self_int8_lanes_kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                            bias_ref, o_ref, *, scale: float):
    """Beam-decode SELF-attention over an UN-reordered ("lane") KV cache
    for ONE batch element.

    Beam search classically reorders the whole self-KV cache every step
    to match the surviving hypotheses — at beam 5 / batch 32 that
    read+write was the single largest decode-step cost (~430 MB/step,
    scripts/profile_beam_ops.py). Here the cache is never moved: lane l
    permanently holds whatever hypothesis occupied beam slot l when each
    position was written, and a tiny (K, T) int32 `lane_map` records, for
    the CURRENT beam k, which lane owns position t. The kernel computes
    scores against ALL K lanes (K× more MXU flops — nanoseconds at these
    shapes) and keeps exactly the (lane == lane_map[k, t]) entries, so
    HBM sees one contiguous read of the cache and zero reorder traffic.

    Blocks: q (H, K, Dh) bf16 — beams ride the query axis; kq/vq
    (H, K·T, Dh) int8 (lane-major: lane l occupies rows [l·T, (l+1)·T));
    ks/vs (H, K·T) scales; bias (K, K·T) f32 additive mask encoding BOTH
    the lane selection (lane == lane_map[k, t]) and the valid-length
    cut, built host-of-kernel in XLA (Mosaic cannot split the
    non-128-multiple K·T minor dim in-kernel)."""
    q = q_ref[0]                                    # (H, K, Dh)
    kq = kq_ref[0].astype(jnp.bfloat16)             # (H, K*T, Dh)
    vq = vq_ref[0].astype(jnp.bfloat16)
    ks = ks_ref[0].astype(jnp.float32)              # (H, K*T)
    vs = vs_ref[0].astype(jnp.float32)
    bias = bias_ref[0]                              # (K, K*T) f32
    scores = jax.lax.dot_general(
        q, kq, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # (H, K, K*T)
    scores = scores * (ks[:, None, :] * scale) + bias[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False)
    w = (w * vs[:, None, :]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        w, vq, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # (H, K, Dh)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_int8_lanes(
    q: jax.Array,         # (B, H, K, Dh) bf16 — beam queries
    kq: jax.Array,        # (B, H, K, T, Dh) int8 lane cache
    ks: jax.Array,        # (B, H, K, T) scales
    vq: jax.Array,        # (B, H, K, T, Dh) int8
    vs: jax.Array,        # (B, H, K, T)
    lane_map: jax.Array,  # (B, K, T) int32
    valid_len,            # scalar int32
    interpret: bool = False,
) -> jax.Array:
    """Beam-decode self-attention over the un-reordered lane cache.
    Returns (B, H, K, Dh) in q's dtype."""
    import math

    b, h, k, dh = q.shape
    t = kq.shape[3]
    scale = (dh**-0.5) * math.log2(math.e)
    kqf = kq.reshape(b, h, k * t, dh)
    vqf = vq.reshape(b, h, k * t, dh)
    ksf = ks.reshape(b, h, k * t)
    vsf = vs.reshape(b, h, k * t)
    # additive lane-selection + valid-length mask, flat (B, K, K·T):
    # ~0.4 MB at beam-5 batch 32 — noise next to the cache read it gates
    lane_id = jnp.arange(k, dtype=jnp.int32)[None, None, :, None]
    pos_id = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
    keep = (lane_map[:, :, None, :] == lane_id) & (pos_id < valid_len)
    bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32).reshape(
        b, k, k * t)
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, k, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, k * t, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, k * t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, k * t, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, k * t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, k * t), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, k, dh), lambda i: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_self_int8_lanes_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, k, dh), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * k * k * t * dh,
            bytes_accessed=2 * b * h * k * t * dh + 4 * b * h * k * dh,
            transcendentals=b * h * k * k * t,
        ),
        interpret=interpret,
    )(q, kqf, ksf, vqf, vsf, bias)


def self_attention_int8_lanes_xla(
    q: jax.Array,         # (B, H, K, Dh)
    kq: jax.Array,        # (B, H, K, T, Dh) int8 lane cache
    ks: jax.Array,        # (B, H, K, T)
    vq: jax.Array,        # (B, H, K, T, Dh) int8
    vs: jax.Array,        # (B, H, K, T)
    lane_map: jax.Array,  # (B, K, T) int32
    valid_len,            # scalar int32
) -> jax.Array:
    """Plain-XLA twin of the lane kernel (CPU fallback / test oracle)."""
    b, h, k, dh = q.shape
    t = kq.shape[3]
    scale = dh**-0.5
    scores = jnp.einsum(
        "bhkd,bhltd->bhklt", q, kq.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (ks.astype(jnp.float32)[:, :, None] * scale)
    lane_id = jnp.arange(k)[None, :, None]
    pos_id = jnp.arange(t)[None, None, :]
    keep = (lane_id == lane_map[..., None, :]) & (pos_id < valid_len)
    scores = jnp.where(keep[:, None], scores, NEG_INF)
    flat = scores.reshape(b, h, k, k * t)
    w = jax.nn.softmax(flat, axis=-1).reshape(b, h, k, k, t)
    w = (w * vs.astype(jnp.float32)[:, :, None]).astype(q.dtype)
    return jnp.einsum("bhklt,bhltd->bhkd", w, vq.astype(q.dtype))


def self_attention_int8_xla(
    q: jax.Array,         # (B, H, Tq, Dh)
    kq: jax.Array,        # (B, H, T, Dh) int8
    ks: jax.Array,        # (B, H, T)
    vq: jax.Array,        # (B, H, T, Dh) int8
    vs: jax.Array,        # (B, H, T)
    mask: jax.Array,      # broadcastable to (B, H, Tq, T)
) -> jax.Array:
    """Plain-XLA twin (CPU fallback / prefill with causal mask / kernel
    test oracle). Same math as the Pallas kernel."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kq.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (ks.astype(jnp.float32)[:, :, None, :] * scale)
    logits = jnp.where(mask, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = (weights * vs.astype(jnp.float32)[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, vq.astype(q.dtype))


def quantize_cross_kv_int8(k: jax.Array, v: jax.Array):
    """(L, B, H, T, Dh) bf16 K/V → transposed int8 + per-(L,B,H) scales,
    T padded to a 128 multiple for int8 lane tiling."""
    l, b, h, t, dh = k.shape
    tpad = -(-t // 128) * 128

    def quant(x):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(-2, -1)) / 127.0
        s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[..., None, None]), -127, 127
        ).astype(jnp.int8)
        xq = xq.transpose(0, 1, 2, 4, 3)           # (L,B,H,Dh,T)
        if tpad != t:
            xq = jnp.pad(xq, ((0, 0),) * 4 + ((0, tpad - t),))
        return xq, s.astype(jnp.float32)

    kq, ks = quant(k)
    vq, vs = quant(v)
    # seq_len is NOT stored: it equals dims.n_audio_ctx (static) at every
    # call site, and pytree leaves must all be arrays (beam tiling maps
    # jnp.repeat over them)
    return {"k_q": kq, "v_q": vq, "k_scale": ks, "v_scale": vs}


@functools.partial(jax.jit, static_argnames=("seq_len",))
def cross_attention_int8_xla(
    q: jax.Array,        # (B, H, 1, Dh)
    kq: jax.Array,       # (B, H, Dh, Tpad) int8
    vq: jax.Array,       # (B, H, Dh, Tpad) int8
    k_scale: jax.Array,  # (B, H) f32
    v_scale: jax.Array,  # (B, H) f32
    seq_len: int | None = None,
) -> jax.Array:
    """Plain-XLA twin of cross_attention_int8 — same math, no Pallas.

    Used off-TPU (interpret-mode Pallas at every decode step is
    pathologically slow on CPU) and as the oracle in kernel tests."""
    import math

    b, h, one, dh = q.shape
    tpad = kq.shape[-1]
    seq_len = seq_len if seq_len is not None else tpad
    scale = dh**-0.5
    qs = (q.astype(jnp.float32) * (k_scale[:, :, None, None] * scale)).astype(
        jnp.bfloat16
    )
    scores = jnp.einsum(
        "bhqd,bhdt->bhqt", qs, kq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if seq_len < tpad:
        col = jnp.arange(tpad)
        scores = jnp.where(col[None, None, None] < seq_len, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhqt,bhdt->bhqd", w, vq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (out * v_scale[:, :, None, None]).astype(q.dtype)


def attention_reference(q, k, v):
    """Naive einsum oracle for kernel tests."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)
