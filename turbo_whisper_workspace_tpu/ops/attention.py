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


def _bd_expand(q, n_head: int, d_full: int):
    """(M, Dh) compact queries → (M, D=H·Dh) block-diagonal, in VMEM.

    Row m belongs to head m // (M/H); its Dh values land in that head's
    column block, zeros elsewhere. Built as one tiny matmul with the
    static tile matrix T[d, c] = (c mod Dh == d) followed by the static
    block mask — no HBM traffic (the naive XLA-side eye-einsum build
    materialized 16 MB per call and dominated the kernel's runtime)."""
    m_rows, dh = q.shape
    per_head = m_rows // n_head
    di = jax.lax.broadcasted_iota(jnp.int32, (dh, d_full), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (dh, d_full), 1)
    tile = (ci % dh == di).astype(q.dtype)            # (Dh, D)
    q_exp = jax.lax.dot_general(
        q, tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)                                 # (M, D)
    ri = jax.lax.broadcasted_iota(jnp.int32, (m_rows, d_full), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (m_rows, d_full), 1)
    blk = (ri // per_head == cj // dh)
    return jnp.where(blk, q_exp, jnp.zeros_like(q_exp))


def _bd_extract(full, n_head: int, dh: int):
    """(M, D) block-diag output → (M, Dh) compact: keep each row's own
    head block and fold it back to Dh columns with the tile matmul."""
    m_rows, d_full = full.shape
    per_head = m_rows // n_head
    ri = jax.lax.broadcasted_iota(jnp.int32, (m_rows, d_full), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (m_rows, d_full), 1)
    blk = ri // per_head == cj // dh
    masked = jnp.where(blk, full, jnp.zeros_like(full))
    di = jax.lax.broadcasted_iota(jnp.int32, (dh, d_full), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (dh, d_full), 1)
    tile = (ci % dh == di).astype(masked.dtype)       # (Dh, D)
    return jax.lax.dot_general(
        masked, tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (M, Dh)


def _bd_attn_int8_kernel(q_ref, kq_ref, vq_ref, o_ref, *, seq_len: int,
                         n_head: int):
    """Block-diagonal decode attention over int8 K/V for ONE batch
    element — the tiny-M problem solved the MXU way.

    Decode-step attention is per-(batch, head) with M = beam-width(≤5)
    query rows: issuing B·H separate (5×64)·(64×1536) matmuls leaves the
    MXU >95% idle and measured ~2.2 ms/step (scripts/
    profile_decoder_step.py). Instead the caller packs all H heads'
    queries into ONE block-diagonal (H·Tq, H·Dh) matrix (row h·Tq+t is
    zero outside head h's Dh-column block), so the whole step is two
    DENSE matmuls against the flattened panels:

        scores = Qblk (M, D) · K (D, Tpad)      M = H·Tq, D = H·Dh
        out    = softmax(scores) · V (Tpad, D)

    Cross-head score terms are killed by the zero blocks in Qblk; the
    (M, D) output contains cross-head garbage OUTSIDE each row's own
    head block, and the caller selects the diagonal blocks (cheap XLA
    gather on a tiny array). ~20× more MXU flops — which converts a
    latency-bound op into a bandwidth-bound one and measures ~3× faster.

    K/V scale handling is the caller's: fold per-head k-scales into
    the compact q rows, apply v-scales to the compact output (cross),
    or pre/post-multiply score columns (self — per-position scales).

    The block-diagonal expansion of q and the diagonal extraction of
    the output happen IN VMEM (_bd_expand/_bd_extract): HBM sees only
    the compact (M, Dh) query/output and the int8 panels.
    """
    qc = q_ref[0]                                  # (M, Dh) bf16 compact
    kq = kq_ref[0].astype(jnp.bfloat16)            # (D, Tpad)
    vq = vq_ref[0].astype(jnp.bfloat16)            # (Tpad, D)
    qb = _bd_expand(qc, n_head, kq.shape[0])       # (M, D)
    scores = jax.lax.dot_general(
        qb, kq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (M, Tpad)
    if seq_len < kq.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = (p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False))
    full = jax.lax.dot_general(
        w.astype(jnp.bfloat16), vq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (M, D)
    o_ref[0] = _bd_extract(full, n_head,
                           qc.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "interpret"))
def cross_attention_int8(
    q: jax.Array,        # (B, H, Tq, Dh) activation dtype (Tq = 1 or beam K)
    kq: jax.Array,       # (B, H, Dh, Tpad) int8  (viewed flat (B, H·Dh, Tpad))
    vq: jax.Array,       # (B, Tpad, H·Dh) int8
    k_scale: jax.Array,  # (B, H) f32
    v_scale: jax.Array,  # (B, H) f32
    seq_len: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode-step cross-attention reading quantized K/V (half the HBM
    traffic of bf16) through the block-diagonal kernel.
    Returns (B, H, Tq, Dh)."""
    import math

    b, h, tq, dh = q.shape
    tpad = kq.shape[-1]
    seq_len = seq_len if seq_len is not None else tpad
    scale = (dh**-0.5) * math.log2(math.e)
    # per-head k-scales are scalars: fold into the (compact) query rows
    qs = (q.astype(jnp.float32)
          * (k_scale[:, :, None, None] * scale)).astype(jnp.bfloat16)
    qc = qs.reshape(b, h * tq, dh)                 # compact (B, M, Dh)
    kqf = kq.reshape(b, h * dh, tpad)
    m, d = h * tq, h * dh
    out = pl.pallas_call(
        functools.partial(_bd_attn_int8_kernel, seq_len=seq_len, n_head=h),
        out_shape=jax.ShapeDtypeStruct((b, m, dh), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, tpad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tpad, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * m * tpad * d,
            bytes_accessed=2 * b * d * tpad + b * m * dh * (2 + 4),
            transcendentals=b * m * tpad,
        ),
        interpret=interpret,
    )(qc, kqf, vq)
    out = out.reshape(b, h, tq, dh)  # f32 out of the kernel: v_scale
    # multiplies in f32, single bf16 rounding at the very end
    return (out * v_scale[:, :, None, None]).astype(q.dtype)


def _bd_attn_s8_kernel(q_ref, kq_ref, vq_ref, o_ref, *, seq_len: int,
                       n_head: int):
    """s8×s8 variant of the block-diagonal decode cross-attention
    (EXPERIMENTAL, opt-in via TWW_CROSS_S8): the int8 K/V panels feed
    the MXU's native s8×s8 path directly instead of being cast to bf16
    in VMEM first. profile_decoder_step measured the shipping kernel at
    2.30 ms/step vs a 0.6 ms HBM floor — the ~494 MB/step int8→bf16
    cast is the bottleneck (docs/KERNELS.md). Queries are quantized per
    row (symmetric, after the block-diagonal expansion so zero blocks
    stay zero); softmax weights quantize at a fixed 7-bit scale (they
    live in [0, 1]). Adds ~0.5-1% attention-output noise vs the bf16
    dequant kernel."""
    qc = q_ref[0]                                  # (M, Dh) bf16 compact
    d_full = kq_ref.shape[1]
    qb = _bd_expand(qc, n_head, d_full)            # (M, D)
    qf = qb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qs = jnp.maximum(amax, 1e-30) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    scores_i = jax.lax.dot_general(
        q8, kq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                              # (M, Tpad)
    scores = scores_i.astype(jnp.float32) * qs
    if seq_len < scores.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False)
    # per-row scaling keeps precision when attention is diffuse (a fixed
    # 1/127 scale truncates near-uniform rows to zero)
    wmax = jnp.max(w, axis=-1, keepdims=True)
    wscale = jnp.maximum(wmax, 1e-30) / 127.0
    w8 = jnp.round(w / wscale).astype(jnp.int8)
    full_i = jax.lax.dot_general(
        w8, vq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                              # (M, D)
    full = full_i.astype(jnp.float32) * wscale
    o_ref[0] = _bd_extract(full, n_head, qc.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "interpret"))
def cross_attention_s8(
    q: jax.Array,        # (B, H, Tq, Dh)
    kq: jax.Array,       # (B, H, Dh, Tpad) int8
    vq: jax.Array,       # (B, Tpad, H·Dh) int8
    k_scale: jax.Array,  # (B, H) f32
    v_scale: jax.Array,  # (B, H) f32
    seq_len: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode-step cross-attention on the native s8×s8 MXU path
    (opt-in twin of cross_attention_int8; see _bd_attn_s8_kernel)."""
    import math

    b, h, tq, dh = q.shape
    tpad = kq.shape[-1]
    seq_len = seq_len if seq_len is not None else tpad
    scale = (dh**-0.5) * math.log2(math.e)
    qs = (q.astype(jnp.float32)
          * (k_scale[:, :, None, None] * scale)).astype(jnp.bfloat16)
    qc = qs.reshape(b, h * tq, dh)
    kqf = kq.reshape(b, h * dh, tpad)
    m, d = h * tq, h * dh
    out = pl.pallas_call(
        functools.partial(_bd_attn_s8_kernel, seq_len=seq_len, n_head=h),
        out_shape=jax.ShapeDtypeStruct((b, m, dh), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, tpad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tpad, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * m * tpad * d,
            bytes_accessed=2 * b * d * tpad + b * m * dh * (2 + 4),
            transcendentals=b * m * tpad,
        ),
        interpret=interpret,
    )(qc, kqf, vq)
    out = out.reshape(b, h, tq, dh)
    return (out * v_scale[:, :, None, None]).astype(q.dtype)


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


def _bd_self_int8_kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                         bias_ref, o_ref, *, scale: float, n_head: int):
    """Beam-decode SELF-attention over an UN-reordered ("lane") KV cache
    for ONE batch element, as ONE block-diagonal matmul pair.

    Beam search classically reorders the whole self-KV cache every step
    to match the surviving hypotheses — at beam 5 / batch 32 that
    read+write was the single largest beam-only cost (~430 MB/step).
    Here the cache is never moved: lane l permanently holds whatever
    hypothesis occupied beam slot l when each position was written, and
    a (K, T) int32 lane_map (encoded into `bias` by the caller) records
    which lane owns each position for the current beams. Scores are
    computed against ALL K lanes and non-owned entries are -inf'd.

    Like the cross kernel, the tiny per-(head) matmuls are packed into
    one dense pair via a block-diagonal query (see _bd_attn_int8_kernel):

        scores = Qblk (H·K, H·Dh) · Kpanel (H·Dh, K·T)
        out    = softmax(scores·ks + bias)·vs · Vpanel (K·T, H·Dh)

    ks/vs are per-(head, position) so they multiply score columns,
    broadcast over each head's K query rows; bias carries lane-selection
    + valid-length masking, broadcast over heads.
    """
    qc = q_ref[0]                                   # (H·K, Dh) bf16 compact
    kq = kq_ref[0].astype(jnp.bfloat16)             # (H·Dh, K·T)
    vq = vq_ref[0].astype(jnp.bfloat16)             # (K·T, H·Dh)
    ks = ks_ref[0].astype(jnp.float32)              # (H, K·T)
    vs = vs_ref[0].astype(jnp.float32)
    bias = bias_ref[0]                              # (K, K·T) f32
    mkt = kq.shape[-1]
    m_rows = qc.shape[0]
    k_beams = m_rows // n_head
    qb = _bd_expand(qc, n_head, kq.shape[0])        # (M, D) in VMEM
    scores = jax.lax.dot_general(
        qb, kq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (H·K, K·T)
    # Per-(head, position) scales and per-(beam) bias must reach row
    # (h·K + k): Mosaic can't reshape (M, K·T)↔(H, K, K·T), so expand
    # them to (M, K·T) with static 0/1 row-map MATMULS (row→head is
    # iota//K, row→beam is iota%K) — three ~3 MFLOP dots in VMEM.
    row = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_head), 0)
    hid = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_head), 1)
    r_head = (row // k_beams == hid).astype(jnp.float32)     # (M, H)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (m_rows, k_beams), 0)
    kid = jax.lax.broadcasted_iota(jnp.int32, (m_rows, k_beams), 1)
    r_beam = (rowb % k_beams == kid).astype(jnp.float32)     # (M, K)
    ks_exp = jax.lax.dot_general(
        r_head, ks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (M, K·T)
    vs_exp = jax.lax.dot_general(
        r_head, vs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bias_exp = jax.lax.dot_general(
        r_beam, bias, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores * (ks_exp * scale) + bias_exp
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    w = p * pl.reciprocal(jnp.sum(p, -1, keepdims=True), approx=False)
    w = (w * vs_exp).astype(jnp.bfloat16)
    full = jax.lax.dot_general(
        w, vq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (H·K, H·Dh)
    o_ref[0] = _bd_extract(full, n_head,
                           qc.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_int8_lanes(
    q: jax.Array,         # (B, H, K, Dh) bf16 — beam queries
    kq: jax.Array,        # (B, H·Dh, K·T) int8 lane cache (K panel)
    ks: jax.Array,        # (B, H, K·T) scales
    vq: jax.Array,        # (B, K·T, H·Dh) int8 (V panel)
    vs: jax.Array,        # (B, H, K·T)
    lane_map: jax.Array,  # (B, K, T) int32
    valid_len,            # scalar int32
    interpret: bool = False,
) -> jax.Array:
    """Beam-decode self-attention over the un-reordered lane cache.
    Returns (B, H, K, Dh) in q's dtype."""
    import math

    b, h, k, dh = q.shape
    kt = kq.shape[-1]
    t = kt // k
    scale = (dh**-0.5) * math.log2(math.e)
    qc = q.astype(jnp.bfloat16).reshape(b, h * k, dh)  # compact (B, M, Dh)
    # additive lane-selection + valid-length mask, flat (B, K, K·T):
    # ~0.4 MB at beam-5 batch 32 — noise next to the cache read it gates
    lane_id = jnp.arange(k, dtype=jnp.int32)[None, None, :, None]
    pos_id = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
    keep = (lane_map[:, :, None, :] == lane_id) & (pos_id < valid_len)
    bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32).reshape(
        b, k, kt)
    m, d = h * k, h * dh
    out = pl.pallas_call(
        functools.partial(_bd_self_int8_kernel, scale=scale, n_head=h),
        out_shape=jax.ShapeDtypeStruct((b, m, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d, kt), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, kt), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, kt, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, kt), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, k, kt), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * m * kt * d,
            bytes_accessed=2 * b * d * kt + 2 * b * m * dh * 2,
            transcendentals=b * m * kt,
        ),
        interpret=interpret,
    )(qc, kq, ks, vq, vs, bias)
    return out.astype(q.dtype).reshape(b, h, k, dh)


def self_attention_int8_lanes_xla(
    q: jax.Array,         # (B, H, K, Dh)
    kq: jax.Array,        # (B, H·Dh, K·T) int8 lane cache
    ks: jax.Array,        # (B, H, K·T)
    vq: jax.Array,        # (B, K·T, H·Dh) int8
    vs: jax.Array,        # (B, H, K·T)
    lane_map: jax.Array,  # (B, K, T) int32
    valid_len,            # scalar int32
) -> jax.Array:
    """Plain-XLA twin of the lane kernel (CPU fallback / test oracle)."""
    b, h, k, dh = q.shape
    kt = kq.shape[-1]
    t = kt // k
    scale = dh**-0.5
    kh = kq.reshape(b, h, dh, kt).astype(q.dtype)
    scores = jnp.einsum(
        "bhkd,bhdj->bhkj", q, kh,
        preferred_element_type=jnp.float32,
    ) * (ks.astype(jnp.float32)[:, :, None] * scale)
    lane_id = jnp.arange(k)[None, :, None]
    pos_id = jnp.arange(t)[None, None, :]
    keep = ((lane_id == lane_map[..., None, :]) & (pos_id < valid_len)
            ).reshape(b, k, kt)
    scores = jnp.where(keep[:, None], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    w = (w * vs.astype(jnp.float32)[:, :, None]).astype(q.dtype)
    vh = vq.reshape(b, kt, h, dh).astype(q.dtype)
    return jnp.einsum("bhkj,bjhd->bhkd", w, vh)


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
    """(L, B, H, T, Dh) bf16 K/V → int8 + per-(L,B,H) scales, T padded
    to a 128 multiple for int8 lane tiling. Layouts feed the
    block-diagonal kernel with zero transposes: K is (L,B,H,Dh,Tpad)
    (flattens to the (H·Dh, Tpad) score panel), V is (L,B,Tpad,H·Dh)
    (the (Tpad, H·Dh) output panel)."""
    l, b, h, t, dh = k.shape
    tpad = -(-t // 128) * 128

    def quant(x, to_v_layout):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(-2, -1)) / 127.0
        s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[..., None, None]), -127, 127
        ).astype(jnp.int8)
        if to_v_layout:                            # (L,B,T,H·Dh)
            xq = xq.transpose(0, 1, 3, 2, 4).reshape(l, b, t, h * dh)
            if tpad != t:
                xq = jnp.pad(xq, ((0, 0),) * 2 + ((0, tpad - t), (0, 0)))
        else:                                      # (L,B,H,Dh,Tpad)
            xq = xq.transpose(0, 1, 2, 4, 3)
            if tpad != t:
                xq = jnp.pad(xq, ((0, 0),) * 4 + ((0, tpad - t),))
        return xq, s.astype(jnp.float32)

    kq, ks = quant(k, False)
    vq, vs = quant(v, True)
    # seq_len is NOT stored: it equals dims.n_audio_ctx (static) at every
    # call site, and pytree leaves must all be arrays (beam tiling maps
    # jnp.repeat over them)
    return {"k_q": kq, "v_q": vq, "k_scale": ks, "v_scale": vs}


@functools.partial(jax.jit, static_argnames=("seq_len",))
def cross_attention_int8_xla(
    q: jax.Array,        # (B, H, Tq, Dh)
    kq: jax.Array,       # (B, H, Dh, Tpad) int8
    vq: jax.Array,       # (B, Tpad, H·Dh) int8
    k_scale: jax.Array,  # (B, H) f32
    v_scale: jax.Array,  # (B, H) f32
    seq_len: int | None = None,
) -> jax.Array:
    """Plain-XLA twin of cross_attention_int8 — same math, no Pallas.

    Used off-TPU (interpret-mode Pallas at every decode step is
    pathologically slow on CPU) and as the oracle in kernel tests."""
    b, h, tq, dh = q.shape
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
    vh = vq.reshape(b, tpad, h, dh).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhqt,bthd->bhqd", w, vh,
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
