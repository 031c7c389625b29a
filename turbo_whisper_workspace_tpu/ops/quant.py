"""Int8 weight-only quantization kernels.

The reference serves its LLM as a 4-bit GGUF through llama.cpp
(Hermes-3-8B Q4_K_M at vocalis/llm/llm_helper.py:67-73). The TPU-native
analog is symmetric per-output-channel int8: weights stream from HBM at
half the bf16 bytes and are dequantized inside a Pallas matmul kernel's
VMEM — the scale multiply fuses with the MXU feed, so a bandwidth-bound
decode step sees ~2× less weight traffic with no extra HBM round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jax.Array) -> dict:
    """(K, N) or layer-stacked (L, K, N) float → {"w_q": int8, "scale":
    f32 (N,) / (L, N)} — symmetric per-output-channel."""
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=-2) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(wf / np.expand_dims(scale, -2)), -127, 127)
    return {"w_q": jnp.asarray(q.astype(np.int8)),
            "scale": jnp.asarray(scale, np.float32)}


def _q_matmul_kernel(x_ref, wq_ref, scale_ref, o_ref):
    w = wq_ref[:].astype(jnp.bfloat16) * scale_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matmul(
    x: jax.Array,          # (M, K) bf16/f32
    w_q: jax.Array,        # (K, N) int8
    scale: jax.Array,      # (N,) f32
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(w_q) with in-kernel dequantization. Returns (M, N)."""
    m, k = x.shape
    _, n = w_q.shape
    bn = min(block_n, n)
    if n % bn:
        # pad N to the block multiple — falling back to bn = n would
        # stage the whole weight in VMEM (a 128k-vocab lm_head is
        # ~394 MB int8: 25x the VMEM)
        npad = -(-n // bn) * bn
        w_q = jnp.pad(w_q, ((0, 0), (0, npad - n)))
        scale = jnp.pad(scale, (0, npad - n))
        out = int8_matmul(x, w_q, scale, block_n=bn, interpret=interpret)
        return out[:, :n]
    grid = (n // bn,)
    out = pl.pallas_call(
        _q_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n))
    return out


# ---------------------------------------------------------------------------
# int4: the reference's Q4 operating point (Hermes-3-8B Q4_K_M through
# llama.cpp, vocalis/llm/llm_helper.py:67-73). Grouped symmetric 4-bit
# (group size 128 along K, like Q4 block scales): quarter the bf16 weight
# bytes for the bandwidth-bound LLM decode step.
#
# TPU-friendly packing: two int4 values share one int8 byte, with the
# LOW nibbles holding rows [0, K/2) and the HIGH nibbles rows [K/2, K).
# The kernel then never interleaves — it splits x into halves and runs
# two MXU matmuls (x_lo @ deq(low) + x_hi @ deq(high)); nibble extraction
# is two VPU shifts.

GROUP4 = 128


def quantize_int4(w: jax.Array, group: int = GROUP4) -> dict:
    """(K, N) or layer-stacked (L, K, N) float → {"w_q4": int8 (…, K/2, N)
    packed, "scale4": f32 (…, K/group, N)} — symmetric per-(group, col).

    K must be divisible by 2*group (holds for every Llama/Whisper
    projection at group 128)."""
    wf = np.asarray(w, np.float32)
    k = wf.shape[-2]
    if k % (2 * group):
        raise ValueError(f"K={k} not divisible by 2*group={2 * group}")
    gshape = wf.shape[:-2] + (k // group, group, wf.shape[-1])
    scale = np.abs(wf.reshape(gshape)).max(axis=-2) / 7.0   # (…, K/G, N)
    scale = np.maximum(scale, 1e-12)
    q = np.clip(
        np.round(wf.reshape(gshape) / scale[..., None, :]), -7, 7
    ).reshape(wf.shape).astype(np.int8)
    lo, hi = q[..., : k // 2, :], q[..., k // 2 :, :]
    packed = (lo & 0x0F) | (hi << 4)
    return {"w_q4": jnp.asarray(packed.astype(np.int8)),
            "scale4": jnp.asarray(scale, np.float32)}


def _dequant4_halves(wq, scale, k: int):
    """packed (K/2, N) int8 + scale (K/G, N) → (lo, hi) bf16 (K/2, N)."""
    w32 = wq.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(w32, 4)
    n_groups = scale.shape[-2]
    g = k // n_groups
    half_groups = n_groups // 2

    def scale_half(x, s):
        xg = x.reshape(half_groups, g, -1).astype(jnp.float32)
        return (xg * s[:, None, :]).reshape(k // 2, -1).astype(jnp.bfloat16)

    return (scale_half(lo, scale[:half_groups]),
            scale_half(hi, scale[half_groups:]))


def _q4_matmul_kernel(x_ref, wq_ref, scale_ref, o_ref, *, k: int):
    lo, hi = _dequant4_halves(wq_ref[:], scale_ref[:], k)
    x = x_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot(x[:, : k // 2], lo, preferred_element_type=jnp.float32)
    acc += jax.lax.dot(x[:, k // 2 :], hi, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int4_matmul(
    x: jax.Array,          # (M, K) bf16/f32
    w_q4: jax.Array,       # (K/2, N) int8 packed
    scale: jax.Array,      # (K/G, N) f32
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant4(w_q4) with in-kernel dequantization. Returns (M, N)."""
    m, k = x.shape
    n = w_q4.shape[-1]
    # VMEM budget: the in-kernel unpack holds int32 temporaries of the
    # (K/2, bn) weight block (~4.5 B/packed byte); at the 8B geometry
    # (K=14336) a 512-wide block blows the 16 MB scoped limit
    cap = max(128, ((8 << 20) // max(k // 2, 1) // 5) // 128 * 128)
    block_n = min(block_n, cap)
    bn = min(block_n, n)
    if n % bn:
        # pad N to the block multiple (see int8_matmul — bn = n would
        # stage the whole weight in VMEM for non-multiple vocab sizes)
        npad = -(-n // bn) * bn
        w_q4 = jnp.pad(w_q4, ((0, 0), (0, npad - n)))
        scale = jnp.pad(scale, ((0, 0), (0, npad - n)))
        out = int4_matmul(x, w_q4, scale, block_n=bn, interpret=interpret)
        return out[:, :n]
    grid = (n // bn,)
    n_groups = scale.shape[0]
    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 2, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n // 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q4, scale)
    return out


def _int8_matmul_xla(x, w_q, scale):
    """Plain-XLA dequant-einsum int8 matmul.

    At decode batch (m=1) this measures 639 GB/s on v5e vs 373 GB/s for
    the Pallas dequant kernel and ~200 GB/s for a native s8xs8 MXU
    kernel: XLA's matvec strategy streams weights at the HBM bound and
    fuses the int8→bf16 convert into the reduction, while an MXU matmul
    at one row is weight-load-latency-bound (scripts/profile_llm_ops.py,
    docs/KERNELS.md). Used for small m; the Pallas kernel keeps the
    large-m (prefill) path."""
    w = w_q.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
    return (x.astype(jnp.bfloat16) @ w).astype(x.dtype)


# --- W4A8: grouped int4 weights x dynamically-quantized int8 activations.
# The int4 nibbles unpack to int8 in VMEM (the VPU cost is ~2 ops/byte,
# half the bf16-dequant path's) and feed native s8xs8 MXU dots per scale
# group; the f32 rescale touches only the (m, block) output.

def quant_act_grouped(x, n_groups: int):
    """(M, K) float → per-(row, group) symmetric int8 activations."""
    m, k = x.shape
    g = k // n_groups
    xf = x.astype(jnp.float32).reshape(m, n_groups, g)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq.reshape(m, k), xs[..., 0]


def _s8g4_kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref, *, k, n_groups):
    g = k // n_groups
    half = n_groups // 2
    xq = xq_ref[:]
    xs = xs_ref[:].astype(jnp.float32)
    ws = ws_ref[:].astype(jnp.float32)
    acc = jnp.zeros((xq.shape[0], o_ref.shape[1]), jnp.float32)
    for gi in range(n_groups):
        # unpack ONE scale group at a time: the int32 shift temporaries
        # then stay at (g, bn) — a whole-block unpack blew the VMEM
        # scoped limit at the 8B geometry (K/2 = 7168)
        row = (gi - half if gi >= half else gi) * g
        w32 = wq_ref[row:row + g, :].astype(jnp.int32)
        if gi < half:
            wg = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(w32, 28), 28).astype(jnp.int8)
        else:
            wg = jax.lax.shift_right_arithmetic(w32, 4).astype(jnp.int8)
        part = jax.lax.dot_general(
            xq[:, gi * g:(gi + 1) * g], wg,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc += part.astype(jnp.float32) * (xs[:, gi:gi + 1] * ws[gi:gi + 1])
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int4_matmul_s8(xq, xs, w_q4, scale4, block_n=512, interpret=False):
    """W4A8 decode matmul: int8 activations (per-group scales) against
    packed int4 weights, unpacked to int8 in VMEM and fed to the MXU's
    native s8xs8 path. 294 GB/s of packed int4 bytes on v5e (~590 GB/s
    int8-equivalent) vs 255 for the bf16-dequant kernel."""
    m, k = xq.shape
    n = w_q4.shape[-1]
    n_groups = scale4.shape[0]
    bn = min(block_n, n)
    if n % bn:
        npad = -(-n // bn) * bn
        w_q4 = jnp.pad(w_q4, ((0, 0), (0, npad - n)))
        scale4 = jnp.pad(scale4, ((0, 0), (0, npad - n)))
        return int4_matmul_s8(xq, xs, w_q4, scale4, block_n=bn,
                              interpret=interpret)[:, :n]
    out = pl.pallas_call(
        functools.partial(_s8g4_kernel, k=k, n_groups=n_groups),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, n_groups), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 2, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n // 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xs, w_q4, scale4)
    return out


def _int4_matmul_xla(x, w_q4, scale):
    """Plain-XLA twin of int4_matmul (CPU path / oracle)."""
    k = x.shape[-1]
    lo, hi = _dequant4_halves(w_q4, scale, k)
    x = x.astype(jnp.bfloat16)
    acc = jnp.dot(x[..., : k // 2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[..., k // 2 :], hi, preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def matmul_any(x: jax.Array, wp: dict, interpret: bool | None = None) -> jax.Array:
    """x @ w for a dense {"w"}, int8 {"w_q","scale"}, or int4
    {"w_q4","scale4"} param dict.

    Works on (..., K) inputs; collapses leading dims for the kernel.
    On non-TPU backends quantized matmuls run the plain-XLA twin
    (interpret-mode Pallas per call is pathologically slow off-TPU;
    force the real kernels with interpret=True in kernel tests).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if "w_q4" in wp:
        if interpret is None and on_tpu:
            if m <= 8:
                # decode: W4A8 grouped s8xs8 (bandwidth-bound regime)
                n_groups = wp["scale4"].shape[0]
                xq, xs = quant_act_grouped(xf, n_groups)
                out = int4_matmul_s8(xq, xs, wp["w_q4"], wp["scale4"])
                out = out.astype(x.dtype)
            else:
                out = int4_matmul(xf, wp["w_q4"], wp["scale4"])
        elif interpret:
            out = int4_matmul(xf, wp["w_q4"], wp["scale4"], interpret=True)
        else:
            out = _int4_matmul_xla(xf, wp["w_q4"], wp["scale4"])
        return out.reshape(*lead, -1)
    if "w_q" not in wp:
        return x @ wp["w"].astype(x.dtype)
    if interpret is None and on_tpu and m <= 8:
        # decode: XLA dequant-einsum streams at the HBM bound at m=1
        out = _int8_matmul_xla(xf, wp["w_q"], wp["scale"])
        return out.reshape(*lead, -1)
    if interpret is None:
        interpret = not on_tpu
    out = int8_matmul(xf, wp["w_q"], wp["scale"], interpret=interpret)
    return out.reshape(*lead, -1)


def quantize_tree(params, keys=("q", "k", "v", "out", "gate", "up", "down",
                                "fc1", "fc2", "lm_head"), bits: int = 8,
                  group: int = GROUP4) -> dict:
    """Quantize every matching {"w": ...} projection dict in a parameter
    tree (2-D weights or layer-stacked 3-D). bits=4 uses grouped int4
    (the reference's Q4 operating point); the lm_head stays int8 — as
    Q4_K_M keeps its output tensor at q6_K, the final logits are the
    most quantization-sensitive projection — and projections whose K
    dim is not divisible by 2*group fall back to int8."""
    def quant(w, name):
        if bits == 4 and name != "lm_head":
            # shrink the group to fit small K (tighter groups only
            # IMPROVE accuracy); int8 only when no group ≥ 8 divides K/2
            k = w.shape[-2]
            g = min(group, k // 2)
            while g >= 8 and k % (2 * g):
                g //= 2
            if g >= 8:
                return quantize_int4(w, group=g)
            return quantize_int8(w)
        return quantize_int8(w)

    def walk(node, name=""):
        if isinstance(node, dict):
            if "w" in node and name in keys and node["w"].ndim in (2, 3):
                q = quant(np.asarray(node["w"]), name)
                if "b" in node:
                    q["b"] = node["b"]
                return q
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
