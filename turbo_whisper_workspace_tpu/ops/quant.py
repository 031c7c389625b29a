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
        bn = n
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


def matmul_any(x: jax.Array, wp: dict, interpret: bool | None = None) -> jax.Array:
    """x @ w for either a dense {"w"} or quantized {"w_q","scale"} param.

    Works on (..., K) inputs; collapses leading dims for the kernel.
    On non-TPU backends the kernel runs in interpret mode (tests).
    """
    if "w_q" not in wp:
        return x @ wp["w"].astype(x.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    out = int8_matmul(x2, wp["w_q"], wp["scale"], interpret=interpret)
    return out.reshape(*lead, -1)


def quantize_tree(params, keys=("q", "k", "v", "out", "gate", "up", "down",
                                "fc1", "fc2", "lm_head")) -> dict:
    """Quantize every matching {"w": ...} projection dict in a parameter
    tree (2-D weights or layer-stacked 3-D)."""
    def walk(node, name=""):
        if isinstance(node, dict):
            if "w" in node and name in keys and node["w"].ndim in (2, 3):
                q = quantize_int8(np.asarray(node["w"]))
                if "b" in node:
                    q["b"] = node["b"]
                return q
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
