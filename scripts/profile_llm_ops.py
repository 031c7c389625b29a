"""Isolate the LLM decode step's matmul costs on the TPU (VERDICT r4 #3).

The decode step at batch 1 is weight-streaming-bound: 3B int8 weights
are ~2.8 GB + 394 MB lm_head → ~3.9 ms/step floor at 819 GB/s, yet the
shipped step measures ~9.3 ms. Hypothesis: the dequant-in-kernel bf16
multiply is VPU-bound (k·n casts+multiplies per matmul — ~2× the DMA
time per weight block), so the MXU waits on the VPU, not on HBM.

Times S-iteration fori_loops of the full per-layer projection stack
(q/k/v/out/gate/up/down at m=1, scanned over L layers) plus the lm_head
for each weight format:

  * bf16 dense (einsum)             — the pure-DMA anchor at 2 B/elem
  * int8 pallas (shipping kernel)   — bf16 dequant in-kernel
  * int8 s8×s8 MXU prototype        — dynamic per-row activation quant,
                                      native int8 MXU dot, f32 rescale
  * int4 pallas (shipping kernel)   — nibble unpack + bf16 dequant
  * int4 s8×s8 grouped prototype    — nibble unpack to int8, per-group
                                      int8 MXU dots, f32 group rescale

Each loop iteration's inputs are perturbed by the loop carry so XLA
cannot hoist or CSE the matmuls out of the loop.

Run with no other TPU process active:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_llm_ops.py
"""

import argparse
import functools
import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_whisper_workspace_tpu.models import llama as lm
from turbo_whisper_workspace_tpu.ops import quant

GROUP = 128


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, args, iters, steps, results, bytes_per_step=None):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters / steps * 1000.0
    gbs = f"  {bytes_per_step / dt / 1e6:7.0f} GB/s" if bytes_per_step else ""
    print(f"{name:40s} {dt:9.3f} ms/step{gbs}   (compile {compile_s:.1f}s)",
          flush=True)
    results[name] = round(dt, 4)


# --- s8×s8 prototypes -------------------------------------------------------

def _s8_kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def s8_matmul(xq, xs, w_q, scale, block_n=512):
    m, k = xq.shape
    _, n = w_q.shape
    bn = min(block_n, n)
    if n % bn:
        npad = -(-n // bn) * bn
        w_q = jnp.pad(w_q, ((0, 0), (0, npad - n)))
        scale = jnp.pad(scale, (0, npad - n))
        return s8_matmul(xq, xs, w_q, scale, block_n=bn)[:, :n]
    out = pl.pallas_call(
        _s8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=0,
        ),
    )(xq, xs, w_q, scale.reshape(1, n))
    return out


def quant_act(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _s8g4_kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref, *, k, n_groups):
    """Grouped int4: unpack nibbles to int8, per-group s8×s8 dots."""
    w32 = wq_ref[:].astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 28), 28).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(w32, 4).astype(jnp.int8)
    g = k // n_groups
    half = n_groups // 2
    xq = xq_ref[:]
    xs = xs_ref[:].astype(jnp.float32)
    ws = ws_ref[:].astype(jnp.float32)
    acc = jnp.zeros((xq.shape[0], lo.shape[1]), jnp.float32)
    for gi in range(n_groups):
        src = lo if gi < half else hi
        row = (gi - half if gi >= half else gi) * g
        part = jax.lax.dot_general(
            xq[:, gi * g:(gi + 1) * g], src[row:row + g],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc += part.astype(jnp.float32) * (xs[:, gi:gi + 1] * ws[gi:gi + 1])
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def s8g4_matmul(xq, xs, w_q4, scale4, block_n=512):
    m, k = xq.shape
    n = w_q4.shape[-1]
    n_groups = scale4.shape[0]
    bn = min(block_n, n)
    if n % bn:
        npad = -(-n // bn) * bn
        w_q4 = jnp.pad(w_q4, ((0, 0), (0, npad - n)))
        scale4 = jnp.pad(scale4, ((0, 0), (0, npad - n)))
        return s8g4_matmul(xq, xs, w_q4, scale4, block_n=bn)[:, :n]
    out = pl.pallas_call(
        functools.partial(_s8g4_kernel, k=k, n_groups=n_groups),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
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
    )(xq, xs, w_q4, scale4)
    return out


def quant_act_grouped(x, n_groups):
    m, k = x.shape
    g = k // n_groups
    xf = x.astype(jnp.float32).reshape(m, n_groups, g)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq.reshape(m, k), xs[..., 0]


# ---------------------------------------------------------------------------

def layer_shapes(dims):
    d, kv, ff = dims.d_model, dims.n_kv_head * dims.head_dim, dims.d_ff
    return [("q", d, d), ("k", d, kv), ("v", d, kv), ("out", d, d),
            ("gate", d, ff), ("up", d, ff), ("down", ff, d)]


def make_loop(S, body):
    """fori_loop of `body(carry_scalar, *weights) -> scalar`, carry-
    perturbed inputs so nothing hoists out of the loop."""
    @jax.jit
    def run(carry0, *weights):
        def f(i, c):
            return body(c, *weights)
        return jax.lax.fori_loop(0, S, f, carry0)
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-3b")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", default="bf16,int8,s8,int4,s8g4,head")
    args = ap.parse_args()
    dims = lm.LLAMA_CONFIGS[args.model]
    S, L = args.steps, dims.n_layer
    d, ff = dims.d_model, dims.d_ff
    variants = args.variants.split(",")
    rng = np.random.default_rng(0)
    results = {}
    shapes = layer_shapes(dims)
    layer_elems = sum(k * n for _, k, n in shapes)
    head_elems = d * dims.n_vocab
    print(f"{args.model}: per-layer weight elems {layer_elems / 1e6:.1f}M, "
          f"L={L}, head {head_elems / 1e6:.1f}M elems", flush=True)

    xd0 = jnp.asarray(rng.standard_normal((1, d)), jnp.bfloat16)
    xf0 = jnp.asarray(rng.standard_normal((1, ff)), jnp.bfloat16)
    c0 = jnp.zeros((), jnp.float32)

    def inputs(c):
        # carry-dependent perturbation defeats loop-invariant hoisting
        return (xd0 + c.astype(jnp.bfloat16) * 1e-6,
                xf0 + c.astype(jnp.bfloat16) * 1e-6)

    def reduce_out(outs):
        return sum(o[0, 0].astype(jnp.float32) for o in outs) * 1e-9

    if "bf16" in variants:
        ws = [jnp.asarray(rng.standard_normal((L, k, n)) * 0.02, jnp.bfloat16)
              for _, k, n in shapes]

        def body_bf16(c, *ws):
            xd, xf = inputs(c)

            def layer(c, w):
                outs = [(xf if wi.shape[0] == ff else xd) @ wi for wi in w]
                return c + reduce_out(outs), None
            c, _ = jax.lax.scan(layer, c, tuple(ws))
            return c

        timeit("layers bf16 dense", make_loop(S, body_bf16), (c0, *ws),
               args.iters, S, results, bytes_per_step=2 * L * layer_elems)
        del ws

    if any(v in variants for v in ("int8", "s8", "xla8")):
        wq = [jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
              for _, k, n in shapes]
        sc = [jnp.full((L, n), 0.01, jnp.float32) for _, k, n in shapes]

        if "int8" in variants:
            def body_int8(c, *flat):
                xd, xf = inputs(c)

                def layer(c, wss):
                    outs = [
                        quant.int8_matmul(
                            xf if wi.shape[0] == ff else xd, wi, si)
                        for wi, si in zip(wss[:7], wss[7:])
                    ]
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers int8 pallas (shipping)", make_loop(S, body_int8),
                   (c0, *wq, *sc), args.iters, S, results,
                   bytes_per_step=L * layer_elems)

        if "xla8" in variants:
            def body_xla8(c, *flat):
                xd, xf = inputs(c)

                def layer(c, wss):
                    outs = []
                    for wi, si in zip(wss[:7], wss[7:]):
                        x = xf if wi.shape[0] == ff else xd
                        w = wi.astype(jnp.bfloat16) * si.astype(jnp.bfloat16)
                        outs.append((x @ w))
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers int8 XLA dequant-einsum", make_loop(S, body_xla8),
                   (c0, *wq, *sc), args.iters, S, results,
                   bytes_per_step=L * layer_elems)

        if "s8" in variants:
            def body_s8(c, *flat):
                xd, xf = inputs(c)
                xdq, xds = quant_act(xd)
                xfq, xfs = quant_act(xf)

                def layer(c, wss):
                    outs = []
                    for wi, si in zip(wss[:7], wss[7:]):
                        if wi.shape[0] == ff:
                            outs.append(s8_matmul(xfq, xfs, wi, si))
                        else:
                            outs.append(s8_matmul(xdq, xds, wi, si))
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers s8xs8 MXU (prototype)", make_loop(S, body_s8),
                   (c0, *wq, *sc), args.iters, S, results,
                   bytes_per_step=L * layer_elems)
        del wq, sc

    if any(v in variants for v in ("int4", "s8g4", "xla4")):
        wq4 = [jnp.asarray(rng.integers(-128, 128, (L, k // 2, n)), jnp.int8)
               for _, k, n in shapes]
        sc4 = [jnp.full((L, k // GROUP, n), 0.01, jnp.float32)
               for _, k, n in shapes]

        if "int4" in variants:
            def body_int4(c, *flat):
                xd, xf = inputs(c)

                def layer(c, wss):
                    outs = [
                        quant.int4_matmul(
                            xf if wi.shape[0] == ff // 2 else xd, wi, si)
                        for wi, si in zip(wss[:7], wss[7:])
                    ]
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers int4 pallas (shipping)", make_loop(S, body_int4),
                   (c0, *wq4, *sc4), args.iters, S, results,
                   bytes_per_step=L * layer_elems // 2)

        if "xla4" in variants:
            def body_xla4(c, *flat):
                xd, xf = inputs(c)

                def layer(c, wss):
                    outs = []
                    for wi, si in zip(wss[:7], wss[7:]):
                        x = xf if wi.shape[0] == ff // 2 else xd
                        outs.append(quant._int4_matmul_xla(x, wi, si))
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers int4 XLA twin", make_loop(S, body_xla4),
                   (c0, *wq4, *sc4), args.iters, S, results,
                   bytes_per_step=L * layer_elems // 2)

        if "s8g4" in variants:
            def body_s8g4(c, *flat):
                xd, xf = inputs(c)
                ngd, ngf = d // GROUP, ff // GROUP
                xdq, xds = quant_act_grouped(xd, ngd)
                xfq, xfs = quant_act_grouped(xf, ngf)

                def layer(c, wss):
                    outs = []
                    for wi, si in zip(wss[:7], wss[7:]):
                        if wi.shape[0] == ff // 2:
                            outs.append(s8g4_matmul(xfq, xfs, wi, si))
                        else:
                            outs.append(s8g4_matmul(xdq, xds, wi, si))
                    return c + reduce_out(outs), None
                c, _ = jax.lax.scan(layer, c, (*flat[:7], *flat[7:]))
                return c

            timeit("layers s8xs8 grouped-int4 (proto)", make_loop(S, body_s8g4),
                   (c0, *wq4, *sc4), args.iters, S, results,
                   bytes_per_step=L * layer_elems // 2)
        del wq4, sc4

    if "head" in variants:
        v = dims.n_vocab
        hq = jnp.asarray(rng.integers(-127, 128, (d, v)), jnp.int8)
        hs = jnp.full((v,), 0.01, jnp.float32)

        def body_head_int8(c, hq, hs):
            xd, _ = inputs(c)
            out = quant.int8_matmul(xd, hq, hs)
            return c + out[0, 0].astype(jnp.float32) * 1e-9

        timeit("lm_head int8 pallas (shipping)", make_loop(S, body_head_int8),
               (c0, hq, hs), args.iters, S, results,
               bytes_per_step=head_elems)

        def body_head_s8(c, hq, hs):
            xd, _ = inputs(c)
            xq, xs = quant_act(xd)
            out = s8_matmul(xq, xs, hq, hs)
            return c + out[0, 0].astype(jnp.float32) * 1e-9

        timeit("lm_head s8xs8 MXU (prototype)", make_loop(S, body_head_s8),
               (c0, hq, hs), args.iters, S, results,
               bytes_per_step=head_elems)

        def body_head_xla(c, hq, hs):
            xd, _ = inputs(c)
            w = hq.astype(jnp.bfloat16) * hs.astype(jnp.bfloat16)
            return c + (xd @ w)[0, 0].astype(jnp.float32) * 1e-9

        timeit("lm_head int8 XLA dequant-einsum", make_loop(S, body_head_xla),
               (c0, hq, hs), args.iters, S, results,
               bytes_per_step=head_elems)
        del hq, hs

    print(json.dumps(results))


if __name__ == "__main__":
    main()
