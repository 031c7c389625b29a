"""Head-to-head: per-row int8 self-attention + physical regather (the
round-3 scheme) vs the lane kernel with ancestry map (round-4 scheme),
at the shipping beam shapes, S steps inside one fori_loop.

Run with no other TPU process active:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_lane_kernel.py
"""

import argparse
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

from turbo_whisper_workspace_tpu.ops.attention import (
    self_attention_int8, self_attention_int8_lanes,
)


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, arg, iters, results):
    t0 = time.time()
    out = fn(arg)
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(arg)
    sync(out)
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:46s} {dt:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    results[name] = round(dt, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    B, K, H, T, DH, L = 32, 5, 20, 131, 64, 4
    S = args.steps
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- round-3 scheme: physical regather (int8 flat take, all L
    # layers) + per-row kernel (L sequential calls)
    cache_row = {
        "k_q": jax.random.randint(key, (L, B * K, H, T, DH), -127, 127,
                                  jnp.int8),
        "v_q": jax.random.randint(key, (L, B * K, H, T, DH), -127, 127,
                                  jnp.int8),
        "k_s": jax.random.uniform(key, (L, B * K, H, T), jnp.bfloat16),
        "v_s": jax.random.uniform(key, (L, B * K, H, T), jnp.bfloat16),
    }
    q_row = jax.random.normal(key, (B * K, H, 1, DH), jnp.bfloat16)

    @jax.jit
    def rowpath(c0):
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)

            def g(x):
                l = x.shape[0]
                flat = x.reshape((l * B * K,) + x.shape[2:])
                idx = (jnp.arange(l)[:, None] * (B * K) + src[None]).reshape(-1)
                return jnp.take(flat, idx, axis=0).reshape(x.shape)

            c = {k: g(v) for k, v in c.items()}
            outs = []
            for li in range(L):
                outs.append(self_attention_int8(
                    q_row, c["k_q"][li], c["k_s"][li],
                    c["v_q"][li], c["v_s"][li], i % T + 1))
            acc = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return {k: (v + (acc * 0).astype(v.dtype)) for k, v in c.items()}
        return jax.lax.fori_loop(0, S, body, c0)

    # ---- round-4 scheme: lane kernel, no regather, lane_map carried
    cache_lane = {
        "k_q": jax.random.randint(key, (L, B, H, K, T, DH), -127, 127,
                                  jnp.int8),
        "v_q": jax.random.randint(key, (L, B, H, K, T, DH), -127, 127,
                                  jnp.int8),
        "k_s": jax.random.uniform(key, (L, B, H, K, T), jnp.bfloat16),
        "v_s": jax.random.uniform(key, (L, B, H, K, T), jnp.bfloat16),
    }
    q_lane = jax.random.normal(key, (B, H, K, DH), jnp.bfloat16)

    @jax.jit
    def lanepath(c0):
        lm0 = jnp.zeros((B, K, T), jnp.int32)

        def body(i, carry):
            c, lm = carry
            src = jnp.tile((jnp.arange(K) + i) % K, (B, 1))
            lm = jnp.take_along_axis(lm, src[:, :, None], axis=1)
            outs = []
            for li in range(L):
                outs.append(self_attention_int8_lanes(
                    q_lane, c["k_q"][li], c["k_s"][li],
                    c["v_q"][li], c["v_s"][li], lm, i % T + 1))
            acc = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            c = {k: (v + (acc * 0).astype(v.dtype)) for k, v in c.items()}
            return (c, lm)
        return jax.lax.fori_loop(0, S, body, (c0, lm0))

    timeit(f"row kernel + regather x{S}", rowpath, cache_row,
           args.iters, results)
    timeit(f"lane kernel (no regather) x{S}", lanepath, cache_lane,
           args.iters, results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
