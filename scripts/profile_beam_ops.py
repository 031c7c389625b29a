"""Isolate per-step op costs inside the beam decode loop on the TPU.

Times 128-iteration fori_loops of each suspect op at the beam-5 shapes
(B=32, K=5, V=51866, turbo cache dims) so per-step costs can be compared
against the whole-decode wall clock:

  * top-2K over the (B, K*V) candidate matrix (XLA top_k)
  * two-stage top-k alternative (per-beam top-2K, then combine)
  * log_softmax + rules-style masking over (B*K, V)
  * full self-KV cache gather by beam index (jnp.take)
  * logits head matmul at B*K rows

Run with no other TPU process active.
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
    print(f"{name:44s} {dt:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    results[name] = round(dt, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    args = ap.parse_args()
    B, K, S = args.batch, args.beam, args.steps
    V = 51866
    L, D, TOTAL = 4, 1280, 131
    results = {}
    key = jax.random.PRNGKey(0)

    # ---- top-k over the flat candidate matrix, S times
    @jax.jit
    def topk_flat2(cand0):
        def body(i, cand):
            scores, idx = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)
            return cand + jnp.sum(scores) * 1e-9
        return jax.lax.fori_loop(0, S, body, cand0)

    @jax.jit
    def topk_two_stage(cand0):
        def body(i, cand):
            # per (B, K) row: top-2K of V, then combine K*2K
            s1, i1 = jax.lax.top_k(cand.reshape(B * K, V), 2 * K)
            s2, i2 = jax.lax.top_k(s1.reshape(B, K * 2 * K), 2 * K)
            return cand + jnp.sum(s2) * 1e-9
        return jax.lax.fori_loop(0, S, body, cand0)

    @jax.jit
    def topk_raw_lse(logits0):
        # raw+lse (REJECTED variant): per-beam top-2K on RAW logits +
        # lse from the top-1 — measured 8 ms/step slower than the plain
        # log_softmax form decode/beam.py actually ships
        def body(i, lg):
            s1, i1 = jax.lax.top_k(lg, 2 * K)
            mx = s1[:, 0]
            lse = mx + jnp.log(jnp.sum(jnp.exp(lg - mx[:, None]), axis=-1))
            s2, i2 = jax.lax.top_k(
                (s1 - lse[:, None]).reshape(B, K * 2 * K), 2 * K)
            return lg + jnp.sum(s2) * 1e-12
        return jax.lax.fori_loop(0, S, body, logits0)

    def topk_chunked(chunk):
        vpad = -(-V // chunk) * chunk

        @jax.jit
        def run(logits0):
            def body(i, lg):
                p = jnp.pad(lg, ((0, 0), (0, vpad - V)),
                            constant_values=-1e30)
                sA, iA = jax.lax.top_k(
                    p.reshape(B * K, vpad // chunk, chunk), 2 * K)
                sB, iB = jax.lax.top_k(
                    sA.reshape(B * K, (vpad // chunk) * 2 * K), 2 * K)
                s2, i2 = jax.lax.top_k(sB.reshape(B, K * 2 * K), 2 * K)
                return lg + jnp.sum(s2) * 1e-12
            return jax.lax.fori_loop(0, S, body, logits0)
        return run

    @jax.jit
    def mask_softmax(logits0):
        mask = jnp.zeros((V,), jnp.float32).at[:100].set(-1e30)
        def body(i, lg):
            masked = lg + mask[None]
            lp = jax.nn.log_softmax(masked, axis=-1)
            return lg + jnp.sum(lp) * 1e-12
        return jax.lax.fori_loop(0, S, body, logits0)

    @jax.jit
    def cache_gather(cache0):
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            k = jnp.take(c["k"], src, axis=1)
            v = jnp.take(c["v"], src, axis=1)
            return {"k": k, "v": v}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def cache_gather_onehot(cache0):
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            oh = jax.nn.one_hot(src, B * K, dtype=jnp.bfloat16)  # (BK, BK)
            def g(x):
                l, bk, t, d = x.shape
                flat = x.reshape(l, bk, t * d)
                return jnp.einsum(
                    "rs,lsf->lrf", oh, flat,
                    preferred_element_type=jnp.bfloat16,
                ).reshape(l, bk, t, d)
            return {"k": g(c["k"]), "v": g(c["v"])}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def cache_gather_flataxis(cache0):
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            def g(x):
                l, bk, t, d = x.shape
                flat = x.reshape(l * bk, t, d)
                idx = (jnp.arange(l)[:, None] * bk + src[None]).reshape(-1)
                return jnp.take(flat, idx, axis=0).reshape(l, bk, t, d)
            return {"k": g(c["k"]), "v": g(c["v"])}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def cache_gather_batchmajor(cache0):
        # cache stored (B*K, L, T, D): take along axis 0 directly
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            return {k: jnp.take(v, src, axis=0) for k, v in c.items()}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def cache_gather_int8(cache0):
        # int8 cache: half the bytes through the same flat-axis take
        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            def g(x):
                l, bk, t, d = x.shape
                flat = x.reshape(l * bk, t, d)
                idx = (jnp.arange(l)[:, None] * bk + src[None]).reshape(-1)
                return jnp.take(flat, idx, axis=0).reshape(l, bk, t, d)
            return {k: g(v) for k, v in c.items()}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def cache_gather_chunked(cache0):
        # gather only chunks that contain written positions (simulated:
        # chunk count grows with i) — lax.cond skips untouched chunks
        CH = 32
        nch = (TOTAL + CH - 1) // CH

        def body(i, c):
            src = (jnp.arange(B * K) + i) % (B * K)
            live = i // (S // nch) + 1  # chunks in use at "step" i

            def g(x):
                l, bk, t, d = x.shape
                parts = []
                for ci in range(nch):
                    part = jax.lax.dynamic_slice_in_dim(
                        x, ci * CH, min(CH, t - ci * CH), axis=2)
                    flat = part.reshape(l * bk, -1, d)
                    idx = (jnp.arange(l)[:, None] * bk + src[None]).reshape(-1)
                    gathered = jax.lax.cond(
                        ci < live,
                        lambda p: jnp.take(p, idx, axis=0),
                        lambda p: p,
                        flat,
                    )
                    parts.append(gathered.reshape(l, bk, -1, d))
                return jnp.concatenate(parts, axis=2)
            return {k: g(v) for k, v in c.items()}
        return jax.lax.fori_loop(0, S, body, cache0)

    @jax.jit
    def logits_head(x0):
        w = jax.random.normal(key, (V, D), jnp.bfloat16)
        def body(i, x):
            lg = jnp.einsum("bd,vd->bv", x, w,
                            preferred_element_type=jnp.float32)
            return x + jnp.mean(lg).astype(x.dtype) * 1e-9
        return jax.lax.fori_loop(0, S, body, x0)

    cand = jax.random.normal(key, (B, K, V), jnp.float32)
    logits = jax.random.normal(key, (B * K, V), jnp.float32)
    cache = {
        "k": jax.random.normal(key, (L, B * K, TOTAL, D), jnp.bfloat16),
        "v": jax.random.normal(key, (L, B * K, TOTAL, D), jnp.bfloat16),
    }
    x = jax.random.normal(key, (B * K, D), jnp.bfloat16)

    timeit(f"top_k(2K) flat (B,K*V) x{S}", topk_flat2, cand, args.iters, results)
    timeit(f"top_k two-stage x{S}", topk_two_stage, cand, args.iters, results)
    timeit(f"top_k raw+lse (shipping) x{S}", topk_raw_lse, logits,
           args.iters, results)
    timeit(f"top_k chunked c=1024 x{S}", topk_chunked(1024), logits,
           args.iters, results)
    timeit(f"top_k chunked c=4096 x{S}", topk_chunked(4096), logits,
           args.iters, results)
    timeit(f"mask+log_softmax (B*K,V) x{S}", mask_softmax, logits,
           args.iters, results)
    timeit(f"self-KV gather (L,B*K,{TOTAL},{D}) x{S}", cache_gather, cache,
           args.iters, results)
    timeit(f"self-KV gather one-hot matmul x{S}", cache_gather_onehot, cache,
           args.iters, results)
    timeit(f"self-KV gather flat-axis take x{S}", cache_gather_flataxis,
           cache, args.iters, results)
    cache_bm = {
        "k": jax.random.normal(key, (B * K, L, TOTAL, D), jnp.bfloat16),
        "v": jax.random.normal(key, (B * K, L, TOTAL, D), jnp.bfloat16),
    }
    timeit(f"self-KV gather batch-major take x{S}", cache_gather_batchmajor,
           cache_bm, args.iters, results)
    cache_i8 = jax.tree.map(lambda x: (x * 10).astype(jnp.int8), cache)
    timeit(f"self-KV gather int8 flat take x{S}", cache_gather_int8,
           cache_i8, args.iters, results)
    timeit(f"self-KV gather chunked cond x{S}", cache_gather_chunked, cache,
           args.iters, results)
    timeit(f"logits head (B*K,{D})@(V,{D}) x{S}", logits_head, x,
           args.iters, results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
