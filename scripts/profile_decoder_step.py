"""Decompose the single-token decoder step cost at beam row counts.

profile_beam.py showed beam5 (160 rows) == greedy (160 rows) ≈ 15 ms/
step while HBM accounting predicts ~2-4 ms: something in the decoder
forward dominates. This ablates decoder_forward piece by piece at
(rows=160, turbo dims) inside one fori_loop:

  full        — the shipping step (int8 cross kernel + bf16 self + MLP)
  nocross     — cross-attention replaced by identity
  noself      — self-attention replaced by identity
  nologits    — final vocab projection removed
  nomlp       — MLP removed
  linonly     — only the 6 linears + LN (no attention, no logits)

Run with no other TPU process active:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_decoder_step.py
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

from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops.attention import cross_attention_int8


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--rows", type=int, default=160)
    ap.add_argument("--batch", type=int, default=32)  # cross-KV batch (beam shares)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    dims = wm.WHISPER_CONFIGS[args.model]
    R, B, S = args.rows, args.batch, args.steps
    K = R // B
    H = dims.n_text_head
    D = dims.n_text_state
    DH = D // H
    L = dims.n_text_layer
    T = 131
    V = dims.n_vocab
    TC = 1536

    key = jax.random.PRNGKey(0)
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dec_blocks = params["decoder"]["blocks"]
    token_emb = params["decoder"]["token_emb"]

    ckv = {
        "k_q": jax.random.randint(key, (L, B, H, DH, TC), -127, 127, jnp.int8),
        "v_q": jax.random.randint(key, (L, B, TC, H * DH), -127, 127, jnp.int8),
        "k_scale": jax.random.uniform(key, (L, B, H), jnp.float32),
        "v_scale": jax.random.uniform(key, (L, B, H), jnp.float32),
    }
    cache = {
        "k": jax.random.normal(key, (L, R, T, D), jnp.bfloat16),
        "v": jax.random.normal(key, (L, R, T, D), jnp.bfloat16),
    }
    x0 = jax.random.normal(key, (R, 1, D), jnp.bfloat16)

    def step_fn(mode, blocks, ckv, cache, x):
        def body(carry, layer):
            x, cache = carry
            block, ckv_l, li = layer
            h = wm.layer_norm(x, block["attn_ln"])
            if mode != "linonly":
                q = wm.linear(h, block["attn"]["q"])
                k = wm.linear(h, block["attn"]["k"])
                v = wm.linear(h, block["attn"]["v"])
            else:
                q = k = v = h
            if mode in ("full", "nocross", "nologits", "nomlp"):
                cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], k[None].astype(cache["k"].dtype),
                        (li, 0, T - 1, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], v[None].astype(cache["v"].dtype),
                        (li, 0, T - 1, 0)),
                }
                kc = jax.lax.dynamic_slice(
                    cache["k"], (li, 0, 0, 0), (1, R, T, D))[0]
                vc = jax.lax.dynamic_slice(
                    cache["v"], (li, 0, 0, 0), (1, R, T, D))[0]
                attn = wm.mha(q, kc.astype(q.dtype), vc.astype(q.dtype), H)
                x = x + wm.linear(attn, block["attn"]["out"])
            if mode in ("full", "noself", "nologits", "nomlp"):
                hc = wm.layer_norm(x, block["cross_ln"])
                cq = wm.linear(hc, block["cross"]["q"])
                qh = cq.reshape(B, K, H, DH).transpose(0, 2, 1, 3)
                cattn = cross_attention_int8(
                    qh, ckv_l["k_q"], ckv_l["v_q"],
                    ckv_l["k_scale"], ckv_l["v_scale"],
                    seq_len=dims.n_audio_ctx)
                cattn = cattn.transpose(0, 2, 1, 3).reshape(R, 1, D)
                x = x + wm.linear(cattn, block["cross"]["out"])
            if mode != "nomlp" and mode != "linonly":
                x = wm._mlp_block(x, block)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body, (x, cache), (blocks, ckv, jnp.arange(L)), unroll=L)
        if mode != "nologits":
            logits = jnp.einsum("btd,vd->btv", x, token_emb.astype(x.dtype),
                                preferred_element_type=jnp.float32)
            x = x + (jnp.sum(logits, axis=-1, keepdims=True) * 1e-30).astype(x.dtype)
        return x, cache

    results = {}
    for mode in ("full", "nocross", "noself", "nologits", "nomlp", "linonly"):
        @jax.jit
        def run(blocks, ckv_in, cache0, x0, mode=mode):
            def body(i, carry):
                x, cache = carry
                x, cache = step_fn(mode, blocks, ckv_in, cache, x)
                return (x * 1e-30 + x0, cache)
            return jax.lax.fori_loop(0, S, body, (x0, cache0))

        t0 = time.time()
        out = run(dec_blocks, ckv, cache, x0)
        sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = run(dec_blocks, ckv, cache, x0)
        sync(out)
        dt = (time.time() - t0) / args.iters / S * 1000.0
        print(f"{mode:10s} {dt:8.3f} ms/step   (compile {compile_s:.1f}s)",
              flush=True)
        results[mode] = round(dt, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
