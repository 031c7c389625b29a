#!/usr/bin/env python
"""TPU probe + tuning advisor (reference: scripts/optimize_gpu.py).

Probes the attached devices, runs tiered matmul benchmarks
(optimize_gpu.py:69-105 analog), smoke-tests the decode path, and prints
batch-size suggestions from available HBM (`:158-205` analog).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jnp.sum(x))


def main():
    devs = jax.devices()
    print(f"devices: {devs}")
    dev = devs[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    hbm = stats.get("bytes_limit", 16e9)
    print(f"HBM limit: {hbm / 1e9:.1f} GB")

    for n in (1024, 2048, 4096, 8192):
        x = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        sync(f(x))
        t0 = time.time()
        r = f(x)
        for _ in range(9):
            r = f(r)
        sync(r)
        dt = time.time() - t0
        print(f"{n}^3 bf16 x10: {2 * n**3 * 10 / dt / 1e12:7.1f} TF/s")

    # decode-path smoke (tiny model)
    from turbo_whisper_workspace_tpu.decode import greedy, rules, tokenizer
    from turbo_whisper_workspace_tpu.models import whisper as wm

    dims = wm.WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4)
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules.DecodeRules(specials=sp)
    mel = jnp.zeros((4, 80, 3000))
    prompt = jnp.tile(jnp.asarray([[sp.sot, sp.transcribe]], jnp.int32), (4, 1))
    t0 = time.time()
    res = greedy.greedy_decode(params, dims, mel, prompt, rules=drules, max_len=32)
    sync(res.tokens)
    print(f"tiny decode smoke: {time.time() - t0:.1f} s (incl. compile)")

    # batch suggestions: large-v3-turbo memory model
    # params 1.6GB bf16 + per-window cross-KV ~31MB + caches ~3MB
    per_window = 0.035e9
    budget = hbm * 0.8 - 1.7e9
    print(f"suggested max batch (large-v3-turbo): {int(budget / per_window)}")


if __name__ == "__main__":
    main()
