"""Block-size sweep for the one-pass encoder attention kernel on TPU.

The kernel (ops/attention.flash_attention) measured 9.6 ms at
(32, 20, 1500, 64) bf16 with block_q=768 — vs a ~4 ms structural floor
(QK^T and PV are depth/width-64 capped at ~50% MXU). With 32 encoder
layers that is ~300 ms per batch-32 window set, on BOTH bench paths.
Sweeps block_q to find the best pipelining point.

Run with no other TPU process active:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_flash.py
"""

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

from turbo_whisper_workspace_tpu.ops.attention import flash_attention


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    b, h, t, d = 32, 20, 1500, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
    iters = 20
    results = {}
    for bq in (128, 256, 384, 512, 768, 1536):
        fn = jax.jit(lambda q, k, v, bq=bq: flash_attention(q, k, v, block_q=bq))
        try:
            t0 = time.time()
            sync(fn(q, k, v))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(iters):
                out = fn(q, k, v)
            sync(out)
            dt = (time.time() - t0) / iters * 1000.0
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"block_q={bq:5d}  FAILED: {str(e)[:120]}")
            continue
        flops = 4 * b * h * t * t * d
        print(f"block_q={bq:5d}  {dt:7.2f} ms  {flops/dt*1e-9:7.1f} GF/s"
              f"  (compile {compile_s:.1f}s)", flush=True)
        results[bq] = round(dt, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
