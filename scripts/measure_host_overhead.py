"""Measure per-batch HOST cost vs DEVICE step time on the real TPU.

Quantifies the DP scaling claim (BASELINE.md ≥85%-to-2-hosts gate):
the compiled DP decode has ZERO collectives (parallel/infer.py
dp_collective_report), so the only thing that can erode weak scaling
across hosts is per-host input feeding + dispatch. In multi-controller
JAX each host feeds only its local devices, so per-host host work is
CONSTANT as hosts are added; 2-host efficiency is bounded by

    eff = T_dev / max(T_dev, T_host)        (pipelined feeding)

where T_host = host-side dispatch + input transfer per batch and
T_dev = device execution per batch. This script measures both on the
real chip for the bench decode step and writes docs/SCALING.json,
which __graft_entry__.dryrun_multichip reads to print
projected_2host_efficiency with real measured inputs.

Run with no other TPU process active:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/measure_host_overhead.py
"""

import json
import os
import pathlib
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

from turbo_whisper_workspace_tpu.decode import greedy, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops

MODEL = os.environ.get("BENCH_MODEL", "large-v3-turbo")
BATCH = int(os.environ.get("BENCH_BATCH", 32))
DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", 128))
REPEATS = int(os.environ.get("REPEATS", 5))


def main():
    dims = wm.WHISPER_CONFIGS[MODEL]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True,
                                   extra_suppress=(sp.eot,))
    prompt = jnp.tile(
        jnp.asarray([[sp.sot, sp.language_tokens["en"], sp.transcribe]],
                    jnp.int32),
        (BATCH, 1),
    )
    rng = np.random.default_rng(0)
    audio_f32 = (rng.standard_normal((BATCH, mel_ops.N_SAMPLES))
                 .astype(np.float32) * 0.1)
    # production wire format: decoders emit int16 PCM; the f32 convert
    # happens ON DEVICE inside log_mel_spectrogram — half the H2D bytes
    audio_np = (audio_f32 * 32768.0).clip(-32768, 32767).astype(np.int16)

    @jax.jit
    def step(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        res = greedy.greedy_decode_features(
            params, dims, ckv, prompt, rules=drules, max_len=DECODE_LEN)
        return res.tokens

    # warm up / compile
    audio = jax.device_put(audio_np)
    float(np.asarray(jnp.sum(step(params, audio, prompt))))

    def time_feed(arr, n=REPEATS):
        ts = []
        for _ in range(n):
            t0 = time.time()
            jax.block_until_ready(jax.device_put(arr))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    feed_s, disp_s, total_s = [], [], []
    for _ in range(REPEATS):
        t0 = time.time()
        audio = jax.device_put(audio_np)               # input feed (H2D)
        jax.block_until_ready(audio)
        t1 = time.time()
        out = step(params, audio, prompt)              # async dispatch
        t2 = time.time()
        float(np.asarray(jnp.sum(out)))                # device completes
        t3 = time.time()
        feed_s.append(t1 - t0)
        disp_s.append(t2 - t1)
        total_s.append(t3 - t1)

    t_feed = float(np.median(feed_s))
    t_disp = float(np.median(disp_s))
    t_dev = float(np.median(total_s))
    t_host = t_feed + t_disp
    eff = t_dev / max(t_dev, t_host)
    t_feed_f32 = time_feed(audio_f32)
    report = {
        "model": MODEL, "batch": BATCH, "decode_len": DECODE_LEN,
        "device": str(jax.devices()[0]),
        "input_dtype": "int16 (decoder-native PCM, f32 convert on device)",
        "t_host_feed_s": round(t_feed, 5),
        "t_host_feed_f32_s": round(t_feed_f32, 5),
        "t_host_dispatch_s": round(t_disp, 5),
        "t_device_batch_s": round(t_dev, 4),
        "host_fraction": round(t_host / t_dev, 5),
        "projected_2host_efficiency": round(eff, 4),
        "model_note": (
            "multi-controller JAX: each host feeds only its local devices, "
            "per-host host work is constant in host count; with zero "
            "collectives in the SPMD module, weak-scaling efficiency is "
            "bounded by T_dev/max(T_dev, T_host_feed+T_host_dispatch)"
        ),
    }
    out_path = pathlib.Path(__file__).resolve().parent.parent / "docs" / "SCALING.json"
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
