"""Capture a jax.profiler trace of one pipeline_beam5 iteration and
aggregate device op durations — the definitive per-op cost breakdown of
the beam decode loop (stage timers can't see inside the while_loop)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from turbo_whisper_workspace_tpu.decode import beam, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"


def main():
    dims = wm.WHISPER_CONFIGS["large-v3-turbo"]
    B, S, K = 32, 128, 5
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True,
                                   extra_suppress=(sp.eot,))
    prompt = jnp.tile(
        jnp.asarray([[sp.sot, sp.language_tokens["en"], sp.transcribe]],
                    jnp.int32), (B, 1))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((B, mel_ops.N_SAMPLES)).astype(np.float32) * 0.1)

    @jax.jit
    def step(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        return beam.beam_decode_features(
            params, dims, ckv, prompt, rules=drules, beam_size=K,
            max_len=S, quantize_cache=True,
        ).tokens

    t0 = time.time()
    np.asarray(step(params, audio, prompt))
    print(f"compile+first run {time.time() - t0:.1f}s", flush=True)

    with jax.profiler.trace(OUT):
        np.asarray(step(params, audio, prompt))
    print("trace captured", flush=True)

    # ---- aggregate
    files = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", OUT)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "xla" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    print(f"\ntrack processes: {sorted(set(pids.values()))}")
    print(f"total device op time: {total:.1f} ms")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur:9.2f} ms  x{cnt_by_name[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
