"""Headline benchmark: audio-seconds transcribed per second per chip.

Runs the flagship path (whisper large-v3-turbo, bf16, batch of 30 s
windows → fused mel → encoder → KV-cached greedy decode with timestamp
rules) on the attached TPU and prints ONE json line:
  {"metric": "audio_s_per_s_per_chip", "value": N, "unit": "audio_s/s",
   "vs_baseline": N/500}
vs_baseline is against BASELINE.md's >500 audio-s/s/chip target.

Weights are random (no pretrained checkpoints reachable offline) —
throughput is weight-independent; decode length is fixed at 128 tokens
per window (≈ dense-speech token count for 30 s), a conservative stand-in
for EOT-terminated decode.
"""

import json
import os
import time

import jax

# persistent compile cache: repeated bench runs skip the multi-minute
# remote compilation of the fused decode program
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

MODEL = "large-v3-turbo"
BATCH = 32
DECODE_LEN = 128
ITERS = 3


def main():
    dims = wm.WHISPER_CONFIGS[MODEL]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    # random weights sample EOT immediately and the while_loop early-exits;
    # suppress EOT so every window decodes the full 128 tokens (honest
    # worst-case: real checkpoints terminate earlier)
    drules = rules_mod.DecodeRules(
        specials=sp, timestamps=True, extra_suppress=(sp.eot,)
    )
    prompt = jnp.tile(
        jnp.asarray([[sp.sot, sp.language_tokens["en"], sp.transcribe]], jnp.int32),
        (BATCH, 1),
    )

    @jax.jit
    def step(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        # int8 cross-KV (the shipping default): halves the dominant
        # decode-step HBM read — decode 4.66 → 3.14 ms/step measured
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        res = greedy.greedy_decode_features(
            params, dims, ckv, prompt, rules=drules, max_len=DECODE_LEN
        )
        return res.tokens

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, mel_ops.N_SAMPLES)).astype(np.float32) * 0.1
    )

    def sync(x):
        # tiny scalar fetch — block_until_ready alone has proven
        # unreliable through the remote-device tunnel
        return int(np.asarray(jnp.sum(x)))

    t0 = time.time()
    sync(step(params, audio, prompt))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(ITERS):
        toks = step(params, audio, prompt)
    sync(toks)
    elapsed = time.time() - t0

    audio_seconds = BATCH * 30.0 * ITERS
    value = audio_seconds / elapsed
    print(json.dumps({
        "metric": "audio_s_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / 500.0, 3),
        "detail": {
            "model": MODEL, "batch": BATCH, "decode_len": DECODE_LEN,
            "iters": ITERS, "compile_s": round(compile_s, 1),
            "elapsed_s": round(elapsed, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
