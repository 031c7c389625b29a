"""Dump the compiled HLO of the bench pipeline step and print the
definitions of the hot ops found by scripts/trace_beam.py."""

import os
import re
import sys

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
    audio = jnp.zeros((B, mel_ops.N_SAMPLES), jnp.float32)

    @jax.jit
    def step(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        return beam.beam_decode_features(
            params, dims, ckv, prompt, rules=drules, beam_size=K,
            max_len=S, quantize_cache=True,
        ).tokens

    txt = step.lower(params, audio, prompt).compile().as_text()
    path = "/tmp/beam_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {path}")

    # summarize requested ops
    for name in sys.argv[1:]:
        print("=" * 70)
        print("###", name)
        # calls / definitions
        for m in re.finditer(rf"^\s*.*{re.escape(name)}\b.*$", txt, re.M):
            line = m.group(0)
            if len(line) > 400:
                line = line[:400] + " …"
            print(line)
            if sum(1 for _ in re.finditer(rf"{re.escape(name)}\b", txt)) > 40:
                break


if __name__ == "__main__":
    main()
