"""Isolate the pipeline_beam5 stage costs on the TPU.

Times: encoder, cross-kv+int8, beam-5 decode alone, greedy decode at
B*K rows (same decoder row count as beam — isolates beam bookkeeping +
KV-tiling overhead from raw forward cost), seg/emb diarization forwards.

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

from turbo_whisper_workspace_tpu.decode import beam, greedy, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import embedding as emb_mod
from turbo_whisper_workspace_tpu.models import segmentation as seg_mod
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, iters, results):
    t0 = time.time()
    out = fn()
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:38s} {dt:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    results[name] = round(dt, 3)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    dims = wm.WHISPER_CONFIGS[args.model]
    B, S, K = args.batch, args.steps, args.beam
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules_mod.DecodeRules(specials=sp, timestamps=True,
                                   extra_suppress=(sp.eot,))
    prompt = jnp.tile(
        jnp.asarray([[sp.sot, sp.language_tokens["en"], sp.transcribe]], jnp.int32),
        (B, 1),
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, mel_ops.N_SAMPLES), np.float32) * 0.1)
    results = {}

    # NB: params are passed as jit ARGUMENTS everywhere (never closed
    # over): closure'd weights lower as embedded jaxpr consts and the
    # resulting giant module wedges the remote compile service for tens
    # of minutes (observed: the encoder-only program never finished).
    mel = jax.jit(lambda a: mel_ops.log_mel_spectrogram(a, num_mels=dims.n_mels))
    mels = mel(audio)
    enc = jax.jit(lambda p, m: wm.encoder_forward(p, dims, m))
    if "encoder" not in skip:
        timeit("encoder B=32", lambda: enc(params, mels), args.iters, results)
    feats = enc(params, mels)
    ckv_q = jax.jit(
        lambda p, f: wm.precompute_cross_kv(p, dims, f, quantize=True))
    if "ckv" not in skip:
        timeit("cross_kv+int8", lambda: ckv_q(params, feats),
               args.iters, results)
    ckvq = ckv_q(params, feats)

    if "beam" not in skip:
        # quantize_cache=True = the shipping/bench config (lane cache)
        bd = jax.jit(lambda p, c: beam.beam_decode_features(
            p, dims, c, prompt, rules=drules, beam_size=K,
            max_len=S, quantize_cache=True).tokens)
        timeit(f"beam{K} decode {S} steps", lambda: bd(params, ckvq),
               args.iters, results)

    if "greedybk" not in skip:
        # greedy at B*K rows with tiled KV: what the beam forward costs
        # without any beam bookkeeping/gather
        ckv_bk = jax.tree.map(lambda x: jnp.repeat(x, K, axis=1), ckvq)
        prompt_bk = jnp.repeat(prompt, K, axis=0)
        gd = jax.jit(lambda p, c: greedy.greedy_decode_features(
            p, dims, c, prompt_bk, rules=drules, max_len=S).tokens)
        timeit(f"greedy decode B*K={B*K} rows", lambda: gd(params, ckv_bk),
               args.iters, results)

    if "greedy" not in skip:
        g1 = jax.jit(lambda p, c: greedy.greedy_decode_features(
            p, dims, c, prompt, rules=drules, max_len=S).tokens)
        timeit(f"greedy decode B={B} rows", lambda: g1(params, ckvq),
               args.iters, results)

    if "diar" not in skip:
        seg_dims = seg_mod.SegmentationDims()
        seg_params = seg_mod.init_params(seg_dims, jax.random.PRNGKey(1),
                                         dtype=jnp.bfloat16)
        e_dims = emb_mod.EmbeddingDims()
        e_params = emb_mod.init_params(e_dims, jax.random.PRNGKey(2),
                                       dtype=jnp.bfloat16)
        n_seg, n_emb = B * 21, B * 15

        @jax.jit
        def diar(seg_params, e_params, audio):
            diar_mels = mel_ops.log_mel_spectrogram(audio, num_mels=seg_dims.n_mels)
            seg_mels = jax.lax.dynamic_slice_in_dim(
                jnp.tile(diar_mels, (-(-n_seg // B), 1, 1)), 0, n_seg, 0
            )[:, :, : seg_dims.window_frames]
            seg_logits = seg_mod.forward(seg_params, seg_dims, seg_mels)
            emb_mels = jax.lax.dynamic_slice_in_dim(
                jnp.tile(diar_mels, (-(-n_emb // B), 1, 1)), 0, n_emb, 0
            )[:, :, : e_dims.crop_frames]
            embs = emb_mod.forward(e_params, e_dims, emb_mels)
            return jnp.sum(seg_logits) + jnp.sum(embs)

        timeit(f"diar forwards seg={n_seg} emb={n_emb}",
               lambda: diar(seg_params, e_params, audio), args.iters, results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
