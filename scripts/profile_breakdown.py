"""Stage-level timing breakdown of the flagship bench path on the TPU.

Times each piece of bench.py's fused step in isolation (separate small
jits, N-iteration loops, one scalar fetch per measurement to defeat the
tunnel's unreliable block_until_ready) so optimization work is aimed at
measured costs, not guesses. Run with no other TPU process active.

Usage: python scripts/profile_breakdown.py [--model large-v3-turbo]
       [--batch 32] [--steps 128] [--skip decode,encoder,...]
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

from turbo_whisper_workspace_tpu.decode import greedy, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import attention as att
from turbo_whisper_workspace_tpu.ops import mel as mel_ops


def sync(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(name, fn, iters=10, results=None):
    t0 = time.time()
    out = fn()
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name:34s} {dt:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    if results is not None:
        results[name] = round(dt, 3)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    dims = wm.WHISPER_CONFIGS[args.model]
    B, S = args.batch, args.steps
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

    mel = jax.jit(lambda a: mel_ops.log_mel_spectrogram(a, num_mels=dims.n_mels))
    if "mel" not in skip:
        timeit("mel", lambda: mel(audio), args.iters, results)
    mels = mel(audio)

    enc = jax.jit(lambda m: wm.encoder_forward(params, dims, m))
    if "encoder" not in skip:
        timeit("encoder", lambda: enc(mels), args.iters, results)
    feats = enc(mels)

    ckv_q = jax.jit(lambda f: wm.precompute_cross_kv(params, dims, f, quantize=True))
    ckv_bf = jax.jit(lambda f: wm.precompute_cross_kv(params, dims, f, quantize=False))
    if "ckv" not in skip:
        timeit("cross_kv precompute+int8", lambda: ckv_q(feats), args.iters, results)
        timeit("cross_kv precompute bf16", lambda: ckv_bf(feats), args.iters, results)
    ckvq = jax.tree.map(lambda x: x, ckv_q(feats))
    ckvb = ckv_bf(feats)

    # --- full decode loop (rules + sampling + forward), per-step slope
    def dec(ckv, n):
        return greedy.greedy_decode_features(
            params, dims, ckv, prompt, rules=drules, max_len=n).tokens

    if "decode" not in skip:
        d128 = timeit(f"decode int8 {S} steps", lambda: dec(ckvq, S), 3, results)
        d64 = timeit(f"decode int8 {S//2} steps", lambda: dec(ckvq, S // 2), 3, results)
        slope = (d128 - d64) / (S - S // 2)
        print(f"{'  -> per-step slope':34s} {slope:9.3f} ms/step", flush=True)
        results["decode_ms_per_step"] = round(slope, 4)
        d128b = timeit(f"decode bf16 {S} steps", lambda: dec(ckvb, S), 3, results)
        results["decode_bf16_ms_per_step"] = round(
            (d128b - d64 * d128b / d128) / (S - S // 2), 4)

    # --- decoder model forward only (no rules/sampling), fori_loop
    cache = wm.init_kv_cache(dims, B, max_len=prompt.shape[1] + S,
                             dtype=jnp.bfloat16)
    _, cache0 = wm.decoder_forward(params, dims, prompt, ckvq, cache, pos=0)

    def fwd_only(ckv, cache_init, n):
        tok = jnp.full((B, 1), 42, jnp.int32)

        def body(i, carry):
            acc, cache = carry
            logits, cache = wm.decoder_forward(
                params, dims, tok, ckv, cache, pos=prompt.shape[1] + i)
            return acc + logits[:, 0, 0], cache

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((B,), jnp.float32), cache_init))
        return acc

    if "fwd" not in skip:
        f = jax.jit(lambda c: fwd_only(ckvq, c, S))
        f64 = jax.jit(lambda c: fwd_only(ckvq, c, S // 2))
        a = timeit(f"fwd-only int8 {S} steps", lambda: f(cache0), 3, results)
        b = timeit(f"fwd-only int8 {S//2} steps", lambda: f64(cache0), 3, results)
        print(f"{'  -> per-step slope':34s} {(a - b) / (S - S//2):9.3f} ms/step",
              flush=True)
        results["fwd_ms_per_step"] = round((a - b) / (S - S // 2), 4)
        fb = jax.jit(lambda c: fwd_only(ckvb, c, S))
        ab = timeit(f"fwd-only bf16 {S} steps", lambda: fb(cache0), 3, results)
        results["fwd_bf16_total_ms"] = round(ab, 3)

    # --- rules + sampling only, on a fixed logits tensor
    def rules_only(logits, n):
        static_mask = drules.static_mask()
        begin_mask = drules.begin_mask()
        key = jax.random.key(0, impl="rbg")

        def body(i, carry):
            acc, last, penult, floor = carry
            masked = drules.apply(logits + acc[:, None], is_begin=i == 0,
                                  last_tok=last, penult_tok=penult,
                                  ts_floor=floor, static_mask=static_mask,
                                  begin_mask=begin_mask)
            logp = jax.nn.log_softmax(masked, axis=-1)
            gumbel = jax.random.gumbel(jax.random.fold_in(key, i),
                                       masked.shape, jnp.float32)
            nxt = jnp.argmax(masked + 0.0 * gumbel, axis=-1).astype(jnp.int32)
            tl = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
            return (acc + tl, nxt,
                    jnp.where(i == 0, penult, last),
                    rules_mod.update_ts_floor(floor, nxt, last, sp))

        init = (jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.int32),
                jnp.full((B,), sp.timestamp_begin, jnp.int32),
                jnp.full((B,), sp.timestamp_begin, jnp.int32))
        return jax.lax.fori_loop(0, n, body, init)[0]

    if "rules" not in skip:
        logits = jnp.asarray(
            rng.standard_normal((B, dims.n_vocab), np.float32))
        r = jax.jit(lambda l: rules_only(l, S))
        a = timeit(f"rules+sample {S} steps", lambda: r(logits), 3, results)
        results["rules_ms_per_step"] = round(a / S, 4)

    # --- cross-attention int8 kernel alone
    if "kernel" not in skip:
        q = jnp.asarray(rng.standard_normal(
            (B, dims.n_text_head, 1, dims.head_dim)), jnp.bfloat16)

        def kern_loop(q, n):
            # loop-carried dependency through q so XLA can't hoist the call
            def body(i, acc):
                o = att.cross_attention_int8(
                    (q + acc).astype(jnp.bfloat16), ckvq["k_q"][0],
                    ckvq["v_q"][0], ckvq["k_scale"][0], ckvq["v_scale"][0],
                    seq_len=dims.n_audio_ctx)
                return o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        kl = jax.jit(lambda q: kern_loop(q, S))
        a = timeit(f"cross int8 kernel x{S} (1 layer)", lambda: kl(q), 3, results)
        results["cross_kernel_ms_per_step_per_layer"] = round(a / S, 4)

    # --- encoder flash attention kernel alone (one layer shape)
    if "encatt" not in skip:
        h = dims.n_audio_head
        qk = jnp.asarray(rng.standard_normal(
            (B, h, dims.n_audio_ctx, dims.head_dim)), jnp.bfloat16)

        def enc_att_loop(x, n):
            def body(i, acc):
                o = att.flash_attention((x + acc).astype(jnp.bfloat16), x, x)
                return o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        el = jax.jit(lambda x: enc_att_loop(x, 8))
        a = timeit("encoder flash attn x8 (1 layer)", lambda: el(qk), 3, results)
        results["enc_attn_ms_per_layer"] = round(a / 8, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
