"""Headline benchmarks: audio-seconds transcribed per second per chip.

Prints one JSON line per bench, the BASELINE target configuration LAST
(the driver records the final line):

  1. asr_greedy      — large-v3-turbo, batch 32, greedy, 128-token decode
                       (tracking metric from round 1)
  2. llm_decode_int8/int4 — N3 engine: Llama single-stream decode
                       tokens/s/chip at the reference's Q4/Q8 points
  3. pipeline_beam5  — BASELINE.md's >500 target row: large-v3-turbo
                       BEAM-5 + timestamps (config #3) PLUS the
                       diarization forwards (segmentation sliding
                       windows + speaker-embedding crops) that the full
                       pipeline runs per window batch
                       (vocalis/core/audio_pipeline.py:567-688 flow).

vs_baseline is against the >500 audio-s/s/chip target in both cases.

Weights are random (no pretrained checkpoints reachable offline) —
throughput is weight-independent; EOT is suppressed so every window
decodes the full 128 tokens (honest worst case: real checkpoints
terminate earlier). Host-side merge/clustering is excluded: it is
O(segments²) NumPy measured at <1% of stage time in examples/demo.py.

Env knobs: BENCH_MODE=asr|llm|pipeline|both, BENCH_BATCH,
BENCH_DECODE_LEN, BENCH_ITERS, BENCH_BEAM, BENCH_LLM_MODEL,
BENCH_LLM_LEN.
"""

import json
import os
import time

import jax

# persistent compile cache: repeated bench runs skip the multi-minute
# remote compilation of the fused decode programs
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

MODEL = os.environ.get("BENCH_MODEL", "large-v3-turbo")
BATCH = int(os.environ.get("BENCH_BATCH", 32))
DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", 128))
ITERS = int(os.environ.get("BENCH_ITERS", 3))
BEAM = int(os.environ.get("BENCH_BEAM", 5))
MODE = os.environ.get("BENCH_MODE", "both")

# diarization work per 30 s window at the shipping config
# (DiarizationConfig: window_s=10, step_s=1 → 21 segmentation windows;
# embedding crops ≈ one 2 s crop per speech second / 2 → 15)
SEG_WINDOWS_PER_30S = 21
EMB_CROPS_PER_30S = 15


def _sync(x):
    # tiny scalar fetch — block_until_ready alone has proven unreliable
    # through the remote-device tunnel
    return float(np.asarray(jnp.sum(x)))


def _emit(name, audio_seconds, elapsed, compile_s, detail):
    value = audio_seconds / elapsed
    detail.update({
        "model": MODEL, "batch": BATCH, "decode_len": DECODE_LEN,
        "iters": ITERS, "compile_s": round(compile_s, 1),
        "elapsed_s": round(elapsed, 2), "device": str(jax.devices()[0]),
    })
    print(json.dumps({
        "metric": name,
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / 500.0, 3),
        "detail": detail,
    }), flush=True)
    return value


def bench_asr_greedy(params, dims, drules, prompt, audio):
    @jax.jit
    def step(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        res = greedy.greedy_decode_features(
            params, dims, ckv, prompt, rules=drules, max_len=DECODE_LEN
        )
        return res.tokens

    t0 = time.time()
    _sync(step(params, audio, prompt))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        toks = step(params, audio, prompt)
    _sync(toks)
    elapsed = time.time() - t0
    return _emit("asr_greedy", BATCH * 30.0 * ITERS, elapsed, compile_s, {})


def bench_llm_decode():
    """N3 engine number (VERDICT r3 #8): tokens/s/chip for the Llama
    decoder at the reference's operating points — int8 and grouped-int4
    weights (the reference runs Hermes Q4_K_M through llama.cpp,
    vocalis/llm/llm_helper.py:67-73). Single-stream (batch 1) like the
    reference's enrichment calls; one jitted while_loop per generation.

    vs_baseline is vs a nominal 100 tok/s — the llama.cpp single-stream
    class on the reference's stated RTX 4090 target (no number is
    published in the reference repo, BASELINE.md:5)."""
    from turbo_whisper_workspace_tpu.llm import generate as gen_mod
    from turbo_whisper_workspace_tpu.models import llama as lm
    from turbo_whisper_workspace_tpu.ops.quant import quantize_tree

    model = os.environ.get("BENCH_LLM_MODEL", "llama-3.2-3b")
    gen_len = int(os.environ.get("BENCH_LLM_LEN", 64))
    # (model, bits, metric-suffix): the 3B geometry at both operating
    # points, plus the reference's exact 8B point (Hermes-3-Llama-3.1-8B
    # Q4, vocalis/llm/llm_helper.py:40) — int4 fits the 16 GB chip
    runs = [(model, 8, ""), (model, 4, "")]
    if os.environ.get("BENCH_LLM_8B", "1") == "1" and model != "test-tiny":
        runs.append(("llama-3.1-8b", 4, "_8b"))
    for model, bits_run, suffix in runs:
        _bench_llm_one(model, bits_run, suffix, gen_len)


def _bench_llm_one(model, bits, suffix, gen_len):
    from turbo_whisper_workspace_tpu.llm import generate as gen_mod
    from turbo_whisper_workspace_tpu.models import llama as lm
    from turbo_whisper_workspace_tpu.ops.quant import quantize_tree

    dims = lm.LLAMA_CONFIGS[model]

    # Weights are built HOST-side (numpy f16) and only the QUANTIZED
    # tensors are pushed to the chip: materializing the bf16 3B model
    # on device next to the whisper bench state OOMs a 16 GB v5e.
    rng = np.random.default_rng(0)
    d, dh = dims.d_model, dims.head_dim
    kv_d = dims.n_kv_head * dh
    L = dims.n_layer

    def lin(din, dout, lead=()):
        w = rng.standard_normal(lead + (din, dout), dtype=np.float32)
        return {"w": (w * din**-0.5).astype(np.float16)}

    params = {
        "token_emb": (rng.standard_normal((dims.n_vocab, d),
                                          dtype=np.float32) * 0.02
                      ).astype(np.float16),
        "blocks": {
            "attn_norm": {"scale": np.ones((L, d), np.float16)},
            "q": lin(d, d, (L,)), "k": lin(d, kv_d, (L,)),
            "v": lin(d, kv_d, (L,)), "out": lin(d, d, (L,)),
            "mlp_norm": {"scale": np.ones((L, d), np.float16)},
            "gate": lin(d, dims.d_ff, (L,)), "up": lin(d, dims.d_ff, (L,)),
            "down": lin(dims.d_ff, d, (L,)),
        },
        "norm": {"scale": np.ones((d,), np.float16)},
        "lm_head": lin(d, dims.n_vocab),
    }
    prompt = jnp.arange(16, dtype=jnp.int32)[None, :] % dims.n_vocab

    if True:
        qparams = quantize_tree(params, bits=bits)
        # push the remaining host leaves (embeddings, norms) as bf16
        qparams = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if isinstance(x, np.ndarray) else x, qparams)

        def run():
            return gen_mod.generate_tokens(
                qparams, dims, prompt, max_len=gen_len)

        t0 = time.time()
        _sync(run().tokens)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            res = run()
        _sync(res.tokens)
        elapsed = time.time() - t0
        toks = gen_len * ITERS
        value = toks / elapsed
        print(json.dumps({
            "metric": f"llm_decode_int{bits}{suffix}",
            "value": round(value, 2),
            "unit": "tok/s/chip",
            "vs_baseline": round(value / 100.0, 3),
            "detail": {
                "model": model, "gen_len": gen_len, "batch": 1,
                "iters": ITERS, "compile_s": round(compile_s, 1),
                "elapsed_s": round(elapsed, 2),
                "device": str(jax.devices()[0]),
            },
        }), flush=True)
        del qparams
    del params


def bench_pipeline_beam5(params, dims, drules, prompt, audio):
    """BASELINE config #3/#4: beam-5 + timestamps + diarization forwards."""
    seg_dims = seg_mod.SegmentationDims()
    seg_params = seg_mod.init_params(seg_dims, jax.random.PRNGKey(1),
                                     dtype=jnp.bfloat16)
    e_dims = emb_mod.EmbeddingDims()
    e_params = emb_mod.init_params(e_dims, jax.random.PRNGKey(2),
                                   dtype=jnp.bfloat16)
    n_seg = BATCH * SEG_WINDOWS_PER_30S
    n_emb = BATCH * EMB_CROPS_PER_30S

    @jax.jit
    def step(params, seg_params, e_params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        ckv = wm.precompute_cross_kv(params, dims, feats, quantize=True)
        res = beam.beam_decode_features(
            params, dims, ckv, prompt, rules=drules, beam_size=BEAM,
            max_len=DECODE_LEN, quantize_cache=True,
            lane_cache=os.environ.get("BENCH_LANES", "1") == "1",
        )
        # diarization stage on the same audio: sliding segmentation
        # windows (10 s / 1 s step) + attentive-stats embedding crops,
        # batched exactly as pipeline/diarizer.py batches them — which
        # computes its own 80-mel features (whisper's may be 128-mel)
        diar_mels = mel_ops.log_mel_spectrogram(
            audio, num_mels=seg_dims.n_mels
        )
        seg_mels = jax.lax.dynamic_slice_in_dim(
            jnp.tile(diar_mels, (-(-n_seg // BATCH), 1, 1)), 0, n_seg, 0
        )[:, :, : seg_dims.window_frames]
        seg_logits = seg_mod.forward(seg_params, seg_dims, seg_mels)
        emb_mels = jax.lax.dynamic_slice_in_dim(
            jnp.tile(diar_mels, (-(-n_emb // BATCH), 1, 1)), 0, n_emb, 0
        )[:, :, : e_dims.crop_frames]
        embs = emb_mod.forward(e_params, e_dims, emb_mels)
        return (res.tokens, jnp.sum(seg_logits) + jnp.sum(embs))

    t0 = time.time()
    toks, aux = step(params, seg_params, e_params, audio, prompt)
    _sync(toks)
    _sync(aux)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        toks, aux = step(params, seg_params, e_params, audio, prompt)
    _sync(toks)
    _sync(aux)
    elapsed = time.time() - t0
    return _emit(
        "pipeline_beam5", BATCH * 30.0 * ITERS, elapsed, compile_s,
        {"beam": BEAM, "seg_windows": n_seg, "emb_crops": n_emb},
    )



def bench_pipeline_e2e(params, dims):
    """Wall-clock of the SHIPPED AudioProcessingPipeline.process_batch
    (VERDICT r4 #2): host file decode, VAD chunk planning, bucketed
    encode + beam decode, diarization (segmentation windows + embedding
    crops through the bucketed device batches, host AHC), merge — the
    production flow at pipeline/audio_pipeline.py:229-299, matching the
    reference's master flow (vocalis/core/audio_pipeline.py:567-688).

    Inputs: N_FILES multi-minute files tiled from the golden two-speaker
    conversation with per-file noise/gain variation. EOT is suppressed
    (random weights; same honest worst case as the other benches), so
    every surviving window decodes DECODE_LEN tokens at BEAM width.
    First process_batch call compiles/warms; the timed pass reuses it.
    """
    import shutil
    import tempfile
    import wave as wave_mod

    from turbo_whisper_workspace_tpu.config import (PipelineConfig,
                                                    TranscriptionConfig)
    from turbo_whisper_workspace_tpu.decode.rules import DecodeRules
    from turbo_whisper_workspace_tpu.pipeline.audio_pipeline import (
        AudioProcessingPipeline)
    from turbo_whisper_workspace_tpu.pipeline.transcriber import (
        load_transcriber)

    n_files = int(os.environ.get("BENCH_E2E_FILES", 16))
    file_s = float(os.environ.get("BENCH_E2E_FILE_S", 120.0))

    with wave_mod.open("examples/golden/conversation.wav") as w:
        sr = w.getframerate()
        base = np.frombuffer(w.readframes(w.getnframes()),
                             np.int16).astype(np.float32) / 32768.0
    rng = np.random.default_rng(7)
    tmpdir = tempfile.mkdtemp(prefix="bench_e2e_")
    paths = []
    total_audio_s = 0.0
    for i in range(n_files):
        reps = int(np.ceil(file_s * sr / len(base)))
        x = np.tile(base * float(rng.uniform(0.6, 1.0)), reps)
        x = x[: int(file_s * sr)]
        x = x + rng.standard_normal(len(x)).astype(np.float32) * 0.003
        pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        p = os.path.join(tmpdir, f"clip{i:02d}.wav")
        with wave_mod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        paths.append(p)
        total_audio_s += file_s

    # retry ladder off: random weights produce gibberish text, so the
    # compression-ratio check would exhaust ALL fallback temperatures on
    # every window — a random-weight artifact (real checkpoints retry
    # on a small fraction of windows); the single-pass decode is the
    # honest shipped-path measure
    from turbo_whisper_workspace_tpu.pipeline import transcriber as tr_mod
    tr_mod.FALLBACK_TEMPERATURES = (0.0,)
    tcfg = TranscriptionConfig(
        batch_size=BATCH, beam_size=BEAM, max_decode_len=DECODE_LEN,
        language="en",
    )
    tr = load_transcriber(params, dims, tcfg)
    tr.rules = DecodeRules(
        specials=tr.tokenizer.specials, timestamps=True,
        extra_suppress=(tr.tokenizer.specials.eot,),
    )
    pcfg = PipelineConfig()
    pcfg.llm.enabled = False
    pipe = AudioProcessingPipeline(pcfg, transcriber=tr)

    t0 = time.time()
    pipe.process_batch(paths, enrich=False)     # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    results = pipe.process_batch(paths, enrich=False)
    elapsed = time.time() - t0
    shutil.rmtree(tmpdir, ignore_errors=True)
    assert len(results) == n_files
    tps = results[0]["processing_times"]
    value = total_audio_s / elapsed
    print(json.dumps({
        "metric": "pipeline_e2e",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / 500.0, 3),
        "detail": {
            "files": n_files, "file_s": file_s, "model": MODEL,
            "batch": BATCH, "beam": BEAM, "decode_len": DECODE_LEN,
            "warm_pass_s": round(compile_s, 1),
            "elapsed_s": round(elapsed, 2),
            "t_transcribe_s": round(tps["transcription"], 2),
            "t_diarize_s": round(tps["diarization"], 2),
            "device": str(jax.devices()[0]),
        },
    }), flush=True)


def main():
    dims = wm.WHISPER_CONFIGS[MODEL]
    params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    # random weights sample EOT immediately and the loop early-exits;
    # suppress EOT so every window decodes the full DECODE_LEN tokens
    drules = rules_mod.DecodeRules(
        specials=sp, timestamps=True, extra_suppress=(sp.eot,)
    )
    prompt = jnp.tile(
        jnp.asarray([[sp.sot, sp.language_tokens["en"], sp.transcribe]],
                    jnp.int32),
        (BATCH, 1),
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, mel_ops.N_SAMPLES)).astype(np.float32) * 0.1
    )

    if MODE in ("asr", "both"):
        bench_asr_greedy(params, dims, drules, prompt, audio)
    if MODE in ("llm", "both"):
        bench_llm_decode()
    if MODE in ("e2e", "both"):
        bench_pipeline_e2e(params, dims)
    # BASELINE gate config LAST — the driver records the final line
    if MODE in ("pipeline", "both"):
        bench_pipeline_beam5(params, dims, drules, prompt, audio)


if __name__ == "__main__":
    main()
