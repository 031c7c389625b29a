"""End-to-end learnability: tiny Whisper trained on a toy audio→token task
decodes it back through the REAL inference stack.

With no pretrained weights reachable offline, this is the strongest
available end-to-end accuracy evidence: the full chain (mel frontend →
encoder → cross-KV → constrained greedy/beam decode → timestamp split →
long-form stride merge) learns a synthetic "language" of tone-words on a
fixed slot grid and transcribes held-out clips — including a multi-window
clip through decode/longform.py with merged-timestamp correctness.

The toy uses 2 s windows (encoder ctx 100) instead of Whisper's native
30 s so training runs in seconds on CPU; every inference component is the
production one (greedy.py, beam.py, rules.py, longform.py, mel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from turbo_whisper_workspace_tpu.decode import (
    beam as beam_mod,
    greedy,
    longform,
    rules as rules_mod,
    tokenizer,
)
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops

SR = 16000
WINDOW_S = 2.0                      # toy window (prod: 30 s)
N_SAMPLES = int(SR * WINDOW_S)      # 32_000 → 200 mel frames → ctx 100
# four tone-"words": distinct fundamentals, 0.3 s each, on a 0.4 s slot grid
WORD_F0 = {10: 220.0, 11: 330.0, 12: 440.0, 13: 550.0}
WORD_IDS = list(WORD_F0)
SLOT_STARTS = (0.1, 0.5, 0.9, 1.3)  # in-window word start times
WORD_DUR = 0.3

# vocab 517 → toy layout: eot=399, sot=400, timestamp_begin=417,
# 100 timestamp tokens = 0.00…1.98 s — covers the 2 s toy window the same
# way 1500 tokens cover the real 30 s window
DIMS = wm.WhisperDims(80, 100, 64, 2, 2, 517, 448, 64, 2, 2)
SP = tokenizer.special_tokens_for_vocab(DIMS.n_vocab)
RULES = rules_mod.DecodeRules(specials=SP, timestamps=True,
                              max_initial_timestamp_s=WINDOW_S)
SOT_SEQ = SP.sot_sequence("en", timestamps=True)
# 3 prompt + 4 slots × (ts, word, ts) + eot
TARGET_LEN = len(SOT_SEQ) + len(SLOT_STARTS) * 3 + 1


def _tone(word: int) -> np.ndarray:
    t = np.arange(int(WORD_DUR * SR)) / SR
    env = np.hanning(len(t))
    return (0.4 * env * np.sin(2 * np.pi * WORD_F0[word] * t)).astype(np.float32)


def _render(slots: list, total_s: float, slot_starts, rng) -> np.ndarray:
    """slots: list of (start_s, word) → waveform with noise floor."""
    audio = 0.005 * rng.standard_normal(int(total_s * SR)).astype(np.float32)
    for start_s, w in slots:
        i = int(start_s * SR)
        seg = _tone(w)
        audio[i : i + len(seg)] += seg
    return audio


def _sample_clip(rng):
    """One training clip: each slot empty (p=.25) or a random word."""
    while True:
        slots = [
            (s, int(rng.choice(WORD_IDS)))
            for s in SLOT_STARTS
            if rng.random() > 0.25
        ]
        if slots:
            break
    audio = _render(slots, WINDOW_S, SLOT_STARTS, rng)
    target = list(SOT_SEQ)
    for start_s, w in slots:
        target += [SP.timestamp_token(start_s), w,
                   SP.timestamp_token(start_s + WORD_DUR + 0.1)]
    target.append(SP.eot)
    target += [SP.eot] * (TARGET_LEN - len(target))
    return audio, target, slots


def _mels(audios) -> jnp.ndarray:
    return jnp.asarray(
        np.asarray(
            mel_ops.log_mel_spectrogram(jnp.asarray(np.stack(audios)), num_mels=80)
        )
    )


@pytest.fixture(scope="module")
def trained():
    """Train the toy model once; shared by greedy/beam/longform tests."""
    rng = np.random.default_rng(0)
    xs, ys = [], []
    for _ in range(48):
        a, t, _ = _sample_clip(rng)
        xs.append(a)
        ys.append(t)
    mels = _mels(xs)
    toks = jnp.asarray(np.asarray(ys, np.int32))

    params = wm.init_params(DIMS, jax.random.PRNGKey(0))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-3, warmup_steps=20, decay_steps=400, end_value=3e-4
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mels, toks):
        def loss_fn(p):
            logits = wm.forward(p, DIMS, mels, toks[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(400):
        params, opt_state, loss = step(params, opt_state, mels, toks)
        losses.append(float(loss))
        if losses[-1] < 0.01 and i >= 50:
            break
    assert losses[-1] < 0.05, f"did not fit toy task: {losses[::50]}"
    return params


def _expected_tokens(slots) -> list:
    out = []
    for start_s, w in slots:
        out += [SP.timestamp_token(start_s), w,
                SP.timestamp_token(start_s + WORD_DUR + 0.1)]
    return out


def _held_out_batch(seed: int, n: int = 4):
    rng = np.random.default_rng(seed)
    clips = [_sample_clip(rng) for _ in range(n)]
    mels = _mels([c[0] for c in clips])
    expected = [_expected_tokens(c[2]) for c in clips]
    return mels, expected


@pytest.mark.slow
def test_greedy_decodes_held_out_clips(trained):
    mels, expected = _held_out_batch(seed=1234)
    n = mels.shape[0]
    prompt = jnp.tile(jnp.asarray([SOT_SEQ], jnp.int32), (n, 1))
    res = greedy.greedy_decode(trained, DIMS, mels, prompt,
                               rules=RULES, max_len=TARGET_LEN)
    p_len = prompt.shape[1]
    correct = 0
    for i in range(n):
        out = [int(t) for t in np.asarray(res.tokens)[i, p_len:]][: int(res.lengths[i])]
        correct += out == expected[i]
    assert correct >= 3, f"greedy decoded {correct}/{n} held-out clips"


@pytest.mark.slow
def test_beam5_decodes_held_out_clips(trained):
    mels, expected = _held_out_batch(seed=99)
    n = mels.shape[0]
    prompt = jnp.tile(jnp.asarray([SOT_SEQ], jnp.int32), (n, 1))
    res = beam_mod.beam_decode(trained, DIMS, mels, prompt,
                               rules=RULES, beam_size=5, max_len=TARGET_LEN)
    p_len = prompt.shape[1]
    correct = 0
    for i in range(n):
        out = [int(t) for t in np.asarray(res.tokens)[i, p_len:]][: int(res.lengths[i])]
        correct += out == expected[i]
    assert correct >= 3, f"beam-5 decoded {correct}/{n} held-out clips"


@pytest.mark.slow
def test_longform_multiwindow_merge(trained):
    """A clip longer than one window through the production long-form
    path: plan_chunks → per-window decode → split_timestamps →
    merge_chunk_segments, asserting merged ABSOLUTE timestamps.

    4.8 s audio → 3 windows (2 s chunk, 0.2 s stride → starts 0/1.6/2.8 s,
    all multiples of the 0.4 s slot grid so every tone is fully inside or
    fully outside each window; overlap regions are de-duplicated by the
    core-ownership rule exactly as in production)."""
    rng = np.random.default_rng(7)
    total_s = 4.8
    # global slot grid 0.1 + 0.4k; drop a couple to vary spacing
    slots = []
    for k in range(11):
        start = 0.1 + 0.4 * k
        if k in (2, 7):
            continue
        slots.append((round(start, 2), int(rng.choice(WORD_IDS))))
    audio = _render(slots, total_s, None, rng)

    plans = longform.plan_chunks(
        len(audio), chunk_s=WINDOW_S, stride_s=0.2
    )
    assert len(plans) == 3
    windows = [longform.slice_chunk(audio, pl, n_samples=N_SAMPLES) for pl in plans]
    mels = _mels(windows)
    prompt = jnp.tile(jnp.asarray([SOT_SEQ], jnp.int32), (len(plans), 1))
    res = greedy.greedy_decode(trained, DIMS, mels, prompt,
                               rules=RULES, max_len=TARGET_LEN)

    wt = tokenizer.WhisperTokenizer(specials=SP)
    p_len = prompt.shape[1]
    chunk_segments = []
    for i in range(len(plans)):
        ids = [int(t) for t in np.asarray(res.tokens)[i, p_len:]][: int(res.lengths[i])]
        segs = wt.split_timestamps(ids)
        chunk_segments.append(
            [{"start": s["start"], "end": s["end"], "text": s["tokens"]}
             for s in segs]
        )

    merged = longform.merge_chunk_segments(chunk_segments, plans, duration_s=total_s)

    got = [(round(m["start"], 2), m["text"][0] if m["text"] else None)
           for m in merged]
    want = [(s, w) for s, w in slots]
    # require ≥8/9 words recovered at the exact absolute slot time
    hits = sum(1 for g in got if g in want)
    assert len(got) >= 8, f"merged only {len(got)} segments: {got}"
    assert hits >= 8, f"only {hits}/9 correct merged (start, word): {got} vs {want}"
    # no duplicated starts (stride overlap de-duplication)
    starts = [g[0] for g in got]
    assert len(starts) == len(set(starts)), f"duplicate segments: {got}"
