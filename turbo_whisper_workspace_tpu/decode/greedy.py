"""KV-cached greedy / sampled decode under a single jit.

Replaces the per-token CUDA decode loop the reference drives through HF
generate() (hot loop #1 in SURVEY.md §3.1). The whole autoregressive
loop is one `lax.while_loop` inside one compiled XLA program: fixed-shape
token buffer, preallocated KV cache, constraint masks from
decode/rules.py, early exit when every sequence has emitted EOT.

Returned bookkeeping mirrors openai/whisper's DecodingResult fields the
long-form scheduler needs for its temperature-escalation fallbacks
(avg_logprob, no_speech_prob), cf. the reference's retry ladder at
dynamic_bar_audio.py:513-560.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import whisper as wm
from .rules import DecodeRules, update_ts_floor


class DecodeResult(NamedTuple):
    tokens: jax.Array         # (B, P + max_len) int32, EOT-padded
    lengths: jax.Array        # (B,) sampled tokens before EOT
    sum_logprobs: jax.Array   # (B,) f32 over sampled tokens (incl. EOT)
    avg_logprobs: jax.Array   # (B,)
    no_speech_probs: jax.Array  # (B,) P(<|nospeech|>) at the SOT position


@functools.partial(
    jax.jit,
    static_argnames=("dims", "rules", "max_len", "sot_index", "cache_len"),
)
def greedy_decode_features(
    params,
    dims: wm.WhisperDims,
    cross_kv,
    prompt: jax.Array,               # (B, P) int32
    *,
    rules: DecodeRules,
    max_len: int = 224,
    temperature: jax.Array | float = 0.0,
    key: jax.Array | None = None,
    sot_index: int = 0,
    cache_len: int | None = None,
) -> DecodeResult:
    # temperature is a *traced* value (escalation fallbacks re-decode at
    # 0.2…1.0 — a static temperature would recompile the whole loop per
    # retry). argmax-vs-sample is selected with jnp.where below.
    temperature = jnp.asarray(temperature, jnp.float32)
    if key is None:
        # rbg: hardware-friendly PRNG — the per-step gumbel draw over the
        # full vocab is otherwise a visible slice of the decode step
        key = jax.random.key(0, impl="rbg")
    sp = rules.specials
    b, p = prompt.shape
    total = p + max_len
    cache_len = cache_len or min(total, dims.n_text_ctx)
    assert total <= dims.n_text_ctx

    cache = wm.init_kv_cache(
        dims, b, max_len=cache_len, dtype=params["decoder"]["token_emb"].dtype
    )
    static_mask = rules.static_mask()
    begin_mask = rules.begin_mask()

    # ---- prefill the prompt in one pass
    prefill_logits, cache = wm.decoder_forward(
        params, dims, prompt, cross_kv, cache, pos=0
    )
    no_speech_probs = jax.nn.softmax(
        prefill_logits[:, sot_index].astype(jnp.float32), axis=-1
    )[:, sp.no_speech]

    tokens = jnp.concatenate(
        [prompt, jnp.full((b, max_len), sp.eot, jnp.int32)], axis=1
    )

    class Carry(NamedTuple):
        step: jax.Array
        tokens: jax.Array
        cache: dict
        last_logits: jax.Array   # (B, V) logits for next sample
        last_tok: jax.Array
        penult_tok: jax.Array
        ts_floor: jax.Array
        finished: jax.Array
        sum_logprobs: jax.Array

    # Pairing state follows openai/whisper's convention of looking at
    # SAMPLED tokens only: before anything is sampled, "last" is a
    # non-timestamp sentinel (no pairing constraint — the begin mask
    # governs step 0) and "penultimate" is treated as a timestamp
    # (fewer than two sampled ⇒ penultimate_was_timestamp = True).
    non_ts_sentinel = jnp.zeros((b,), jnp.int32)
    ts_sentinel = jnp.full((b,), sp.timestamp_begin, jnp.int32)
    init = Carry(
        step=jnp.array(0),
        tokens=tokens,
        cache=cache,
        last_logits=prefill_logits[:, -1].astype(jnp.float32),
        last_tok=non_ts_sentinel,
        penult_tok=ts_sentinel,
        ts_floor=jnp.full((b,), sp.timestamp_begin, jnp.int32),
        finished=jnp.zeros((b,), bool),
        sum_logprobs=jnp.zeros((b,), jnp.float32),
    )

    def cond(c: Carry):
        return (c.step < max_len) & jnp.logical_not(jnp.all(c.finished))

    def body(c: Carry) -> Carry:
        masked = rules.apply(
            c.last_logits,
            is_begin=c.step == 0,
            last_tok=c.last_tok,
            penult_tok=c.penult_tok,
            ts_floor=c.ts_floor,
            static_mask=static_mask,
            begin_mask=begin_mask,
        )
        # gumbel-max: argmax(logits + T·G) samples softmax(logits/T) and
        # degenerates to exact argmax at T=0; the T=0 branch (the
        # shipping greedy path) skips the full-vocab RNG draw entirely
        def _sample(m):
            gumbel = jax.random.gumbel(
                jax.random.fold_in(key, c.step), m.shape, jnp.float32
            )
            return jnp.argmax(m + temperature * gumbel, axis=-1)

        next_tok = jax.lax.cond(
            temperature > 0.0, _sample, lambda m: jnp.argmax(m, axis=-1), masked
        ).astype(jnp.int32)
        # NB: the "cheaper" max+exp-sum logsumexp recovery (avoiding the
        # (B, V) log_softmax materialization) measured SLOWER end-to-end
        # on v5e — same pathology as the beam-side raw-top_k variant
        # (see decode/beam.py body comment). Keep the plain form.
        logp = jax.nn.log_softmax(masked, axis=-1)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None], axis=-1)[:, 0]

        next_tok = jnp.where(c.finished, sp.eot, next_tok)
        sum_logprobs = c.sum_logprobs + jnp.where(c.finished, 0.0, tok_logp)
        now_finished = c.finished | (next_tok == sp.eot)

        pos = p + c.step
        tokens = jax.lax.dynamic_update_slice(
            c.tokens, next_tok[:, None], (0, pos)
        )
        ts_floor = update_ts_floor(c.ts_floor, next_tok, c.last_tok, sp)

        logits, cache = wm.decoder_forward(
            params, dims, next_tok[:, None], cross_kv, c.cache, pos=pos
        )
        # penultimate stays the ts-sentinel while fewer than 2 tokens sampled
        new_penult = jnp.where(c.step == 0, ts_sentinel, c.last_tok)
        return Carry(
            step=c.step + 1,
            tokens=tokens,
            cache=cache,
            last_logits=logits[:, 0].astype(jnp.float32),
            last_tok=next_tok,
            penult_tok=new_penult,
            ts_floor=ts_floor,
            finished=now_finished,
            sum_logprobs=sum_logprobs,
        )

    final = jax.lax.while_loop(cond, body, init)

    sampled = final.tokens[:, p:]
    lengths = jnp.argmax(sampled == sp.eot, axis=-1)
    # no EOT found → full length
    lengths = jnp.where(jnp.any(sampled == sp.eot, axis=-1), lengths, max_len)
    avg = final.sum_logprobs / jnp.maximum(lengths + 1, 1).astype(jnp.float32)
    return DecodeResult(
        tokens=final.tokens,
        lengths=lengths,
        sum_logprobs=final.sum_logprobs,
        avg_logprobs=avg,
        no_speech_probs=no_speech_probs,
    )


def greedy_decode(
    params, dims: wm.WhisperDims, mel: jax.Array, prompt: jax.Array, **kw
) -> DecodeResult:
    """mel (B, n_mels, 3000) + prompt (B, P) → DecodeResult."""
    audio = wm.encoder_forward(params, dims, mel)
    cross_kv = wm.precompute_cross_kv(params, dims, audio)
    return greedy_decode_features(params, dims, cross_kv, prompt, **kw)


@functools.partial(
    jax.jit, static_argnames=("dims", "sot", "lang_token_start", "n_languages")
)
def detect_language_features(params, dims: wm.WhisperDims, cross_kv, sot: int,
                             lang_token_start: int, n_languages: int):
    """One decoder step from <|sot|>, restricted to language tokens.

    Returns (B, n_languages) probabilities (reference behavior: language
    auto-detect when no language is pinned — HF pipeline default)."""
    b = jax.tree.leaves(cross_kv)[0].shape[1]
    prompt = jnp.full((b, 1), sot, jnp.int32)
    logits, _ = wm.decoder_forward(params, dims, prompt, cross_kv)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0].astype(jnp.float32), lang_token_start, n_languages, axis=-1
    )
    return jax.nn.softmax(lang_logits, axis=-1)


def detect_language(params, dims, mel, specials):
    audio = wm.encoder_forward(params, dims, mel)
    cross_kv = wm.precompute_cross_kv(params, dims, audio)
    probs = detect_language_features(
        params, dims, cross_kv, specials.sot, specials.sot + 1, specials.n_languages
    )
    return probs
