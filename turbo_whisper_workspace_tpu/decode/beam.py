"""Fixed-shape beam search with Whisper's constraint grammar, under jit.

The reference reaches beam search only through its retry ladder
(dynamic_bar_audio.py:513-560 passes beam sizes 10/15 to the HF
pipeline). Here beam-5 with timestamp/language-token constraints is a
first-class jitted decoder (BASELINE config #3).

TPU-first shape discipline: beams are flattened into the batch axis
(B*K rows through the decoder), alive and finished hypothesis sets are
fixed (B, K) arrays, and every step is pure gather/top-k — so the whole
search is one `lax.while_loop` in one XLA program and the same compiled
code serves any batch size. Beam state that must cross devices when the
batch axis is sharded (scores, source-beam indices) moves via XLA
collectives inserted automatically from sharding annotations
(parallel/sharding.py); nothing here is host-side.

Semantics follow openai/whisper's BeamSearchDecoder + MaximumLikelihoodRanker:
sum-logprob scoring during search, EOT hypotheses retired into the
finished set, termination when every batch item holds K finished
hypotheses, final ranking by length-normalized score.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import whisper as wm
from .rules import DecodeRules, NEG_INF, update_ts_floor


class BeamResult(NamedTuple):
    tokens: jax.Array          # (B, total) best hypothesis, EOT-padded
    lengths: jax.Array         # (B,) sampled length of best hypothesis
    sum_logprobs: jax.Array    # (B,)
    avg_logprobs: jax.Array    # (B,)
    no_speech_probs: jax.Array # (B,)
    all_tokens: jax.Array      # (B, K, total) full finished set
    all_scores: jax.Array      # (B, K)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "rules", "beam_size", "max_len", "sot_index",
                     "quantize_cache", "lane_cache"),
)
def beam_decode_features(
    params,
    dims: wm.WhisperDims,
    cross_kv,                     # (L, B, 1500, D)
    prompt: jax.Array,            # (B, P)
    *,
    rules: DecodeRules,
    beam_size: int = 5,
    max_len: int = 224,
    sot_index: int = 0,
    quantize_cache: bool = False,
    lane_cache: bool = True,
) -> BeamResult:
    sp = rules.specials
    b, p = prompt.shape
    k = beam_size
    bk = b * k
    total = p + max_len
    assert total <= dims.n_text_ctx

    # Cross-KV is NOT tiled across beams: the decoder reads ONE copy per
    # batch row and feeds K query rows through it (decoder_forward
    # beam=k) — beam-tiling it K× was the dominant decode-step traffic.
    dtype = params["decoder"]["token_emb"].dtype
    static_mask = rules.static_mask()
    begin_mask = rules.begin_mask()

    # Prefill once at B rows (every beam shares the prompt).
    # quantize_cache=True additionally switches the self-KV cache to the
    # int8 "lane" layout (L, B, H, K, T, Dh): lanes are NEVER physically
    # reordered across steps — a (B, K, T) lane_map records which lane
    # owns each position for the current beams and the attention kernel
    # selects lanes in VMEM (ops/attention.self_attention_int8_lanes).
    # The per-step cache regather this replaces was the single largest
    # beam-decode cost (~430 MB read+write per step at batch 32).
    lane_cache = lane_cache and quantize_cache
    cache_b = wm.init_kv_cache(dims, b, max_len=total, dtype=dtype,
                               quantize=quantize_cache)
    prefill_logits, cache_b = wm.decoder_forward(
        params, dims, prompt, cross_kv, cache_b, pos=0
    )
    if lane_cache:
        cache = wm.beam_lane_cache(cache_b, k)
    else:
        # physical per-step regather path (lane_cache=False A/B fallback)
        cache = jax.tree.map(lambda x: jnp.repeat(x, k, axis=1), cache_b)
    lane_map0 = jnp.zeros((b, k, total), jnp.int32)
    no_speech_probs = jax.nn.softmax(
        prefill_logits[:, sot_index].astype(jnp.float32), axis=-1
    )[:, sp.no_speech]

    prompt_bk = jnp.repeat(prompt, k, axis=0)
    tokens0 = jnp.concatenate(
        [prompt_bk, jnp.full((bk, max_len), sp.eot, jnp.int32)], axis=1
    ).reshape(b, k, total)

    class Carry(NamedTuple):
        step: jax.Array
        alive_tokens: jax.Array     # (B, K, total)
        alive_scores: jax.Array     # (B, K) sum logprob
        cache: dict
        lane_map: jax.Array         # (B, K, total) int32 (lane cache only)
        last_logits: jax.Array      # (B*K, V)
        last_tok: jax.Array         # (B*K,)
        penult_tok: jax.Array       # (B*K,)
        ts_floor: jax.Array         # (B*K,)
        fin_tokens: jax.Array       # (B, K, total)
        fin_scores: jax.Array       # (B, K)
        fin_lengths: jax.Array      # (B, K)

    # beam 0 active, the rest start at -inf so step 0 yields K distinct beams
    alive_scores = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
        )[None],
        (b, 1),
    ).astype(jnp.float32)

    non_ts = jnp.zeros((bk,), jnp.int32)
    ts_sent = jnp.full((bk,), sp.timestamp_begin, jnp.int32)
    init = Carry(
        step=jnp.array(0),
        alive_tokens=tokens0,
        alive_scores=alive_scores,
        cache=cache,
        lane_map=lane_map0,
        last_logits=jnp.repeat(
            prefill_logits[:, -1].astype(jnp.float32), k, axis=0
        ),
        last_tok=non_ts,
        penult_tok=ts_sent,
        ts_floor=jnp.full((bk,), sp.timestamp_begin, jnp.int32),
        fin_tokens=jnp.full((b, k, total), sp.eot, jnp.int32),
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_lengths=jnp.zeros((b, k), jnp.int32),
    )

    v = sp.n_vocab

    def cond(c: Carry):
        saturated = jnp.all(c.fin_scores > NEG_INF / 2)
        return (c.step < max_len) & jnp.logical_not(saturated)

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
        # top 2K candidates per batch item — enough to fill K alive
        # (non-EOT) beams even if K candidates are EOT. Two-stage exact
        # top-k: any global top-2K candidate is inside its own beam's
        # top-2K, so per-beam top-2K (rows of V) then a merge over the
        # K·2K survivors selects the same set as one top-2K over K·V —
        # at a fraction of the sort cost (XLA top_k cost grows with row
        # length; the merge rows are only 2K² wide).
        #
        # Measured footgun (scripts/profile_beam_ops.py, v5e): running
        # top_k on RAW logits and recovering the row logsumexp from the
        # top-1 plus one fused exp-sum pass — "saving" the (B·K, V)
        # log_softmax write — measured 8 ms/step SLOWER than this plain
        # form (the log_softmax pass itself costs 0.1 ms/step; whatever
        # that data dependency does to XLA's schedule costs 20× that).
        # Keep the boring version.
        logp = jax.nn.log_softmax(masked, axis=-1)           # (B*K, V)
        cand = c.alive_scores.reshape(bk, 1) + logp
        s1, i1 = jax.lax.top_k(cand, 2 * k)                  # (B*K, 2K)
        top_scores, m2 = jax.lax.top_k(
            s1.reshape(b, k * 2 * k), 2 * k)                 # (B, 2K)
        src_beam = m2 // (2 * k)                             # (B, 2K)
        tok = jnp.take_along_axis(
            i1.reshape(b, k * 2 * k), m2, axis=1).astype(jnp.int32)
        is_eot = tok == sp.eot

        pos = p + c.step

        # ---- finished set: merge EOT candidates, keep top-K by score
        eot_scores = jnp.where(is_eot, top_scores, NEG_INF)  # (B, 2K)
        # gather candidate token buffers (with EOT written at pos)
        cand_tokens = jnp.take_along_axis(
            c.alive_tokens, src_beam[:, :, None], axis=1
        )                                                    # (B, 2K, total)
        merged_scores = jnp.concatenate([c.fin_scores, eot_scores], axis=1)
        merged_tokens = jnp.concatenate([c.fin_tokens, cand_tokens], axis=1)
        merged_lengths = jnp.concatenate(
            [c.fin_lengths, jnp.full((b, 2 * k), c.step, jnp.int32)], axis=1
        )
        fin_top, fin_idx = jax.lax.top_k(merged_scores, k)   # (B, K)
        fin_tokens = jnp.take_along_axis(
            merged_tokens, fin_idx[:, :, None], axis=1
        )
        fin_lengths = jnp.take_along_axis(merged_lengths, fin_idx, axis=1)

        # ---- alive set: best K non-EOT candidates
        alive_cand_scores = jnp.where(is_eot, NEG_INF, top_scores)
        alive_top, alive_idx = jax.lax.top_k(alive_cand_scores, k)  # (B, K)
        alive_src = jnp.take_along_axis(src_beam, alive_idx, axis=1)  # (B, K)
        alive_tok = jnp.take_along_axis(tok, alive_idx, axis=1)       # (B, K)

        # gather alive token buffers + write the new token
        alive_tokens = jnp.take_along_axis(
            c.alive_tokens, alive_src[:, :, None], axis=1
        )
        alive_tokens = jax.lax.dynamic_update_slice(
            alive_tokens, alive_tok[:, :, None], (0, 0, pos)
        )

        # ---- gather per-beam decoder state by flat source index
        flat_src = (
            jnp.arange(b)[:, None] * k + alive_src
        ).reshape(bk)                                        # (B*K,)
        if lane_cache:
            # Lane cache: the KV cache itself is NEVER moved. Only the
            # (B, K, T) int32 ancestry map is regathered (~80 KB vs the
            # ~430 MB/step physical reorder it replaces); the new row
            # this step writes belongs to lane k by construction.
            cache = c.cache
            lane_map = jnp.take_along_axis(
                c.lane_map, alive_src[:, :, None], axis=1)
            lane_map = jax.lax.dynamic_update_slice(
                lane_map,
                jnp.broadcast_to(
                    jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, 1)
                ),
                (0, 0, pos),
            )
        else:
            # bf16 cache: physical reorder. Measured on v5e
            # (scripts/profile_beam_ops.py, (4,160,131,1280) bf16):
            # jnp.take on axis 1 moves the cache at ~185 GB/s (4.6
            # ms/step); a one-hot MXU copy is WORSE (5.7 ms); flattening
            # (L, B·K) into one leading axis and taking axis 0 lowers to
            # large contiguous row copies at ~300 GB/s — use that.
            def regather(x):
                l, bk_ = x.shape[:2]
                flat = x.reshape((l * bk_,) + x.shape[2:])
                idx = (jnp.arange(l)[:, None] * bk_
                       + flat_src[None]).reshape(-1)
                return jnp.take(flat, idx, axis=0).reshape(x.shape)

            cache = jax.tree.map(regather, c.cache)
            lane_map = c.lane_map
        last_tok_g = jnp.take(c.last_tok, flat_src)
        ts_floor_g = jnp.take(c.ts_floor, flat_src)

        next_tok = alive_tok.reshape(bk)
        ts_floor = update_ts_floor(ts_floor_g, next_tok, last_tok_g, sp)
        new_penult = jnp.where(c.step == 0, ts_sent, last_tok_g)

        logits, cache = wm.decoder_forward(
            params, dims, next_tok[:, None], cross_kv, cache, pos=pos,
            beam=k, lane_map=lane_map if lane_cache else None,
        )
        return Carry(
            step=c.step + 1,
            alive_tokens=alive_tokens,
            alive_scores=alive_top,
            cache=cache,
            lane_map=lane_map,
            last_logits=logits[:, 0].astype(jnp.float32),
            last_tok=next_tok,
            penult_tok=new_penult,
            ts_floor=ts_floor,
            fin_tokens=fin_tokens,
            fin_scores=fin_top,
            fin_lengths=fin_lengths,
        )

    final = jax.lax.while_loop(cond, body, init)

    # If nothing finished (max_len hit), fall back to alive hypotheses.
    any_fin = final.fin_scores > NEG_INF / 2
    fin_scores = jnp.where(any_fin, final.fin_scores, final.alive_scores)
    fin_tokens = jnp.where(
        any_fin[:, :, None], final.fin_tokens, final.alive_tokens
    )
    fin_lengths = jnp.where(
        any_fin, final.fin_lengths, jnp.full_like(final.fin_lengths, max_len)
    )

    # MaximumLikelihoodRanker: maximize sum_logprob / (length + 1)
    norm = fin_scores / (fin_lengths.astype(jnp.float32) + 1.0)
    best = jnp.argmax(norm, axis=1)                          # (B,)
    best_tokens = jnp.take_along_axis(
        fin_tokens, best[:, None, None], axis=1
    )[:, 0]
    best_scores = jnp.take_along_axis(fin_scores, best[:, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(fin_lengths, best[:, None], axis=1)[:, 0]
    avg = best_scores / (best_lengths.astype(jnp.float32) + 1.0)
    return BeamResult(
        tokens=best_tokens,
        lengths=best_lengths,
        sum_logprobs=best_scores,
        avg_logprobs=avg,
        no_speech_probs=no_speech_probs,
        all_tokens=fin_tokens,
        all_scores=fin_scores,
    )


def beam_decode(params, dims, mel, prompt, **kw) -> BeamResult:
    audio = wm.encoder_forward(params, dims, mel)
    cross_kv = wm.precompute_cross_kv(params, dims, audio)
    return beam_decode_features(params, dims, cross_kv, prompt, **kw)
