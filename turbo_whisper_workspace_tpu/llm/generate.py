"""Jitted autoregressive generation for the Llama LM.

The reference's token-by-token llama.cpp decode (hot loop #4,
llm_helper.py:469-477) becomes one compiled lax.while_loop with a
fixed-shape cache — the same discipline as decode/greedy.py, minus the
Whisper grammar.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import llama as lm


class GenResult(NamedTuple):
    tokens: jax.Array     # (B, P + max_len)
    lengths: jax.Array    # (B,)


@functools.partial(
    jax.jit, static_argnames=("dims", "max_len", "eos_tokens")
)
def generate_tokens(
    params,
    dims: lm.LlamaDims,
    prompt: jax.Array,          # (B, P) int32
    *,
    max_len: int = 256,
    temperature: jax.Array | float = 0.0,
    eos_tokens: tuple = (),
    key: jax.Array | None = None,
) -> GenResult:
    temperature = jnp.asarray(temperature, jnp.float32)
    if key is None:
        key = jax.random.key(0, impl="rbg")
    b, p = prompt.shape
    total = p + max_len
    assert total <= dims.max_ctx
    eos = jnp.asarray(eos_tokens or (0,), jnp.int32)
    pad_tok = eos[0]

    cache = lm.init_kv_cache(dims, b, max_len=total,
                             dtype=params["token_emb"].dtype)
    prefill_logits, cache = lm.forward(params, dims, prompt, cache, pos=0)
    tokens = jnp.concatenate(
        [prompt, jnp.full((b, max_len), pad_tok, jnp.int32)], axis=1
    )

    class Carry(NamedTuple):
        step: jax.Array
        tokens: jax.Array
        cache: dict
        last_logits: jax.Array
        finished: jax.Array

    init = Carry(jnp.array(0), tokens, cache,
                 prefill_logits[:, -1].astype(jnp.float32),
                 jnp.zeros((b,), bool))

    def cond(c):
        return (c.step < max_len) & ~jnp.all(c.finished)

    def body(c):
        # gumbel-max: exact argmax at T=0, exact categorical at T>0
        gumbel = jax.random.gumbel(
            jax.random.fold_in(key, c.step), c.last_logits.shape, jnp.float32
        )
        next_tok = jnp.argmax(
            c.last_logits + temperature * gumbel, axis=-1
        ).astype(jnp.int32)
        next_tok = jnp.where(c.finished, pad_tok, next_tok)
        finished = c.finished | jnp.any(next_tok[:, None] == eos[None], axis=-1)
        pos = p + c.step
        tokens = jax.lax.dynamic_update_slice(c.tokens, next_tok[:, None], (0, pos))
        logits, cache = lm.forward(params, dims, next_tok[:, None], c.cache, pos=pos)
        return Carry(c.step + 1, tokens, cache,
                     logits[:, 0].astype(jnp.float32), finished)

    final = jax.lax.while_loop(cond, body, init)
    sampled = final.tokens[:, p:]
    is_eos = jnp.any(sampled[:, :, None] == eos[None, None], axis=-1)
    lengths = jnp.where(
        jnp.any(is_eos, axis=-1), jnp.argmax(is_eos, axis=-1), max_len
    )
    return GenResult(tokens=final.tokens, lengths=lengths)
