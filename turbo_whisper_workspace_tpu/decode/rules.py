"""Whisper decode-time logit constraints, as fixed-shape masks under jit.

The reference inherits these from HF generate() inside the ASR pipeline
(vocalis/core/audio_pipeline.py:351-358, return_timestamps=True). Rules
implemented (the openai/whisper grammar):

* static suppress list (non-speech tokens + control specials);
* begin-suppress (blank / EOT cannot open a segment);
* timestamp pairing: after <|t|><|t|> the next token must be text;
  after a single <|t|> only a timestamp or EOT may follow;
* timestamps are monotonically non-decreasing within a window;
* the first sampled token must be a timestamp, capped at
  max_initial_timestamp (1.0 s);
* if the total timestamp probability mass beats the best text token,
  a timestamp must be emitted.

Everything is a vectorized `jnp.where` over the (B, V) logits — no
data-dependent Python control flow, so the whole decode loop stays in
one compiled XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .tokenizer import SpecialTokens

# Canonical non-speech suppress list for the published multilingual
# vocabularies (same content HF ships in generation_config.suppress_tokens).
CANONICAL_SUPPRESS = (
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254,
)

NEG_INF = -1e30  # finite -inf: keeps masked softmax NaN-free


@dataclass(frozen=True)
class DecodeRules:
    specials: SpecialTokens
    timestamps: bool = True
    max_initial_timestamp_s: float = 1.0
    extra_suppress: tuple = ()

    def _static_suppress_ids(self) -> np.ndarray:
        sp = self.specials
        ids = {sp.sot, sp.sot_prev, sp.sot_lm, sp.no_speech, sp.translate,
               sp.transcribe}
        ids.update(sp.language_tokens.values())
        ids.add(sp.no_timestamps)
        ids.update(i for i in self.extra_suppress if i < sp.n_vocab)
        if sp.n_vocab >= 51864:
            ids.update(i for i in CANONICAL_SUPPRESS if i < sp.n_vocab)
        return np.array(sorted(ids), dtype=np.int32)

    def static_mask(self) -> jnp.ndarray:
        """(V,) additive mask applied at every step."""
        mask = np.zeros((self.specials.n_vocab,), np.float32)
        mask[self._static_suppress_ids()] = NEG_INF
        return jnp.asarray(mask)

    def begin_mask(self) -> jnp.ndarray:
        """(V,) additive mask for the first sampled position only."""
        sp = self.specials
        mask = np.zeros((sp.n_vocab,), np.float32)
        # blank (" " = GPT-2 id 220) and EOT cannot begin a segment
        if sp.n_vocab > 220:
            mask[220] = NEG_INF
        mask[sp.eot] = NEG_INF
        if self.timestamps:
            # first token must be a timestamp, capped at max_initial
            mask[: sp.timestamp_begin] = NEG_INF
            cap = sp.timestamp_begin + int(self.max_initial_timestamp_s / 0.02) + 1
            if cap < sp.n_vocab:
                mask[cap:] = NEG_INF
        return jnp.asarray(mask)

    def apply(
        self,
        logits: jax.Array,        # (B, V) f32
        is_begin: jax.Array,      # scalar bool — first sampled position?
        last_tok: jax.Array,      # (B,) previous sampled token
        penult_tok: jax.Array,    # (B,) token before that
        ts_floor: jax.Array,      # (B,) minimum allowed timestamp token id
        static_mask: jax.Array,
        begin_mask: jax.Array,
    ) -> jax.Array:
        sp = self.specials
        v = sp.n_vocab
        logits = logits + static_mask[None]
        logits = jnp.where(is_begin, logits + begin_mask[None], logits)
        if not self.timestamps:
            ts_mask = jnp.zeros((v,), np.float32).at[sp.timestamp_begin :].set(NEG_INF)
            return logits + ts_mask[None]

        token_ids = jnp.arange(v)
        is_ts_tok = token_ids >= sp.timestamp_begin       # (V,)
        is_text_tok = token_ids < sp.eot                   # (V,)

        last_is_ts = last_tok >= sp.timestamp_begin        # (B,)
        penult_is_ts = penult_tok >= sp.timestamp_begin

        # after <|t|><|t|> → no more timestamps; after single <|t|> → no text
        ban_ts = (last_is_ts & penult_is_ts)[:, None] & is_ts_tok[None]
        ban_text = (last_is_ts & ~penult_is_ts)[:, None] & is_text_tok[None]
        # monotonicity: timestamps below the floor are banned
        ban_low = is_ts_tok[None] & (token_ids[None] < ts_floor[:, None])
        banned = ban_ts | ban_text | ban_low
        banned = banned & jnp.logical_not(is_begin)  # begin_mask governs step 0
        logits = jnp.where(banned, NEG_INF, logits)

        # timestamp-probability rule on the post-mask distribution.
        # Computed on RAW masked logits: logp = logits - lse(row) shifts
        # both sides of the comparison by the same per-row constant, so
        # logsumexp(ts logp) > max(text logp) ⟺ the same on raw logits —
        # skipping a full-vocab log_softmax materialization per step.
        ts_lse = jax.nn.logsumexp(
            jnp.where(is_ts_tok[None], logits, NEG_INF), axis=-1
        )
        max_text = jnp.max(jnp.where(is_ts_tok[None], NEG_INF, logits), axis=-1)
        force_ts = ts_lse > max_text                       # (B,)
        logits = jnp.where(
            force_ts[:, None] & ~is_ts_tok[None], NEG_INF, logits
        )
        return logits


def update_ts_floor(
    ts_floor: jax.Array, next_tok: jax.Array, prev_tok: jax.Array, sp: SpecialTokens
) -> jax.Array:
    """New minimum-allowed timestamp id after sampling next_tok.

    Mirrors openai/whisper's timestamp_last bookkeeping: a timestamp that
    follows text keeps an *inclusive* floor (the adjacent pair token may
    repeat the same value); a timestamp following a timestamp moves the
    floor past itself; and once text follows a timestamp the floor bumps
    past that timestamp (segment ends are strictly greater than starts).
    """
    tsb = sp.timestamp_begin
    is_ts = next_tok >= tsb
    prev_is_ts = prev_tok >= tsb
    floor = ts_floor
    floor = jnp.where(is_ts & ~prev_is_ts, jnp.maximum(floor, next_tok), floor)
    floor = jnp.where(is_ts & prev_is_ts, jnp.maximum(floor, next_tok + 1), floor)
    floor = jnp.where(~is_ts & prev_is_ts, jnp.maximum(floor, prev_tok + 1), floor)
    return floor
