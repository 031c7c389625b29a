"""End-to-end learnability: tiny Whisper trained on a toy audio→token task
decodes it back through the REAL inference stack.

With no pretrained weights reachable offline, this is the strongest
available end-to-end accuracy evidence: the full chain (mel frontend →
encoder → cross-KV → constrained greedy decode → timestamp split) learns
a synthetic 'language' of tone-words and transcribes held-out clips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from turbo_whisper_workspace_tpu.decode import greedy, rules as rules_mod, tokenizer
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops

SR = 16000
# four tone-"words": distinct fundamentals, 0.5 s each
WORD_F0 = {10: 220.0, 11: 330.0, 12: 440.0, 13: 550.0}


def _dims():
    # vocab 517 keeps the toy word ids (10-13) well below the special
    # tokens (eot=399 in the scaled test layout)
    return wm.WhisperDims(80, 1500, 64, 2, 2, 517, 448, 64, 2, 2)


def _clip(rng, words):
    audio = np.zeros(SR * 30, np.float32)
    t0 = 0.5
    for w in words:
        t = np.arange(int(0.5 * SR)) / SR
        seg = 0.4 * np.sin(2 * np.pi * WORD_F0[w] * t)
        i = int(t0 * SR)
        audio[i : i + len(seg)] += seg.astype(np.float32)
        t0 += 0.8
    return audio + 0.01 * rng.standard_normal(len(audio)).astype(np.float32)


@pytest.mark.slow
def test_toy_language_learned_end_to_end():
    rng = np.random.default_rng(0)
    dims = _dims()
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    word_ids = list(WORD_F0)

    # dataset: random 3-word sentences
    def sample(n):
        xs, ys = [], []
        for _ in range(n):
            words = list(rng.choice(word_ids, size=3))
            xs.append(_clip(rng, words))
            # target: sot-seq .. words .. eot  (no timestamps for the toy)
            ys.append(sp.sot_sequence("en", timestamps=False) + words + [sp.eot])
        mels = np.asarray(
            mel_ops.log_mel_spectrogram(jnp.asarray(np.stack(xs)), num_mels=80)
        )
        toks = np.asarray(ys, np.int32)
        return jnp.asarray(mels), jnp.asarray(toks), xs

    mels, toks, _ = sample(12)

    params = wm.init_params(dims, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mels, toks):
        def loss_fn(p):
            logits = wm.forward(p, dims, mels, toks[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, mels, toks)
        losses.append(float(loss))
    assert losses[-1] < 0.1, f"did not fit toy task: {losses[::30]}"

    # decode TRAIN clips through the real inference stack
    drules = rules_mod.DecodeRules(specials=sp, timestamps=False)
    prompt = jnp.tile(
        jnp.asarray([sp.sot_sequence("en", timestamps=False)], jnp.int32),
        (4, 1),
    )
    res = greedy.greedy_decode(
        params, dims, mels[:4], prompt, rules=drules, max_len=8
    )
    p_len = prompt.shape[1]
    correct = 0
    for i in range(4):
        out = [int(t) for t in np.asarray(res.tokens)[i, p_len:]][: int(res.lengths[i])]
        tgt = [int(t) for t in np.asarray(toks)[i, p_len:-1]]
        correct += out == tgt
    assert correct >= 3, f"decoded {correct}/4 training clips correctly"
