"""Llama decoder parity vs transformers + generation loop behavior."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.models import llama as lm


@pytest.fixture(scope="module")
def setup():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    dims = lm.LLAMA_CONFIGS["test-tiny"]
    cfg = LlamaConfig(
        vocab_size=dims.n_vocab, hidden_size=dims.d_model,
        num_hidden_layers=dims.n_layer, num_attention_heads=dims.n_head,
        num_key_value_heads=dims.n_kv_head, intermediate_size=dims.d_ff,
        rope_theta=dims.rope_theta, rms_norm_eps=dims.norm_eps,
        max_position_embeddings=dims.max_ctx, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg).eval()
    params = lm.params_from_hf_state_dict(model.state_dict(), dims)
    return model, params, dims


def test_forward_parity(setup, rng):
    import torch

    model, params, dims = setup
    tokens = rng.integers(0, dims.n_vocab, (2, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = lm.forward(params, dims, tokens)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_incremental_matches_full(setup, rng):
    import jax.numpy as jnp

    _, params, dims = setup
    tokens = rng.integers(0, dims.n_vocab, (2, 7))
    full, _ = lm.forward(params, dims, jnp.asarray(tokens))
    cache = lm.init_kv_cache(dims, 2, max_len=7, dtype=jnp.float32)
    steps = []
    for t in range(7):
        lg, cache = lm.forward(
            params, dims, jnp.asarray(tokens[:, t : t + 1]), cache, pos=t
        )
        steps.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(
        np.stack(steps, 1), np.asarray(full), atol=1e-4, rtol=1e-4
    )


def test_generate_stops_at_eos(setup):
    import jax

    _, params, dims = setup
    from turbo_whisper_workspace_tpu.llm.generate import generate_tokens

    prompt = np.array([[5, 6, 7]], np.int32)
    res = generate_tokens(
        params, dims, prompt, max_len=32, eos_tokens=(2,),
    )
    toks = np.asarray(res.tokens)[0, 3:]
    n = int(res.lengths[0])
    if n < 32:  # hit EOS
        assert toks[n] == 2 or (toks[:n] != 2).all()
    assert res.tokens.shape == (1, 35)
