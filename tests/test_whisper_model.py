"""Whisper forward-pass parity vs transformers (torch CPU, random init).

Offline substitute for pretrained-WER gates: a random-init HF torch
Whisper (the same numerics the reference runs at
vocalis/core/audio_pipeline.py:195-200) is converted to our pytree; the
JAX forward must reproduce its logits.
"""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.models import convert, whisper


def _tiny_dims():
    return whisper.WhisperDims(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=517,
        n_text_ctx=448,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )


@pytest.fixture(scope="module")
def torch_and_jax():
    import torch
    from transformers import WhisperForConditionalGeneration

    dims = _tiny_dims()
    cfg = convert.hf_config_from_dims(dims)
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg).eval()
    params = convert.params_from_hf_state_dict(model.state_dict(), dims)
    return model, params, dims


def test_forward_parity(torch_and_jax, rng):
    import torch

    model, params, dims = torch_and_jax
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(2, 7))

    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    ours = np.asarray(whisper.forward(params, dims, mel, tokens))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_encoder_parity(torch_and_jax, rng):
    import torch

    model, params, dims = torch_and_jax
    mel = rng.standard_normal((1, dims.n_mels, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper.encoder_forward(params, dims, mel))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_incremental_decode_matches_full(torch_and_jax, rng):
    """KV-cached step-by-step decode must equal teacher-forced logits."""
    import jax.numpy as jnp

    _, params, dims = torch_and_jax
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(2, 6))

    audio = whisper.encoder_forward(params, dims, mel)
    ckv = whisper.precompute_cross_kv(params, dims, audio)

    full_logits, _ = whisper.decoder_forward(params, dims, jnp.asarray(tokens), ckv)
    full_logits = np.asarray(full_logits)

    cache = whisper.init_kv_cache(dims, 2, max_len=8, dtype=jnp.float32)
    step_logits = []
    for t in range(6):
        lg, cache = whisper.decoder_forward(
            params, dims, jnp.asarray(tokens[:, t : t + 1]), ckv, cache, pos=t
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, atol=1e-4, rtol=1e-4)


def test_save_load_roundtrip(torch_and_jax, tmp_path):
    import jax

    _, params, dims = torch_and_jax
    p = tmp_path / "params.npz"
    convert.save_params(str(p), params)
    loaded = convert.load_params(str(p))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_scaling():
    import jax

    dims = whisper.WHISPER_CONFIGS["tiny"]
    params = whisper.init_params(dims, jax.random.PRNGKey(0))
    n = whisper.param_count(params)
    assert 35e6 < n < 45e6  # whisper tiny ≈ 39M params


def test_orbax_checkpoint_roundtrip(torch_and_jax, tmp_path):
    import jax

    _, params, dims = torch_and_jax
    path = str(tmp_path / "ckpt")
    convert.save_checkpoint(path, params)
    loaded = convert.load_checkpoint(path, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
