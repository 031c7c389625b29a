"""Sharded execution on the 8-device CPU mesh: TP/DP parity + train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbo_whisper_workspace_tpu.models import whisper
from turbo_whisper_workspace_tpu.parallel import mesh as mesh_mod
from turbo_whisper_workspace_tpu.parallel import sharding, train


def _dims(vocab=1024):
    return whisper.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=vocab, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_tp_forward_matches_single_device(rng):
    """Model-sharded forward == replicated forward (collective correctness)."""
    dims = _dims()
    params = whisper.init_params(dims, jax.random.PRNGKey(0))
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, (2, 6))

    ref = np.asarray(whisper.forward(params, dims, mel, tokens))

    mesh = mesh_mod.make_mesh(model_parallel=4, data_parallel=2)
    with mesh:
        sharded = sharding.shard_params(params, mesh)
        out = np.asarray(whisper.forward(sharded, dims, mel, tokens))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_train_step_runs_and_descends():
    dims = _dims()
    params = whisper.init_params(dims, jax.random.PRNGKey(1))
    mesh = mesh_mod.make_mesh(model_parallel=2)
    init_fn, step_fn = train.make_train_step(dims, mesh, learning_rate=1e-3)
    with mesh:
        params, opt_state = init_fn(params)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((4, 80, 3000)),
                          jnp.float32)
        tokens = jnp.asarray(
            np.random.default_rng(1).integers(0, dims.n_vocab, (4, 12)), jnp.int32
        )
        mask = jnp.ones((4, 11), jnp.float32)
        losses = []
        for _ in range(3):
            params, opt_state, loss = step_fn(params, opt_state, mel, tokens, mask)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"


def test_graft_entry_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_data_parallel_decode_matches(rng):
    """Batch sharded over data axis decodes identically to unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from turbo_whisper_workspace_tpu.decode import greedy, rules, tokenizer

    dims = _dims(vocab=517)
    params = whisper.init_params(dims, jax.random.PRNGKey(2))
    sp = tokenizer.special_tokens_for_vocab(dims.n_vocab)
    drules = rules.DecodeRules(specials=sp, timestamps=True)
    mel = rng.standard_normal((8, 80, 3000)).astype(np.float32)
    prompt = np.tile(np.array([[sp.sot, sp.transcribe]], np.int32), (8, 1))

    ref = greedy.greedy_decode(params, dims, mel, prompt, rules=drules, max_len=8)

    mesh = mesh_mod.make_mesh(model_parallel=1, data_parallel=8)
    with mesh:
        mel_s = jax.device_put(
            jnp.asarray(mel), NamedSharding(mesh, P("data", None, None))
        )
        out = greedy.greedy_decode(
            params, dims, mel_s, jnp.asarray(prompt), rules=drules, max_len=8
        )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))
