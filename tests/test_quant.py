"""Int8 weight-only quantization: kernel correctness + quantized Llama."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.ops import quant


def test_quantize_roundtrip_error(rng):
    w = rng.standard_normal((128, 256)).astype(np.float32)
    q = quant.quantize_int8(w)
    deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])[None, :]
    err = np.abs(deq - w).max(axis=0) / np.abs(w).max(axis=0)
    assert err.max() < 0.01  # ≤1% per-channel relative error


def test_quantize_stacked():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 64, 128)).astype(np.float32)
    q = quant.quantize_int8(w)
    assert q["w_q"].shape == (3, 64, 128)
    assert q["scale"].shape == (3, 128)


def test_int8_matmul_matches_dequant(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    q = quant.quantize_int8(w)
    ref = x @ (np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])[None])
    out = np.asarray(quant.int8_matmul(x, q["w_q"], q["scale"],
                                       block_n=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.02)  # bf16 dequant


def test_quantized_llama_close_to_dense(rng):
    import jax

    from turbo_whisper_workspace_tpu.models import llama as lm

    dims = lm.LLAMA_CONFIGS["test-tiny"]
    params = lm.init_params(dims, jax.random.PRNGKey(0))
    tokens = rng.integers(0, dims.n_vocab, (1, 6))
    dense_logits, _ = lm.forward(params, dims, tokens)
    qparams = quant.quantize_tree(params)
    # embeddings / norms untouched, projections quantized
    assert "w_q" in qparams["blocks"]["q"]
    assert "w" in {"w": 1} and "w_q" not in qparams["norm"]
    q_logits, _ = lm.forward(qparams, dims, tokens)
    dense = np.asarray(dense_logits)
    qq = np.asarray(q_logits)
    # logits stay close and the argmax token agrees
    corr = np.corrcoef(dense.ravel(), qq.ravel())[0, 1]
    assert corr > 0.999
    assert (dense.argmax(-1) == qq.argmax(-1)).mean() > 0.95
