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


def test_quantize_int4_roundtrip(rng):
    w = rng.standard_normal((256, 192)).astype(np.float32)
    q = quant.quantize_int4(w, group=128)
    assert q["w_q4"].shape == (128, 192)     # two nibbles per byte
    assert q["scale4"].shape == (2, 192)     # K/group scale rows
    # unpack on the host and check grouped dequant error
    packed = np.asarray(q["w_q4"], np.int32)
    lo = (packed << 28) >> 28
    hi = packed >> 4
    deq = np.concatenate([lo, hi], axis=0).astype(np.float32)
    scale = np.asarray(q["scale4"])
    deq = (deq.reshape(2, 128, 192) * scale[:, None]).reshape(256, 192)
    # 4-bit symmetric: |err| ≤ scale/2 per group
    assert np.all(np.abs(deq - w) <= scale.repeat(128, axis=0) * 0.51)


def test_int4_matmul_paths_agree(rng):
    """Pallas interpret kernel == XLA twin == host dequant reference."""
    import jax.numpy as jnp

    x = rng.standard_normal((8, 256)).astype(np.float32)
    w = rng.standard_normal((256, 256)).astype(np.float32)
    q = quant.quantize_int4(w, group=64)
    ref = np.asarray(
        quant._int4_matmul_xla(jnp.asarray(x), q["w_q4"], q["scale4"])
    )
    out_kernel = np.asarray(
        quant.int4_matmul(jnp.asarray(x), q["w_q4"], q["scale4"],
                          block_n=128, interpret=True)
    )
    np.testing.assert_allclose(out_kernel, ref, atol=0.2, rtol=0.02)
    # and both are close to the true product of the original weights —
    # int4's intrinsic error: per-element quant noise ≈ scale/sqrt(12)
    # accumulates to ~0.1 relative over a K=256 contraction
    full = x @ w
    rel = np.abs(ref - full).mean() / np.abs(full).mean()
    assert rel < 0.2, rel


def test_int4_llama_argmax_agreement():
    """bits=4 quantized Llama (int8 head, as Q4_K_M keeps its output
    tensor at q6_K) tracks bf16 logits; argmax agrees wherever the dense
    model is at all confident (VERDICT r1 item 10).

    A RANDOM-INIT net's logits are near-uniform, so unconditional argmax
    agreement is a coin-toss metric — trained LLMs have confident
    margins. The honest gates: high logit correlation, top-5 set
    overlap, and exact agreement on positions with top-2 margin >0.5σ."""
    import jax

    from turbo_whisper_workspace_tpu.models import llama as lm

    rng = np.random.default_rng(42)
    dims = lm.LLAMA_CONFIGS["test-tiny"]
    params = lm.init_params(dims, jax.random.PRNGKey(0))
    tokens = rng.integers(0, dims.n_vocab, (4, 16))
    dense_logits, _ = lm.forward(params, dims, tokens)
    qparams = quant.quantize_tree(params, bits=4, group=16)
    assert "w_q4" in qparams["blocks"]["q"]
    assert "w_q" in qparams["lm_head"]          # head stays int8
    q_logits, _ = lm.forward(qparams, dims, tokens)
    dense = np.asarray(dense_logits).reshape(-1, dims.n_vocab)
    qq = np.asarray(q_logits).reshape(-1, dims.n_vocab)

    corr = np.corrcoef(dense.ravel(), qq.ravel())[0, 1]
    assert corr > 0.95, corr

    top5_d = np.argsort(dense, -1)[:, -5:]
    top5_q = np.argsort(qq, -1)[:, -5:]
    overlap = np.mean([len(set(a) & set(b)) / 5
                       for a, b in zip(top5_d, top5_q)])
    assert overlap > 0.6, overlap

    srt = np.sort(dense, -1)
    margin = srt[:, -1] - srt[:, -2]
    conf = margin > 0.5 * dense.std(-1)
    assert conf.sum() >= 5
    agree = (dense.argmax(-1) == qq.argmax(-1))[conf].mean()
    assert agree >= 0.9, agree

    # the bandwidth win: block weights stream at ≤ 1/4 the f32 bytes
    # (< 1/2 the bf16 serving bytes), scales included
    import jax

    def nbytes(t):
        return sum(x.nbytes for x in jax.tree.leaves(t))

    assert nbytes(qparams["blocks"]) < 0.27 * nbytes(params["blocks"])


def test_quantized_llama_close_to_dense():
    import jax

    from turbo_whisper_workspace_tpu.models import llama as lm

    # own rng: the shared session fixture makes the argmax-agreement
    # assertion depend on test execution order
    rng = np.random.default_rng(1234)
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


def test_int4_s8_decode_kernel(rng):
    """W4A8 decode kernel (grouped int8 activations x packed int4 MXU
    dots) tracks the true product within activation-quant noise."""
    import jax.numpy as jnp

    x = rng.standard_normal((1, 256)).astype(np.float32) * 0.5
    w = rng.standard_normal((256, 384)).astype(np.float32) * 0.05
    q = quant.quantize_int4(w, group=64)
    xq, xs = quant.quant_act_grouped(jnp.asarray(x), 256 // 64)
    out = np.asarray(quant.int4_matmul_s8(xq, xs, q["w_q4"], q["scale4"],
                                          block_n=128, interpret=True))
    ref = np.asarray(
        quant._int4_matmul_xla(jnp.asarray(x), q["w_q4"], q["scale4"])
    ).astype(np.float32)
    rel = np.abs(out - ref).mean() / max(np.abs(ref).mean(), 1e-9)
    assert rel < 0.05, rel  # W8 activation quant adds ~1% noise


def test_int8_xla_matches_kernel(rng):
    """The decode-path XLA dequant-einsum equals the Pallas kernel."""
    import jax.numpy as jnp

    x = rng.standard_normal((1, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    q = quant.quantize_int8(w)
    a = np.asarray(quant._int8_matmul_xla(jnp.asarray(x, jnp.bfloat16),
                                          q["w_q"], q["scale"]))
    b = np.asarray(quant.int8_matmul(x, q["w_q"], q["scale"], block_n=128,
                                     interpret=True))
    np.testing.assert_allclose(a.astype(np.float32), b, atol=0.3, rtol=0.05)
