"""Pallas one-pass attention kernel vs the einsum oracle (interpret mode
on CPU; the same code compiles with Mosaic on the TPU)."""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.ops import attention as att


@pytest.mark.parametrize("t", [128, 300])  # 300 exercises pad+mask
def test_flash_matches_reference(rng, t):
    b, h, d = 2, 3, 64
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    ref = np.asarray(att.attention_reference(q, k, v))
    out = np.asarray(att.flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_flash_bf16(rng):
    import jax.numpy as jnp

    b, h, t, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    ref = np.asarray(att.attention_reference(q, q, q), np.float32)
    out = np.asarray(
        att.flash_attention(q, q, q, block_q=128, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
