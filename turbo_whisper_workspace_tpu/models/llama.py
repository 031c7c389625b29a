"""Llama-architecture decoder-only LM in pure-function JAX.

TPU-native replacement for the reference's llama.cpp engine (N3 in
SURVEY.md §2.3: Hermes-3-Llama-3.1-8B GGUF loaded at
vocalis/llm/llm_helper.py:67-73 with n_ctx=4096). Same design rules as
models/whisper.py: layer-stacked params scanned once, fixed-shape KV
cache, f32 softmax/norm statistics, bf16 matmuls on the MXU. GQA
(grouped-query attention), RoPE, RMSNorm, SwiGLU — the Llama-3 family
layout — convertible from any local HF LlamaForCausalLM checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LlamaDims:
    n_vocab: int
    d_model: int
    n_layer: int
    n_head: int
    n_kv_head: int
    d_ff: int
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    max_ctx: int = 4096

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head


LLAMA_CONFIGS: dict[str, LlamaDims] = {
    # Hermes-3-Llama-3.1-8B — the reference's default LLM
    # (vocalis/llm/llm_helper.py:40)
    "llama-3.1-8b": LlamaDims(
        n_vocab=128256, d_model=4096, n_layer=32, n_head=32, n_kv_head=8,
        d_ff=14336,
    ),
    # DeepHermes-3-3B — the reference's smaller alternative
    "llama-3.2-3b": LlamaDims(
        n_vocab=128256, d_model=3072, n_layer=28, n_head=24, n_kv_head=8,
        d_ff=8192,
    ),
    "test-tiny": LlamaDims(
        n_vocab=512, d_model=64, n_layer=2, n_head=4, n_kv_head=2, d_ff=128,
        max_ctx=512,
    ),
}


def init_params(dims: LlamaDims, key: jax.Array, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    d, dh = dims.d_model, dims.head_dim
    kv_d = dims.n_kv_head * dh

    def lin(k, din, dout):
        return {"w": jax.random.normal(k, (din, dout)) * (din**-0.5)}

    def block(k):
        kk = jax.random.split(k, 7)
        return {
            "attn_norm": {"scale": jnp.ones((d,))},
            "q": lin(kk[0], d, d),
            "k": lin(kk[1], d, kv_d),
            "v": lin(kk[2], d, kv_d),
            "out": lin(kk[3], d, d),
            "mlp_norm": {"scale": jnp.ones((d,))},
            "gate": lin(kk[4], d, dims.d_ff),
            "up": lin(kk[5], d, dims.d_ff),
            "down": lin(kk[6], dims.d_ff, d),
        }

    blocks = [block(k) for k in jax.random.split(ks[0], dims.n_layer)]
    params = {
        "token_emb": jax.random.normal(ks[1], (dims.n_vocab, d)) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"scale": jnp.ones((d,))},
        "lm_head": lin(ks[2], d, dims.n_vocab),
    }
    return jax.tree.map(lambda x: x.astype(dtype), params)


def rms_norm(x: jax.Array, p, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * p["scale"].astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x (B, T, H, Dh), positions (T,) → rotated (Llama half-split layout)."""
    b, t, h, dh = x.shape
    half = dh // 2
    freqs = 1.0 / (theta ** (np.arange(0, half) / half))
    angles = positions[:, None].astype(jnp.float32) * freqs[None, :]  # (T, half)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def init_kv_cache(dims: LlamaDims, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (dims.n_layer, batch, max_len, dims.n_kv_head * dims.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def forward(
    params,
    dims: LlamaDims,
    tokens: jax.Array,        # (B, T)
    kv_cache=None,
    pos: jax.Array | int = 0,
):
    """Returns (logits (B, T, vocab) f32, new_cache)."""
    b, t = tokens.shape
    dtype = params["token_emb"].dtype
    h, kvh, dh = dims.n_head, dims.n_kv_head, dims.head_dim
    x = params["token_emb"][tokens].astype(dtype)

    use_cache = kv_cache is not None
    if not use_cache:
        kv_cache = init_kv_cache(dims, b, max_len=t, dtype=dtype)
        pos = 0
    cache_len = kv_cache["k"].shape[2]
    positions = pos + jnp.arange(t)
    key_pos = jnp.arange(cache_len)
    attn_mask = key_pos[None, :] <= positions[:, None]     # (t, cache_len)

    from ..ops.quant import matmul_any

    def body(x, layer):
        block, cache = layer
        hnorm = rms_norm(x, block["attn_norm"], dims.norm_eps)
        q = matmul_any(hnorm, block["q"]).reshape(b, t, h, dh)
        k = matmul_any(hnorm, block["k"]).reshape(b, t, kvh, dh)
        v = matmul_any(hnorm, block["v"]).reshape(b, t, kvh, dh)
        q = _rope(q, positions, dims.rope_theta)
        k = _rope(k, positions, dims.rope_theta)

        ck = jax.lax.dynamic_update_slice(
            cache["k"], k.reshape(b, t, kvh * dh).astype(cache["k"].dtype),
            (0, pos, 0),
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v.reshape(b, t, kvh * dh).astype(cache["v"].dtype),
            (0, pos, 0),
        )
        kk = ck.reshape(b, cache_len, kvh, dh).astype(dtype)
        vv = cv.reshape(b, cache_len, kvh, dh).astype(dtype)
        # GQA: query head i shares kv head i // group → pack q as
        # (b, t, kv_head, group, dh) so flattening restores head order
        group = h // kvh
        q5 = q.reshape(b, t, kvh, group, dh)
        logits = jnp.einsum(
            "btkgd,bskd->bkgts", q5, kk, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        logits = jnp.where(attn_mask[None, None, None], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(dtype)
        attn = jnp.einsum("bkgts,bskd->btkgd", w, vv)
        attn = attn.reshape(b, t, h * dh)
        x = x + matmul_any(attn, block["out"])

        hnorm = rms_norm(x, block["mlp_norm"], dims.norm_eps)
        gate = jax.nn.silu(matmul_any(hnorm, block["gate"]))
        up = matmul_any(hnorm, block["up"])
        x = x + matmul_any(gate * up, block["down"])
        return x, {"k": ck, "v": cv}

    x, new_cache = jax.lax.scan(body, x, (params["blocks"], kv_cache))
    x = rms_norm(x, params["norm"], dims.norm_eps)
    if "w" not in params["lm_head"]:   # int8/int4 quantized head
        logits = matmul_any(x, params["lm_head"]).astype(jnp.float32)
    else:
        logits = jnp.einsum(
            "btd,dv->btv", x, params["lm_head"]["w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
    return logits, (new_cache if use_cache else None)


def params_from_hf_state_dict(sd, dims: LlamaDims, dtype=jnp.float32):
    """Convert a transformers LlamaForCausalLM state_dict."""
    import torch

    def t(x):
        return x.detach().to(torch.float32).cpu().numpy()

    blocks = []
    for i in range(dims.n_layer):
        p = f"model.layers.{i}"
        blocks.append({
            "attn_norm": {"scale": t(sd[f"{p}.input_layernorm.weight"])},
            "q": {"w": t(sd[f"{p}.self_attn.q_proj.weight"]).T},
            "k": {"w": t(sd[f"{p}.self_attn.k_proj.weight"]).T},
            "v": {"w": t(sd[f"{p}.self_attn.v_proj.weight"]).T},
            "out": {"w": t(sd[f"{p}.self_attn.o_proj.weight"]).T},
            "mlp_norm": {"scale": t(sd[f"{p}.post_attention_layernorm.weight"])},
            "gate": {"w": t(sd[f"{p}.mlp.gate_proj.weight"]).T},
            "up": {"w": t(sd[f"{p}.mlp.up_proj.weight"]).T},
            "down": {"w": t(sd[f"{p}.mlp.down_proj.weight"]).T},
        })
    head_key = "lm_head.weight" if "lm_head.weight" in sd else "model.embed_tokens.weight"
    params = {
        "token_emb": t(sd["model.embed_tokens.weight"]),
        "blocks": jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                               *blocks),
        "norm": {"scale": t(sd["model.norm.weight"])},
        "lm_head": {"w": t(sd[head_key]).T},
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)
