"""Weight conversion: HF torch checkpoints → our pytree format.

The reference consumes weights through HF transformers directly
(vocalis/core/audio_pipeline.py:195-200). We instead convert any local HF
Whisper checkpoint (torch state_dict / safetensors snapshot) into the
layer-stacked pytree consumed by models/whisper.py, and save/load it via
numpy archives (orbax-compatible trees). This also powers the offline
parity tests: a random-init transformers model on CPU is converted and
must produce identical logits to our JAX forward pass.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .whisper import WHISPER_CONFIGS, WhisperDims


def hf_config_from_dims(dims: WhisperDims):
    """Build a transformers WhisperConfig matching our dims (offline)."""
    from transformers import WhisperConfig

    return WhisperConfig(
        vocab_size=dims.n_vocab,
        num_mel_bins=dims.n_mels,
        d_model=dims.n_audio_state,
        encoder_layers=dims.n_audio_layer,
        encoder_attention_heads=dims.n_audio_head,
        decoder_layers=dims.n_text_layer,
        decoder_attention_heads=dims.n_text_head,
        encoder_ffn_dim=4 * dims.n_audio_state,
        decoder_ffn_dim=4 * dims.n_text_state,
        max_source_positions=dims.n_audio_ctx,
        max_target_positions=dims.n_text_ctx,
        # keep special ids inside small test vocabs
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=min(dims.n_vocab - 1, 50257),
        decoder_start_token_id=min(dims.n_vocab - 1, 50258),
    )


def dims_from_hf_config(cfg) -> WhisperDims:
    return WhisperDims(
        n_mels=cfg.num_mel_bins,
        n_audio_ctx=cfg.max_source_positions,
        n_audio_state=cfg.d_model,
        n_audio_head=cfg.encoder_attention_heads,
        n_audio_layer=cfg.encoder_layers,
        n_vocab=cfg.vocab_size,
        n_text_ctx=cfg.max_target_positions,
        n_text_state=cfg.d_model,
        n_text_head=cfg.decoder_attention_heads,
        n_text_layer=cfg.decoder_layers,
    )


def _t(x) -> np.ndarray:
    """torch tensor → numpy (handles bf16)."""
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().to(torch.float32).cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"]).T}  # torch (out,in) → (in,out)
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _attn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "q": _linear(sd, f"{prefix}.q_proj"),
        "k": _linear(sd, f"{prefix}.k_proj", bias=False),
        "v": _linear(sd, f"{prefix}.v_proj"),
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def _stack(blocks: list) -> Any:
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)


def params_from_hf_state_dict(
    sd: Mapping[str, Any], dims: WhisperDims, dtype=jnp.float32
):
    """Convert a transformers WhisperForConditionalGeneration state_dict."""
    # accept both "model.encoder.…" and "encoder.…" key styles
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_blocks = []
    for i in range(dims.n_audio_layer):
        pre = f"encoder.layers.{i}"
        enc_blocks.append(
            {
                "attn_ln": _ln(sd, f"{pre}.self_attn_layer_norm"),
                "attn": _attn(sd, f"{pre}.self_attn"),
                "mlp_ln": _ln(sd, f"{pre}.final_layer_norm"),
                "mlp": {
                    "fc1": _linear(sd, f"{pre}.fc1"),
                    "fc2": _linear(sd, f"{pre}.fc2"),
                },
            }
        )
    dec_blocks = []
    for i in range(dims.n_text_layer):
        pre = f"decoder.layers.{i}"
        dec_blocks.append(
            {
                "attn_ln": _ln(sd, f"{pre}.self_attn_layer_norm"),
                "attn": _attn(sd, f"{pre}.self_attn"),
                "cross_ln": _ln(sd, f"{pre}.encoder_attn_layer_norm"),
                "cross": _attn(sd, f"{pre}.encoder_attn"),
                "mlp_ln": _ln(sd, f"{pre}.final_layer_norm"),
                "mlp": {
                    "fc1": _linear(sd, f"{pre}.fc1"),
                    "fc2": _linear(sd, f"{pre}.fc2"),
                },
            }
        )

    params = {
        "encoder": {
            "conv1": {"w": _t(sd["encoder.conv1.weight"]), "b": _t(sd["encoder.conv1.bias"])},
            "conv2": {"w": _t(sd["encoder.conv2.weight"]), "b": _t(sd["encoder.conv2.bias"])},
            "pos_emb": _t(sd["encoder.embed_positions.weight"]),
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_emb": _t(sd["decoder.embed_tokens.weight"]),
            "pos_emb": _t(sd["decoder.embed_positions.weight"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)
    return params


def load_hf_snapshot(path: str, dtype=jnp.float32):
    """Load a local HF Whisper snapshot directory (config.json +
    pytorch_model.bin / model.safetensors) → (params, dims).

    Degrade-and-continue is the reference's style for model resolution
    (vocalis/core/model.py:237-426 tries local files before any hub
    access); offline we *only* support local paths.
    """
    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    from transformers import WhisperConfig

    dims = dims_from_hf_config(WhisperConfig(**raw))

    sd = None
    st_path = os.path.join(path, "model.safetensors")
    pt_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.torch import load_file

        sd = load_file(st_path)
    elif os.path.exists(pt_path):
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights found under {path}")
    return params_from_hf_state_dict(sd, dims, dtype=dtype), dims


def save_params(path: str, params, meta: dict | None = None) -> None:
    """Flat .npz save of a parameter pytree.

    `meta` (JSON-serializable, e.g. model dims fields) rides along under
    the reserved `__meta__` key so loaders can reconstruct the exact
    architecture from the checkpoint alone — the same role GGUF
    metadata plays for the reference's llama.cpp engine."""
    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            arr = np.asarray(node)
            # npz has no bfloat16: store as f32 (load_params re-casts)
            if arr.dtype == jnp.bfloat16:
                arr = arr.astype(np.float32)
            flat[prefix] = arr

    visit("", params)
    if meta is not None:
        import json

        flat["__meta__"] = np.asarray(json.dumps(meta))
    np.savez(path, **flat)


def load_params(path: str, dtype=None):
    """Load a flat .npz back into a nested pytree (skips `__meta__`)."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        if key == "__meta__":
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = jnp.asarray(data[key])
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        node[parts[-1]] = arr
    return tree


def load_meta(path: str) -> dict | None:
    """Read the `__meta__` dict saved alongside a .npz checkpoint."""
    import json

    data = np.load(path)
    if "__meta__" not in data.files:
        return None
    return json.loads(str(data["__meta__"]))


def save_checkpoint(path: str, params) -> None:
    """Orbax checkpoint save (sharding-aware; preferred for large trees —
    the reference has no computation checkpointing at all, SURVEY.md §5.4)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_checkpoint(path: str, like=None):
    """Orbax checkpoint load; `like` provides the target tree structure
    (with shardings) when restoring onto a mesh."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)
