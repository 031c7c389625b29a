"""Speaker segmentation: powerset multi-speaker activity over sliding windows.

TPU-native counterpart of the reference's sherpa-onnx pyannote
segmentation-3.0 stage (configured at vocalis/core/model.py:432-475,
executed inside sherpa C++ at vocalis/core/diar.py:107-109). Same
semantics — a 10 s window yields per-frame activity for up to 3 local
speakers, encoded as a 7-class powerset (∅, A, B, C, AB, AC, BC) — but
the architecture is TPU-idiomatic: log-mel frontend into a conv
downsampler and a small pre-LN transformer (pyannote's SincNet+LSTM is
latency-oriented and maps poorly to the MXU; batched windows through a
transformer saturate it instead). All windows of all files batch through
one jitted forward.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .whisper import _attn_block, _init_block, _init_linear, _init_ln, _mlp_block, _stack_blocks, layer_norm, linear, sinusoids

# powerset for ≤3 simultaneous local speakers
POWERSET = ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2))
N_CLASSES = len(POWERSET)
MAX_LOCAL_SPEAKERS = 3

WINDOW_S = 10.0
FRAMES_PER_WINDOW = 100   # 10 frames/s after 10x downsample of mel frames


@dataclass(frozen=True)
class SegmentationDims:
    n_mels: int = 80
    d_model: int = 256
    n_head: int = 4
    n_layer: int = 4
    n_classes: int = N_CLASSES
    window_frames: int = 1000     # mel frames per 10 s window (hop 160)
    downsample: int = 10          # → 100 output frames (10 Hz)


def init_params(dims: SegmentationDims, key: jax.Array, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    d = dims.d_model
    blocks = [
        _init_block(k, d, cross=False)
        for k in jax.random.split(ks[0], dims.n_layer)
    ]
    params = {
        "conv1": {
            "w": jax.random.normal(ks[1], (d, dims.n_mels, 5)) * 0.05,
            "b": jnp.zeros((d,)),
        },
        "conv2": {
            "w": jax.random.normal(ks[2], (d, d, 5)) * 0.02,
            "b": jnp.zeros((d,)),
        },
        "pos_emb": jnp.asarray(
            sinusoids(dims.window_frames // dims.downsample, d)
        ),
        "blocks": _stack_blocks(blocks),
        "ln": _init_ln(d),
        "head": _init_linear(ks[3], d, dims.n_classes),
    }
    return jax.tree.map(lambda x: x.astype(dtype), params)


def forward(params, dims: SegmentationDims, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, window_frames) → powerset logits (B, T_out, n_classes)."""
    dtype = params["conv1"]["w"].dtype
    x = mel.astype(dtype)
    half = dims.downsample // 2
    x = jax.lax.conv_general_dilated(
        x, params["conv1"]["w"], (half,), [(2, 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv1"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2"]["w"], (2,), [(2, 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv2"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)
    x = x + params["pos_emb"].astype(dtype)[: x.shape[1]]

    def body(carry, block):
        h = _attn_block(carry, block, dims.n_head)
        h = _mlp_block(h, block)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln"])
    return linear(x, params["head"]).astype(jnp.float32)


def powerset_to_activity(logits: np.ndarray) -> np.ndarray:
    """(B, T, n_classes) argmax → (B, T, MAX_LOCAL_SPEAKERS) activity bools."""
    cls = np.argmax(logits, axis=-1)
    act = np.zeros(cls.shape + (MAX_LOCAL_SPEAKERS,), bool)
    for ci, members in enumerate(POWERSET):
        mask = cls == ci
        for m in members:
            act[mask, m] = True
    return act


def powerset_speech_prob(logits: np.ndarray) -> np.ndarray:
    """(B, T, n_classes) → (B, T) P(any speaker active) = 1 - P(∅).

    Soft per-frame speech probability so overlapping sliding windows can
    be averaged (pyannote's overlap aggregation) before thresholding."""
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(-1, keepdims=True)
    return 1.0 - p[..., 0]
