"""Sharded training step (fine-tuning support; new vs the reference).

The reference is inference-only, but a framework at this scale needs a
training path: teacher-forced cross-entropy over (mel, tokens) with an
optax optimizer, jit-compiled over a (data, model) mesh. Gradients
all-reduce over the data axis and TP partials psum over the model axis —
both inserted by XLA from the sharding annotations (parallel/sharding.py);
there is no hand-written collective here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import whisper as wm
from .mesh import DATA_AXIS
from .sharding import param_specs, shard_params


def cross_entropy_loss(params, dims, mel, tokens, loss_mask):
    """Teacher-forced next-token CE. tokens (B, T): input tokens[:, :-1]
    predict targets tokens[:, 1:]; loss_mask (B, T-1) zeroes padding."""
    logits = wm.forward(params, dims, mel, tokens[:, :-1])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(loss_mask.sum(), 1.0)
    return (nll * loss_mask).sum() / denom


def make_train_step(dims, mesh, optimizer=None, learning_rate: float = 1e-5):
    """Build (init_fn, step_fn) jitted over the mesh.

    init_fn(params) → (sharded_params, opt_state)
    step_fn(params, opt_state, mel, tokens, loss_mask) → (params, opt_state, loss)
    """
    optimizer = optimizer or optax.adamw(learning_rate)
    specs = None

    def init_fn(params):
        nonlocal specs
        specs = param_specs(params)
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        return params, opt_state

    data_spec = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, mel, tokens, loss_mask):
        mel = jax.lax.with_sharding_constraint(mel, data_spec)
        tokens = jax.lax.with_sharding_constraint(tokens, data_spec)
        loss, grads = jax.value_and_grad(cross_entropy_loss)(
            params, dims, mel, tokens, loss_mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn
