"""Trainability: the segmentation and embedding nets learn synthetic tasks.

No pretrained checkpoints exist in this environment, so these tests are
the evidence that the diarization stack can reach quality once trained:
gradients flow, losses descend, and the learned nets beat chance on
held-out synthetic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from turbo_whisper_workspace_tpu.models import embedding as emb_mod
from turbo_whisper_workspace_tpu.models import segmentation as seg_mod


def _seg_batch(rng, dims, n=8):
    """Synthetic speech-activity task: bursts of tone+noise vs silence;
    labels at the 10 Hz output rate (class 0 = ∅, class 1 = {A})."""
    mel_frames = dims.window_frames
    out_frames = mel_frames // dims.downsample
    x = np.zeros((n, 16000 * 10), np.float32)
    y = np.zeros((n, out_frames), np.int64)
    for i in range(n):
        t = 0
        while t < 10:
            burst = rng.integers(1, 3)
            gap = rng.integers(1, 3)
            s, e = t, min(t + burst, 10)
            tt = np.arange((e - s) * 16000) / 16000
            x[i, s * 16000 : e * 16000] = (
                0.4 * np.sin(2 * np.pi * rng.uniform(100, 300) * tt)
                + 0.05 * rng.standard_normal(len(tt))
            )
            y[i, s * out_frames // 10 : e * out_frames // 10] = 1
            t = e + gap
    from turbo_whisper_workspace_tpu.ops import mel as mel_ops

    mels = np.asarray(mel_ops.log_mel_spectrogram(jnp.asarray(x), num_mels=80))
    return mels[:, :, :mel_frames], y


def test_segmentation_learns_speech_activity():
    rng = np.random.default_rng(0)
    dims = seg_mod.SegmentationDims(d_model=64, n_head=2, n_layer=2)
    params = seg_mod.init_params(dims, jax.random.PRNGKey(0))
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mels, labels):
        def loss_fn(p):
            logits = seg_mod.forward(p, dims, mels)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    mels, labels = _seg_batch(rng, dims, n=8)
    mels_j, labels_j = jnp.asarray(mels), jnp.asarray(labels)
    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state, mels_j, labels_j)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"

    # held-out accuracy beats the majority baseline
    te_mels, te_labels = _seg_batch(np.random.default_rng(1), dims, n=4)
    pred = np.asarray(seg_mod.forward(params, dims, jnp.asarray(te_mels)))
    acc = (pred.argmax(-1) == te_labels).mean()
    majority = max(te_labels.mean(), 1 - te_labels.mean())
    assert acc > majority + 0.05, f"acc {acc} vs majority {majority}"


def test_embedding_learns_speaker_contrast():
    """Triplet-style: same-voice crops should embed closer than
    different-voice crops after a few steps."""
    rng = np.random.default_rng(2)
    dims = emb_mod.EmbeddingDims(channels=32, n_blocks=2, embed_dim=32)
    params = emb_mod.init_params(dims, jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def voices(n_per=6):
        from turbo_whisper_workspace_tpu.ops import mel as mel_ops

        xs, ys = [], []
        for label, f0 in enumerate((110.0, 290.0)):
            for _ in range(n_per):
                t = np.arange(32000) / 16000
                f = f0 * rng.uniform(0.95, 1.05)
                sig = sum((0.5 / k) * np.sin(2 * np.pi * f * k * t
                                             + rng.uniform(0, 6))
                          for k in range(1, 6))
                xs.append(0.3 * sig + 0.02 * rng.standard_normal(len(t)))
                ys.append(label)
        mels = np.asarray(mel_ops.log_mel_spectrogram(
            jnp.asarray(np.stack(xs).astype(np.float32))))
        return mels[:, :, :dims.crop_frames], np.array(ys)

    mels, ys = voices()
    mels_j = jnp.asarray(mels)
    same = jnp.asarray((ys[:, None] == ys[None, :]).astype(np.float32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            e = emb_mod.forward(p, dims, mels_j)
            sim = e @ e.T
            # pull same-speaker pairs together, push different apart
            return jnp.mean(same * (1 - sim) + (1 - same) * jnp.maximum(sim, 0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8

    e = np.asarray(emb_mod.forward(params, dims, mels_j))
    sim = e @ e.T
    same_np = ys[:, None] == ys[None, :]
    off_diag = ~np.eye(len(ys), dtype=bool)
    gap = sim[same_np & off_diag].mean() - sim[~same_np].mean()
    assert gap > 0.2, f"speaker separation too weak: {gap}"
