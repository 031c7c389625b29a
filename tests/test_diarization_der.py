"""End-to-end diarization quality: DER bound through the FULL
SpeakerDiarizer path (segmentation → crops → embeddings → clustering →
smoothing → turns), not just descending losses.

Offline substitute for the AMI DER parity gate (BASELINE.md): synthetic
two-speaker conversations (distinct harmonic voices, alternating turns
with silences) where ground-truth turns are known exactly. Two tiers:

* fallback tier — energy VAD + spectral-statistics embeddings (the
  shipping no-checkpoint path, pipeline/diarizer.py:119,126);
* trained tier — the segmentation transformer and embedding net trained
  briefly on the same synthetic distribution, then handed to
  SpeakerDiarizer exactly as converted checkpoints would be.

Reference analogue: sherpa-onnx clustering diarization driven at
vocalis/core/diar.py:91-140; its quality gate is external (pyannote/AMI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from turbo_whisper_workspace_tpu.models import embedding as emb_mod
from turbo_whisper_workspace_tpu.models import segmentation as seg_mod
from turbo_whisper_workspace_tpu.ops import mel as mel_ops
from turbo_whisper_workspace_tpu.pipeline.diarizer import SpeakerDiarizer
from turbo_whisper_workspace_tpu.utils.metrics import der

SR = 16000
VOICES = (115.0, 285.0)


def _voice(rng, f_base, dur_s):
    """Harmonic stack with vibrato + amplitude modulation (speech-like)."""
    tt = np.arange(int(dur_s * SR)) / SR
    f0 = f_base * rng.uniform(0.97, 1.03)
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * tt)
    sig = sum(
        (0.5 / k) * np.sin(2 * np.pi * f0 * k * vib * tt + rng.uniform(0, 6))
        for k in range(1, 6)
    )
    am = 0.6 + 0.4 * np.clip(np.sin(2 * np.pi * rng.uniform(2, 4) * tt), 0, 1)
    return (0.3 * sig * am + 0.005 * rng.standard_normal(len(tt))).astype(
        np.float32
    )


def make_conversation(rng, total_s=40.0):
    """Alternating two-speaker dialogue; returns (audio, truth_turns)."""
    audio = np.zeros(int(total_s * SR), np.float32)
    turns = []
    t, spk = 0.8, 0
    while t < total_s - 5.0:
        dur = float(rng.uniform(2.5, 4.5))
        seg = _voice(rng, VOICES[spk], dur)
        i0 = int(t * SR)
        audio[i0 : i0 + len(seg)] = seg
        turns.append({"start": t, "end": t + dur, "speaker": f"S{spk}"})
        t += dur + float(rng.uniform(0.8, 1.3))
        spk = 1 - spk
    return audio, turns


def test_fallback_diarization_der_bound():
    """No-checkpoint path: energy VAD + spectral embeddings + AHC."""
    rng = np.random.default_rng(7)
    audio, truth = make_conversation(rng)
    diar = SpeakerDiarizer()
    hyp = [s.to_dict() for s in diar.process_audio(audio, num_speakers=2)]
    assert len({h["speaker"] for h in hyp}) == 2
    rep = der(truth, hyp, duration_s=len(audio) / SR)
    assert rep["der"] < 0.25, rep


def _train_embedder(rng):
    dims = emb_mod.EmbeddingDims(channels=32, n_blocks=2, embed_dim=32)
    params = emb_mod.init_params(dims, jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    xs, ys = [], []
    for label, f_base in enumerate(VOICES):
        for _ in range(8):
            xs.append(_voice(rng, f_base, 2.0))
            ys.append(label)
    mels = np.asarray(
        mel_ops.log_mel_spectrogram(jnp.asarray(np.stack(xs)))
    )[:, :, : dims.crop_frames]
    ys = np.asarray(ys)
    mels_j = jnp.asarray(mels)
    same = jnp.asarray((ys[:, None] == ys[None, :]).astype(np.float32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            e = emb_mod.forward(p, dims, mels_j)
            sim = e @ e.T
            return jnp.mean(same * (1 - sim) + (1 - same) * jnp.maximum(sim, 0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, _ = step(params, opt_state)
    return params, dims


def _train_segmenter(rng):
    dims = seg_mod.SegmentationDims(d_model=64, n_head=2, n_layer=2)
    params = seg_mod.init_params(dims, jax.random.PRNGKey(2))
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    out_frames = dims.window_frames // dims.downsample

    # 10 s windows cut from the conversation distribution itself
    xs, ys = [], []
    for _ in range(8):
        audio, truth = make_conversation(rng, total_s=20.0)
        for w0 in (0, 10):
            win = audio[w0 * SR : (w0 + 10) * SR]
            lab = np.zeros(out_frames, np.int64)
            for t in truth:
                f0 = int(max(t["start"] - w0, 0) * 10)
                f1 = int(min(max(t["end"] - w0, 0), 10) * 10)
                lab[f0:f1] = 1
            xs.append(win)
            ys.append(lab)
    mels = np.asarray(
        mel_ops.log_mel_spectrogram(jnp.asarray(np.stack(xs)))
    )[:, :, : dims.window_frames]
    mels_j, labels_j = jnp.asarray(mels), jnp.asarray(np.stack(ys))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = seg_mod.forward(p, dims, mels_j)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels_j[..., None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, _ = step(params, opt_state)
    return params, dims


def test_trained_diarization_der_bound():
    """Trained nets through the full SpeakerDiarizer path beat a fixed
    DER bound on a held-out conversation (VERDICT r1 item 8)."""
    rng = np.random.default_rng(3)
    emb_params, emb_dims = _train_embedder(rng)
    seg_params, seg_dims = _train_segmenter(rng)

    audio, truth = make_conversation(np.random.default_rng(11))
    diar = SpeakerDiarizer(
        seg_params=seg_params, seg_dims=seg_dims,
        emb_params=emb_params, emb_dims=emb_dims,
    )
    hyp = [s.to_dict() for s in diar.process_audio(audio, num_speakers=2)]
    assert hyp, "no turns produced"
    rep = der(truth, hyp, duration_s=len(audio) / SR)
    assert rep["der"] < 0.35, rep


def test_trained_checkpoint_beats_fallback(tmp_path):
    """The neural tier, loaded from CONVERTED .npz CHECKPOINTS through
    SpeakerDiarizer.from_names (the exact production load path), beats
    the DSP fallback's DER on held-out conversations (VERDICT r4 #6 —
    closes the only untested seam between 'code exists' and 'code
    works': seg_params/emb_params is not None, end-to-end, and wins)."""
    import dataclasses

    from turbo_whisper_workspace_tpu.config import DiarizationConfig
    from turbo_whisper_workspace_tpu.models import convert

    rng = np.random.default_rng(3)
    emb_params, emb_dims = _train_embedder(rng)
    seg_params, seg_dims = _train_segmenter(rng)

    convert.save_params(str(tmp_path / "seg-synthetic.npz"), seg_params,
                        meta=dataclasses.asdict(seg_dims))
    convert.save_params(str(tmp_path / "emb-synthetic.npz"), emb_params,
                        meta=dataclasses.asdict(emb_dims))
    neural = SpeakerDiarizer.from_names(
        DiarizationConfig(),
        segmentation_model="synthetic", embedding_model="synthetic",
        models_dir=str(tmp_path),
    )
    assert neural.seg_params is not None and neural.emb_params is not None
    assert neural.seg_dims == seg_dims and neural.emb_dims == emb_dims
    fallback = SpeakerDiarizer()

    der_nn = der_fb = 0.0
    for seed in (11, 12, 13):
        audio, truth = make_conversation(np.random.default_rng(seed))
        dur = len(audio) / SR
        hyp_nn = [s.to_dict()
                  for s in neural.process_audio(audio, num_speakers=2)]
        hyp_fb = [s.to_dict()
                  for s in fallback.process_audio(audio, num_speakers=2)]
        assert hyp_nn, f"neural path produced no turns (seed {seed})"
        der_nn += der(truth, hyp_nn, duration_s=dur)["der"]
        der_fb += der(truth, hyp_fb, duration_s=dur)["der"]
    assert der_nn <= der_fb, (der_nn, der_fb)
    assert der_nn / 3 < 0.05, der_nn / 3
