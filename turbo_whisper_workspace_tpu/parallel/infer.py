"""Data-parallel sharded inference (greedy / beam decode) over a mesh.

The reference decodes one file at a time on one GPU (serial directory
loop at vocalis/security/security_monitor.py:371-381, device pinned at
vocalis/core/audio_pipeline.py:191). Here the window batch is sharded
over the mesh's `data` axis with `jax.shard_map`: every device runs the
full mel→encoder→decode program on its batch shard, so the Pallas
kernels see ordinary per-device shapes (no GSPMD partitioning of opaque
kernel calls) and no collective is needed — rows are independent.
Parameters travel replicated; TP-sharded decode (model axis) stays the
GSPMD/train path in parallel/train.py.

Multi-host: call `maybe_initialize_distributed()` first (one process
per host on a pod), then build the mesh over `jax.devices()` — the same
shard_map program spans hosts, with each host feeding its local shard
via `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decode import beam as beam_mod
from ..decode import greedy as greedy_mod
from ..decode.rules import DecodeRules
from ..models import whisper as wm
from ..ops import mel as mel_ops
from .mesh import DATA_AXIS

_DIST_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """`jax.distributed.initialize()` when pod env vars are present.

    Controller discovery uses the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU pod's built-in metadata where initialize() needs no args via
    JAX_USE_DISTRIBUTED=1). No-op on a single host so every entry point
    can call this unconditionally. Returns True when running multi-host.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("JAX_USE_DISTRIBUTED") == "1"
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _DIST_INITIALIZED = True
    elif auto:
        jax.distributed.initialize()
        _DIST_INITIALIZED = True
    return _DIST_INITIALIZED and jax.process_count() > 1


def make_dp_decode(
    dims: wm.WhisperDims,
    mesh: Mesh,
    *,
    rules: DecodeRules,
    beam_size: int = 1,
    max_len: int = 224,
    quantize_kv: bool = False,
    sot_index: int = 0,
):
    """Build a jitted DP-sharded decode: (params, audio, prompt) → result.

    audio (B, N_SAMPLES) f32 and prompt (B, P) i32 shard over the data
    axis (B must be divisible by the axis size); params replicate. The
    result is a DecodeResult (greedy) or BeamResult (beam>1) with every
    leaf sharded on its leading batch axis.
    """
    dp = mesh.shape[DATA_AXIS]

    def local_fn(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        cross_kv = wm.precompute_cross_kv(
            params, dims, feats, quantize=quantize_kv
        )
        if beam_size > 1:
            return beam_mod.beam_decode_features(
                params, dims, cross_kv, prompt, rules=rules,
                beam_size=beam_size, max_len=max_len, sot_index=sot_index,
            )
        return greedy_mod.greedy_decode_features(
            params, dims, cross_kv, prompt, rules=rules, max_len=max_len,
            sot_index=sot_index,
        )

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )

    @functools.partial(jax.jit)
    def decode_fn(params, audio, prompt):
        b = audio.shape[0]
        assert b % dp == 0, f"batch {b} not divisible by data axis {dp}"
        return sharded(params, audio, prompt)

    return decode_fn


def make_tp_decode(
    params_template,
    dims: wm.WhisperDims,
    mesh: Mesh,
    *,
    rules: DecodeRules,
    beam_size: int = 1,
    max_len: int = 224,
    quantize_kv: bool = False,
    sot_index: int = 0,
):
    """Tensor-parallel (optionally DP×TP) sharded decode via GSPMD.

    Parameters shard Megatron-style over the model axis
    (sharding.param_specs: q/k/v/fc1 column, out/fc2 row), the batch over
    the data axis; XLA propagates the shardings through the whole
    mel→encoder→cross-KV→decode while_loop — the KV caches inherit the
    feature-axis sharding from the activations (sharding.cache_spec
    layout) and the row-parallel psum is inserted automatically
    (SURVEY §7.3 item 7: heads-sharded KV decode).

    Whisper fits one chip in bf16, so this is the capacity path (HBM
    relief / bigger batch), not the default: DP shard_map (make_dp_decode)
    remains the throughput path because it keeps Pallas kernels on
    per-device shapes. Under GSPMD the cross-attention runs the XLA
    einsum path (a pallas_call is opaque to the partitioner), so pass
    quantize_kv=False on TPU unless the batch is data-sharded only.
    """
    from .sharding import param_specs

    specs = param_specs(params_template)
    p_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    def fn(params, audio, prompt):
        mels = mel_ops.log_mel_spectrogram(audio, num_mels=dims.n_mels)
        feats = wm.encoder_forward(params, dims, mels)
        cross_kv = wm.precompute_cross_kv(
            params, dims, feats, quantize=quantize_kv
        )
        if beam_size > 1:
            return beam_mod.beam_decode_features(
                params, dims, cross_kv, prompt, rules=rules,
                beam_size=beam_size, max_len=max_len, sot_index=sot_index,
            )
        return greedy_mod.greedy_decode_features(
            params, dims, cross_kv, prompt, rules=rules, max_len=max_len,
            sot_index=sot_index,
        )

    return jax.jit(fn, in_shardings=(p_shard, data_sh, data_sh))


def put_dp(mesh: Mesh, x) -> jax.Array:
    """Place a host array on the mesh sharded over the data axis."""
    spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


_COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")


def count_collectives(lowered_or_text) -> dict:
    """Count collective ops in a compiled SPMD module's HLO text."""
    if hasattr(lowered_or_text, "compile"):
        txt = lowered_or_text.compile().as_text()
    else:
        txt = lowered_or_text
    return {op: txt.count(f" {op}") + txt.count(f"{op}(") + txt.count(f"{op}-start")
            for op in _COLLECTIVE_OPS}


def dp_collective_report(
    dims: wm.WhisperDims,
    mesh: Mesh,
    *,
    rules: DecodeRules,
    batch_per_device: int = 1,
    max_len: int = 4,
    quantize_kv: bool = False,
) -> dict:
    """Structural evidence for the ≥85%-to-2-hosts scaling gate
    (BASELINE.md:34): compile the DP-sharded decode and count collective
    ops in the SPMD program.

    The DP decode is embarrassingly parallel — params replicate before
    the loop, rows are independent, and shard_map introduces no psum /
    all_gather — so the compiled module contains ZERO collectives and
    the per-step ICI/DCN traffic is zero bytes. Scaling efficiency on
    real hardware is then bounded only by host-side input dispatch
    (file reads overlap compute), not by the interconnect: the analytic
    efficiency to any host count is ~100% ≫ 85%. Virtual-mesh wall-clock
    numbers (shared host cores) cannot show this; the compiled-program
    structure can.
    """
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    fn = make_dp_decode(dims, mesh, rules=rules, max_len=max_len,
                        quantize_kv=quantize_kv)
    b = batch_per_device * mesh.shape[DATA_AXIS]
    audio = jnp.zeros((b, mel_ops.N_SAMPLES), jnp.float32)
    sot = rules.specials.sot_sequence(language="en", task="transcribe",
                                      timestamps=False)
    prompt = jnp.tile(jnp.asarray(sot, jnp.int32), (b, 1))
    counts = count_collectives(fn.lower(params, audio, prompt))
    total = sum(counts.values())
    return {
        "collective_ops": counts,
        "total_collectives": total,
        "ici_bytes_per_step": 0 if total == 0 else None,
        "claim": (
            "DP decode is embarrassingly parallel: zero collectives in the "
            "compiled SPMD module => zero ICI/DCN bytes per decode step => "
            "scaling efficiency is host-dispatch-bound (~100%), meeting the "
            ">=85%-to-2-hosts gate analytically"
            if total == 0 else
            "collectives present - analytic zero-traffic claim does not hold"
        ),
    }


def measure_scaling(
    dims: wm.WhisperDims,
    *,
    rules: DecodeRules,
    widths=(1, 2),
    batch_per_device: int = 2,
    max_len: int = 16,
    repeats: int = 3,
) -> dict:
    """Weak-scaling probe of the DP decode: audio-s/s at each DP width.

    On a real pod this measures ICI-era scaling efficiency (BASELINE
    gate: ≥85% to 2 hosts). On the virtual CPU mesh it validates the
    sharded program end-to-end and reports the simulated figure — the
    virtual devices share host cores, so treat CPU numbers as plumbing
    evidence, not hardware truth.
    """
    import time

    params = wm.init_params(dims, jax.random.PRNGKey(0))
    devices = jax.devices()
    results = {}
    sot = rules.specials.sot_sequence(language="en", task="transcribe",
                                      timestamps=False)
    for w in widths:
        if w > len(devices):
            continue
        mesh = Mesh(np.asarray(devices[:w]).reshape(w, 1),
                    (DATA_AXIS, "model"))
        fn = make_dp_decode(dims, mesh, rules=rules, max_len=max_len)
        b = batch_per_device * w
        audio = put_dp(mesh, np.zeros((b, mel_ops.N_SAMPLES), np.float32))
        prompt = put_dp(mesh, np.tile(np.asarray(sot, np.int32), (b, 1)))
        r = fn(params, audio, prompt)
        np.asarray(r.lengths)  # sync (compile + first run)
        t0 = time.time()
        for _ in range(repeats):
            r = fn(params, audio, prompt)
        np.asarray(r.lengths)
        dt = (time.time() - t0) / repeats
        results[w] = b * 30.0 / dt  # audio-seconds per second
    base = results.get(widths[0])
    eff = {
        w: results[w] / (base * w / widths[0]) for w in results
    } if base else {}
    # analytic communication-volume argument rides along: wall-clock on a
    # virtual mesh is meaningless (shared cores), program structure is not
    max_w = max(results) if results else 1
    mesh = Mesh(np.asarray(devices[:max_w]).reshape(max_w, 1),
                (DATA_AXIS, "model"))
    analytic = dp_collective_report(dims, mesh, rules=rules, max_len=max_len)
    return {"audio_s_per_s": results, "efficiency_vs_linear": eff,
            "analytic": analytic}
