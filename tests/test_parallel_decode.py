"""DP-sharded inference parity + multi-host wiring (SURVEY §2.4).

The reference has no distributed path at all (serial directory loop,
vocalis/security/security_monitor.py:371-381); these tests validate the
new capability on the virtual 8-device CPU mesh: greedy and beam decode
sharded over the data axis must reproduce the single-device decode
token-for-token, and the pod-init helper must no-op on a single host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from turbo_whisper_workspace_tpu.decode.rules import DecodeRules
from turbo_whisper_workspace_tpu.decode.tokenizer import WhisperTokenizer
from turbo_whisper_workspace_tpu.models import whisper as wm
from turbo_whisper_workspace_tpu.ops import mel as mel_ops
from turbo_whisper_workspace_tpu.parallel import infer
from turbo_whisper_workspace_tpu.parallel.mesh import DATA_AXIS


def _dims():
    return wm.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )


@pytest.fixture(scope="module")
def setup():
    dims = _dims()
    params = wm.init_params(dims, jax.random.PRNGKey(0))
    tk = WhisperTokenizer.for_model(dims.n_vocab)
    rules = DecodeRules(specials=tk.specials, timestamps=True)
    rng = np.random.default_rng(0)
    b = 8
    audio = np.zeros((b, mel_ops.N_SAMPLES), np.float32)
    audio[:, : 16000 * 5] = rng.normal(size=(b, 16000 * 5)).astype(np.float32) * 0.1
    sot = tk.specials.sot_sequence(language="en", task="transcribe",
                                   timestamps=True)
    prompt = np.tile(np.asarray(sot, np.int32), (b, 1))
    return dims, params, rules, audio, prompt


def _mesh(dp: int) -> Mesh:
    devs = jax.devices()[:dp]
    return Mesh(np.asarray(devs).reshape(dp, 1), (DATA_AXIS, "model"))


@pytest.mark.parametrize("beam_size", [1, 3])
def test_dp_decode_matches_single_device(setup, beam_size):
    dims, params, rules, audio, prompt = setup
    kw = dict(rules=rules, beam_size=beam_size, max_len=12)

    ref_fn = infer.make_dp_decode(dims, _mesh(1), **kw)
    ref = ref_fn(params, jnp.asarray(audio), jnp.asarray(prompt))

    mesh8 = _mesh(8)
    fn = infer.make_dp_decode(dims, mesh8, **kw)
    out = fn(params, infer.put_dp(mesh8, audio), infer.put_dp(mesh8, prompt))

    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(out.lengths), np.asarray(ref.lengths))
    np.testing.assert_allclose(
        np.asarray(out.avg_logprobs), np.asarray(ref.avg_logprobs),
        atol=1e-4, rtol=1e-4,
    )
    # the sharded result really is distributed over 8 devices
    assert len(out.tokens.sharding.device_set) == 8


def test_dp_decode_quantized_kv(setup):
    """int8 cross-KV path under the sharded program (XLA twin on CPU)."""
    dims, params, rules, audio, prompt = setup
    mesh = _mesh(4)
    fn = infer.make_dp_decode(dims, mesh, rules=rules, max_len=8,
                              quantize_kv=True)
    out = fn(params, infer.put_dp(mesh, audio), infer.put_dp(mesh, prompt))
    assert np.asarray(out.tokens).shape[0] == 8
    assert np.all(np.isfinite(np.asarray(out.avg_logprobs)))


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 4)])
def test_tp_decode_matches_single_device(setup, dp, tp):
    """Model-axis (Megatron TP) sharded decode reproduces the replicated
    decode (SURVEY §7.3 item 7: heads-sharded KV decode path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims, params, rules, audio, prompt = setup
    kw = dict(rules=rules, max_len=10)

    ref_fn = infer.make_dp_decode(dims, _mesh(1), **kw)
    ref = ref_fn(params, jnp.asarray(audio), jnp.asarray(prompt))

    devs = jax.devices()[: dp * tp]
    mesh = Mesh(np.asarray(devs).reshape(dp, tp), (DATA_AXIS, "model"))
    fn = infer.make_tp_decode(params, dims, mesh, **kw)
    from turbo_whisper_workspace_tpu.parallel.sharding import shard_params

    params_sh = shard_params(params, mesh)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    out = fn(
        params_sh,
        jax.device_put(jnp.asarray(audio), data_sh),
        jax.device_put(jnp.asarray(prompt), data_sh),
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(
        np.asarray(out.avg_logprobs), np.asarray(ref.avg_logprobs),
        atol=2e-3, rtol=2e-3,
    )
    # params really live column/row-sharded over the model axis
    qw = params_sh["decoder"]["blocks"]["attn"]["q"]["w"]
    assert len(qw.sharding.device_set) == dp * tp


def test_dp_batch_not_divisible_raises(setup):
    dims, params, rules, audio, prompt = setup
    mesh = _mesh(8)
    fn = infer.make_dp_decode(dims, mesh, rules=rules, max_len=4)
    with pytest.raises(Exception):
        fn(params, jnp.asarray(audio[:6]), jnp.asarray(prompt[:6]))


def test_maybe_initialize_distributed_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_USE_DISTRIBUTED", raising=False)
    assert infer.maybe_initialize_distributed() is False


def test_measure_scaling_runs(setup):
    dims, *_ = setup
    tk = WhisperTokenizer.for_model(dims.n_vocab)
    rules = DecodeRules(specials=tk.specials, timestamps=False)
    rep = infer.measure_scaling(dims, rules=rules, widths=(1, 2),
                                batch_per_device=1, max_len=4, repeats=1)
    assert set(rep["audio_s_per_s"]) == {1, 2}
    assert all(v > 0 for v in rep["audio_s_per_s"].values())
    assert 2 in rep["efficiency_vs_linear"]
    # the analytic argument rides along (BASELINE ≥85% gate)
    assert rep["analytic"]["total_collectives"] == 0
    assert rep["analytic"]["ici_bytes_per_step"] == 0


def test_dp_decode_has_zero_collectives(setup):
    """The scaling gate's structural evidence: the compiled DP-sharded
    decode contains no collective ops — zero ICI bytes per step."""
    dims, params, rules, *_ = setup
    rep = infer.dp_collective_report(dims, _mesh(8), rules=rules, max_len=4)
    assert rep["total_collectives"] == 0
    assert rep["ici_bytes_per_step"] == 0
    assert "embarrassingly parallel" in rep["claim"]


def test_tp_decode_has_collectives(setup):
    """Contrast case proving the counter sees real collectives: the
    Megatron row-parallel psum must appear in the TP-sharded module."""
    dims, params, rules, audio, prompt = setup
    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs).reshape(1, 2), (DATA_AXIS, "model"))
    fn = infer.make_tp_decode(params, dims, mesh, rules=rules, max_len=4)
    from turbo_whisper_workspace_tpu.parallel.sharding import shard_params

    params_sh = shard_params(params, mesh)
    counts = infer.count_collectives(
        fn.lower(params_sh, jnp.asarray(audio), jnp.asarray(prompt))
    )
    assert sum(counts.values()) > 0
