"""Tracing / profiling: stage timers, device traces, kernel accounting.

The reference's observability is wall-clock stage timers surfaced as
`processing_times` + a realtime factor (vocalis/core/audio_pipeline.py:
585-663, vocalis/ui/app.py:93-99) and ad-hoc matmul microbenchmarks
(check_gpu.py, scripts/optimize_gpu.py:69-105). Here that becomes:

* `StageTimer` — context-manager timers producing the same
  processing_times dict (plus audio-seconds/s rates);
* `trace` — jax.profiler trace capture around any callable (TensorBoard
  format) for per-kernel inspection;
* `speed_of_light` — roofline accounting for a kernel: achieved vs peak
  FLOP/s and bytes/s on the attached chip (BASELINE.md's kernel gates).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

# v5e (TPU v5 lite) per-chip peaks; override for other generations.
# bf16 MXU peak is 197 TFLOP/s — the oft-quoted 394 is the INT8 TOPS
# figure (rounds 1-3 used 394 for bf16, which halved every reported
# speed-of-light fraction; e.g. the encoder MLP's measured ~180 TF/s is
# ~91% of the true bf16 peak, not 46%).
PEAK_BF16_FLOPS = 197e12
PEAK_INT8_OPS = 394e12
PEAK_HBM_BYTES_S = 819e9


class StageTimer:
    """Accumulates named stage durations; produces the reference's
    processing_times dict."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def finish(self) -> dict[str, float]:
        self.times["total"] = time.time() - self._t0
        return dict(self.times)

    def realtime_factor(self, audio_seconds: float) -> float:
        total = self.times.get("total") or (time.time() - self._t0)
        return total / audio_seconds if audio_seconds else 0.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/twt_trace"):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class KernelRoofline:
    name: str
    seconds: float
    flops: float = 0.0
    bytes_accessed: float = 0.0
    peak_flops: float = PEAK_BF16_FLOPS
    peak_bytes_s: float = PEAK_HBM_BYTES_S
    extra: dict = field(default_factory=dict)

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds if self.seconds else 0.0

    @property
    def achieved_bytes_s(self) -> float:
        return self.bytes_accessed / self.seconds if self.seconds else 0.0

    @property
    def sol_time(self) -> float:
        """Speed-of-light time: max of compute-bound and bandwidth-bound."""
        return max(self.flops / self.peak_flops,
                   self.bytes_accessed / self.peak_bytes_s)

    @property
    def sol_fraction(self) -> float:
        return self.sol_time / self.seconds if self.seconds else 0.0

    def report(self) -> str:
        return (
            f"{self.name}: {self.seconds * 1e3:.2f} ms | "
            f"{self.achieved_flops / 1e12:.1f} TF/s "
            f"({100 * self.achieved_flops / self.peak_flops:.0f}% peak) | "
            f"{self.achieved_bytes_s / 1e9:.0f} GB/s "
            f"({100 * self.achieved_bytes_s / self.peak_bytes_s:.0f}% peak) | "
            f"SoL {100 * self.sol_fraction:.0f}%"
        )


def speed_of_light(name: str, fn, *args, flops: float = 0.0,
                   bytes_accessed: float = 0.0, iters: int = 5) -> KernelRoofline:
    """Time a jitted callable and report roofline numbers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jnp.sum(leaf))

    sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return KernelRoofline(
        name=name, seconds=(time.time() - t0) / iters, flops=flops,
        bytes_accessed=bytes_accessed,
    )
