"""Auxiliary subsystems: profiling, metrics, checkpointing.

The reference has no tracing/profiling and its only checkpoint system is
``.sigs`` patch persistence (SURVEY §5).  Here:

* :class:`LatencyStats` — per-block render-time metrics (p50/p95/max,
  realtime headroom), fed by the Transport loop;
* :func:`trace` — a ``jax.profiler`` trace context for TPU timeline capture;
* :mod:`signals_tpu.utils.checkpoint` — carried-state snapshots, so a long
  render (or live performance) can resume exactly: patch text (``.sigs``) +
  position + carry pytree.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class LatencyStats:
    """Rolling per-block latency collector."""

    def __init__(self, *, window: int = 512):
        self.window = window
        self._times: list[float] = []
        self.total_blocks = 0

    def record(self, seconds: float) -> None:
        self.total_blocks += 1
        self._times.append(seconds)
        if len(self._times) > self.window:
            del self._times[:len(self._times) - self.window]

    def percentile(self, q: float) -> float:
        if not self._times:
            return 0.0
        return float(np.percentile(self._times, q))

    @property
    def p50(self) -> float:
        return self.percentile(50)

    @property
    def p95(self) -> float:
        return self.percentile(95)

    @property
    def worst(self) -> float:
        return max(self._times, default=0.0)

    def headroom(self, block_frames: int, rate: int) -> float:
        """How many times realtime the p50 block render is."""
        budget = block_frames / rate
        p50 = self.p50
        return budget / p50 if p50 > 0 else float('inf')

    def summary(self, block_frames: int, rate: int) -> dict:
        return {
            'blocks': self.total_blocks,
            'p50_ms': self.p50 * 1e3,
            'p95_ms': self.p95 * 1e3,
            'worst_ms': self.worst * 1e3,
            'x_realtime_p50': self.headroom(block_frames, rate),
        }


@contextlib.contextmanager
def timed(stats: LatencyStats):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        stats.record(time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/signals_tpu_trace'):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_persistent_compile_cache(path: 'str | None' = None, *,
                                    min_compile_seconds: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.cache/signals_tpu_xla``) and
    return the directory used.

    Setting the ``JAX_COMPILATION_CACHE_DIR`` environment variable from
    Python is NOT enough in environments where a platform plugin
    pre-imports ``jax`` at interpreter startup (config env defaults are
    captured at first import — observed live: the env var set in
    ``bench.py`` left ``jax_compilation_cache_dir`` at ``None`` and every
    bench run recompiled everything through the tunnel, ~20-40 s per
    program).  ``jax.config.update`` works regardless of import order;
    a cache hit re-loads a tunnel-compiled executable in ~0.2 s.
    """
    import os

    import jax
    cache_dir = path if path is not None else os.environ.get(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.expanduser('~/.cache/signals_tpu_xla'))
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_seconds))
    return cache_dir
