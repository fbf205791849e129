"""Wavetable synthesis.

The reference sketched a wavetable oscillator (``src/signals/chain/osc.py:
65-103``, ``OscTable``) and abandoned it: on CPU, per-block table reads with
wraparound padding measured slower than evaluating the waveform directly.
On TPU the trade is different — a table read is one vectorized gather, and
a *traced* table is a synthesis surface: any single-cycle waveform becomes
an oscillator, morphable per block and differentiable (``signals_tpu.learn``
can fit the waveform itself to target audio).

The phase path follows :mod:`signals_tpu.nodes.osc`'s bit-parity discipline
(primitive frac, multiply by the host-precomputed reciprocal rate).
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, array_2d
from signals_tpu.graph import (
    BlockCachingEmitter,
    ImplicitChannels,
    KernelCtx,
    Receiver,
    port,
)
from signals_tpu.nodes.osc import _frac
from signals_tpu.registry import register

F32 = np.float32


def _default_table() -> np.ndarray:
    # one sine cycle, 1024 samples — replace with any single-cycle waveform
    t = np.arange(1024, dtype=np.float32) / 1024.0
    return np.sin(2 * np.pi * t).astype(np.float32).reshape(-1, 1)


@register()
class Wavetable(BlockCachingEmitter, ImplicitChannels):
    """Single-cycle wavetable oscillator with linear interpolation.

    ``table`` is a traced ``(length, 1)`` array param: editable (and
    gradient-trainable) without recompiling, as long as its length is
    unchanged.  ``hertz``/``phase`` behave exactly like the analytic
    oscillators.
    """

    hertz: Receiver.BoundPort = port('hertz')
    phase: Receiver.BoundPort = port('phase')

    class State(BlockCachingEmitter.State):
        table: np.ndarray = Param(
            _default_table,
            validate=array_2d,
            convert=lambda v: np.asarray(v, dtype=np.float32)
            if isinstance(v, (np.ndarray, list, tuple)) else v,
            traced=True)

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.GENERATOR

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        table = ctx.param('table')
        n = table.shape[0]
        hertz = ctx.in_block_rate('hertz')
        phase = ctx.in_block_rate('phase')
        turns = _frac(xp, ctx.frame_range * ctx.inv_rate_f32 * hertz)
        t = _frac(xp, turns + phase)
        # linear interpolation with wraparound
        x = t * F32(n)
        i0 = xp.floor(x)
        frac = x - i0
        i0 = i0.astype(np.int32)
        i1 = xp.where(i0 + 1 >= n, 0, i0 + 1)
        i0 = xp.where(i0 >= n, 0, i0)      # guard t == 1.0 edge
        wave = table[:, 0]
        y0 = wave[i0]
        y1 = wave[i1]
        return y0 + (y1 - y0) * frac
