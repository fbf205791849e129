"""Oscillators (reference ``src/signals/chain/osc.py``).

Phase model is stateless absolute time, exactly as the reference
(``osc.py:32``): ``cycles = frame_index / rate * hertz + phase`` with
``hertz`` and ``phase`` sampled once per block.  Statelessness gives
sample-exact reproducibility and free seeking, and compiles to pure
vectorized VPU math with nothing carried between blocks.

The reference's ``OscTable`` wavetable is deliberately not reproduced: the
reference's own measurement found it slower than direct evaluation
(``osc.py:67-68``), and on TPU a gather-based table lookup is strictly worse
than fused transcendental evaluation.
"""

from __future__ import annotations

import abc

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.graph import (
    BlockCachingEmitter,
    ImplicitChannels,
    KernelCtx,
    Receiver,
    port,
)
from signals_tpu.registry import register

F32 = np.float32


def _frac(xp, x):
    """``x mod 1`` as primitive IEEE ops.

    ``xp.mod`` is a *composite* (remainder + sign correction) whose exact
    sequence differs between numpy and XLA backends, so results can differ
    by an ulp for negative operands — which a periodic discontinuity then
    amplifies.  ``x - floor(x)`` is two single IEEE-exact-rounded ops, so
    every backend produces identical bits.
    """
    return x - xp.floor(x)


def _frac_half(xp, x):
    """``x mod 0.5`` via the same primitive-op trick (scaling by powers of
    two is exact)."""
    return F32(0.5) * _frac(xp, x * F32(2.0))


class Osc(BlockCachingEmitter, ImplicitChannels, abc.ABC):
    hertz: Receiver.BoundPort = port('hertz')
    phase: Receiver.BoundPort = port('phase')

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.GENERATOR

    def kernel(self, ctx: KernelCtx):
        # phase: cycles ; hertz: cycles/second — both at block rate
        phase = ctx.in_block_rate('phase')
        hertz = ctx.in_block_rate('hertz')
        xp = ctx.xp
        # frames / (frames/second) * (cycles/second), reduced to one cycle
        # *before* the phase offset and the periodic function.  This exact
        # op sequence is chosen for cross-engine bit-parity: IEEE remainder
        # is exact (x - floor(x)), so both engines reduce identically, and
        # there is no mul+add pair XLA could contract into an FMA (which
        # rounds differently from numpy).  It is also the numerically right
        # thing: transcendental range reduction of a large absolute-time
        # argument loses accuracy linearly in |t|.
        turns = _frac(xp, ctx.frame_range * ctx.inv_rate_f32 * hertz)
        t = _frac(xp, turns + phase)
        return self._osc(ctx, t)

    @abc.abstractmethod
    def _osc(self, ctx, t):
        raise NotImplementedError


@register('signals.chain.osc.Sine')
class Sine(Osc):
    """Sine via the shared cross-engine polynomial
    (:func:`signals_tpu.core.mathx.sin2pi`): numpy's and XLA's library
    ``sin`` differ by ~2 ulps, which FM phase stacks and feedback loops
    amplify past the 1e-5 parity budget — the shared evaluation makes both
    engines bit-identical."""

    def _osc(self, ctx, t):
        from signals_tpu.core.mathx import sin2pi
        return sin2pi(ctx.xp, t, ctx.exact)   # t already reduced to [0, 1)


@register('signals.chain.osc.Square')
class Square(Osc):

    def _osc(self, ctx, t):
        xp = ctx.xp
        return xp.sign(F32(0.5) - _frac(xp, t))


@register('signals.chain.osc.Sawtooth')
class Sawtooth(Osc):

    def _osc(self, ctx, t):
        xp = ctx.xp
        return F32(2.0) * _frac(xp, t - F32(0.5)) - F32(1.0)


@register('signals.chain.osc.Triangle')
class Triangle(Osc):

    def _osc(self, ctx, t):
        xp = ctx.xp
        t = t - F32(0.25)
        return ((F32(4.0) * _frac_half(xp, t) - F32(1.0))
                * xp.sign(_frac(xp, t) - F32(0.5)))
