"""Noise generators (reference ``src/signals/chain/noise.py``).

The reference's white noise is unseeded ``np.random.rand``
(``noise.py:23``) — nondeterministic and seek-unstable.  Here noise is
counter-based (:mod:`signals_tpu.core.rng`): a pure function of
``(seed, frame, channel)``, so both engines produce identical samples and
seeking/replay is exact.  Parity with the reference is distribution-level
(uniform [0, 1)), which is the only property the reference guarantees.
"""

from __future__ import annotations

import abc

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.rng import uniform01
from signals_tpu.core.state import Param, instance_of
from signals_tpu.graph import (
    BlockCachingEmitter,
    ExplicitChannelsEmitter,
    KernelCtx,
    Receiver,
    port,
)
from signals_tpu.registry import register


class Noise(ExplicitChannelsEmitter, BlockCachingEmitter, abc.ABC):

    class State(ExplicitChannelsEmitter.State):
        seed: int = Param(0, validate=instance_of(int), traced=True)

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.GENERATOR


@register('signals.chain.noise.White')
class White(Noise):

    def kernel(self, ctx: KernelCtx):
        return uniform01(ctx.xp, ctx.param('seed'), ctx.frame_range_int,
                         self._state.channels)


@register()
class Pink(Noise):
    """~1/f noise in [0, 1) via Voss-McCartney: the sum of 16 octave-rate
    sample-and-hold white sources, each a pure counter hash of
    ``frame >> k`` — stateless, seek-stable, and identical across engines
    like :class:`White` (no reference counterpart; the reference only has
    white noise)."""

    OCTAVES = 16

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        n = ctx.frame_range_int
        seed = ctx.param('seed')
        ch = self._state.channels
        total = uniform01(xp, seed, n, ch)
        for k in range(1, self.OCTAVES):
            held = n >> np.int32(k)
            total = total + uniform01(xp, seed, held, ch, salt=k)
        return total * np.float32(1.0 / self.OCTAVES)


@register()
class SampleHold(Noise, Receiver):
    """Random sample-and-hold LFO: a fresh uniform [0, 1) value held for
    ``1/rate`` seconds (``rate`` in Hz at block rate) — the classic
    "random" modulation source.  The hold index is an absolute-time pure
    function (like oscillator phase), so it is seekable and engine-exact."""

    rate: Receiver.BoundPort = port('rate')

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        hold_hz = ctx.in_block_rate('rate')           # (1, c)
        # same discipline as Osc phase: multiply by the host-exact 1/rate
        idx_f = xp.floor(ctx.frame_range * ctx.inv_rate_f32 * hold_hz)
        idx = idx_f.astype(np.int32)                  # (F, c)
        seed = ctx.param('seed')
        ch = max(self._state.channels, idx.shape[1])
        idx = xp.broadcast_to(idx, (idx.shape[0], ch))
        cols = [uniform01(xp, seed, idx[:, c:c + 1], 1, salt=c + 1)
                for c in range(ch)]
        return xp.concatenate(cols, axis=1) if ch > 1 else cols[0]
