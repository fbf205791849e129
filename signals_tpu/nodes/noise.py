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

from signals_tpu import SignalFlags
from signals_tpu.core.rng import uniform01
from signals_tpu.core.state import Param, instance_of
from signals_tpu.graph import (
    BlockCachingEmitter,
    ExplicitChannelsEmitter,
    KernelCtx,
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
