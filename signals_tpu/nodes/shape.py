"""Channel-shape manipulation (reference ``src/signals/chain/shape.py``).

Two latent reference bugs are fixed rather than copied (each noted below):
the reference's ``Flatten``/``Select`` reduce/index on the wrong axis,
producing 1-D arrays that violate its own block invariant
(``shape.py:35,57``), and ``Merge`` crashes on broadcast-shaped or unplugged
inputs (``shape.py:69-74``).
"""

from __future__ import annotations

import abc

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, ge, instance_of
from signals_tpu.graph import (
    BlockCachingEmitter,
    KernelCtx,
    Receiver,
    port,
)
from signals_tpu.registry import register


class Shaper(BlockCachingEmitter, Receiver, abc.ABC):

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT


class Scalar(Shaper, abc.ABC):
    input: Receiver.BoundPort = port('input')

    @property
    def channels(self) -> int:
        return 1


@register('signals.chain.shape.Flatten')
class Flatten(Scalar):
    """Sum all channels into one.  (The reference sums axis 0 — frames —
    which breaks its own 2-D block invariant; summing channels is the
    documented intent of a ``Scalar`` shaper.)"""

    def kernel(self, ctx: KernelCtx):
        return ctx.xp.sum(ctx.in_full('input'), axis=1, keepdims=True)


@register('signals.chain.shape.FlattenUnit')
class FlattenUnit(Scalar):
    """Mean of all channels (see :class:`Flatten` for the axis note)."""

    def kernel(self, ctx: KernelCtx):
        return ctx.xp.mean(ctx.in_full('input'), axis=1, keepdims=True)


@register('signals.chain.shape.Select')
class Select(Scalar):
    """Pick one channel by index; empty result when the index is out of
    range (reference ``shape.py:44-57``, kept 2-D)."""

    class State(Scalar.State):
        index: int = Param(0, validate=all_of(instance_of(int), ge(0)))

    def kernel(self, ctx: KernelCtx):
        ch = ctx.in_channels('input')
        idx = self._state.index
        if ch is None or idx >= ch:
            return np.zeros((1, 1), dtype=np.float32)
        return ctx.in_full('input')[:, idx:idx + 1]


@register('signals.chain.shape.Merge')
class Merge(Shaper):
    """Concatenate the channels of both inputs (reference ``shape.py:60-74``).

    Each side is broadcast to its full ``(frames, channels)`` extent first,
    so constant (1×1) inputs merge correctly — the reference crashes there.
    """

    left: Receiver.BoundPort = port('left')
    right: Receiver.BoundPort = port('right')

    @property
    def channels(self) -> int:
        return sum(inp.channels for inp in self.inputs_by_port.values()) or 1

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        parts = []
        for name in ('left', 'right'):
            ch = ctx.in_channels(name)
            if ch is None:
                continue
            block = ctx.in_full(name)
            parts.append(xp.broadcast_to(block, (ctx.nframes, ch)))
        if not parts:
            return np.zeros((1, 1), dtype=np.float32)
        return xp.concatenate(parts, axis=1)
