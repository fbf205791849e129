"""Envelope generators (new capability; the reference's only envelope-like
design lives in its dead prototype, ``src/signals/sig.py:68-100``, and was
never wired in — this is a fresh TPU-native design).

:class:`ADSR` is a gate-driven attack/decay/sustain/release envelope.  The
gate is sampled at block rate (like every control input in the framework,
reference ``chain/__init__.py:305-306``), so edges are detected at block
granularity; within a block the envelope is an exact closed-form function of
the frame index, which keeps the carried state tiny (edge times and levels)
and the per-frame math branch-free VPU code.
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, ge
from signals_tpu.graph import (
    ImplicitChannels,
    KernelCtx,
    Receiver,
    StatefulEmitter,
    port,
)
from signals_tpu.registry import register

F32 = np.float32


@register()
class ADSR(StatefulEmitter, ImplicitChannels):
    """Linear ADSR envelope driven by a gate signal (>0.5 = on).

    Retrigger-safe: attack restarts from the envelope's current level, and
    release decays linearly from the level at the off-edge.
    """

    gate: Receiver.BoundPort = port('gate')

    class State(StatefulEmitter.State):
        attack: float = Param(0.01, validate=ge(0.0), traced=True)
        decay: float = Param(0.1, validate=ge(0.0), traced=True)
        sustain: float = Param(0.7, validate=ge(0.0), traced=True)
        release: float = Param(0.2, validate=ge(0.0), traced=True)

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.GENERATOR

    def init_carry(self, *, channels: int, rate: int,
                   block_frames: int) -> dict[str, np.ndarray]:
        far = np.full((1, channels), -1e9, dtype=F32)
        zero = np.zeros((1, channels), dtype=F32)
        return {'gate': zero.copy(), 't_on': far.copy(), 't_off': far.copy(),
                'level_on': zero.copy(), 'level_off': zero.copy()}

    def _value(self, xp, t, gate_on, t_on, t_off, level_on, level_off,
               A, D, S, R):
        """Envelope level at frame(s) ``t`` given edge state."""
        dt_on = t - t_on
        attack_v = level_on + (F32(1.0) - level_on) * (dt_on / A)
        decay_v = F32(1.0) - (F32(1.0) - S) * ((dt_on - A) / D)
        on_v = xp.where(dt_on < A, attack_v,
                        xp.where(dt_on < A + D, decay_v, S))
        off_v = level_off * xp.maximum(
            F32(0.0), F32(1.0) - (t - t_off) / R)
        return xp.where(gate_on, on_v, off_v)

    def step(self, ctx: KernelCtx, carry: dict):
        xp = ctx.xp
        rate = ctx.rate_f32
        one_frame = F32(1.0)
        A = xp.maximum(ctx.param('attack') * rate, one_frame)
        D = xp.maximum(ctx.param('decay') * rate, one_frame)
        S = ctx.param('sustain')
        R = xp.maximum(ctx.param('release') * rate, one_frame)

        g = ctx.in_block_rate('gate') > F32(0.5)      # (1, ch-ish) bool
        prev = carry['gate'] > F32(0.5)
        pos = ctx.frame_range[0:1]                    # (1, 1)

        level_now = self._value(xp, pos, prev,
                                carry['t_on'], carry['t_off'],
                                carry['level_on'], carry['level_off'],
                                A, D, S, R)
        on_edge = g & ~prev
        off_edge = ~g & prev
        t_on = xp.where(on_edge, pos, carry['t_on'])
        level_on = xp.where(on_edge, level_now, carry['level_on'])
        t_off = xp.where(off_edge, pos, carry['t_off'])
        level_off = xp.where(off_edge, level_now, carry['level_off'])

        t = ctx.frame_range                           # (F, 1)
        out = self._value(xp, t, g, t_on, t_off, level_on, level_off,
                          A, D, S, R)
        ch = self.channels
        new_carry = {
            'gate': xp.broadcast_to(
                xp.where(g, F32(1.0), F32(0.0)), (1, ch)).astype(F32),
            't_on': xp.broadcast_to(t_on, (1, ch)).astype(F32),
            't_off': xp.broadcast_to(t_off, (1, ch)).astype(F32),
            'level_on': xp.broadcast_to(level_on, (1, ch)).astype(F32),
            'level_off': xp.broadcast_to(level_off, (1, ch)).astype(F32),
        }
        return out, new_carry
