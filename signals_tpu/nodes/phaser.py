"""Phaser: a swept chain of first-order allpass sections.

Completes the classic modulation-effect set (chorus/flanger/vibrato live
in :mod:`signals_tpu.nodes.moddelay`; the reference has no modulation
effects at all — its fx set is elementwise + filters,
``src/signals/chain/fx.py``).  An allpass chain passes every frequency
at unit gain but rotates phase around a movable break frequency; mixed
with the dry signal, the rotations become moving notches — the phaser
swoosh.

TPU shape: with a per-frame coefficient ``g[n]`` each section is a
one-state *affine* recurrence ``y[n] = a[n]·y[n-1] + b[n]`` — exactly
the shape ``jax.lax.associative_scan`` evaluates in O(log n) depth on
the VPU, the same trick the streaming filters' ``mega_step`` uses for
their two-state transitions (``fx.py:238-320``).  A whole mega window
renders as ``stages`` scans with no block loop; the per-block ``step``
is the same code over one block.  The numpy pull engine runs the
literal per-frame recurrence — the sequential semantic oracle the scan
is tested against.
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, ge, in_range, instance_of
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
class Phaser(StatefulEmitter, ImplicitChannels, Receiver):
    """Swept first-order allpass chain with dry mix.

    ``sweep`` is the allpass break frequency in Hz (audio-rate signal —
    drive it with an LFO through Gain/Mix, exactly like a filter
    cutoff); ``stages`` (structural) is the number of allpass sections
    (notch count = stages/2 at the classic 0.5 mix); ``mix`` (traced)
    blends dry and allpassed (0 = dry, 0.5 = deepest notches, 1 = pure
    allpass — audibly transparent on its own).

    Exact streaming state (one f32 per stage per channel): like
    ``streaming=True`` filters, state is position-dependent — seeking
    resets it.  Each section: ``y[n] = g[n]·x[n] + x[n-1] − g[n]·y[n-1]``
    with ``g = (tan(π·f/fs) − 1) / (tan(π·f/fs) + 1)`` (|g| < 1 for any
    f in (0, Nyquist): unconditionally stable, however hard the sweep
    modulates).
    """

    input: Receiver.BoundPort = port('input')
    sweep: Receiver.BoundPort = port('sweep')

    class State(StatefulEmitter.State):
        #: structural: number of first-order allpass sections
        stages: int = Param(4, validate=all_of(instance_of(int), ge(1)))
        mix: float = Param(0.5, validate=in_range(0.0, 1.0), traced=True)

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def init_carry(self, *, channels: int, rate: int,
                   block_frames: int) -> dict:
        S = self._state.stages
        return {
            # last input frame seen by each stage (stage 0: the raw
            # input; stage i: stage i-1's last output)
            'x1': np.zeros((S, channels), dtype=F32),
            # each stage's last output frame
            'y1': np.zeros((S, channels), dtype=F32),
        }

    def _coeff(self, xp, f):
        t = xp.tan(F32(np.pi) * f * self._inv_rate)
        return (t - F32(1.0)) / (t + F32(1.0))

    def step(self, ctx: KernelCtx, carry: dict):
        xp = ctx.xp
        F = ctx.nframes
        ch = self.channels
        self._inv_rate = ctx.inv_rate_f32
        x = xp.broadcast_to(ctx.in_('input'), (F, ch)).astype(F32)
        f = xp.broadcast_to(ctx.in_('sweep'), (F, ch)).astype(F32)
        f = xp.clip(f, F32(1.0), F32(0.49) * ctx.rate_f32)
        g = self._coeff(xp, f)                       # (F, ch), |g| < 1
        mix = xp.asarray(ctx.param('mix'), dtype=F32).reshape(())

        x1 = carry['x1']
        y1 = carry['y1']
        S = self._state.stages
        wet = x
        x1_out = []
        y1_out = []
        for s in range(S):
            xin = wet
            # x[n-1] within the window; frame 0 reads the carried frame
            xprev = xp.concatenate([x1[s][None, :], xin[:-1]], axis=0)
            b = g * xin + xprev
            if xp is np:                             # pull engine: literal
                y = np.empty_like(xin)
                prev = y1[s]
                for n in range(F):
                    prev = b[n] - g[n] * prev
                    y[n] = prev
            else:
                import jax

                def combine(l, r):
                    (al, bl), (ar, br) = l, r
                    return al * ar, ar * bl + br

                a_all, b_all = jax.lax.associative_scan(
                    combine, (-g, b), axis=0)
                y = a_all * y1[s][None, :] + b_all
            x1_out.append(xin[-1])
            y1_out.append(y[-1])
            wet = y
        out = (F32(1.0) - mix) * x + mix * wet
        return out, {'x1': xp.stack(x1_out), 'y1': xp.stack(y1_out)}

    @property
    def supports_mega_step(self) -> bool:
        """The scan form is window-length-agnostic: a mega window is the
        same ``stages`` associative scans over ``nb·F`` frames."""
        return True

    def mega_step(self, ctx: KernelCtx, carry: dict):
        return self.step(ctx, carry)
