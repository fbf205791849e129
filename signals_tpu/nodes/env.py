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

    Execution: the pull engine steps carried state per block
    (:meth:`step`).  The compiler instead lowers the envelope
    **statelessly** (:meth:`grid_kernel`): the gate is sampled on the
    absolute block grid over a bounded ``horizon``, edge times come from a
    running maximum, and retrigger levels from an associative chain of the
    per-edge affine updates — so envelope patches stay loop-free
    (independent blocks) and the block scan disappears.  The two agree
    exactly once boundary effects decay, i.e. when ``horizon`` comfortably
    exceeds ``attack+decay`` and ``release`` (both capped to ``horizon``).
    """

    #: compiler: lower via grid_kernel, carry-free
    is_grid_stateless = True

    gate: Receiver.BoundPort = port('gate')

    class State(StatefulEmitter.State):
        attack: float = Param(0.01, validate=ge(0.0), traced=True)
        decay: float = Param(0.1, validate=ge(0.0), traced=True)
        sustain: float = Param(0.7, validate=ge(0.0), traced=True)
        release: float = Param(0.2, validate=ge(0.0), traced=True)
        #: structural: seconds of gate history the compiled form retains
        horizon: float = Param(1.0, validate=ge(0.01))

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

    # --- compiled engine: stateless bounded-horizon lowering ---------------

    def _adsr_params(self, ctx):
        xp = ctx.xp
        rate = ctx.rate_f32
        one = F32(1.0)
        A = xp.maximum(ctx.param('attack') * rate, one)
        D = xp.maximum(ctx.param('decay') * rate, one)
        S = ctx.param('sustain')
        R = xp.maximum(ctx.param('release') * rate, one)
        return A, D, S, R

    def _grid_count(self, stride: int, rate: int) -> int:
        return max(2, int(np.ceil(self._state.horizon * rate / stride)) + 1)

    def grid_windows(self, stride: int, rate: int):
        """(port, stride, count) grid-history requirements, for the
        compiler's window-collection pass."""
        return [('gate', stride, self._grid_count(stride, rate))]

    def grid_kernel(self, ctx: KernelCtx, stride: int):
        """Carry-free evaluation from ``K`` grid samples of the gate.

        Edge *times* are running maxima over the sampled history; edge
        *levels* obey a linear recurrence in ``(level_on, level_off)``
        whose per-step update is affine (attack/release values are affine
        in the previous levels), so the whole chain evaluates with one
        associative scan — no sequential dependence between blocks.
        """
        import jax
        xp = ctx.xp
        A, D, S, R = self._adsr_params(ctx)
        K = self._grid_count(stride, ctx.rate)
        horizon_frames = F32(K * stride)

        # windows may span several grid cells (mega-window rendering, or
        # strided control windows): sample the gate across all of them and
        # evaluate each frame against the state of *its* cell
        w = getattr(ctx, 'window', None)
        if w is not None:
            anchor_off = stride * (w.offset // stride)
            nb = 1 + (w.end - 1 - anchor_off) // stride
        else:
            nb = 1
        total = K + nb - 1

        g = ctx.in_grid_samples('gate', stride, total, ahead=nb - 1)
        ch = g.shape[1]
        on = g > F32(0.5)
        prev_on = xp.concatenate([on[:1], on[:-1]], axis=0)
        rise = on & ~prev_on
        fall = ~on & prev_on

        # absolute positions of the grid samples (newest = window anchor);
        # integer arithmetic so large positions stay exact
        fri0 = ctx.frame_range_int[0:1]
        anchor = (fri0 - xp.mod(fri0, stride)).astype(F32)
        pos = anchor + F32(stride) * (
            xp.arange(total, dtype=np.int32).astype(F32).reshape(-1, 1)
            - F32(K - 1))                               # (total, 1)
        sentinel = anchor - horizon_frames              # "long ago"

        # latest edge positions at-or-before each sample: running maximum
        t_on_seq = jax.lax.cummax(xp.where(rise, pos, sentinel), axis=0)
        t_off_seq = jax.lax.cummax(xp.where(fall, pos, sentinel), axis=0)
        t_on_prev = xp.concatenate([xp.broadcast_to(sentinel, (1, ch)),
                                    t_on_seq[:-1]], axis=0)
        t_off_prev = xp.concatenate([xp.broadcast_to(sentinel, (1, ch)),
                                     t_off_seq[:-1]], axis=0)

        # per-step affine update of L = (lv_on, lv_off):
        #  rise (gate was off): lv_on' = beta*lv_off  (release value)
        #  fall (gate was on):  lv_off' = alpha*lv_on + gamma (on-side value)
        dt_on = pos - t_on_prev
        in_attack = dt_on < A
        alpha = xp.where(in_attack, F32(1.0) - dt_on / A, F32(0.0))
        gamma = xp.where(
            in_attack, dt_on / A,
            xp.where(dt_on < A + D,
                     F32(1.0) - (F32(1.0) - S) * ((dt_on - A) / D), S))
        beta = xp.maximum(F32(0.0), F32(1.0) - (pos - t_off_prev) / R)

        riz = rise.astype(F32)
        fal = fall.astype(F32)
        idm = F32(1.0) - riz - fal
        # lv_on' = a11 lv_on + a12 lv_off + b1 ; lv_off' = a21 lv_on + a22 lv_off + b2
        a11 = idm + fal
        a12 = riz * beta
        b1 = xp.zeros_like(riz)
        a21 = fal * alpha
        a22 = idm + riz
        b2 = fal * gamma

        def combine(older, newer):
            o11, o12, ob1, o21, o22, ob2 = older
            n11, n12, nb1, n21, n22, nb2 = newer
            return (n11 * o11 + n12 * o21,
                    n11 * o12 + n12 * o22,
                    n11 * ob1 + n12 * ob2 + nb1,
                    n21 * o11 + n22 * o21,
                    n21 * o12 + n22 * o22,
                    n21 * ob1 + n22 * ob2 + nb2)

        c11, c12, cb1, c21, c22, cb2 = jax.lax.associative_scan(
            combine, (a11, a12, b1, a21, a22, b2), axis=0)
        # applied to the boundary state (0, 0): levels = the b terms
        lv_on_seq = cb1                                 # (total, ch)
        lv_off_seq = cb2

        # evaluate every frame against the state of its own grid cell.
        # Gathers over the full frame axis are catastrophically slow on TPU
        # (measured 5x the whole rest of the patch), and the cell mapping is
        # static in every real window shape — so pick rows with slices:
        #   * one block (nb == 1): every frame shares cell K-1
        #   * a grid-aligned strided window: frame j IS cell K-1+j
        #   * a whole-blocks contiguous window: cells repeat stride times
        nframes = ctx.nframes
        w_stride = w.stride if w is not None else 1
        aligned = w is not None and w.offset % stride == 0

        def pick(arr):
            if nb == 1:
                return arr[K - 1:K]                    # (1, ch) broadcast row
            if aligned and w_stride == stride:
                return arr[K - 1:K - 1 + nframes]      # one row per frame
            if aligned and w_stride == 1 and nframes == nb * stride:
                return xp.repeat(arr[K - 1:K - 1 + nb], stride, axis=0)
            fri_ = ctx.frame_range_int
            anchor_int = fri_[0:1] - xp.mod(fri_[0:1], stride)
            cell = ((fri_ - anchor_int) // stride)[:, 0] + (K - 1)
            return arr[cell]

        t = ctx.frame_range
        return self._value(xp, t, pick(on), pick(t_on_seq), pick(t_off_seq),
                           pick(lv_on_seq), pick(lv_off_seq),
                           A, D, S, R)
