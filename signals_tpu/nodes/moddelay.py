"""Modulated fractional delay — the chorus/flanger/vibrato primitive.

New capability (the reference has no delay at all, ``src/signals/
__init__.py:28-29`` declares CYCLIC unimplemented, and this framework's
:class:`~signals_tpu.nodes.delay.Delay` is block-quantized for feedback):
modulation effects need delays of *fractions of a block* that move every
sample.  A moving sub-block read needs no carried state — it is a pure
function of a bounded input lookback, exactly the stateless context-window
shape the engines already serve everywhere (``fx.py:82-106`` context
filters, the Compressor), so :class:`FracDelay` is seekable,
blocking-invariant, and rides every fast render path (mega, packed,
segment) with a single per-frame linear-interpolated gather — a VPU-friendly
``take_along_axis``, no scatter, no scan.

Classic patches (compose with the existing library):

* **vibrato**: ``FracDelay`` driven by a slow Sine on ``delay``;
* **chorus**: ``Mix(dry, FracDelay(src, lfo))``;
* **flanger**: chorus with a short sweep (< ~10 ms) — the comb notches
  at ``f = (2k+1) / (2·d)`` sweep with the LFO;
* **stereo spread**: a 2-channel ``delay`` input (e.g. a panned LFO)
  reads each channel at a different moving offset.
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, ge, instance_of
from signals_tpu.graph import (
    BlockCachingEmitter,
    ImplicitChannels,
    KernelCtx,
    Receiver,
    port,
)
from signals_tpu.registry import register

F32 = np.float32


@register()
class FracDelay(BlockCachingEmitter, ImplicitChannels, Receiver):
    """Linearly-interpolated moving delay read.

    ``input`` is delayed by the ``delay`` signal (seconds, audio-rate,
    broadcastable — a constant gives a static fractional delay, an LFO a
    chorus/vibrato sweep, a multi-channel signal a per-channel spread),
    clamped to ``[0, max_delay]``.  ``max_delay`` (seconds) is structural:
    it sizes the context lookback.

    Delay-line physics, not resampling: a *ramping* delay produces true
    Doppler pitch shift (rate ``1 - d'(t)``), which is what vibrato is.
    Frames before the stream start read as silence in both engines.
    """

    input: Receiver.BoundPort = port('input')
    delay: Receiver.BoundPort = port('delay')

    class State(BlockCachingEmitter.State):
        #: structural: maximum delay in seconds (sizes the lookback)
        max_delay: float = Param(
            0.05, validate=all_of(instance_of(float), ge(1e-4)))

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def lookback_frames(self, rate: int) -> int:
        # +1: the linear interpolation reads one frame past the clamp
        return int(np.ceil(self._state.max_delay * rate)) + 1

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        M = self.lookback_frames(ctx.rate)
        F = ctx.nframes
        ch = self.channels
        x = ctx.in_context('input', M)
        if x.shape[0] < M + F:          # pull engine clamps at stream
            x = xp.pad(x, ((M + F - x.shape[0], 0), (0, 0)))
        x = xp.broadcast_to(x, (M + F, ch))

        d = xp.broadcast_to(ctx.in_('delay'), (F, ch))
        df = xp.clip(d * F32(ctx.rate), F32(0.0), F32(M - 1))
        # split BEFORE adding the frame index: ``t + M - df`` computed in
        # f32 quantizes the fraction at large t (mega windows lower the
        # whole batch as one window, t up to n*F), which audibly snaps
        # the read near waveform discontinuities.  With the integer part
        # removed first, indices are exact int32 arithmetic at any
        # window size and the fraction's precision is t-independent.
        df_int = xp.floor(df)
        frac = df - df_int              # in [0, 1)
        # frame t of this block sits at x[M + t]; read M + t - df, i.e.
        # between a-1 and a with a = M + t - int(df)
        t = xp.arange(F, dtype=np.int32)[:, None]
        a = t + (M - df_int.astype(np.int32))   # in [1, M + F - 1]
        lo = xp.take_along_axis(x, a - 1, axis=0)
        hi = xp.take_along_axis(x, a, axis=0)
        return lo * frac + hi * (F32(1.0) - frac)
