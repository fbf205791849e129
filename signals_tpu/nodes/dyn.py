"""Dynamics processing (new capability; the reference has no dynamics —
its effect set is elementwise + filters, ``src/signals/chain/fx.py``).

:class:`Compressor` is an RMS compressor in the framework's stateless
context-window style: the envelope is a sliding-window RMS over the last
``window`` frames — a pure function of bounded history, exactly like the
filters' context semantics (``fx.py:82-106``), so it is seekable,
blocking-invariant, and mega-window compatible.  Gain is computed per
frame from the classic ratio law above the threshold.

Numerics: the windowed power sum is a difference of cumulative sums; in
float32 the cumulative sum grows without bound over long windows and the
difference cancels catastrophically (~1e-4 envelope error per rendered
minute).  The cumsum therefore runs in float64 and rounds once — which
also makes the two engines agree bit-for-bit at the f32 level (same
argument as :func:`signals_tpu.core.mathx.sin2pi`).
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
class Compressor(BlockCachingEmitter, ImplicitChannels, Receiver):
    """Sliding-RMS compressor.

    ``threshold`` (linear amplitude), ``ratio`` (>= 1) and ``makeup`` gain
    are traced — sweepable without recompiling; ``window`` (frames of RMS
    history) is structural.  Attack/release both equal the RMS window (a
    symmetric design; the window is the time constant).
    """

    input: Receiver.BoundPort = port('input')

    class State(BlockCachingEmitter.State):
        threshold: float = Param(0.5, validate=ge(1e-6), traced=True)
        ratio: float = Param(4.0, validate=ge(1.0), traced=True)
        makeup: float = Param(1.0, validate=ge(0.0), traced=True)
        #: structural: frames of RMS history (the attack/release time)
        window: int = Param(1024, validate=all_of(instance_of(int), ge(8)))

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        W = self._state.window
        F = ctx.nframes
        ch = self.channels
        x = ctx.in_context('input', W)
        # the pull engine clamps context at the start of the timeline
        # (reference BlockLoc.before); zero-pad to the full window — silence
        # before position 0, identical to the compiled engine's masking
        if x.shape[0] < W + F:
            x = xp.pad(x, ((W + F - x.shape[0], 0), (0, 0)))
        x = xp.broadcast_to(x, (W + F, ch))

        if xp is np:
            cs = np.cumsum(x.astype(np.float64) ** 2, axis=0)
            mean_pow = ((cs[W:] - cs[:-W]) / float(W)).astype(F32)
        else:
            import jax
            with jax.enable_x64(True):
                x64 = x.astype(xp.float64)
                cs = xp.cumsum(x64 * x64, axis=0)
                mean_pow = ((cs[W:] - cs[:-W]) / float(W)).astype(F32)
        env = xp.sqrt(xp.maximum(mean_pow, F32(1e-20)))   # (F, ch)

        thresh = xp.asarray(ctx.param('threshold'), dtype=F32).reshape(())
        ratio = xp.asarray(ctx.param('ratio'), dtype=F32).reshape(())
        makeup = xp.asarray(ctx.param('makeup'), dtype=F32).reshape(())
        # above threshold, output level follows thresh * (env/thresh)^(1/R):
        # gain = (env/thresh)^(1/R - 1); below, unity
        over = env / thresh
        gain = xp.where(over > F32(1.0),
                        over ** (F32(1.0) / ratio - F32(1.0)),
                        F32(1.0))
        return x[W:] * gain * makeup
