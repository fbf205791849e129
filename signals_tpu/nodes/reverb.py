"""Feedback-delay-network reverb (new capability; the reference has no
time-based effects at all — its effect set is elementwise + filters,
``src/signals/chain/fx.py``).

A classic FDN: ``n_lines`` delay lines with mutually-prime lengths, mixed
each block through an energy-preserving Hadamard matrix and fed back with
per-line gains derived from the decay time (``g_i = 10^(-3 len_i /
(t60 rate))``, the standard Schroeder relation).  TPU shape: delay reads
are static slices of one carried ``(L, n_lines, ch)`` buffer, the
feedback mix is an unrolled 8-term scaled sum (identical op order in both
engines — parity discipline), and the whole step is pure vectorized math
threaded through the compiler's carry scan.

Feedback latency is one block (the FDN state advances per block, like
:class:`~signals_tpu.nodes.delay.Delay`); line lengths are clamped to at
least one block accordingly.
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, ge, instance_of
from signals_tpu.graph import (
    ImplicitChannels,
    KernelCtx,
    Receiver,
    StatefulEmitter,
    port,
)
from signals_tpu.registry import register

F32 = np.float32

#: mutually-prime base delay lengths in seconds (scaled by ``size``);
#: classic FDN spread over ~30-90 ms
_BASE_SECONDS = (0.0297, 0.0371, 0.0411, 0.0437, 0.0533, 0.0617, 0.0693,
                 0.0797)


def _hadamard8() -> np.ndarray:
    h2 = np.array([[1.0, 1.0], [1.0, -1.0]])
    h = np.kron(np.kron(h2, h2), h2) / np.sqrt(8.0)
    return h.astype(np.float32)


_H8 = _hadamard8()


@register()
class Reverb(StatefulEmitter, ImplicitChannels, Receiver):
    """8-line Hadamard FDN reverb.

    ``t60`` (decay time to -60 dB, seconds) and ``mix`` (dry/wet) are
    traced — sweepable without recompiling; ``size`` scales the line
    lengths (structural: resizes the carried buffers).
    """

    input: Receiver.BoundPort = port('input')

    class State(StatefulEmitter.State):
        #: decay time to -60 dB, seconds
        t60: float = Param(2.0, validate=ge(0.01), traced=True)
        #: wet/dry balance in [0, 1]: 0 = dry, 1 = wet
        mix: float = Param(0.3, validate=ge(0.0), traced=True)
        #: room-size multiplier on the line lengths (structural)
        size: float = Param(1.0, validate=all_of(instance_of(float),
                                                 ge(0.1)))

    n_lines = len(_BASE_SECONDS)

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def _lengths(self, rate: int, block_frames: int) -> list[int]:
        """Static per-line delay lengths (frames), each >= one block."""
        return [max(int(round(b * self._state.size * rate)), block_frames)
                for b in _BASE_SECONDS]

    def init_carry(self, *, channels: int, rate: int,
                   block_frames: int) -> dict[str, np.ndarray]:
        L = max(self._lengths(rate, block_frames))
        return {'lines': np.zeros((L, self.n_lines, channels), dtype=F32)}

    def step(self, ctx: KernelCtx, carry: dict):
        xp = ctx.xp
        F = ctx.nframes
        ch = self.channels
        rate = int(ctx.rate)
        lengths = self._lengths(rate, F)
        buf = carry['lines']                       # (L, n_lines, ch)
        L = buf.shape[0]

        x = xp.broadcast_to(ctx.in_('input'), (F, ch))

        # per-line delayed output: static slices (len_i >= F guaranteed)
        outs = xp.concatenate(
            [buf[L - d:L - d + F, i:i + 1, :] for i, d in enumerate(lengths)],
            axis=1)                                # (F, n_lines, ch)

        # per-line feedback gain from the Schroeder t60 relation; derived
        # per step from the traced decay param
        t60 = xp.asarray(ctx.param('t60'), dtype=F32).reshape(())
        lens = xp.asarray(np.array(lengths, dtype=np.float32))
        g = xp.exp(lens * (F32(-3.0 * np.log(10.0)) / (t60 * F32(rate))))
        fed = outs * g.reshape(1, self.n_lines, 1)

        # Hadamard mix, unrolled as an identical-order scaled sum in both
        # engines (an einsum/dot would accumulate in engine-specific order)
        mixed = []
        for i in range(self.n_lines):
            acc = _H8[i, 0] * fed[:, 0, :]
            for j in range(1, self.n_lines):
                acc = acc + _H8[i, j] * fed[:, j, :]
            mixed.append(acc)
        mixed = xp.stack(mixed, axis=1)            # (F, n_lines, ch)

        # inject the dry signal into every line and advance the buffers
        new = mixed + x[:, None, :] * F32(1.0 / self.n_lines)
        buf = xp.concatenate([buf, new], axis=0)[-L:]

        wet = xp.sum(outs, axis=1)                 # (F, ch)
        mix = xp.asarray(ctx.param('mix'), dtype=F32).reshape(())
        out = mix * wet + (F32(1.0) - mix) * x
        return out, {'lines': buf}

    # --- whole-window (mega) lowering ------------------------------------

    @property
    def supports_mega_step(self) -> bool:
        return True

    def mega_step(self, ctx: KernelCtx, carry: dict):
        """Whole-window FDN advance as a lines-only ``lax.scan``.

        Under a mega/segment window everything upstream lowers ONCE over
        the window; only the FDN recurrence itself is sequential, and its
        per-step body is tiny (8 static buffer slices + an unrolled 8x8
        mix) compared to the full-patch per-block step this path
        replaces.  The recurrence itself keeps :meth:`step`'s exact
        per-block op order; upstream producers lower whole-window, so
        the output agrees with the per-block engines to ~1 ulp
        (measured 6e-8 on a 40-block window).

        (A truncation-free FFT alternative — window-length line IRs by
        linearity, zero-state wet by convolution — measured ~6e-8 f32
        error but strictly more work: two scans of the same length plus
        four 8M-point transforms.  The direct scan dominates on both
        backends.)
        """
        import jax
        import jax.numpy as jnp

        grid = ctx.block_grid
        F_, nb = grid if grid is not None else (ctx.nframes, 1)
        T = F_ * nb
        ch = self.channels
        rate = int(ctx.rate)
        lengths = self._lengths(rate, F_)
        L = max(lengths)
        n_lines = self.n_lines

        t60 = jnp.asarray(ctx.param('t60'), dtype=F32).reshape(())
        mixp = jnp.asarray(ctx.param('mix'), dtype=F32).reshape(())
        lens = jnp.asarray(np.array(lengths, dtype=np.float32))
        g = jnp.exp(lens * (F32(-3.0 * np.log(10.0)) / (t60 * F32(rate))))
        x = jnp.broadcast_to(ctx.in_('input'), (T, ch))

        def body(buf, xc):
            # identical op order to step(): reads -> fed -> unrolled mix
            reads = jnp.concatenate(
                [buf[L - d:L - d + F_, i:i + 1, :]
                 for i, d in enumerate(lengths)], axis=1)   # (F_, 8, ch)
            fed = reads * g.reshape(1, n_lines, 1)
            mixed = []
            for i in range(n_lines):
                acc = _H8[i, 0] * fed[:, 0, :]
                for j in range(1, n_lines):
                    acc = acc + _H8[i, j] * fed[:, j, :]
                mixed.append(acc)
            mixed = jnp.stack(mixed, axis=1)
            new = mixed + xc[:, None, :] * F32(1.0 / n_lines)
            buf = jnp.concatenate([buf, new], axis=0)[-L:]
            return buf, reads.sum(axis=1)

        buf0 = jnp.asarray(carry['lines'], dtype=F32)       # (L, 8, ch)
        buf_out, wet = jax.lax.scan(body, buf0, x.reshape(nb, F_, ch))
        wet = wet.reshape(T, ch)
        out = mixp * wet + (F32(1.0) - mixp) * x
        return out, {'lines': buf_out}
