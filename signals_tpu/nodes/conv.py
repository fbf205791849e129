"""Convolution (impulse-response) processor — convolution reverb, cabinet
and room simulation (new capability; the reference's effect set is
elementwise ops + order-2 Butterworth filters, ``src/signals/chain/fx.py``).

FIR convolution is the ideal citizen of this engine's stateless-context
design (the reference's ``forward_with_context`` trick,
``chain/__init__.py:308-315``): unlike an IIR — whose context window is an
*approximation* of its infinite memory — a K-tap FIR is **exactly** a pure
function of the last ``K-1`` input frames.  So :class:`Convolve` carries no
state at all: it is seekable, blockwise-parallel, and rides every compiled
fast path (per-block, mega windows, packed streams) with zero eligibility
caveats.

TPU shape: one real FFT of the padded context window, a spectrum
multiply against the (host-precomputed, trace-constant) IR spectrum, one
inverse FFT — overlap-save with the engine's own window as the segment.
Under a mega window the *whole batch* convolves in a single transform
pair; XLA's FFT runs on-device and the IR spectrum is folded in as a
constant.  Both engines compute f32 FFTs (numpy's pocketfft preserves
single precision), so cross-engine parity stays well inside the 1e-5
budget for unit-energy IRs.
"""

from __future__ import annotations

import os

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, ge, in_range, instance_of
from signals_tpu.graph import KernelCtx, Receiver, port
from signals_tpu.nodes.fx import Effect
from signals_tpu.registry import register

F32 = np.float32

#: hard cap on IR taps (~12 s @ 44.1 kHz): bounds the context window the
#: compiler must retain and the FFT working set
MAX_IR_FRAMES = 1 << 19


def _next_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


@register()
class Convolve(Effect):
    """Convolve the input with an impulse response.

    The IR comes from a sound file (``path``) or, when ``path`` is empty,
    is synthesized as exponentially decaying noise (``ir_frames`` taps
    falling to ``-decay_db`` dB at the tail, seeded by ``seed``) — a
    dense synthetic room that needs no asset to be useful and keeps tests
    hermetic.  File IRs: mono broadcasts to every bus channel, a
    channel-count match convolves per channel (true stereo), anything
    else downmixes to mono by mean (documented, not an error — a stereo
    IR on a mono bus is the common mismatch).

    ``mix`` (dry/wet) and ``gain`` (wet gain) are traced — sweepable
    without recompiling.  Everything defining the IR itself is
    structural: editing it recompiles via the graph hash, exactly like
    editing the patch.
    """

    input: Receiver.BoundPort = port('input')

    class State(Effect.State):
        #: structural: IR sound file; '' synthesizes a noise IR
        path: str = Param('', validate=instance_of(str))
        #: structural: synthesized-IR length in frames (file IRs use the
        #: file's length, capped at MAX_IR_FRAMES)
        ir_frames: int = Param(4096, validate=all_of(instance_of(int),
                                                     ge(1)))
        #: structural: synthesized-IR tail attenuation (dB below the head)
        decay_db: float = Param(60.0, validate=ge(0.0))
        #: structural: synthesized-IR noise seed
        seed: int = Param(0, validate=instance_of(int))
        #: structural: scale the IR to unit energy per channel
        normalize: bool = Param(True, validate=instance_of(bool))
        #: wet/dry balance in [0, 1]: 0 = dry, 1 = wet (bounded above —
        #: mix > 1 would silently phase-invert the dry bleed)
        mix: float = Param(1.0, validate=in_range(0.0, 1.0), traced=True)
        #: linear gain on the wet (convolved) signal
        gain: float = Param(1.0, validate=ge(0.0), traced=True)

    def __init__(self):
        super().__init__()
        self._ir_cache: tuple | None = None   # (key, np.ndarray (K, irch))

    # --- impulse response (host-side, trace-constant) ---------------------

    def _ir_key(self) -> tuple:
        st = self._state
        if st.path:
            try:
                mtime = os.stat(st.path).st_mtime_ns
            except OSError:
                mtime = None
            return ('file', st.path, mtime, st.normalize)
        return ('gen', st.ir_frames, st.decay_db, st.seed, st.normalize)

    def _ir(self) -> np.ndarray:
        """The impulse response as a float32 ``(K, irch)`` array, cached
        until a structural param (or the file on disk) changes."""
        key = self._ir_key()
        if self._ir_cache is not None and self._ir_cache[0] == key:
            return self._ir_cache[1]
        st = self._state
        if st.path:
            from signals_tpu.runtime import sndfile
            reader = sndfile.open_reader(st.path)
            try:
                k = min(int(reader.frames), MAX_IR_FRAMES)
                ir = np.asarray(reader.read(0, k), dtype=F32)
            finally:
                reader.close()
            if k < 1:
                raise ValueError(f'{st.path}: empty impulse response')
        else:
            from signals_tpu.core import rng
            k = min(int(st.ir_frames), MAX_IR_FRAMES)
            idx = np.arange(k, dtype=np.int32).reshape(-1, 1)
            u = rng.uniform01(np, np.uint32(st.seed), idx, 1, salt=7)
            noise = F32(2.0) * u - F32(1.0)
            # head -> -decay_db dB at the last tap (pure decaying tail; a
            # unit head tap would make mix=1 sound dry)
            t = idx.astype(F32) / F32(max(k - 1, 1))
            env = np.power(F32(10.0), t * F32(-st.decay_db / 20.0))
            ir = (noise * env).astype(F32)
        if st.normalize:
            energy = np.sqrt(np.sum(np.square(ir, dtype=np.float64),
                                    axis=0, keepdims=True))
            ir = (ir / np.maximum(energy, 1e-30)).astype(F32)
        self._ir_cache = (key, ir)
        return ir

    def _ir_len(self) -> int:
        return self._ir().shape[0]

    def _ir_for_channels(self, ch: int) -> np.ndarray:
        """IR resolved against the bus width: ``(K, ch)``."""
        ir = self._ir()
        irch = ir.shape[1]
        if irch == ch:
            return ir
        if irch == 1:
            return np.broadcast_to(ir, (ir.shape[0], ch))
        return np.broadcast_to(ir.mean(axis=1, keepdims=True,
                                       dtype=np.float64).astype(F32),
                               (ir.shape[0], ch))

    # --- node protocol -----------------------------------------------------

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def structural_extra(self) -> str:
        """Fold the resolved IR identity (file mtime + tap count, or the
        synth params) into the graph hash: the compile cache and the
        lazily-jitted traces bake the IR spectrum in as a constant, so an
        IR file edited on disk must produce a DIFFERENT hash — otherwise
        renders silently keep the stale IR and, if the length changed,
        the re-trace's context window disagrees with the compile-time
        window pass."""
        return f'{self._ir_key()!r};K={self._ir_len()}'

    def context_frames(self) -> int:
        return self._ir_len() - 1

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        N = ctx.nframes
        ch = self.channels
        K = self._ir_len()

        x = ctx.in_('input')
        dry = xp.broadcast_to(x, (N, ch))
        if K == 1:
            wet = dry * xp.asarray(self._ir_for_channels(ch)[0],
                                   dtype=F32).reshape(1, ch)
        else:
            xc = ctx.in_context('input', K - 1)
            xc = xp.broadcast_to(xc, (xc.shape[0], ch))
            want = K - 1 + N
            if xc.shape[0] < want:
                # pull engine near position 0: the compiled engine zero-
                # fills before the timeline start, the pull engine simply
                # omits those frames — pad so both segments are identical
                pad = xp.zeros((want - xc.shape[0], ch), dtype=F32)
                xc = xp.concatenate([pad, xc], axis=0)
            # overlap-save with the engine window as the segment: the last
            # N samples of the M-point circular convolution are exact
            # (M >= N + K - 1 keeps the wrap inside the discarded head)
            M = _next_pow2(N + K - 1)
            if xc.shape[0] < M:
                xc = xp.concatenate(
                    [xp.zeros((M - xc.shape[0], ch), dtype=F32), xc],
                    axis=0)
            ir = self._ir_for_channels(ch)
            irs = np.fft.rfft(ir, n=M, axis=0)     # host: trace constant
            X = xp.fft.rfft(xc, n=M, axis=0)
            y = xp.fft.irfft(X * xp.asarray(irs), n=M, axis=0)
            wet = y[-N:].astype(F32)

        mix = xp.asarray(ctx.param('mix'), dtype=F32).reshape(())
        gain = xp.asarray(ctx.param('gain'), dtype=F32).reshape(())
        return (mix * gain) * wet + (F32(1.0) - mix) * dry
