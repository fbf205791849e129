"""Note sequencing: gate and pitch event tracks.

No reference counterpart (the reference has no way to play a melody — gates
and pitches can only come from constants or oscillators); this is the
minimal sequencer a synthesizer framework needs, designed TPU-first:

* event tracks are **traced arrays** (`starts`/`ends`/values in frames), so
  a song is program *data* — editable and even gradient-trainable without
  recompiling (only the event *count* is structural);
* both nodes are stateless pure functions of the absolute frame index, so
  sequenced patches keep the loop-free render path and are seekable to any
  position, and the whole arrangement loops with integer-exact timing.

Feed :class:`GateSeq` into an :class:`~signals_tpu.nodes.env.ADSR` gate and
:class:`PitchSeq` into an oscillator's ``hertz`` for a classic mono synth
line; use per-voice event tracks with ``PolyPatch`` for polyphonic scores.
"""

from __future__ import annotations

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core.state import Param, all_of, array_2d, ge, instance_of
from signals_tpu.graph import BlockCachingEmitter, Emitter, KernelCtx
from signals_tpu.registry import register

F32 = np.float32


def _empty_track() -> np.ndarray:
    return np.zeros((1, 0), dtype=np.float32)


def _track(v):
    return (np.asarray(v, dtype=np.float32)
            if isinstance(v, (np.ndarray, list, tuple)) else v)


class _SeqBase(BlockCachingEmitter):
    """Shared event-track machinery.  ``starts``/``ends`` are ``(C, E)``
    frame positions — one event row per output channel (``C = 1`` for the
    usual mono track; per-voice rows under the channel-voices polyphony
    layout); ``loop`` > 0 wraps the timeline every ``loop`` frames."""

    class State(Emitter.State):
        starts: np.ndarray = Param(_empty_track, validate=array_2d,
                                   convert=_track, traced=True)
        ends: np.ndarray = Param(_empty_track, validate=array_2d,
                                 convert=_track, traced=True)
        loop: int = Param(0, validate=all_of(instance_of(int), ge(0)))

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.GENERATOR

    @property
    def channels(self) -> int:
        return self._state.starts.shape[0]

    def _timeline(self, ctx: KernelCtx):
        n = ctx.frame_range_int
        loop = self._state.loop
        if loop > 0:
            n = ctx.xp.mod(n, np.int32(loop))
        return n.astype(F32)

    def set_events(self, events, *, rate: int = 44100) -> None:
        """Convenience: install ``(start_s, dur_s, value)`` tuples."""
        events = list(events)
        state = self.get_state()
        if not events:
            state.starts = _empty_track()
            state.ends = _empty_track()
            return
        starts = np.array([[e[0] * rate for e in events]], dtype=np.float32)
        ends = np.array([[(e[0] + e[1]) * rate for e in events]],
                        dtype=np.float32)
        state.starts = starts
        state.ends = ends
        if len(events[0]) > 2:
            state.values = np.array([[e[2] for e in events]],
                                    dtype=np.float32)


@register()
class GateSeq(_SeqBase):
    """1 while any event is active, else 0."""

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        starts = ctx.param('starts')          # (C, E)
        ends = ctx.param('ends')
        if starts.shape[1] == 0:
            return np.zeros((1, 1), dtype=F32)
        n = self._timeline(ctx)[:, :, None]   # (F, 1, 1)
        active = (n >= starts) & (n < ends)   # (F, C, E)
        return xp.max(active.astype(F32), axis=2)


@register()
class PitchSeq(_SeqBase):
    """Sample-and-hold value track: the most recently started event's value,
    held through and after the event (the usual mono-synth pitch behavior).
    Defaults to the first event's value before anything starts."""

    class State(_SeqBase.State):
        values: np.ndarray = Param(_empty_track, validate=array_2d,
                                   convert=_track, traced=True)

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        starts = ctx.param('starts')          # (C, E)
        values = ctx.param('values')
        if starts.shape[1] == 0:
            return np.zeros((1, 1), dtype=F32)
        n = self._timeline(ctx)[:, :, None]   # (F, 1, 1)
        started = n >= starts                 # (F, C, E)
        key = xp.where(started, starts, F32(-np.inf))
        idx = xp.argmax(key, axis=2)          # (F, C) latest-started event
        nframes = idx.shape[0]
        vals = xp.broadcast_to(values, (nframes, *values.shape))
        return xp.take_along_axis(vals, idx[:, :, None], axis=2)[:, :, 0]
