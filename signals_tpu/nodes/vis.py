"""Visualization taps (reference ``src/signals/chain/vis.py``).

A ``Vis`` node forwards its input unchanged and queues a copy for the UI
thread — the PASSTHRU side-effect design (reference ``vis.py:19-64``).
In the compiled engine the tap is an extra program output delivered to
``consume_tap`` after each device step, so visualization costs nothing on
the TPU side.  ``Spec`` is implemented properly (rfft magnitude bands); the
reference's version is a marked-broken sketch (``vis.py:87-89``).
"""

from __future__ import annotations

import abc
import queue

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core import Request, Shape
from signals_tpu.core.state import Param
from signals_tpu.graph import KernelCtx, PassThroughResult
from signals_tpu.registry import register


class Vis(PassThroughResult, abc.ABC):

    def __init__(self):
        super().__init__()
        self.q: queue.Queue = queue.Queue()

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.VIS

    def kernel(self, ctx: KernelCtx):
        return ctx.in_('input')

    def consume_tap(self, block: np.ndarray, position: int,
                    rate: int) -> None:
        self.q.put(np.asarray(block))

    # pull engine: queue inline, exactly like the reference (vis.py:61-64)
    def _eval(self, request: Request) -> np.ndarray:
        result = super()._eval(request)
        self.consume_tap(result, request.loc.position, request.loc.rate)
        return result

    def drain(self, frames: int) -> list[np.ndarray]:
        """Pop queued blocks up to a total of ``frames``; excess blocks are
        dropped (reference ``vis.py:29-44``)."""
        blocks = []
        queued = 0
        while True:
            try:
                block = self.q.get_nowait()
            except queue.Empty:
                break
            queued += Shape.of_array(block).frames
            if queued <= frames:
                blocks.append(block)
        return blocks

    def render(self, ax, frames: int) -> list:
        """Draw onto a matplotlib Axes (reference ``vis.py:29-55``)."""
        blocks = self.drain(frames)
        ax.clear()
        result = []
        if blocks:
            x = 0
            for block in blocks[:-1]:
                x += Shape.of_array(block).frames
                result.append(ax.axvline(x, c='black'))
            result.extend(self._plot(np.concatenate(blocks), ax))
        ax.set_xlim(0, frames)
        return result

    @abc.abstractmethod
    def _plot(self, block: np.ndarray, ax) -> list:
        raise NotImplementedError


@register('signals.chain.vis.Wave')
class Wave(Vis):

    class State(Vis.State):
        min_amp: float = Param(-1.0)
        max_amp: float = Param(+1.0)

    def _plot(self, block: np.ndarray, ax) -> list:
        ax.set_ylim(self._state.min_amp, self._state.max_amp)
        return ax.plot(block)


@register('signals.chain.vis.Spec')
class Spec(Vis):
    """Magnitude spectrum bars over ``bands`` linear frequency bins."""

    class State(Vis.State):
        min_freq: float = Param(0.0)
        max_freq: float = Param(22000.0)
        bands: int = Param(80)

    def spectrum(self, block: np.ndarray, rate: int) -> tuple[np.ndarray, np.ndarray]:
        """(band_centers_hz, magnitudes) pooled into ``bands`` bins."""
        mono = block.mean(axis=1)
        mags = np.abs(np.fft.rfft(mono)) / max(len(mono), 1)
        freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
        lo, hi = self._state.min_freq, self._state.max_freq
        bands = max(int(self._state.bands), 1)
        edges = np.linspace(lo, hi, bands + 1)
        centers = 0.5 * (edges[:-1] + edges[1:])
        idx = np.clip(np.searchsorted(edges, freqs) - 1, 0, bands - 1)
        pooled = np.zeros(bands)
        np.maximum.at(pooled, idx[(freqs >= lo) & (freqs <= hi)],
                      mags[(freqs >= lo) & (freqs <= hi)])
        return centers, pooled

    def _plot(self, block: np.ndarray, ax) -> list:
        rate = 44100 if self._last_request is None else self._last_request.loc.rate
        centers, mags = self.spectrum(block, rate)
        width = (centers[1] - centers[0]) if len(centers) > 1 else 1.0
        ax.set_xlim(self._state.min_freq, self._state.max_freq)
        return list(ax.bar(centers, mags, width=width * 0.9))
