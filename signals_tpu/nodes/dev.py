"""Audio devices (reference ``src/signals/chain/dev.py``).

The reference binds directly to live PortAudio devices, making every layer
above it untestable without hardware (a defect SURVEY §4 flags).  Here the
device layer is an abstraction:

* :class:`SinkDevice` — owns the transport (open/start/stop/seek/tell,
  reference ``dev.py:128-165``) and drives the **compiled** patch through a
  :class:`signals_tpu.runtime.Transport` render loop, instead of pulling the
  Python graph on the audio callback.  Virtual sinks (always present) render
  to memory/null at real-time pace or as fast as possible; if the
  ``sounddevice`` package is imported successfully, real hardware sinks
  appear in the rack too.
* :class:`SourceDevice` — a host source: capture blocks enter the compiled
  program as staged inputs.  The virtual source yields silence (position-
  addressed), so patches with sources compile and run deterministically in
  tests.
"""

from __future__ import annotations

import typing

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.core import ChainLayerError, Shape
from signals_tpu.graph import (
    Emitter,
    ExplicitChannels,
    KernelCtx,
    Receiver,
    port,
)

F32 = np.float32


class BadPlaybackState(ChainLayerError):
    pass


class DeviceInfo(typing.NamedTuple):
    """One entry of the device rack (reference ``dev.py:33-77``)."""

    name: str
    index: int
    hostapi: int = 0
    max_input_channels: int = 0
    max_output_channels: int = 0
    default_low_input_latency: float = 0.01
    default_low_output_latency: float = 0.01
    default_high_input_latency: float = 0.1
    default_high_output_latency: float = 0.1
    default_samplerate: float = 44100.0
    #: 'virtual' (always available, no hardware) or 'portaudio'
    backend: str = 'virtual'
    #: the sounddevice device index for backend='portaudio'
    sd_index: int = -1

    @property
    def is_source(self) -> bool:
        return self.max_input_channels > 0

    @property
    def is_sink(self) -> bool:
        return self.max_output_channels > 0

    def describe(self) -> str:
        return '\n'.join((
            f'{self.index:<3} {self.name} ({self.hostapi})',
            f'\tMaximum supported channels (I/O): '
            f'{self.max_input_channels}/{self.max_output_channels}',
            f'\tDefault samplerate: {self.default_samplerate}',
        ))

    def __str__(self) -> str:
        return self.describe()


class Device:
    """Mixin carrying the rack record."""

    def __init__(self, info: DeviceInfo):
        self.info = info
        super().__init__()


class SinkDevice(Device, Receiver, ExplicitChannels):
    """Playback endpoint and transport owner.

    ``start()`` compiles the patch feeding ``input`` and spawns the render
    loop; blocks land in ``self.consume_block`` (overridable: memory capture,
    ring buffer, hardware).  ``render_offline`` renders synchronously — the
    deterministic path used by tests and benchmarks.
    """

    input: Receiver.BoundPort = port('input')

    class State(ExplicitChannels.State):
        pass

    def __init__(self, info: DeviceInfo, *,
                 block_frames: int = 1024,
                 realtime: bool = True,
                 ring_blocks: int = 8,
                 output_fd: int = -1,
                 output_format: str = 'f32'):
        super().__init__(info)
        self.block_frames = block_frames
        self.realtime = realtime
        #: render-ahead depth of the native ring buffer (blocks)
        self.ring_blocks = ring_blocks
        #: output target for the paced consumer (-1 = discard)
        self.output_fd = output_fd
        #: fd stream format: 'f32' (raw) or 'pcm16' (the production format)
        self.output_format = output_format
        self.frame_position = 0
        self._transport = None
        self._ring = None
        self._consumer = None
        self._capture: typing.Optional[list[np.ndarray]] = None

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.SINK_DEVICE

    def set_state(self, new_state) -> None:
        if new_state.channels > self.info.max_output_channels:
            from signals_tpu.core.state import BadStateValue
            raise BadStateValue(
                new_state, 'channels', new_state.channels,
                f'device supports at most {self.info.max_output_channels}')
        was_active = self.is_active
        changed = new_state.channels != self._state.channels
        super().set_state(new_state)
        if changed and self.is_open:
            self.close()
            if was_active:
                self.start()

    @property
    def rate(self) -> int:
        return int(self.info.default_samplerate)

    # --- transport (reference dev.py:128-165) ------------------------------

    @property
    def is_open(self) -> bool:
        return self._transport is not None

    @property
    def is_active(self) -> bool:
        return self.is_open and self._transport.is_active

    def _compile(self):
        from signals_tpu.compiler import compile_node
        if not self.input:
            raise BadPlaybackState('The sink has no input connected')
        return compile_node(self.input.sig,
                            block_frames=self.block_frames,
                            rate=self.rate,
                            channels=self._state.channels)

    def open(self) -> None:
        if self.is_open:
            raise BadPlaybackState('The output stream is already open')
        from signals_tpu.runtime import Transport
        if self.realtime:
            # realtime path: the native ring carries blocks from the render
            # thread to the clocked consumer (the virtual output device);
            # ring backpressure paces the renderer (render-ahead depth =
            # ring capacity), so Transport itself runs unthrottled.  The
            # consumer is started in start(), after JIT warmup, so the
            # stream doesn't open with a burst of underrun silence.
            from signals_tpu.runtime.ring import RingBuffer
            self._ring = RingBuffer(
                capacity_frames=self.ring_blocks * self.block_frames,
                channels=self._state.channels)
            self._transport = Transport(self._compile(), self._consume_ring,
                                        realtime=False,
                                        refresh=self._compile)
        else:
            self._transport = Transport(self._compile(), self._consume,
                                        realtime=False,
                                        refresh=self._compile)
        self._transport.seek(self.frame_position)

    def close(self) -> None:
        if not self.is_open:
            raise BadPlaybackState('The output stream is not open')
        self._transport.stop()
        self._transport = None
        if self._consumer is not None:
            self._consumer.stop()
            self._consumer = None
        if self._ring is not None:
            self._ring.close()
            self._ring = None

    @property
    def underruns(self) -> int:
        """Blocks the clocked consumer had to zero-fill."""
        return 0 if self._consumer is None else self._consumer.underruns

    def start(self) -> None:
        if not self.is_open:
            self.open()
        self._transport.start()
        if self._ring is not None and self._consumer is None:
            self._consumer = self._make_consumer()

    def _make_consumer(self):
        """The ring drain: a real PortAudio output callback for hardware
        sinks (reference contract ``dev.py:139-179``), the paced virtual
        device otherwise."""
        from signals_tpu.runtime import portaudio
        if self.info.backend == 'portaudio' and portaudio.available():
            return portaudio.HardwareOutput(
                self._ring, rate=self.rate, channels=self._state.channels,
                block_frames=self.block_frames, device=self.info.sd_index)
        from signals_tpu.runtime.ring import PacedConsumer
        return PacedConsumer(self._ring, rate=self.rate,
                             block_frames=self.block_frames,
                             fd=self.output_fd, fmt=self.output_format)

    def stop(self) -> None:
        if not self.is_active:
            raise BadPlaybackState('The output stream is not active')
        self.frame_position = self._transport.tell()
        self._transport.stop()
        if self._consumer is not None:
            self._consumer.stop()
            self._consumer = None

    def seek(self, position_blocks: int) -> None:
        self.frame_position = position_blocks * self.block_frames
        if self.is_open:
            self._transport.seek(self.frame_position)

    def tell(self) -> int:
        pos = self._transport.tell() if self.is_open else self.frame_position
        return pos // self.block_frames

    def destroy(self) -> None:
        if self.is_open:
            self.close()
        super().destroy()

    # --- block consumption --------------------------------------------------

    def _consume(self, block: np.ndarray, position: int) -> None:
        self.frame_position = position + block.shape[0]
        if self._capture is not None:
            self._capture.append(block)
        self.consume_block(block, position)

    def _consume_ring(self, block: np.ndarray, position: int) -> None:
        """Push into the ring with backpressure (this is what paces the
        render-ahead loop at the sample rate)."""
        import time as _time
        self._consume(block, position)
        written = 0
        while written < block.shape[0]:
            transport = self._transport
            if transport is None or not transport._running.is_set():
                break          # stopping: drop the remainder
            written += self._ring.write(block[written:])
            if written < block.shape[0]:
                _time.sleep(self.block_frames / self.rate / 4)

    def consume_block(self, block: np.ndarray, position: int) -> None:
        """Override point: hand a rendered block to actual output."""

    def capture(self, enable: bool = True) -> None:
        self._capture = [] if enable else None

    def captured(self) -> np.ndarray:
        blocks = self._capture or []
        ch = self._state.channels
        return (np.concatenate(blocks, axis=0) if blocks
                else np.zeros((0, ch), dtype=F32))

    def render_offline(self, *, seconds: float = None,
                       n_blocks: int = None,
                       position: int = 0) -> np.ndarray:
        """Deterministic synchronous render (tests/benchmarks/offline
        bounce)."""
        if n_blocks is None:
            n_blocks = max(1, int(round(seconds * self.rate / self.block_frames)))
        compiled = self._compile()
        audio, _ = compiled.render(position=position, n_blocks=n_blocks)
        return audio

    def render_offline_encoded(self, *, seconds: float = None,
                               n_blocks: int = None, position: int = 0,
                               subtype: str = 'mulaw'):
        """Offline render with the sample encoding applied on device —
        the payload (WAV ``data``-chunk bytes for the subtype) is what
        crosses the host link, cutting bounce fetch bytes 2-8x vs float32.
        Returns ``(payload, frames)``."""
        if n_blocks is None:
            n_blocks = max(1, int(round(seconds * self.rate / self.block_frames)))
        compiled = self._compile()
        payload, frames, _ = compiled.render_encoded(
            position=position, n_blocks=n_blocks, subtype=subtype)
        return payload, frames

    #: streaming-bounce batch length (seconds of audio per device
    #: dispatch).  Long enough to amortize the per-dispatch round trip,
    #: short enough that the double-buffered pipeline overlaps transfers
    #: with the next batch's render from early in the bounce.
    bounce_batch_seconds = 60.0

    def render_offline_encoded_stream(self, *, seconds: float = None,
                                      n_blocks: int = None,
                                      position: int = 0,
                                      subtype: str = 'mulaw',
                                      batch_seconds: float = None):
        """Iterator of ``(payload, frames)`` batches with the next
        batch's render dispatched before the current payload is fetched
        (:meth:`CompiledPatch.render_encoded_stream`) — the production
        long-bounce path: the host-link transfer rides concurrently with
        the device render instead of after it."""
        if n_blocks is None:
            n_blocks = max(1, int(round(seconds * self.rate
                                        / self.block_frames)))
        if batch_seconds is None:
            batch_seconds = self.bounce_batch_seconds
        batch_blocks = max(1, int(round(batch_seconds * self.rate
                                        / self.block_frames)))
        compiled = self._compile()
        return compiled.render_encoded_stream(
            position=position, n_blocks=n_blocks,
            batch_blocks=min(batch_blocks, n_blocks), subtype=subtype)

    # --- pull-engine compatibility (reference dev.py:167-179) --------------

    def pull_block(self, frames: int = None) -> np.ndarray:
        """Pull one block through the interpreter (the reference's audio
        callback body), advancing the device position."""
        frames = frames or self.block_frames
        from signals_tpu.core import BlockLoc
        loc = BlockLoc(position=self.frame_position, rate=self.rate,
                       shape=Shape(frames=frames,
                                   channels=self._state.channels))
        block = self.input.request(loc)
        self.frame_position += frames
        return np.broadcast_to(block, tuple(loc.shape)).astype(F32)


class SourceDevice(Device, Emitter):
    """Capture endpoint.  A host source for the compiler: captured blocks
    enter the compiled program as staged inputs (reference ``dev.py:182-244``
    instead blocks on a live queue inside the graph walk).

    The virtual device is deterministic silence, so patches with sources
    compile and run without hardware; ``start_capture()`` attaches a live
    PortAudio input stream (when the device is a ``'portaudio'``-backend
    rack entry and ``sounddevice`` imports), after which ``host_read``
    serves real captured audio, position-addressed.
    """

    is_host_source = True

    def __init__(self, info: DeviceInfo):
        super().__init__(info)
        self.position = 0
        self._capture = None

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.SOURCE_DEVICE

    @property
    def channels(self) -> int:
        return max(self.info.max_input_channels, 1)

    @property
    def is_capturing(self) -> bool:
        return self._capture is not None

    def start_capture(self, *, block_frames: int = 1024,
                      sd_module=None) -> None:
        """Open the live input stream (reference ``dev.py:198-217``)."""
        if self._capture is not None:
            raise BadPlaybackState('The input stream is already open')
        from signals_tpu.runtime import portaudio
        device = self.info.sd_index if self.info.backend == 'portaudio' \
            else None
        self._capture = portaudio.HardwareCapture(
            rate=self.info.default_samplerate, channels=self.channels,
            block_frames=block_frames, device=device, sd_module=sd_module)

    def stop_capture(self) -> None:
        if self._capture is not None:
            self._capture.stop()
            self._capture = None

    def destroy(self) -> None:
        self.stop_capture()
        super().destroy()

    def host_read(self, position: int, frames: int, rate: int) -> np.ndarray:
        if self._capture is not None:
            if float(rate) != self._capture.rate:
                # silent resampling would time-scale the audio and stall
                # every read near the live head — fail loudly instead
                raise BadPlaybackState(
                    f'patch renders at {rate} Hz but {self.info.name!r} '
                    f'captures at {self._capture.rate:g} Hz')
            return self._capture.read(position, frames)
        return np.zeros((frames, self.channels), dtype=F32)

    def kernel(self, ctx: KernelCtx):
        loc = getattr(ctx, 'request').loc
        return self.host_read(loc.position, loc.shape.frames, loc.rate)


# --- the rack (reference ``chain/discovery.py:96-126``) ---------------------


class BadDevice(ChainLayerError):
    pass


class BadDeviceName(BadDevice):

    def __init__(self, name):
        super().__init__(f'There is no device named {name!r}')


class NotASource(BadDevice):

    def __init__(self, name):
        super().__init__(f'Device {name!r} does not support input')


class NotASink(BadDevice):

    def __init__(self, name):
        super().__init__(f'Device {name!r} does not support output')


_VIRTUAL_DEVICES = (
    DeviceInfo(name='default', index=0, max_output_channels=2),
    DeviceInfo(name='null', index=1, max_output_channels=64),
    DeviceInfo(name='capture', index=2, max_input_channels=2),
)


class Rack:
    """Device catalogue.  Virtual devices are always present (so every layer
    is testable without hardware — fixing the reference's hard dependency on
    live PortAudio devices); real devices are appended when the optional
    ``sounddevice`` package imports."""

    def __init__(self):
        self.devices: list[DeviceInfo] = []

    def scan(self) -> None:
        devices = list(_VIRTUAL_DEVICES)
        try:
            import sounddevice as sd
        except ImportError:
            pass
        else:
            base = len(devices)
            for i, info in enumerate(sd.query_devices()):
                devices.append(DeviceInfo(
                    name=info['name'], index=base + i,
                    hostapi=info.get('hostapi', 0),
                    max_input_channels=info['max_input_channels'],
                    max_output_channels=info['max_output_channels'],
                    default_samplerate=info['default_samplerate'],
                    backend='portaudio', sd_index=i))
        self.devices = devices

    def get_device(self, name: str) -> DeviceInfo:
        for device in self.devices:
            if device.name == name:
                return device
        raise BadDeviceName(name)

    def get_source(self, name: str) -> DeviceInfo:
        device = self.get_device(name)
        if not device.is_source:
            raise NotASource(name)
        return device

    def get_sink(self, name: str) -> DeviceInfo:
        device = self.get_device(name)
        if not device.is_sink:
            raise NotASink(name)
        return device

    def sources(self) -> list[DeviceInfo]:
        return sorted((d for d in self.devices if d.is_source),
                      key=lambda d: d.index)

    def sinks(self) -> list[DeviceInfo]:
        return sorted((d for d in self.devices if d.is_sink),
                      key=lambda d: d.index)
