"""Hardware audio backend (PortAudio via sounddevice), driven by a fake
``sounddevice`` module — no hardware or sounddevice install required.

Covers the reference's live-device contracts: the output callback filling
``outdata`` from rendered audio (``/root/reference/src/signals/chain/dev.py:167-179``)
and the input callback feeding captured blocks into the graph
(``dev.py:198-244``).
"""

import sys
import threading
import time
import types

import numpy as np
import pytest

from signals_tpu.nodes.dev import DeviceInfo, Rack, SinkDevice, SourceDevice
from signals_tpu.runtime.portaudio import HardwareCapture, HardwareOutput
from signals_tpu.runtime.ring import RingBuffer


class FakeStream:
    """Stands in for sd.OutputStream/sd.InputStream: a paced thread invoking
    the callback like PortAudio's realtime thread does."""

    def __init__(self, samplerate=44100, channels=1, blocksize=256,
                 device=None, dtype='float32', callback=None, paced=True):
        self.samplerate = samplerate
        self.channels = channels
        self.blocksize = blocksize or 256
        self.device = device
        self.callback = callback
        self.paced = paced
        self._running = threading.Event()
        self._thread = None
        self.is_input = False

    def start(self):
        self._running.set()
        if self.paced:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        t0 = time.monotonic()
        emitted = 0
        while self._running.is_set():
            due = int((time.monotonic() - t0) * self.samplerate)
            if due >= emitted + self.blocksize:
                if not self.step():
                    return
                emitted += self.blocksize
            else:
                time.sleep(0.001)

    def step(self) -> bool:
        """Run the callback once; False when the stream stopped itself."""
        sd = sys.modules['sounddevice']
        if self.is_input:
            indata = self._next_input()
            try:
                self.callback(indata, indata.shape[0], None, None)
            except sd.CallbackStop:
                self._running.clear()
                return False
        else:
            out = np.empty((self.blocksize, self.channels), dtype=np.float32)
            try:
                self.callback(out, self.blocksize, None, None)
            except sd.CallbackStop:
                self._running.clear()
                return False
            self.received.append(out.copy())
        return True

    def stop(self):
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=2)

    def close(self):
        self.stop()


class FakeOutputStream(FakeStream):

    def __init__(self, **kw):
        super().__init__(**kw)
        self.received = []


class FakeInputStream(FakeStream):

    def __init__(self, **kw):
        super().__init__(**kw)
        self.is_input = True
        self._pos = 0

    def _next_input(self):
        # deterministic ramp: sample k has value k (per channel)
        n = self.blocksize
        ramp = (np.arange(self._pos, self._pos + n, dtype=np.float32)
                .reshape(-1, 1))
        self._pos += n
        return np.broadcast_to(ramp, (n, self.channels)).copy()


def make_fake_sd(*, paced=True):
    sd = types.ModuleType('sounddevice')

    class CallbackStop(Exception):
        pass

    sd.CallbackStop = CallbackStop
    streams = []

    def output_stream(**kw):
        s = FakeOutputStream(paced=paced, **kw)
        streams.append(s)
        return s

    def input_stream(**kw):
        s = FakeInputStream(paced=paced, **kw)
        streams.append(s)
        return s

    sd.OutputStream = output_stream
    sd.InputStream = input_stream
    sd.query_devices = lambda: [
        {'name': 'Fake Speakers', 'max_input_channels': 0,
         'max_output_channels': 2, 'default_samplerate': 48000.0},
        {'name': 'Fake Mic', 'max_input_channels': 1,
         'max_output_channels': 0, 'default_samplerate': 44100.0},
    ]
    sd._streams = streams
    return sd


@pytest.fixture
def fake_sd(monkeypatch):
    sd = make_fake_sd(paced=False)
    monkeypatch.setitem(sys.modules, 'sounddevice', sd)
    return sd


@pytest.fixture
def fake_sd_paced(monkeypatch):
    sd = make_fake_sd(paced=True)
    monkeypatch.setitem(sys.modules, 'sounddevice', sd)
    return sd


def test_rack_lists_hardware_devices(fake_sd):
    rack = Rack()
    rack.scan()
    names = [d.name for d in rack.devices]
    assert 'Fake Speakers' in names and 'Fake Mic' in names
    spk = rack.get_sink('Fake Speakers')
    assert spk.backend == 'portaudio'
    assert spk.sd_index == 0
    assert spk.max_output_channels == 2
    mic = rack.get_source('Fake Mic')
    assert mic.backend == 'portaudio'
    assert mic.sd_index == 1


def test_output_callback_drains_ring(fake_sd):
    ring = RingBuffer(capacity_frames=1024, channels=1)
    out = HardwareOutput(ring, rate=44100, channels=1, block_frames=256,
                         sd_module=fake_sd)
    stream = fake_sd._streams[0]
    data = np.arange(256, dtype=np.float32).reshape(-1, 1)
    ring.write(data)
    assert stream.step()
    np.testing.assert_array_equal(stream.received[0], data)
    assert out.underruns == 0
    # empty ring -> zero-filled + counted, stream survives
    assert stream.step()
    assert float(np.abs(stream.received[1]).max()) == 0.0
    assert out.underruns == 1
    assert out.frames == 512
    out.stop()


def test_output_callback_stops_cleanly_after_stop(fake_sd):
    ring = RingBuffer(capacity_frames=1024, channels=2)
    out = HardwareOutput(ring, rate=44100, channels=2, block_frames=128,
                         sd_module=fake_sd)
    stream = fake_sd._streams[0]
    out.stop()
    # a late callback (PortAudio may fire once more) raises CallbackStop
    assert not stream.step()


def test_capture_read_positions(fake_sd):
    cap = HardwareCapture(rate=44100, channels=1, block_frames=256,
                          sd_module=fake_sd, timeout=0.1)
    stream = fake_sd._streams[0]
    for _ in range(4):
        stream.step()          # captures frames [0, 1024) as a ramp
    got = cap.read(100, 50)
    np.testing.assert_array_equal(
        got[:, 0], np.arange(100, 150, dtype=np.float32))
    # before the start of capture: zeros
    got = cap.read(-30, 40)
    assert float(np.abs(got[:30]).max()) == 0.0
    np.testing.assert_array_equal(got[30:, 0],
                                  np.arange(0, 10, dtype=np.float32))
    # beyond the head: zero-filled after timeout
    got = cap.read(1000, 100)
    np.testing.assert_array_equal(got[:24, 0],
                                  np.arange(1000, 1024, dtype=np.float32))
    assert float(np.abs(got[24:]).max()) == 0.0
    cap.stop()


def test_capture_read_blocks_until_captured(fake_sd):
    cap = HardwareCapture(rate=44100, channels=1, block_frames=256,
                          sd_module=fake_sd, timeout=2.0)
    stream = fake_sd._streams[0]

    def feed():
        time.sleep(0.05)
        for _ in range(2):
            stream.step()

    t = threading.Thread(target=feed)
    t.start()
    got = cap.read(0, 512)     # must wait for the feeder
    t.join()
    np.testing.assert_array_equal(got[:, 0],
                                  np.arange(512, dtype=np.float32))
    cap.stop()


def test_source_device_serves_captured_audio(fake_sd):
    info = DeviceInfo(name='Fake Mic', index=3, max_input_channels=1,
                      backend='portaudio', sd_index=1)
    src = SourceDevice(info)
    assert not src.is_capturing
    # without capture: silence (virtual behavior)
    assert float(np.abs(src.host_read(0, 64, 44100)).max()) == 0.0
    src.start_capture(block_frames=256, sd_module=fake_sd)
    assert src.is_capturing
    stream = fake_sd._streams[0]
    stream.step()
    got = src.host_read(10, 20, 44100)
    np.testing.assert_array_equal(got[:, 0],
                                  np.arange(10, 30, dtype=np.float32))
    src.stop_capture()
    assert not src.is_capturing


def test_captured_audio_flows_through_compiled_patch(fake_sd):
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.fx import Gain
    from tests.conftest import fixed

    info = DeviceInfo(name='Fake Mic', index=3, max_input_channels=1,
                      backend='portaudio', sd_index=1)
    src = SourceDevice(info)
    g = Gain()
    g.left = src
    g.right = fixed(2.0)
    src.start_capture(block_frames=128, sd_module=fake_sd)
    stream = fake_sd._streams[0]
    for _ in range(8):
        stream.step()          # frames [0, 1024)
    compiled = compile_node(g, block_frames=128, rate=44100, channels=1)
    audio, _ = compiled.render(position=0, n_blocks=4)
    np.testing.assert_allclose(
        audio[:, 0], 2.0 * np.arange(512, dtype=np.float32), rtol=1e-6)
    src.stop_capture()


def test_sink_plays_through_hardware_output(fake_sd_paced):
    """End-to-end: patch -> render-ahead ring -> fake PortAudio callback."""
    from signals_tpu.nodes.osc import Sine
    from tests.conftest import fixed

    rack = Rack()
    rack.scan()
    sink = SinkDevice(rack.get_sink('Fake Speakers'), block_frames=256,
                      ring_blocks=8)
    sink.get_state().channels = 2
    osc = Sine()
    osc.hertz = fixed(440.0)
    sink.input = osc
    sink.start()
    try:
        from signals_tpu.runtime.portaudio import HardwareOutput as HO
        assert isinstance(sink._consumer, HO)
        deadline = time.monotonic() + 10.0
        stream = fake_sd_paced._streams[0]
        while time.monotonic() < deadline:
            if any(float(np.abs(b).max()) > 0.1 for b in stream.received):
                break
            time.sleep(0.05)
        else:
            pytest.fail('no audible output reached the hardware callback')
    finally:
        sink.stop()
        sink.close()
    assert sink.underruns < 1000   # counter plumbed through


def test_sink_falls_back_to_paced_consumer_for_virtual(fake_sd_paced):
    from signals_tpu.runtime.ring import PacedConsumer
    from signals_tpu.nodes.osc import Sine
    from tests.conftest import fixed

    rack = Rack()
    rack.scan()
    sink = SinkDevice(rack.get_sink('default'), block_frames=256)
    sink.get_state().channels = 1
    osc = Sine()
    osc.hertz = fixed(440.0)
    sink.input = osc
    sink.start()
    try:
        assert isinstance(sink._consumer, PacedConsumer)
    finally:
        sink.stop()
        sink.close()


def test_capture_rate_mismatch_raises(fake_sd):
    from signals_tpu.nodes.dev import BadPlaybackState
    info = DeviceInfo(name='Fake Mic', index=3, max_input_channels=1,
                      default_samplerate=48000.0,
                      backend='portaudio', sd_index=1)
    src = SourceDevice(info)
    src.start_capture(block_frames=256, sd_module=fake_sd)
    with pytest.raises(BadPlaybackState, match='48000'):
        src.host_read(0, 64, 44100)
    src.stop_capture()
