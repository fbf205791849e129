"""Failure detection & resilience (SURVEY §5): the render loop must stop
cleanly and record the error, never die silently; the ring must stay
consistent under concurrent hammering."""

import threading
import time

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.dev import BadPlaybackState, Rack, SinkDevice
from signals_tpu.nodes.osc import Sine
from signals_tpu.runtime import Transport
from signals_tpu.runtime.ring import RingBuffer

from conftest import fixed


def test_sink_without_input_refuses_to_start():
    rack = Rack()
    rack.scan()
    sink = SinkDevice(rack.get_sink('default'), realtime=False)
    with pytest.raises(BadPlaybackState):
        sink.start()


def test_transport_records_render_errors():
    """An exception on the render thread stops the stream cleanly and is
    recorded (the reference logs + raises CallbackStop, dev.py:172-176)."""
    osc = Sine()
    osc.hertz = fixed(440.0)
    compiled = compile_node(osc, block_frames=256, rate=44100, channels=1)

    calls = {'n': 0}
    real_render = compiled.render

    def flaky_render(**kwargs):
        calls['n'] += 1
        if calls['n'] > 2:
            raise RuntimeError('injected device failure')
        return real_render(**kwargs)

    compiled.render = flaky_render
    transport = Transport(compiled, lambda block, pos: None)
    transport.start()
    deadline = time.time() + 10
    while transport.is_active and time.time() < deadline:
        time.sleep(0.05)
    assert not transport.is_active          # stopped itself
    assert isinstance(transport.error, RuntimeError)


def test_ring_concurrent_stress():
    """SPSC ring under real producer/consumer threads: every frame arrives
    exactly once, in order."""
    ring = RingBuffer(capacity_frames=256, channels=1)
    total = 20000
    seq = np.arange(total, dtype=np.float32).reshape(-1, 1)
    received = []

    def producer():
        i = 0
        while i < total:
            wrote = ring.write(seq[i:i + 96])
            i += wrote
            if wrote == 0:
                time.sleep(0.0002)

    def consumer():
        got = 0
        while got < total:
            out = ring.read(64)
            if len(out):
                received.append(out.copy())
                got += len(out)
            else:
                time.sleep(0.0002)

    pt = threading.Thread(target=producer)
    ct = threading.Thread(target=consumer)
    pt.start()
    ct.start()
    pt.join(timeout=30)
    ct.join(timeout=30)
    out = np.concatenate(received)
    assert out.shape[0] == total
    np.testing.assert_array_equal(out, seq)
