"""Native runtime: ring buffer, paced consumer, streaming sink, WAV IO."""

import time

import numpy as np
import pytest

from signals_tpu.runtime import wavio
from signals_tpu.runtime.ring import PacedConsumer, RingBuffer, native_available


def test_native_library_builds():
    # toolchain is part of the environment contract; the fallback exists for
    # exotic deployments but CI should exercise the native path
    assert native_available()


def test_ring_roundtrip():
    ring = RingBuffer(capacity_frames=16, channels=2)
    data = np.arange(12, dtype=np.float32).reshape(6, 2)
    assert ring.write(data) == 6
    assert ring.readable == 6
    out = ring.read(4)
    np.testing.assert_array_equal(out, data[:4])
    assert ring.readable == 2
    out = ring.read(10)        # short read
    np.testing.assert_array_equal(out, data[4:])
    ring.close()


def test_ring_backpressure():
    ring = RingBuffer(capacity_frames=8, channels=1)
    data = np.ones((6, 1), dtype=np.float32)
    assert ring.write(data) == 6
    assert ring.write(data) == 2          # only 2 slots left
    assert ring.writable == 0
    _ = ring.read(5)
    assert ring.writable == 5
    ring.close()


def test_ring_wraparound_preserves_order():
    ring = RingBuffer(capacity_frames=8, channels=1)
    total_in = []
    total_out = []
    seq = np.arange(100, dtype=np.float32).reshape(-1, 1)
    i = 0
    while i < len(seq) or sum(len(b) for b in total_out) < len(seq):
        if i < len(seq):
            wrote = ring.write(seq[i:i + 5])
            total_in.append(seq[i:i + wrote])
            i += wrote
        got = ring.read(3)
        if len(got):
            total_out.append(got)
    out = np.concatenate(total_out)
    np.testing.assert_array_equal(out, seq)
    ring.close()


def test_paced_consumer_rate():
    """The consumer drains at ~the sample rate and counts underruns."""
    rate = 48000
    block = 256
    ring = RingBuffer(capacity_frames=block * 64, channels=1)
    consumer = PacedConsumer(ring, rate=rate, block_frames=block)
    # feed half a second of audio immediately
    ring.write(np.ones((rate // 2, 1), dtype=np.float32))
    time.sleep(0.5)
    frames = consumer.frames
    consumer.stop()
    # consumed roughly 0.5 s worth (generous bounds for CI jitter)
    assert rate * 0.3 < frames < rate * 0.8, frames
    assert consumer.underruns <= frames // block


def test_paced_consumer_underruns_when_starved():
    ring = RingBuffer(capacity_frames=1024, channels=1)
    consumer = PacedConsumer(ring, rate=44100, block_frames=256)
    time.sleep(0.1)            # no producer at all
    consumer.stop()
    assert consumer.underruns > 0


def test_streaming_sink_with_ring(tmp_path):
    """End-to-end: compiled render -> ring -> clocked consumer -> raw file."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from signals_tpu.nodes.dev import Rack, SinkDevice
    from signals_tpu.nodes.osc import Sine
    from conftest import fixed

    out_path = tmp_path / 'stream.f32'
    fd_file = open(out_path, 'wb')
    rack = Rack()
    rack.scan()
    osc = Sine()
    osc.hertz = fixed(440.0)
    sink = SinkDevice(rack.get_sink('default'), block_frames=512,
                      realtime=True, output_fd=fd_file.fileno())
    sink.get_state().channels = 1
    sink.input = osc
    sink.start()
    time.sleep(0.6)
    sink.stop()
    sink.close()
    fd_file.close()
    raw = np.frombuffer(out_path.read_bytes(), dtype='<f4')
    assert len(raw) >= 44100 // 4          # got a meaningful stretch
    # it's a 440 Hz sine: check the dominant frequency of a middle slice
    mid = raw[1024:1024 + 8192]
    spec = np.abs(np.fft.rfft(mid))
    freq = np.fft.rfftfreq(len(mid), 1 / 44100)[spec.argmax()]
    assert abs(freq - 440.0) < 15.0, freq


def test_wav_roundtrip(tmp_path):
    path = tmp_path / 'x.wav'
    data = np.random.default_rng(0).standard_normal((1000, 2)).astype(np.float32)
    wavio.write_wav(path, data, 44100)
    back, rate = wavio.read_wav(path)
    assert rate == 44100
    np.testing.assert_array_equal(back, data)


def test_wav_positioned_reads(tmp_path):
    path = tmp_path / 'x.wav'
    data = np.arange(100, dtype=np.float32).reshape(-1, 1) / 100
    wavio.write_wav(path, data, 22050)
    r = wavio.WavReader(path)
    np.testing.assert_array_equal(r.read(10, 5), data[10:15])
    # out-of-range regions zero-filled
    np.testing.assert_array_equal(r.read(-3, 5)[:3], np.zeros((3, 1)))
    np.testing.assert_array_equal(r.read(98, 5)[2:], np.zeros((3, 1)))
    r.close()


def test_wav_pcm16(tmp_path):
    import struct, wave
    path = tmp_path / 'pcm.wav'
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack('<4h', 0, 16384, -16384, 32767))
    data, rate = wavio.read_wav(path)
    assert rate == 8000
    np.testing.assert_allclose(data[:, 0], [0.0, 0.5, -0.5, 32767 / 32768],
                               atol=1e-4)


def test_native_consumer_pcm16_fd_stream(tmp_path):
    """fd streaming in the production PCM16 format: write a known block,
    read the emitted int16 bytes back."""
    import os
    from signals_tpu.runtime.ring import PacedConsumer, RingBuffer, \
        native_available
    if not native_available():
        pytest.skip('native ring unavailable')
    path = tmp_path / 'stream.raw'
    fd = os.open(path, os.O_WRONLY | os.O_CREAT, 0o644)
    ring = RingBuffer(capacity_frames=4096, channels=1)
    block = np.linspace(-1.2, 1.2, 256, dtype=np.float32).reshape(-1, 1)
    ring.write(block)
    consumer = PacedConsumer(ring, rate=44100, block_frames=256, fd=fd,
                             fmt='pcm16')
    deadline = time.time() + 5
    while consumer.frames < 256 and time.time() < deadline:
        time.sleep(0.01)
    consumer.stop()
    os.close(fd)
    raw = np.fromfile(path, dtype='<i2')
    assert raw.shape[0] >= 256
    expect = np.clip(np.rint(block[:, 0] * 32767.0), -32768, 32767)
    np.testing.assert_array_equal(raw[:256], expect.astype(np.int16))
