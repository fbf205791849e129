"""Device layer: rack, sink transport, source feeds, file nodes in patches."""

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.core import BlockLoc, Request, Shape
from signals_tpu.nodes.dev import (
    BadDeviceName,
    NotASink,
    NotASource,
    Rack,
    SinkDevice,
    SourceDevice,
)
from signals_tpu.nodes.files import FileReader, FileWriter
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine
from signals_tpu.runtime import wavio

from conftest import fixed


@pytest.fixture
def rack():
    r = Rack()
    r.scan()
    return r


def test_rack_virtual_devices(rack):
    names = [d.name for d in rack.devices]
    assert 'default' in names and 'capture' in names
    assert rack.get_sink('default').is_sink
    assert rack.get_source('capture').is_source
    with pytest.raises(BadDeviceName):
        rack.get_device('nope')
    with pytest.raises(NotASource):
        rack.get_source('default')
    with pytest.raises(NotASink):
        rack.get_sink('capture')


def test_sink_offline_render(rack):
    osc = Sine()
    osc.hertz = fixed(440.0)
    sink = SinkDevice(rack.get_sink('default'), block_frames=256,
                      realtime=False)
    sink.get_state().channels = 2
    sink.input = osc
    audio = sink.render_offline(n_blocks=4)
    assert audio.shape == (1024, 2)
    # mono source broadcast to both channels
    np.testing.assert_array_equal(audio[:, 0], audio[:, 1])


def test_sink_pull_block_matches_reference_callback(rack):
    """pull_block is the reference's audio-callback body on the interpreter
    engine; it must agree with the compiled offline render."""
    osc = Sine()
    osc.hertz = fixed(440.0)
    sink = SinkDevice(rack.get_sink('default'), block_frames=256,
                      realtime=False)
    sink.get_state().channels = 1
    sink.input = osc
    compiled_audio = sink.render_offline(n_blocks=2)
    sink.frame_position = 0
    pulled = np.concatenate([sink.pull_block(), sink.pull_block()])
    assert np.abs(compiled_audio - pulled).max() <= 1e-5


def test_source_device_feeds_compiled_patch(rack):
    src = SourceDevice(rack.get_source('capture'))
    g = Gain()
    g.left = src
    g.right = fixed(2.0)
    compiled = compile_node(g, block_frames=64, rate=44100, channels=2)
    audio, _ = compiled.render(n_blocks=2)
    np.testing.assert_array_equal(audio, 0)   # virtual capture = silence
    assert (src, ) is not None


def test_file_reader_through_patch(tmp_path):
    path = tmp_path / 'src.wav'
    data = np.linspace(-1, 1, 2000).reshape(-1, 1).astype(np.float32)
    wavio.write_wav(path, data, 44100)
    reader = FileReader()
    reader.get_state().path = str(path)
    g = Gain()
    g.left = reader
    g.right = fixed(0.5)
    compiled = compile_node(g, block_frames=500, rate=44100, channels=1)
    audio, _ = compiled.render(n_blocks=4)
    np.testing.assert_allclose(audio, data * 0.5, atol=1e-6)
    # past EOF: zero-padded
    audio2, _ = compiled.render(position=2000, n_blocks=1)
    np.testing.assert_array_equal(audio2, 0)


def test_file_reader_pull_engine(tmp_path):
    path = tmp_path / 'src.wav'
    data = np.arange(100, dtype=np.float32).reshape(-1, 1) / 100
    wavio.write_wav(path, data, 44100)
    reader = FileReader()
    reader.get_state().path = str(path)
    loc = BlockLoc(position=10, rate=44100, shape=Shape(20, 1))
    block = reader.respond(Request(None, 't', loc))
    np.testing.assert_array_equal(block, data[10:30])


def test_file_writer_records_compiled_taps(tmp_path):
    out = tmp_path / 'rec.wav'
    osc = Sine()
    osc.hertz = fixed(220.0)
    writer = FileWriter()
    writer.get_state().path = str(out)
    writer.input = osc
    compiled = compile_node(writer, block_frames=256, rate=44100, channels=1)
    audio, _ = compiled.render(n_blocks=4)
    data, rate = wavio.read_wav(out)
    assert rate == 44100
    np.testing.assert_allclose(data, audio, atol=1e-7)


def test_file_writer_disabled_passthru(tmp_path):
    out = tmp_path / 'rec.wav'
    osc = Sine()
    osc.hertz = fixed(220.0)
    writer = FileWriter()
    writer.get_state().path = str(out)
    writer.get_state().enabled = False
    writer.input = osc
    compiled = compile_node(writer, block_frames=256, rate=44100, channels=1)
    audio, _ = compiled.render(n_blocks=2)
    assert np.abs(audio).max() > 0       # audio passes through
    assert not out.exists()              # nothing recorded
