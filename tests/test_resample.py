"""Sample-rate conversion (``signals_tpu/core/resample.py``) and
pitch-correct file playback (``FileReader(conform_rate=True)``).

The reference has no resampler: ``FileReader`` hands raw frames to any
engine rate (``src/signals/chain/files.py:70-86``), detuning any-rate
files.  These tests pin the converter's quality (peak frequency, alias
floor, DC flatness) and the reader's seek-stability through it.
"""

import numpy as np
import pytest

from signals_tpu.core.resample import resample, sinc_interpolate


def _peak_and_floor(x, rate):
    s = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    f = np.fft.rfftfreq(len(x), 1 / rate)
    k = s.argmax()
    floor = np.sort(s)[:-50].max() / s[k]
    return f[k], 20 * np.log10(floor + 1e-12)


def test_downsample_keeps_pitch_and_rejects_images():
    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 48000, 44100)
    assert len(y) == 44100
    pk, floor_db = _peak_and_floor(y[2000:-2000], 44100)
    assert abs(pk - 1000) < 3, pk
    assert floor_db < -75, floor_db


def test_upsample_keeps_pitch_and_rejects_images():
    t = np.arange(22050) / 22050
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 22050, 44100)
    assert len(y) == 44100
    pk, floor_db = _peak_and_floor(y[2000:-2000], 44100)
    assert abs(pk - 1000) < 3, pk
    assert floor_db < -75, floor_db


def test_mastering_tier_64_taps_hits_minus_90db():
    """The 64-tap quality tier (round 5): alias/image floor measured
    <= -90 dB both directions — the mastering-grade knob for
    ``FileReader.resample_taps`` / fit-target conversion."""
    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 48000, 44100, taps=64)
    pk, floor_db = _peak_and_floor(y[2000:-2000], 44100)
    assert abs(pk - 1000) < 3, pk
    assert floor_db < -90, floor_db
    t = np.arange(22050) / 22050
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 22050, 44100, taps=64)
    pk, floor_db = _peak_and_floor(y[2000:-2000], 44100)
    assert abs(pk - 1000) < 3, pk
    assert floor_db < -90, floor_db


def test_filereader_resample_taps_tier(tmp_path):
    """``FileReader.resample_taps = 64`` flows through ``conform_rate``
    playback (structural param; output differs from the 32-tap tier but
    stays pitch-correct)."""
    from signals_tpu.nodes.files import FileReader
    from signals_tpu.runtime import wavio
    rate_file, rate_engine = 48000, 44100
    t = np.arange(rate_file) / rate_file
    x = (0.5 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    path = tmp_path / 'tone48k.wav'
    wavio.write_wav(path, x[:, None], rate_file)
    rd = FileReader()
    st = rd.get_state()
    st.path = str(path)
    st.conform_rate = True
    st.resample_taps = 64
    y = rd.host_read(1024, 8192, rate_engine)[:, 0]
    s = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f = np.fft.rfftfreq(len(y), 1 / rate_engine)
    assert abs(f[s.argmax()] - 660) < 6
    rd32 = FileReader()
    st2 = rd32.get_state()
    st2.path = str(path)
    st2.conform_rate = True
    y32 = rd32.host_read(1024, 8192, rate_engine)[:, 0]
    assert not np.array_equal(y, y32)     # the tier genuinely changes taps


def test_dc_exact_and_identity_rates():
    dc = resample(np.ones(5000, np.float32), 48000, 44100)
    assert np.abs(dc[100:-100] - 1.0).max() < 1e-6
    x = np.arange(10, dtype=np.float32)
    assert resample(x, 44100, 44100) is x


def test_stereo_preserves_channel_balance():
    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(np.stack([x, 0.5 * x], axis=1), 48000, 44100)
    assert y.shape == (44100, 2)
    mid = slice(1000, -1000)
    assert np.abs(y[mid, 1] - 0.5 * y[mid, 0]).max() < 1e-4


def test_chunking_is_seamless():
    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 700 * t).astype(np.float32)
    a = resample(x, 48000, 44100, chunk=1 << 16)
    b = resample(x, 48000, 44100, chunk=1000)
    np.testing.assert_array_equal(a, b)


def test_rejects_bad_rates():
    with pytest.raises(ValueError):
        resample(np.zeros(10), 0, 44100)


def _write_sine_wav(path, rate, hz=1000.0, seconds=0.6):
    from signals_tpu.runtime.wavio import write_wav
    t = np.arange(int(rate * seconds)) / rate
    write_wav(path, np.sin(2 * np.pi * hz * t).astype(np.float32), rate)


def test_filereader_conform_rate_plays_pitch_correct(tmp_path):
    """A 48 kHz file in a 44.1 kHz patch: raw semantics detune it to
    1000 * 44100/48000 = 918.75 Hz (the reference behavior);
    ``conform_rate=True`` plays it at 1000 Hz."""
    from signals_tpu.nodes.files import FileReader
    path = tmp_path / 'tone48k.wav'
    _write_sine_wav(path, 48000)
    rate, frames = 44100, 22050

    raw = FileReader()
    raw.get_state().path = str(path)
    x_raw = raw.host_read(0, frames, rate)
    pk_raw, _ = _peak_and_floor(x_raw[:, 0], rate)
    assert abs(pk_raw - 918.75) < 4, pk_raw

    conf = FileReader()
    st = conf.get_state()
    st.path = str(path)
    st.conform_rate = True
    x = conf.host_read(0, frames, rate)
    pk, floor_db = _peak_and_floor(x[:, 0], rate)
    assert abs(pk - 1000) < 4, pk
    assert floor_db < -70, floor_db


def test_filereader_conform_rate_is_seek_stable(tmp_path):
    """Resampled block reads are a pure function of absolute position:
    reading blocks independently equals slicing one long read."""
    from signals_tpu.nodes.files import FileReader
    path = tmp_path / 'tone48k.wav'
    _write_sine_wav(path, 48000, hz=333.0)
    rate, F = 44100, 1024
    node = FileReader()
    st = node.get_state()
    st.path = str(path)
    st.conform_rate = True
    full = node.host_read(0, 8 * F, rate)
    for b in (0, 3, 7):
        block = node.host_read(b * F, F, rate)
        np.testing.assert_allclose(block, full[b * F:(b + 1) * F],
                                   atol=1e-6)


def test_filereader_conform_rate_renders_through_engine(tmp_path):
    """End-to-end: the compiled engine plays the conformed file at the
    right pitch (host staging goes through the same host_read)."""
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.files import FileReader
    path = tmp_path / 'tone48k.wav'
    _write_sine_wav(path, 48000)
    node = FileReader()
    st = node.get_state()
    st.path = str(path)
    st.conform_rate = True
    compiled = compile_node(node, block_frames=1024, rate=44100)
    audio, _ = compiled.render(n_blocks=16)
    pk, _ = _peak_and_floor(audio[:, 0], 44100)
    assert abs(pk - 1000) < 4, pk


def test_fit_command_resamples_mismatched_target(tmp_path):
    """The ``fit`` command accepts target audio at any rate, resampling
    it to the patch rate (it used to refuse with 'resample the file
    first' — with no resampler in the framework)."""
    import io

    from signals_tpu.map import Coordinates
    from signals_tpu.map.control import Controller
    from signals_tpu.runtime.wavio import read_wav, write_wav

    ctl = Controller(interactive=False, stdout=io.StringIO())
    for line in ('sink 7a default',
                 '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
                 '+ 2a signals_tpu.nodes.osc.Sine',
                 '+ 3a signals_tpu.nodes.fixed.Fixed value=[[0.8]]',
                 '+ 4a signals_tpu.nodes.fx.Gain',
                 '> 1a 2a.hertz', '> 2a 4a.left', '> 3a 4a.right',
                 '> 4a 7a.input'):
        ctl.default(line)
    t44 = tmp_path / 'target44.wav'
    ctl.default(f'bounce 7a {t44} 0.1')
    audio, _ = read_wav(t44)
    t88 = tmp_path / 'target88.wav'
    write_wav(t88, resample(audio, 44100, 88200), 88200)

    ctl.default('* 3a value=[[0.2]]')
    ctl.default(f'fit 7a {t88} 3a.value --steps 150 --lr 0.1')
    out = ctl.stdout.getvalue()
    assert 'resampled 88200 -> 44100' in out
    node = ctl.map.find(Coordinates.parse('3a'))
    fitted = float(np.asarray(node.get_state().value).ravel()[0])
    assert abs(fitted - 0.8) < 0.08, fitted
