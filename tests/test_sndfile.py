"""Sound-file format dispatch (:mod:`signals_tpu.runtime.sndfile`).

The reference reads anything libsndfile does
(``/root/reference/src/signals/chain/files.py:8``); here WAV/AIFF/AU have
dependency-free codecs and other formats dispatch to ``soundfile`` when
importable (tests skip the live libsndfile round-trip when it is not).
"""

import struct
import sys
import types

import numpy as np
import pytest

from signals_tpu.runtime import sndfile, wavio


def ramp(frames=1000, channels=2):
    t = np.arange(frames, dtype=np.float32).reshape(-1, 1)
    sig = np.concatenate([np.sin(2 * np.pi * 220 * t / 44100),
                          np.cos(2 * np.pi * 110 * t / 44100)], axis=1)
    return np.ascontiguousarray(sig[:, :channels] * 0.7)


@pytest.mark.parametrize('ext,tol', [
    ('.wav', 1e-7),       # float32 native
    ('.aiff', 6e-5),      # PCM16 (write x32767, read /32768)
    ('.au', 1e-7),        # float32
    ('.snd', 1e-7),
    ('.aif', 6e-5),
])
def test_native_round_trip(tmp_path, ext, tol):
    path = tmp_path / f'clip{ext}'
    data = ramp()
    w = sndfile.open_writer(path, rate=48000, channels=2)
    w.write(data[:300])
    w.write(data[300:])
    w.close()
    r = sndfile.open_reader(path)
    assert r.rate == 48000
    assert r.channels == 2
    assert r.frames == 1000
    got = r.read(0, 1000)
    np.testing.assert_allclose(got, data, atol=tol)
    # positioned read with zero-fill on both sides
    got = r.read(990, 30)
    np.testing.assert_allclose(got[:10], data[990:], atol=tol)
    assert float(np.abs(got[10:]).max()) == 0.0
    got = r.read(-5, 10)
    assert float(np.abs(got[:5]).max()) == 0.0
    np.testing.assert_allclose(got[5:], data[:5], atol=tol)
    r.close()


@pytest.mark.parametrize('bits', [8, 16, 24, 32])
def test_wav_pcm_depths(tmp_path, bits):
    """Hand-assemble PCM WAVs at every depth and read them back."""
    frames, channels, rate = 64, 1, 44100
    x = (np.sin(np.linspace(0, 6.0, frames)) * 0.5).astype(np.float64)
    full = 1 << (bits - 1)
    q = np.clip(np.rint(x * full), -full, full - 1).astype(np.int64)
    if bits == 8:
        raw = (q + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = q.astype('<i2').tobytes()
    elif bits == 24:
        b = np.zeros((frames, 3), dtype=np.uint8)
        u = q.astype(np.int64) & 0xFFFFFF
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        raw = b.tobytes()
    else:
        raw = q.astype('<i4').tobytes()
    sb = bits // 8
    path = tmp_path / f'pcm{bits}.wav'
    with path.open('wb') as f:
        f.write(struct.pack(
            '<4sI4s4sIHHIIHH4sI',
            b'RIFF', 36 + len(raw), b'WAVE',
            b'fmt ', 16, 1, channels, rate, rate * sb, sb, bits,
            b'data', len(raw)))
        f.write(raw)
    r = wavio.WavReader(path)
    got = r.read(0, frames)[:, 0]
    np.testing.assert_allclose(got, q / full, atol=1e-6)
    r.close()


def test_wav_pcm16_writer(tmp_path):
    path = tmp_path / 'clip.wav'
    data = ramp(200, 1)
    w = wavio.WavWriter(path, rate=44100, channels=1, subtype='pcm16')
    w.write(data)
    w.close()
    r = wavio.WavReader(path)
    assert r.bits == 16 and not r.is_float
    np.testing.assert_allclose(r.read(0, 200), data, atol=6e-5)
    r.close()


def test_aiff_ext_float_rate():
    from signals_tpu.runtime.sndfile import (_ext_float_decode,
                                             _ext_float_encode)
    for rate in (8000.0, 22050.0, 44100.0, 48000.0, 96000.0, 11025.5):
        assert _ext_float_decode(_ext_float_encode(rate)) == rate


def test_unknown_format_clear_error(tmp_path, monkeypatch):
    # simulate an absent soundfile package by blocking its import
    monkeypatch.delitem(sys.modules, 'soundfile', raising=False)
    import builtins
    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == 'soundfile':
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, 'import_', blocked, raising=False)
    monkeypatch.setattr(builtins, '__import__', blocked)
    with pytest.raises(sndfile.SoundFileError, match='unsupported format'):
        sndfile.open_reader(tmp_path / 'clip.flac')
    with pytest.raises(sndfile.SoundFileError, match='unsupported format'):
        sndfile.open_writer(tmp_path / 'clip.ogg', rate=44100, channels=1)


def test_devnull_write_ok():
    import os
    w = sndfile.open_writer(os.devnull, rate=44100, channels=1)
    w.write(np.zeros((64, 1), dtype=np.float32))
    w.close()


class FakeSoundFile:
    """Duck-typed soundfile.SoundFile over an in-memory store."""

    store: dict = {}

    def __init__(self, path, mode='r', samplerate=None, channels=None):
        self.path = str(path)
        self.mode = mode
        if mode == 'r':
            self.samplerate, self._data = FakeSoundFile.store[self.path]
            self.channels = self._data.shape[1]
        else:
            self.samplerate = samplerate
            self.channels = channels
            self._data = np.zeros((0, channels), dtype=np.float32)
        self._pos = 0

    def __len__(self):
        return self._data.shape[0]

    def seek(self, pos):
        self._pos = pos

    def read(self, frames, dtype='float32', always_2d=True):
        out = self._data[self._pos:self._pos + frames]
        self._pos += out.shape[0]
        return out

    def write(self, block):
        self._data = np.concatenate([self._data, block], axis=0)

    def close(self):
        if self.mode == 'w':
            FakeSoundFile.store[self.path] = (self.samplerate, self._data)


def test_libsndfile_dispatch_with_fake(tmp_path):
    sf = types.ModuleType('soundfile')
    sf.SoundFile = FakeSoundFile
    data = ramp(500, 2)
    path = tmp_path / 'clip.flac'
    w = sndfile.open_writer(path, rate=44100, channels=2, sf_module=sf)
    w.write(data)
    w.close()
    r = sndfile.open_reader(path, sf_module=sf)
    assert r.frames == 500 and r.rate == 44100
    np.testing.assert_allclose(r.read(100, 50), data[100:150], atol=1e-7)
    got = r.read(480, 40)
    np.testing.assert_allclose(got[:20], data[480:], atol=1e-7)
    assert float(np.abs(got[20:]).max()) == 0.0
    r.close()


@pytest.mark.skipif(not sndfile.soundfile_available(),
                    reason='soundfile not installed')
def test_libsndfile_flac_round_trip(tmp_path):
    data = ramp(2000, 1)
    path = tmp_path / 'clip.flac'
    w = sndfile.open_writer(path, rate=44100, channels=1)
    w.write(data)
    w.close()
    r = sndfile.open_reader(path)
    np.testing.assert_allclose(r.read(0, 2000), data, atol=1e-4)
    r.close()


def test_file_reader_node_reads_aiff(tmp_path):
    """End to end: AIFF fixture -> FileReader -> compiled render."""
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.files import FileReader

    path = tmp_path / 'clip.aiff'
    data = ramp(1024, 1)
    w = sndfile.open_writer(path, rate=44100, channels=1)
    w.write(data)
    w.close()

    rd = FileReader()
    rd.get_state().path = str(path)
    compiled = compile_node(rd, block_frames=256, rate=44100, channels=1)
    audio, _ = compiled.render(position=0, n_blocks=4)
    np.testing.assert_allclose(audio, data, atol=6e-5)


def test_file_writer_node_records_au(tmp_path):
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.files import FileWriter
    from signals_tpu.nodes.osc import Sine
    from tests.conftest import fixed

    path = tmp_path / 'take.au'
    osc = Sine()
    osc.hertz = fixed(440.0)
    wr = FileWriter()
    wr.get_state().path = str(path)
    wr.input = osc
    compiled = compile_node(wr, block_frames=256, rate=44100, channels=1)
    audio, _ = compiled.render(position=0, n_blocks=4)
    wr.destroy()
    r = sndfile.open_reader(path)
    assert r.frames == 1024
    np.testing.assert_allclose(r.read(0, 1024), audio, atol=1e-6)
    r.close()


def test_aifc_compressed_rejected(tmp_path):
    """'sowt' (little-endian) AIFC must be rejected, not decoded as
    byte-swapped garbage."""
    import struct
    path = tmp_path / 'clip.aifc'
    comm = struct.pack('>hIh', 1, 4, 16) + \
        sndfile._ext_float_encode(44100.0) + b'sowt' + b'\x00'
    data = struct.pack('<4h', 1000, 2000, -1000, -2000)
    with path.open('wb') as f:
        body = (struct.pack('>4sI', b'COMM', len(comm)) + comm + b'\x00'
                + struct.pack('>4sIII', b'SSND', 8 + len(data), 0, 0) + data)
        f.write(struct.pack('>4sI4s', b'FORM', 4 + len(body), b'AIFC'))
        f.write(body)
    with pytest.raises(sndfile.SoundFileError, match='sowt'):
        sndfile.open_reader(path)


class TestSlacContainer:
    """The native .slac lossless container: write/read round trips are
    bit-exact at PCM16 resolution; device-encoded payloads land
    unchanged."""

    def _sig(self, n=5000, channels=1):
        t = np.arange(n) / 44100.0
        x = (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
        return np.stack([x * (1 - 0.4 * c) for c in range(channels)],
                        axis=1)

    @pytest.mark.parametrize('channels', [1, 2])
    def test_write_read_round_trip(self, tmp_path, channels):
        x = self._sig(channels=channels)
        p = tmp_path / 'take.slac'
        w = sndfile.open_writer(p, rate=44100, channels=channels,
                                subtype='slac')
        w.write(x[:3000])
        w.write(x[3000:])
        w.close()
        r = sndfile.open_reader(p)
        assert r.rate == 44100 and r.channels == channels
        assert r.frames == x.shape[0]
        got = r.read(0, r.frames)
        r.close()
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767)
        assert np.array_equal(
            np.round(got * 32767.0).astype(np.int32),
            pcm.astype(np.int32))

    @pytest.mark.parametrize('version', [1, 2])
    def test_write_encoded_payload(self, tmp_path, version):
        from signals_tpu.runtime import codecs
        x = self._sig()
        encode = (codecs.slac_encode_np if version == 1
                  else codecs.slac2_encode_np)
        payload, n = encode(x)
        p = tmp_path / 'bounced.slac'
        w = sndfile.open_writer(p, rate=48000, channels=1, subtype='slac')
        w.write_encoded(payload, x.shape[0], version=version)
        w.close()
        r = sndfile.open_reader(p)
        assert r.rate == 48000 and r.frames == x.shape[0]
        got = r.read(0, r.frames)
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767)
        assert np.array_equal(np.round(got * 32767.0).astype(np.int32),
                              pcm.astype(np.int32))
        # second payloads: v2 appends write the v3 multi-segment
        # container (each payload independently decodable — the
        # pipelined streaming bounce); v1 cannot multi-segment
        w2 = sndfile.open_writer(tmp_path / 'two.slac', rate=44100,
                                 channels=1, subtype='slac')
        w2.write_encoded(payload, x.shape[0], version=version)
        if version == 1:
            with pytest.raises(sndfile.SoundFileError):
                w2.write_encoded(payload, x.shape[0], version=version)
            w2.close()
        else:
            w2.write_encoded(payload, x.shape[0], version=version)
            w2.close()
            r2 = sndfile.open_reader(tmp_path / 'two.slac')
            assert r2.frames == 2 * x.shape[0]
            got2 = r2.read(0, r2.frames)
            assert np.array_equal(
                np.round(got2 * 32767.0).astype(np.int32),
                np.concatenate([pcm, pcm]).astype(np.int32))

    def test_bounce_command_slac(self, tmp_path):
        import io
        from signals_tpu.map.control import Controller
        c = Controller(interactive=False, stdout=io.StringIO())
        c.default('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
        c.default('+ 2a signals_tpu.nodes.osc.Sine')
        c.default('> 1a 2a.hertz')
        c.default('sink 3a null')
        c.default('> 2a 3a.input')
        out = tmp_path / 'sine.slac'
        c.default(f'bounce 3a {out} 0.25 slac')
        r = sndfile.open_reader(out)
        audio = r.read(0, r.frames)
        r.close()
        assert r.frames >= int(0.25 * 44100 * 0.9)
        spec = np.abs(np.fft.rfft(audio[:, 0]))
        freqs = np.fft.rfftfreq(audio.shape[0], 1 / 44100)
        assert abs(freqs[spec.argmax()] - 440.0) < 5.0
