"""G.711 mu-law/A-law and IMA ADPCM codecs + WAV/AU container support.

The G.711 coders are bit-compatible with the CCITT reference
implementation; where the stdlib ``audioop`` module is importable (it is
on Python <= 3.12) encode/decode are checked byte-for-byte against it.
The JAX implementations must match the numpy ones exactly — the same
bytes a file writer produces are what a device-side stream encoder
fetches over the host link.
"""

import numpy as np
import pytest

from signals_tpu.runtime import codecs, sndfile, wavio


def _signal(n=20000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32)[:, None]
    f = 110.0 * (1 + np.arange(channels, dtype=np.float32))[None, :]
    x = 0.6 * np.sin(2 * np.pi * f * t / 44100.0)
    x = x * np.linspace(0.01, 1.0, n, dtype=np.float32)[:, None]
    x = x + 0.05 * rng.standard_normal((n, channels)).astype(np.float32)
    return np.clip(x, -1.0, 1.0).astype(np.float32)


def _audioop():
    try:
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            import audioop
        return audioop
    except ImportError:          # removed in Python 3.13
        return None


class TestG711:

    def test_mulaw_round_trip_error_bound(self):
        x = _signal()
        dec = codecs.mulaw_decode(np, codecs.mulaw_encode(np, x))
        # mu-law: logarithmic companding — error proportional to the
        # sample magnitude (top segment steps are 1/32 of full scale)
        err = np.abs(dec.reshape(-1) - x.reshape(-1))
        assert np.all(err <= np.abs(x.reshape(-1)) / 12 + 0.005)
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > 30.0
        assert err.mean() < 5e-3

    def test_alaw_round_trip_error_bound(self):
        x = _signal(seed=1)
        dec = codecs.alaw_decode(np, codecs.alaw_encode(np, x))
        err = np.abs(dec.reshape(-1) - x.reshape(-1))
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > 30.0
        assert err.mean() < 5e-3

    @pytest.mark.skipif(_audioop() is None, reason='audioop removed')
    def test_mulaw_matches_audioop_bit_exact(self):
        audioop = _audioop()
        pcm = np.arange(-32768, 32768, dtype='<i2')
        x = pcm.astype(np.float32) / 32768.0
        ref = np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2),
                            dtype=np.uint8)
        assert np.array_equal(codecs.mulaw_encode(np, x), ref)
        codes = np.arange(256, dtype=np.uint8)
        ref_d = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2),
                              dtype='<i2').astype(np.int32)
        got_d = (codecs.mulaw_decode(np, codes) * 32768.0).astype(np.int32)
        assert np.array_equal(got_d, ref_d)

    @pytest.mark.skipif(_audioop() is None, reason='audioop removed')
    def test_alaw_matches_audioop_bit_exact(self):
        audioop = _audioop()
        pcm = np.arange(-32768, 32768, dtype='<i2')
        x = pcm.astype(np.float32) / 32768.0
        ref = np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2),
                            dtype=np.uint8)
        assert np.array_equal(codecs.alaw_encode(np, x), ref)
        codes = np.arange(256, dtype=np.uint8)
        ref_d = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2),
                              dtype='<i2').astype(np.int32)
        got_d = (codecs.alaw_decode(np, codes) * 32768.0).astype(np.int32)
        assert np.array_equal(got_d, ref_d)

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp
        x = _signal(seed=2).reshape(-1)
        xj = jnp.asarray(x)
        assert np.array_equal(np.asarray(codecs.mulaw_encode(jnp, xj)),
                              codecs.mulaw_encode(np, x))
        assert np.array_equal(np.asarray(codecs.alaw_encode(jnp, xj)),
                              codecs.alaw_encode(np, x))
        u = codecs.mulaw_encode(np, x)
        assert np.array_equal(
            np.asarray(codecs.mulaw_decode(jnp, jnp.asarray(u))),
            codecs.mulaw_decode(np, u))


class TestImaAdpcm:

    @pytest.mark.parametrize('channels', [1, 2])
    def test_round_trip_snr(self, channels):
        x = _signal(channels=channels, seed=3)
        payload, ba = codecs.ima_encode_np(x, samples_per_block=505)
        dec = codecs.ima_decode_np(payload, channels=channels,
                                   block_align=ba, frames=x.shape[0])
        assert dec.shape == x.shape
        err = dec - x
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > 24.0, f'ADPCM SNR too low: {snr:.1f} dB'

    def test_jax_encoder_byte_identical(self):
        import jax
        import jax.numpy as jnp
        x = _signal(seed=4)
        ref, ba = codecs.ima_encode_np(x, samples_per_block=505)
        got = jax.jit(
            lambda s: codecs.ima_encode_jax(s, samples_per_block=505))(
                jnp.asarray(x))
        assert np.array_equal(np.asarray(got), ref)

    def test_partial_final_block_padding(self):
        x = _signal(n=505 * 2 + 100, seed=5)
        payload, ba = codecs.ima_encode_np(x, samples_per_block=505)
        assert payload.shape[0] == 3 * ba
        dec = codecs.ima_decode_np(payload, channels=1, block_align=ba,
                                   frames=x.shape[0])
        assert dec.shape[0] == x.shape[0]

    def test_no_block_boundary_transient(self):
        """The per-block starting step index (header byte 3) must be
        estimated, not reset to 0: a reset makes the first ~32 samples of
        every block ~30x noisier than the rest — a periodic ~43 Hz
        artifact in a production bounce format."""
        t = np.arange(44100) / 44100.0
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)
             ).astype(np.float32).reshape(-1, 1)
        payload, ba = codecs.ima_encode_np(x)
        spb = codecs.ima_samples_per_block(ba, 1)
        dec = codecs.ima_decode_np(payload, channels=1, block_align=ba,
                                   frames=x.shape[0])
        err = np.abs(dec - x)
        nb = err.shape[0] // spb
        errb = err[:nb * spb].reshape(nb, spb)
        head = errb[:, :32].mean()
        rest = errb[:, 32:].mean()
        assert head < 3.0 * rest, (head, rest)


class TestWavContainers:

    @pytest.mark.parametrize('subtype', ['mulaw', 'alaw', 'adpcm'])
    def test_wav_round_trip(self, tmp_path, subtype):
        x = _signal(seed=6)
        p = tmp_path / f'{subtype}.wav'
        w = wavio.WavWriter(p, rate=44100, channels=1, subtype=subtype)
        w.write(x[:9999])           # deliberately not block-aligned
        w.write(x[9999:])
        w.close()
        r = wavio.WavReader(p)
        assert r.rate == 44100 and r.channels == 1
        assert r.frames == x.shape[0]
        dec = r.read(0, r.frames)
        r.close()
        err = dec - x
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > (24.0 if subtype == 'adpcm' else 30.0)

    def test_wav_adpcm_random_access(self, tmp_path):
        x = _signal(seed=7)
        p = tmp_path / 'ra.wav'
        w = wavio.WavWriter(p, rate=44100, channels=1, subtype='adpcm')
        w.write(x)
        w.close()
        r = wavio.WavReader(p)
        whole = r.read(0, r.frames)
        # mid-file random read must equal the same slice of a full read
        got = r.read(5000, 3000)
        assert np.array_equal(got, whole[5000:8000])
        # reads straddling EOF zero-fill
        tail = r.read(r.frames - 10, 20)
        assert np.array_equal(tail[:10], whole[-10:])
        assert not tail[10:].any()
        r.close()

    @pytest.mark.parametrize('subtype', ['mulaw', 'alaw', 'adpcm'])
    def test_soundfile_cross_reads_our_wav(self, tmp_path, subtype):
        sf = sndfile._soundfile()
        if sf is None:
            pytest.skip('soundfile not installed')
        x = _signal(seed=8)
        p = tmp_path / f'x{subtype}.wav'
        w = wavio.WavWriter(p, rate=44100, channels=1, subtype=subtype)
        w.write(x)
        w.close()
        data, rate = sf.read(str(p), dtype='float32', always_2d=True)
        assert rate == 44100
        assert data.shape[0] == x.shape[0]
        err = data - x
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > (24.0 if subtype == 'adpcm' else 30.0)

    @pytest.mark.parametrize('subtype', ['mulaw', 'alaw'])
    def test_au_round_trip(self, tmp_path, subtype):
        x = _signal(seed=9)
        p = tmp_path / f'{subtype}.au'
        w = sndfile.AuWriter(p, rate=8000, channels=1, subtype=subtype)
        w.write(x)
        w.close()
        r = sndfile.AuReader(p)
        assert r.frames == x.shape[0] and r.rate == 8000
        dec = r.read(0, r.frames)
        r.close()
        err = dec - x
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
        assert snr > 30.0

    def test_file_writer_node_subtype(self, tmp_path):
        from signals_tpu.nodes.files import FileWriter
        from signals_tpu.nodes.fixed import Fixed
        from signals_tpu.core import BlockLoc, Request, Shape
        x = _signal(seed=10)
        src = Fixed()
        src.get_state().value = np.asarray([[0.25]], dtype=np.float32)
        fw = FileWriter()
        st = fw.get_state()
        st.path = str(tmp_path / 'node.wav')
        st.subtype = 'mulaw'
        fw.set_state(st)
        fw.input = src
        loc = BlockLoc(position=0, rate=44100, shape=Shape(1024, 1))
        fw.respond(Request(requestor=None, port='t', loc=loc))
        fw.destroy()
        r = wavio.WavReader(tmp_path / 'node.wav')
        assert r.fmt_code == wavio._FMT_MULAW
        dec = r.read(0, r.frames)
        r.close()
        assert np.abs(dec - 0.25).max() < 0.01


class TestDeviceEncodedBounce:
    """render_encoded applies the codec on device; its payload must be
    byte-identical to encoding the float32 render on the host."""

    def _patch(self):
        from signals_tpu.nodes.fixed import Fixed
        from signals_tpu.nodes.osc import Sine
        hz = Fixed()
        hz.get_state().value = np.asarray([[330.0]], dtype=np.float32)
        osc = Sine()
        osc.hertz = hz
        return osc

    @pytest.mark.parametrize('subtype', ['pcm16', 'mulaw', 'alaw', 'adpcm',
                                         'slac'])
    def test_payload_matches_host_encoding(self, subtype):
        from signals_tpu.compiler import compile_node
        root = self._patch()
        compiled = compile_node(root, block_frames=256, rate=44100,
                                channels=1)
        audio, _ = compiled.render(n_blocks=8, deliver_taps=False)
        payload, frames, _ = compiled.render_encoded(
            n_blocks=8, subtype=subtype, deliver_taps=False)
        assert frames == 8 * 256
        if subtype == 'pcm16':
            ref = np.clip(np.round(audio * 32767.0), -32768,
                          32767).astype(np.int16).reshape(-1)
        elif subtype == 'mulaw':
            ref = codecs.mulaw_encode(np, audio).reshape(-1)
        elif subtype == 'alaw':
            ref = codecs.alaw_encode(np, audio).reshape(-1)
        elif subtype == 'slac':
            ref, _ = codecs.slac2_encode_np(audio)
        else:
            ref, _ = codecs.ima_encode_np(audio)
        assert np.array_equal(payload.reshape(-1), ref)

    def test_bounce_command_device_encoded(self, tmp_path):
        from signals_tpu.map.control import Controller
        c = Controller(interactive=False)
        c.onecmd('sink 7a default')
        c.onecmd('+ 1a signals.chain.fixed.Fixed value=[[220.0]]')
        c.onecmd('+ 2a signals.chain.osc.Sine')
        c.onecmd('> 1a 2a.hertz')
        c.onecmd('> 2a 7a.input')
        out = tmp_path / 'bounced.wav'
        c.onecmd(f'bounce 7a {out} 0.25 mulaw')
        r = wavio.WavReader(out)
        assert r.fmt_code == wavio._FMT_MULAW
        dec = r.read(0, r.frames)
        r.close()
        spec = np.abs(np.fft.rfft(dec[:, 0]))
        peak = np.argmax(spec) * 44100 / dec.shape[0]
        assert abs(peak - 220.0) < 8


class TestSlac:
    """SLAC lossless codec: bit-exact PCM16 round trips, np/jax
    byte-identity, compression on tonal material."""

    def _sig(self, n=44100, channels=1, seed=11):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / 44100.0
        x = (0.4 * np.sin(2 * np.pi * 440.0 * t)
             + 0.1 * np.sin(2 * np.pi * 2345.0 * t)
             + 0.002 * rng.standard_normal(n)).astype(np.float32)
        return np.stack([x * (1.0 - 0.3 * c) for c in range(channels)],
                        axis=1)

    @pytest.mark.parametrize('channels', [1, 2])
    def test_round_trip_bit_exact(self, channels):
        x = self._sig(channels=channels)
        payload, n = codecs.slac_encode_np(x)
        ref = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        dec = codecs.slac_decode_np(payload, n, channels=channels)
        assert np.array_equal(dec, ref)

    def test_jax_encoder_byte_identical(self):
        import jax
        x = self._sig()
        ref, n = codecs.slac_encode_np(x)
        buf, total = jax.jit(codecs.slac_encode_jax)(x)
        assert int(total) == ref.shape[0]
        assert np.array_equal(np.asarray(buf)[:int(total)], ref)

    def test_compresses_tonal_material(self):
        x = self._sig()
        payload, n = codecs.slac_encode_np(x)
        assert payload.shape[0] / n < 1.6        # < 1.6 bytes/sample

    def test_edge_cases(self):
        rng = np.random.default_rng(3)
        for x in (np.zeros((700, 1), np.float32),
                  np.full((700, 1), 0.25, np.float32),
                  rng.uniform(-1, 1, (700, 1)).astype(np.float32),
                  np.where(np.arange(700) % 2 == 0, 1.0, -1.0
                           ).astype(np.float32).reshape(-1, 1)):
            payload, n = codecs.slac_encode_np(x)
            ref = np.clip(np.round(x * 32767.0),
                          -32768, 32767).astype(np.int16)
            assert np.array_equal(
                codecs.slac_decode_np(payload, n, 1), ref)

    def test_worst_case_capacity_bound(self):
        # alternating full-scale: order-2 residuals at the 18-bit extreme
        x = np.where(np.arange(512) % 2 == 0, 1.0, -1.0
                     ).astype(np.float32).reshape(-1, 1)
        payload, n = codecs.slac_encode_np(x)
        assert payload.shape[0] <= n * (1 + (codecs._SLAC_MAX_W + 7) // 8
                                        * 0 + 3)   # loose sanity bound
        dec = codecs.slac_decode_np(payload, n, 1)
        ref = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        assert np.array_equal(dec, ref)


class TestSlac2:
    """SLAC v2 (Rice-coded residuals): bit-exact round trips, np/jax
    byte-identity, and a measured rate win over v1 on tonal material."""

    def _sig(self, n=44100, channels=1, seed=11):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / 44100.0
        x = (0.4 * np.sin(2 * np.pi * 440.0 * t)
             + 0.1 * np.sin(2 * np.pi * 2345.0 * t)
             + 0.002 * rng.standard_normal(n)).astype(np.float32)
        return np.stack([x * (1.0 - 0.3 * c) for c in range(channels)],
                        axis=1)

    @pytest.mark.parametrize('channels', [1, 2])
    def test_round_trip_bit_exact(self, channels):
        x = self._sig(channels=channels)
        payload, n = codecs.slac2_encode_np(x)
        ref = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        dec = codecs.slac2_decode_np(payload, n, channels=channels)
        assert np.array_equal(dec, ref)

    def test_jax_encoder_byte_identical(self):
        import jax
        x = self._sig()
        ref, n = codecs.slac2_encode_np(x)
        buf, total = jax.jit(codecs.slac2_encode_jax)(x)
        assert int(total) == ref.shape[0]
        assert np.array_equal(np.asarray(buf)[:int(total)], ref)

    def test_jax_encoder_compaction_strategies_identical(self):
        # both stream-compaction lowerings (sequential row writer /
        # vectorized searchsorted+gather) must produce the same bytes
        import jax
        x = self._sig()
        ref, _ = codecs.slac2_encode_np(x)
        saved = codecs.SLAC2_COMPACT
        try:
            for strategy in ('loop', 'gather'):
                codecs.SLAC2_COMPACT = strategy
                buf, total = jax.jit(codecs.slac2_encode_jax)(x)
                assert int(total) == ref.shape[0], strategy
                assert np.array_equal(np.asarray(buf)[:int(total)], ref), \
                    strategy
        finally:
            codecs.SLAC2_COMPACT = saved

    def test_beats_v1_on_tonal_material(self):
        x = self._sig()
        v1, n = codecs.slac_encode_np(x)
        v2, _ = codecs.slac2_encode_np(x)
        assert v2.shape[0] < v1.shape[0]

    def test_edge_cases(self):
        rng = np.random.default_rng(3)
        for x in (np.zeros((700, 1), np.float32),
                  np.full((700, 1), 0.25, np.float32),
                  rng.uniform(-1, 1, (700, 1)).astype(np.float32),
                  np.where(np.arange(700) % 2 == 0, 1.0, -1.0
                           ).astype(np.float32).reshape(-1, 1),
                  np.array([[5e-4], [-3e-4], [7e-4]], np.float32)):
            payload, n = codecs.slac2_encode_np(x)
            ref = np.clip(np.round(x * 32767.0),
                          -32768, 32767).astype(np.int16)
            assert np.array_equal(
                codecs.slac2_decode_np(payload, n, 1), ref)

    def test_escape_path_full_scale_noise(self):
        # white full-scale noise forces large residuals through every
        # predictor: many samples take the 16-ones + 20-raw-bit escape,
        # and both codecs and both backends must agree on all of them
        import jax
        rng = np.random.default_rng(99)
        x = rng.uniform(-1, 1, (1500, 1)).astype(np.float32)
        payload, n = codecs.slac2_encode_np(x)
        ref = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        assert np.array_equal(codecs.slac2_decode_np(payload, n, 1), ref)
        buf, total = jax.jit(codecs.slac2_encode_jax)(x)
        assert np.array_equal(np.asarray(buf)[:int(total)], payload)

    def test_stream_version_constant(self):
        # the compiler's device bounce and the container writer default
        # must agree (sndfile.SlacWriter reads this constant)
        assert codecs.SLAC_STREAM_VERSION == 2
