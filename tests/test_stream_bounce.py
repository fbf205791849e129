"""Pipelined streaming bounce (round 5): batch k+1's render dispatches
before batch k's payload is fetched (``CompiledPatch.
render_encoded_stream``), and the ``.slac`` v3 multi-segment container
concatenates independently-encoded batch payloads losslessly."""

import numpy as np

from conftest import fixed

BLOCK, RATE = 1024, 44100


def _patch():
    from signals_tpu.nodes.fx import Gain
    from signals_tpu.nodes.osc import Sawtooth
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    g = Gain()
    g.left = saw
    g.right = fixed(0.7)
    return g


def test_stream_slac_bit_exact_and_v3_container(tmp_path):
    from signals_tpu.compiler import compile_node
    from signals_tpu.runtime.sndfile import SlacReader, SlacWriter

    root = _patch()
    c = compile_node(root, block_frames=BLOCK, rate=RATE, channels=1)
    n_blocks, batch = 10, 4

    path = tmp_path / 'stream.slac'
    w = SlacWriter(path, rate=RATE, channels=1)
    total = 0
    n_segs = 0
    for payload, frames in c.render_encoded_stream(
            n_blocks=n_blocks, batch_blocks=batch, subtype='slac'):
        w.write_encoded(payload, frames)
        total += frames
        n_segs += 1
    w.close()
    assert total == n_blocks * BLOCK
    assert n_segs == 3                     # 4 + 4 + 2 blocks

    # bit-exact vs the device mix quantized to PCM16
    audio, _ = c.render(n_blocks=n_blocks, deliver_taps=False)
    pcm = np.clip(np.round(audio[:, 0] * 32767.0), -32768, 32767)
    r = SlacReader(path)
    got = np.round(r.read(0, total)[:, 0] * 32767.0)
    assert r.frames == total
    assert np.array_equal(got, pcm)


def test_stream_matches_single_shot_mulaw():
    from signals_tpu.compiler import compile_node

    root = _patch()
    c = compile_node(root, block_frames=BLOCK, rate=RATE, channels=1)
    one, frames, _ = c.render_encoded(n_blocks=9, subtype='mulaw')
    stream = np.concatenate(
        [p for p, _ in c.render_encoded_stream(
            n_blocks=9, batch_blocks=4, subtype='mulaw')])
    assert stream.shape == one.shape
    assert np.array_equal(stream, one)


def test_stream_cap_overshoot_path():
    """Force the adaptive cap below the live payload length: the
    remainder fetch path must still return the exact bytes."""
    from signals_tpu.compiler import CompiledPatch, compile_node

    root = _patch()
    c = compile_node(root, block_frames=BLOCK, rate=RATE, channels=1)
    one, _, _ = c.render_encoded(n_blocks=4, subtype='slac')
    saved = (CompiledPatch.STREAM_CAP_GUESS, CompiledPatch.STREAM_CAP_STEP)
    CompiledPatch.STREAM_CAP_GUESS = 0.05   # ~10x below slac's real rate
    CompiledPatch.STREAM_CAP_STEP = 256
    try:
        (p0, f0), = list(c.render_encoded_stream(
            n_blocks=4, batch_blocks=4, subtype='slac'))
    finally:
        (CompiledPatch.STREAM_CAP_GUESS,
         CompiledPatch.STREAM_CAP_STEP) = saved
    assert np.array_equal(p0, one)


def test_bounce_command_streams_slac(tmp_path):
    from signals_tpu.map.control import Controller
    from signals_tpu.runtime.sndfile import SlacReader

    c = Controller(interactive=False)
    path = tmp_path / 'b.slac'
    for line in ['+ 1a signals.chain.fixed.Fixed enabled=true value=[[330]]',
                 '+ 2a signals.chain.osc.Sine',
                 '> 1a 2a.hertz',
                 'sink 3a default',
                 '> 2a 3a.input',
                 f'bounce 3a {path} 0.5 slac']:
        c.onecmd(line)
    r = SlacReader(path)
    assert r.frames >= int(0.4 * RATE)
    a = r.read(0, r.frames)
    assert np.isfinite(a).all() and np.abs(a).max() > 0.5
    # dominant frequency survives the lossless round trip
    spec = np.abs(np.fft.rfft(a[:, 0] * np.hanning(a.shape[0])))
    freqs = np.fft.rfftfreq(a.shape[0], 1 / RATE)
    assert abs(freqs[spec.argmax()] - 330.0) < 5.0
