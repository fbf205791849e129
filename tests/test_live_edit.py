"""Live editing during playback: traced edits apply instantly, structural
edits recompile between batches (the reference's interpreted engine applies
everything instantly; the compiled engine must preserve that UX)."""

import time

import numpy as np

from signals_tpu.nodes.dev import Rack, SinkDevice
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine, Square

from conftest import fixed


def _dominant_freq(x, rate=44100):
    spec = np.abs(np.fft.rfft(x))
    return np.fft.rfftfreq(len(x), 1 / rate)[spec.argmax()]


def test_traced_edit_applies_during_playback():
    rack = Rack()
    rack.scan()
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    sink = SinkDevice(rack.get_sink('null'), block_frames=512,
                      realtime=False)
    sink.get_state().channels = 1
    sink.input = osc
    sink.capture(True)
    sink.start()
    time.sleep(0.4)
    hz.get_state().value = np.array([[1760.0]], dtype=np.float32)
    time.sleep(0.4)
    sink.stop()
    sink.close()
    audio = sink.captured()[:, 0]
    assert len(audio) > 8192
    head = _dominant_freq(audio[:4096])
    tail = _dominant_freq(audio[-4096:])
    assert abs(head - 440.0) < 30, head
    assert abs(tail - 1760.0) < 60, tail


def test_structural_edit_recompiles_during_playback():
    rack = Rack()
    rack.scan()
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(1.0)
    sink = SinkDevice(rack.get_sink('null'), block_frames=512,
                      realtime=False)
    sink.get_state().channels = 1
    sink.input = g
    sink.capture(True)
    sink.start()
    # wait for real pre-edit output (first compile may be slow under load)
    deadline = time.time() + 30
    while time.time() < deadline and sink.captured().shape[0] < 4096:
        time.sleep(0.1)
    assert sink.captured().shape[0] >= 4096
    # structural edit: swap the oscillator feeding the gain
    sq = Square()
    sq.hertz = hz
    g.left = sq
    # poll until the recompiled square shows up in fresh output (the
    # recompile happens between batches; time depends on machine load)
    deadline = time.time() + 20
    while time.time() < deadline:
        time.sleep(0.5)
        tail = sink.captured()[-2048:, 0]
        if len(tail) and (np.abs(tail) > 0.9).mean() > 0.95:
            break
    sink.stop()
    sink.close()
    audio = sink.captured()[:, 0]
    # discriminate waveforms by duty at high level: a square sits at ±1
    # all the time, a sine only near its peaks
    head_duty = float((np.abs(audio[:2048]) > 0.9).mean())
    tail_duty = float((np.abs(audio[-2048:]) > 0.9).mean())
    assert head_duty < 0.5, head_duty
    assert tail_duty > 0.95, tail_duty
    assert sink._transport is None or sink._transport.error is None


def test_structural_edit_keeps_audio_continuous():
    """The async compile-and-swap (round 5): during the recompile a
    structural edit triggers, the OLD program keeps rendering — blocks
    keep flowing (no compile-long stall) and the captured audio has no
    silent gap; the new structure lands one batch after its background
    warmup completes (``Transport._swap_async``)."""
    rack = Rack()
    rack.scan()
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(1.0)
    sink = SinkDevice(rack.get_sink('null'), block_frames=512,
                      realtime=False)
    sink.get_state().channels = 1
    sink.input = g
    sink.capture(True)
    sink.start()
    tr = sink._transport
    deadline = time.time() + 30
    while time.time() < deadline and tr.position < 16 * 512:
        time.sleep(0.05)
    pos0 = tr.position
    sq = Square()
    sq.hertz = hz
    t0 = time.monotonic()
    g.left = sq                       # structural: triggers a recompile
    deadline = time.time() + 60
    while time.time() < deadline:
        ts = tr.last_swap_time
        if ts is not None and ts >= t0:
            break
        time.sleep(0.02)
    assert tr.last_swap_time is not None, 'swap never landed'
    blocks_during = (tr.position - pos0) // 512
    sink.stop()
    sink.close()
    assert tr.error is None
    # continuity: the old program kept rendering while the new compiled
    assert blocks_during >= 1, blocks_during
    audio = sink.captured()[:, 0]
    # no silent gap anywhere after startup: both waveforms are loud, so
    # every 512-sample window must carry energy
    w = audio[512:len(audio) // 512 * 512].reshape(-1, 512)
    rms = np.sqrt((w ** 2).mean(axis=1))
    assert w.shape[0] > 4
    assert rms.min() > 0.05, float(rms.min())
    # and the edit did land (square duty at the tail)
    tail_duty = float((np.abs(audio[-2048:]) > 0.9).mean())
    assert tail_duty > 0.95, tail_duty


def test_echo_tail_survives_traced_mute():
    """Carry continuity across a traced edit: muting an echo patch's
    source between batches must leave the delay line ringing (the tail
    repeats at the loop gain) — a carry reset here would cut the echo
    dead, which the reference's interpreted engine would never do."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Mix

    F, RATE = 512, 44100
    osc = Sine()
    osc.hertz = fixed(330.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = 4 * F
    fb = Gain()
    fb.left = d
    fb.right = fixed(0.9)
    mix.left = osc
    mix.right = fb
    mix.mix = fixed(0.5)
    d.input = mix
    c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
    _, carry = c.render(position=0, n_blocks=16, deliver_taps=False)
    osc.get_state().enabled = False       # traced edit: no recompile
    b, _ = c.render(position=16 * F, n_blocks=16, carry=carry,
                    deliver_taps=False)
    b = np.asarray(b).ravel()
    assert np.isfinite(b).all()
    early = np.abs(b[:4 * F]).max()       # first delay period after mute
    late = np.abs(b[-4 * F:]).max()       # ~3 loop trips later
    assert early > 0.1, 'echo tail was cut by the edit'
    assert late < early * 0.2, 'tail failed to decay at the loop gain'
    C._compile_cache.clear()
