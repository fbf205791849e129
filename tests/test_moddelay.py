"""FracDelay (modulated fractional delay): engine parity, comb physics,
vibrato sidebands, clamping, stereo spread.

The node is a stateless context-window read (``moddelay.py``), so it
must agree across the pull oracle, the per-block compiled scan, and the
mega fast path, and behave like a physical delay line: a static delay
``d`` mixed with the dry signal is a comb filter with notches at
``(2k+1)/(2d)``; a swept delay imposes FM sidebands (vibrato).
"""

import numpy as np

import signals_tpu.compiler as C
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.fx import Gain, Mix
from signals_tpu.nodes.moddelay import FracDelay
from signals_tpu.nodes.osc import Sawtooth, Sine
from tests.conftest import fixed, pull_blocks

F, RATE = 512, 44100


def _flanger(d_sec, channels=1):
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    fd = FracDelay()
    fd.get_state().max_delay = 0.01
    fd.input = saw
    fd.delay = fixed(d_sec)
    mx = Mix()
    mx.left = saw
    mx.right = fd
    mx.mix = fixed(0.5)
    return mx


def _render(build, n, *, mega, channels=1):
    root = build()
    c = compile_node(root, block_frames=F, rate=RATE, channels=channels)
    if not mega:
        c.enable_mega = False
    else:
        c.mega_min_channels = 1
    got, _ = c.render(position=0, n_blocks=n, deliver_taps=False)
    C._compile_cache.clear()
    return np.asarray(got).reshape(n * F, channels)


def test_parity_all_paths():
    d = 0.0023
    fast = _render(lambda: _flanger(d), 24, mega=True)
    slow = _render(lambda: _flanger(d), 24, mega=False)
    assert np.abs(fast - slow).max() < 1e-6
    oracle = pull_blocks(_flanger(d), 24, block_frames=F, rate=RATE)
    assert np.abs(fast - oracle).max() < 1e-6


def test_comb_notch_physics():
    # d = 1/440 s: notches at 220*(2k+1) -> the saw's 220 Hz harmonic is
    # killed while 440 Hz (a full cycle of delay) passes at 2x
    d = 1.0 / 440.0
    audio = _render(lambda: _flanger(d), 48, mega=True)[:, 0]
    x = audio[4 * F:]
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / RATE)

    def band(f0, bw=25.0):
        m = (freqs > f0 - bw) & (freqs < f0 + bw)
        return sp[m].max()

    assert band(440.0) > 10 * band(220.0), (band(440.0), band(220.0))


def test_vibrato_sidebands():
    def vib():
        osc = Sine()
        osc.hertz = fixed(440.0)
        lfo = Sine()
        lfo.hertz = fixed(6.0)
        dep = Gain()
        dep.left = lfo
        dep.right = fixed(0.0015)
        off = Mix()
        off.left = dep
        off.right = fixed(0.002)
        off.mix = fixed(0.5)
        fd = FracDelay()
        fd.get_state().max_delay = 0.01
        fd.input = osc
        fd.delay = off
        return fd

    audio = _render(vib, 64, mega=True)[:, 0]
    oracle = pull_blocks(vib(), 64, block_frames=F, rate=RATE)
    assert np.abs(audio[:, None] - oracle).max() < 1e-6
    x = audio[2 * F:]
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / RATE)
    center = sp[(freqs > 435) & (freqs < 445)].max()
    side = sp[((freqs > 445) & (freqs < 465))
              | ((freqs > 415) & (freqs < 435))].max()
    # 6 Hz x ~0.66 ms depth at 440 Hz is deep FM: sidebands rival the
    # carrier; a broken (static) read would leave them ~40 dB down
    assert side > 0.5 * center, (side, center)


def test_delay_clamps_to_max():
    # a requested delay beyond max_delay clamps instead of reading
    # outside the lookback (and stays finite)
    def over():
        osc = Sine()
        osc.hertz = fixed(330.0)
        fd = FracDelay()
        fd.get_state().max_delay = 0.001
        fd.input = osc
        fd.delay = fixed(0.5)            # far beyond max
        return fd

    audio = _render(over, 8, mega=False)
    assert np.isfinite(audio).all()
    oracle = pull_blocks(over(), 8, block_frames=F, rate=RATE)
    assert np.abs(audio - oracle).max() < 1e-6


def test_stereo_spread():
    # a 2-channel delay signal reads each channel at a different offset:
    # the two output channels must differ while each stays a pure
    # delayed copy (cross-correlation peak at its own lag)
    from signals_tpu.nodes.shape import Merge

    lag = 110                            # exact frames between channels

    def spread():
        saw = Sawtooth()
        saw.hertz = fixed(110.0)
        dl = Merge()
        dl.left = fixed(88.0 / RATE)     # integer-frame delays so the
        dl.right = fixed((88.0 + lag) / RATE)   # lag check is exact
        fd = FracDelay()
        fd.get_state().max_delay = 0.01
        fd.input = saw
        fd.delay = dl
        return fd

    audio = _render(spread, 24, mega=True, channels=2)
    oracle = pull_blocks(spread(), 24, block_frames=F, rate=RATE,
                         channels=2)
    assert np.abs(audio - oracle).max() < 1e-6
    l, r = audio[4 * F:, 0], audio[4 * F:, 1]
    assert np.abs(l - r).max() > 0.05
    assert np.abs(l[:-lag] - r[lag:]).max() < 1e-4
