"""RBJ parametric-EQ family (Peak/Notch/Allpass/LowShelf/HighShelf).

No reference counterpart (the reference's only filters are the four
Butterworth types, ``src/signals/chain/fx.py:142-163``) — so these tests
pin the design to *physics* (center gain, asymptotes, unit allpass
magnitude), to scipy's independent RBJ implementation where one exists
(``iirnotch``), and to the engine-parity discipline every node obeys.
"""

import numpy as np
import pytest
import scipy.signal

from signals_tpu.compiler.filters import (
    ALLPASS,
    HIGHSHELF,
    LOWSHELF,
    NOTCH,
    PEAK,
    design_coupled,
    design_sos,
    sosfilt_scan,
)
from signals_tpu.nodes.fx import Allpass, HighShelf, LowShelf, Mix, Notch, Peak
from signals_tpu.nodes.osc import Sawtooth, Sine

from conftest import fixed, pull_blocks

RATE = 44100
NYQ = RATE / 2.0
F = 512
TOL = 1e-5


def _mag(sos, f_hz):
    """|H(e^jw)| of the designed (single) section, evaluated in f64."""
    s = np.asarray(sos, np.float64)
    b0, b1, b2, _, a1, a2 = (s[0, 0, i] for i in range(6))
    z = np.exp(-1j * np.pi * f_hz / NYQ)
    return abs((b0 + b1 * z + b2 * z * z) / (1.0 + a1 * z + a2 * z * z))


def _design(btype, *crits):
    return design_sos(np, btype, tuple(np.array([[c]]) for c in crits), NYQ)


@pytest.mark.parametrize('gain_db', [-18.0, -6.0, 6.0, 18.0])
def test_peak_center_gain_and_far_unity(gain_db):
    sos = _design(PEAK, 1000.0, gain_db, 2.0)
    want = 10.0 ** (gain_db / 20.0)
    assert abs(_mag(sos, 1000.0) - want) <= 2e-3 * want
    # two decades away the bell is gone
    assert abs(_mag(sos, 40.0) - 1.0) <= 2e-2
    assert abs(_mag(sos, 16000.0) - 1.0) <= 2e-2


def test_notch_null_and_bandwidth():
    """Exact zero at the center; -3 dB points at f0 ± f0/(2Q) — the RBJ
    Q definition.  (scipy.signal.iirnotch is *close* but parameterizes
    bandwidth as tan(w0/2Q) vs RBJ's sin(w0)/2Q, so coefficients are not
    comparable beyond ~1e-5; the response physics is the real spec.)"""
    for f0, q in [(440.0, 5.0), (1000.0, 30.0)]:
        sos = _design(NOTCH, f0, q)
        assert _mag(sos, f0) <= 1e-4, (f0, q)
        for edge in (f0 - f0 / (2 * q), f0 + f0 / (2 * q)):
            assert abs(_mag(sos, edge) - 2.0 ** -0.5) <= 0.03, (f0, q)


def test_allpass_unit_magnitude():
    sos = _design(ALLPASS, 700.0, 1.3)
    for f in [20.0, 100.0, 700.0, 3000.0, 15000.0, 21000.0]:
        assert abs(_mag(sos, f) - 1.0) <= 1e-6, f


@pytest.mark.parametrize('btype,low_gain,high_gain', [
    (LOWSHELF, -9.0, 0.0),
    (LOWSHELF, 9.0, 0.0),
    (HIGHSHELF, 0.0, -9.0),
    (HIGHSHELF, 0.0, 9.0),
])
def test_shelf_asymptotes(btype, low_gain, high_gain):
    g = low_gain if btype == LOWSHELF else high_gain
    sos = _design(btype, 800.0, g, 0.0)        # q=0 -> default slope
    want_low = 10.0 ** (low_gain / 20.0)
    want_high = 10.0 ** (high_gain / 20.0)
    assert abs(_mag(sos, 20.0) - want_low) <= 2e-2 * max(want_low, 1.0)
    assert abs(_mag(sos, 18000.0) - want_high) <= 2e-2 * max(want_high, 1.0)
    # corner sits between the asymptotes (half-gain point, dB-wise)
    mid = 10.0 ** ((low_gain + high_gain) / 40.0)
    assert abs(_mag(sos, 800.0) - mid) <= 5e-2 * max(mid, 1.0)


def test_q_nonpositive_means_default():
    a = _design(PEAK, 1000.0, 6.0, 0.0)
    b = _design(PEAK, 1000.0, 6.0, 0.7071067811865476)
    assert np.array_equal(a, b)
    c = _design(PEAK, 1000.0, 6.0, -3.0)
    assert np.array_equal(a, c)


def test_real_pole_region_is_clipped_finite_and_stable():
    """A deep low-Q cut has real poles — outside the coupled-form domain.
    The design clips to the nearest complex pair: coefficients stay
    finite, the filter stays stable (impulse response decays), and the
    scan kernel produces finite output."""
    co = design_coupled(np, PEAK,
                        (np.array([[1000.0]]), np.array([[-24.0]]),
                         np.array([[0.06]])), NYQ)
    assert np.all(np.isfinite(co))
    sos64 = np.asarray(co[..., :6], np.float64).reshape(1, 6)
    x = np.zeros(4096)
    x[0] = 1.0
    h = scipy.signal.sosfilt(sos64, x)
    assert np.all(np.isfinite(h))
    assert np.abs(h[-256:]).max() < 1e-3        # decayed -> stable
    y = sosfilt_scan(co, np.random.default_rng(0)
                     .standard_normal((2048, 1)).astype(np.float32))
    assert np.all(np.isfinite(np.asarray(y)))


def _parity(node, n_blocks=12, tol=TOL, channels=1):
    from signals_tpu.compiler import compile_node
    compiled = compile_node(node, block_frames=F, rate=RATE,
                            channels=channels)
    audio, _ = compiled.render(position=0, n_blocks=n_blocks)
    oracle = pull_blocks(node, n_blocks, block_frames=F, rate=RATE,
                         channels=channels)
    err = np.abs(np.asarray(audio) - oracle).max()
    assert err <= tol, f'engines diverge: {err}'
    return np.asarray(audio)


def _saw(hz=220.0):
    saw = Sawtooth()
    saw.hertz = fixed(hz)
    return saw


@pytest.mark.parametrize('mk', [
    lambda: _eq(Peak, freq=660.0, gain=9.0, q=2.0),
    lambda: _eq(Notch, freq=440.0, q=4.0),
    lambda: _eq(Allpass, freq=700.0, q=1.0),
    lambda: _eq(LowShelf, freq=500.0, gain=-12.0),
    lambda: _eq(HighShelf, freq=2000.0, gain=6.0, q=1.0),
])
def test_eq_engine_parity(mk):
    _parity(mk())


def _eq(cls, freq, q=None, gain=None):
    node = cls()
    node.input = _saw()
    node.freq = fixed(freq)
    if q is not None:
        node.q = fixed(q)
    if gain is not None:
        node.gain = fixed(gain)
    return node


@pytest.mark.parametrize('q,tol', [(8.0, 1e-4), (16.0, 2.5e-4)])
def test_eq_high_q_parity_scales_with_resonance(q, tol):
    """Resonance amplifies f32 recurrence rounding vs the f64 oracle:
    error grows ~Q², flat in render length (windows are self-contained).
    Pinned so a regression past rounding noise (state leak, wrong
    handoff) still fails loudly."""
    node = _eq(Notch, freq=440.0, q=q)
    _parity(node, tol=tol)


def test_peak_boost_is_audible_in_spectrum():
    """Golden: +12 dB bell on the saw's 2nd harmonic roughly quadruples
    h2/h1 (natural 1/2 -> ~2) while leaving h3 alone."""
    # +12 dB at q=4 raises the resonant gain — parity at the documented
    # high-Q tolerance, spectrum shape is the assertion that matters here
    audio = _parity(_eq(Peak, freq=440.0, gain=12.0, q=4.0), n_blocks=24,
                    tol=1e-4)
    n = len(audio)
    spec = np.abs(np.fft.rfft(audio[:, 0] * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, 1.0 / RATE)

    def mag(f):
        i = int(np.argmin(np.abs(freqs - f)))
        return spec[max(0, i - 3):i + 4].max()

    h1, h2, h3 = mag(220.0), mag(440.0), mag(660.0)
    assert 1.2 <= h2 / h1 <= 2.6, h2 / h1
    assert h3 / h1 < 0.5, h3 / h1


def test_eq_streaming_mega_matches_block_scan():
    """streaming=true EQ rides the loop-free mega path (the design is
    type-agnostic: per-block coefficients in, affine state scan out);
    must equal the per-block scan, with the center frequency modulated
    per block by an LFO."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node

    def build(streaming=True):
        lfo = Sine()
        lfo.hertz = fixed(0.7)
        sweep = Mix()
        sweep.left = lfo
        sweep.right = fixed(900.0)
        sweep.mix = fixed(0.1)           # freq = 90*lfo + 810
        pk = Peak()
        pk.input = _saw(110.0)
        pk.freq = sweep
        pk.gain = fixed(9.0)
        pk.q = fixed(3.0)
        pk.get_state().streaming = True
        return pk

    C._compile_cache.clear()
    scan_c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    scan_c.enable_mega = False
    ref, _ = scan_c.render(n_blocks=24)

    C._compile_cache.clear()
    mega_c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    mega_c.mega_min_channels = 1
    assert mega_c.mega_compatible and mega_c._use_mega
    got, carry = mega_c.render(n_blocks=24)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() <= TOL

    # resume equivalence through the carried coupled-form state
    a, c1 = mega_c.render(n_blocks=12)
    b, _ = mega_c.render(position=12 * F, n_blocks=12, carry=c1)
    joined = np.concatenate([np.asarray(a), np.asarray(b)])
    assert np.abs(joined - np.asarray(got)).max() <= TOL
