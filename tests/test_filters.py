"""Filter design & execution vs scipy (the reference's implementation,
``src/signals/chain/fx.py:99-121``)."""

import numpy as np
import pytest
import scipy.signal

from signals_tpu.compiler.filters import (
    BANDPASS,
    BANDSTOP,
    HIGHPASS,
    LOWPASS,
    design_sos,
    sosfilt_scan,
)

RATE = 44100
NYQ = RATE / 2


def _impulse_response(sos, n=512):
    x = np.zeros(n)
    x[0] = 1.0
    return scipy.signal.sosfilt(np.asarray(sos, dtype=np.float64), x)


@pytest.mark.parametrize('cutoff', [50.0, 440.0, 2000.0, 8000.0, 18000.0])
@pytest.mark.parametrize('btype,scipy_btype', [(LOWPASS, 'lp'),
                                               (HIGHPASS, 'hp')])
def test_design_matches_scipy_single(btype, scipy_btype, cutoff):
    mine = np.asarray(design_sos(np, btype,
                                 [np.array([[cutoff]], dtype=np.float32)],
                                 NYQ), dtype=np.float64)
    ref = scipy.signal.butter(2, cutoff / NYQ, scipy_btype, output='sos')
    assert mine.shape == (1, 1, 6)
    np.testing.assert_allclose(mine[:, 0, :], ref, atol=2e-6)


@pytest.mark.parametrize('lo,hi', [(100.0, 300.0), (440.0, 2000.0),
                                   (2000.0, 12000.0)])
@pytest.mark.parametrize('btype,scipy_btype', [(BANDPASS, 'bp'),
                                               (BANDSTOP, 'bs')])
def test_design_matches_scipy_band(btype, scipy_btype, lo, hi):
    mine = design_sos(np, btype,
                      [np.array([[lo]], dtype=np.float32),
                       np.array([[hi]], dtype=np.float32)], NYQ)
    ref = scipy.signal.butter(2, [lo / NYQ, hi / NYQ], scipy_btype,
                              output='sos')
    assert mine.shape == (2, 1, 6)
    # section factorization may legitimately differ; compare responses
    np.testing.assert_allclose(_impulse_response(mine[:, 0, :]),
                               _impulse_response(ref), atol=1e-5)


def test_design_vectorized_over_channels():
    cut = np.array([[200.0, 2000.0, 9000.0]], dtype=np.float32)
    batch = np.asarray(design_sos(np, LOWPASS, [cut], NYQ))
    for i, c in enumerate(cut[0]):
        single = np.asarray(design_sos(
            np, LOWPASS, [np.array([[c]], dtype=np.float32)], NYQ))
        np.testing.assert_allclose(batch[:, i, :], single[:, 0, :],
                                   atol=1e-7)


def test_out_of_band_cutoffs_stay_finite():
    # the reference crashes here (scipy rejects Wn outside (0,1))
    for cutoff in (0.0, -5.0, NYQ, RATE):
        sos = np.asarray(design_sos(
            np, LOWPASS, [np.array([[cutoff]], dtype=np.float32)], NYQ))
        assert np.all(np.isfinite(sos))


@pytest.mark.parametrize('btype,crits', [
    (LOWPASS, [1200.0]),
    (HIGHPASS, [500.0]),
    (BANDPASS, [400.0, 3000.0]),
    (BANDSTOP, [400.0, 3000.0]),
])
def test_scan_matches_scipy_sosfilt(btype, crits):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((2048, 2)).astype(np.float32)
    coeffs = design_sos(np, btype,
                        [np.array([[c]], dtype=np.float32) for c in crits],
                        NYQ)
    y_scan = np.asarray(sosfilt_scan(coeffs, x))
    for c in range(2):
        y_ref = scipy.signal.sosfilt(
            np.asarray(coeffs[:, 0, :], dtype=np.float64),
            x[:, c].astype(np.float64))
        np.testing.assert_allclose(y_scan[:, c], y_ref, atol=1e-4)


def test_scan_zero_initial_state():
    coeffs = design_sos(np, LOWPASS,
                        [np.array([[1000.0]], dtype=np.float32)], NYQ)
    y = np.asarray(sosfilt_scan(coeffs, np.zeros((64, 1), dtype=np.float32)))
    assert np.all(y == 0)


def test_streaming_filter_mega_window_is_loop_free_and_exact():
    """streaming=true single-section filters render whole mega windows
    without a block scan: per-block zero-state filtering + an associative
    affine state scan + closed-form initial-state correction.  Must equal
    the per-block scan path (and therefore the pull engine) exactly."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.fx import LowPass
    from signals_tpu.nodes.osc import Sawtooth
    from tests.conftest import fixed, pull_blocks

    F = 512

    def build(streaming=True):
        saw = Sawtooth()
        saw.hertz = fixed(55.0)
        lp = LowPass()
        lp.input = saw
        lp.cutoff = fixed(60.0)          # the streaming-mode regime
        lp.get_state().streaming = streaming
        return lp

    C._compile_cache.clear()
    scan_c = compile_node(build(), block_frames=F, rate=44100, channels=1)
    scan_c.enable_mega = False           # force the per-block scan path
    ref, ref_carry = scan_c.render(n_blocks=24)

    C._compile_cache.clear()
    mega_c = compile_node(build(), block_frames=F, rate=44100, channels=1)
    mega_c.mega_min_channels = 1
    assert mega_c.mega_compatible and mega_c._use_mega
    got, carry = mega_c.render(n_blocks=24)
    assert np.abs(got - ref).max() <= 1e-5

    # carried state round-trips across mega renders (resume equivalence)
    a, c1 = mega_c.render(n_blocks=12)
    b, _ = mega_c.render(position=12 * F, n_blocks=12, carry=c1)
    joined = np.concatenate([a, b])
    assert np.abs(joined - got).max() <= 1e-5

    # and it matches whole-signal float64 filtering with scipy's own f64
    # design (f32-rounded coefficients shift a 60 Hz pole by ~1e-4, and
    # the pull engine's scipy f32 state accumulates similar error — the
    # very reasons coupled-form streaming exists)
    import scipy.signal
    saw = pull_blocks(build().input.sig, 24, block_frames=F, channels=1)
    sos = scipy.signal.butter(2, 60.0 / 22050.0, 'low', output='sos')
    truth = scipy.signal.sosfilt(sos, saw[:, 0].astype(np.float64))
    assert np.abs(got[:, 0] - truth).max() <= 1e-5


def test_streaming_band_filter_mega_matches_scan():
    """Two-section streaming filters render mega windows loop-free too:
    each section's map is affine in its own state, so the single-section
    algorithm cascades (section 2 consumes section 1's corrected
    output).  Mega must equal the forced per-block scan and scipy's
    float64 ground truth."""
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.fx import BandPass
    from tests.conftest import fixed, pull_blocks
    import signals_tpu.compiler as C

    def build():
        bp = BandPass()
        bp.input = Sawtooth_src()
        bp.low = fixed(80.0)
        bp.high = fixed(500.0)
        bp.get_state().streaming = True
        return bp

    C._compile_cache.clear()
    c = compile_node(build(), block_frames=512, rate=44100, channels=1)
    assert c.mega_compatible and c._use_mega
    got, carry = c.render(n_blocks=10)
    C._compile_cache.clear()
    c2 = compile_node(build(), block_frames=512, rate=44100, channels=1)
    c2.enable_mega = False
    ref, _ = c2.render(n_blocks=10)
    assert np.abs(got - ref).max() <= 1e-5

    saw_sig = pull_blocks(Sawtooth_src(), 10, block_frames=512, channels=1)
    import scipy.signal
    sos = scipy.signal.butter(2, [80.0 / 22050.0, 500.0 / 22050.0],
                              'bandpass', output='sos')
    truth = scipy.signal.sosfilt(sos, saw_sig[:, 0].astype(np.float64))
    assert np.abs(got[:, 0] - truth).max() <= 2e-5

    # carried two-section state round-trips (resume equivalence)
    a, c1 = c.render(n_blocks=5)
    b, _ = c.render(position=5 * 512, n_blocks=5, carry=c1)
    assert np.abs(np.concatenate([a, b]) - got).max() <= 1e-5
    C._compile_cache.clear()


def Sawtooth_src():
    from signals_tpu.nodes.osc import Sawtooth
    from tests.conftest import fixed
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    return saw


def test_streaming_filter_with_downstream_consumer_renders():
    """A streaming filter whose output is consumed at a non-main window
    (a nested context-pulling filter here) stays mega-compatible: the
    consumer's lookback is served from the filter's ``hist`` carry ring.
    (Before round 3 this demoted the patch to the per-block scan; before
    that it crashed at trace.)  Mega must agree with the per-block scan
    — the pull oracle differs by the documented nested-filter
    cross-engine bound, not by the window serving."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.fx import HighPass, LowPass
    from signals_tpu.nodes.osc import Sawtooth
    from tests.conftest import fixed

    def build():
        saw = Sawtooth()
        saw.hertz = fixed(110.0)
        lp = LowPass()
        lp.input = saw
        lp.cutoff = fixed(90.0)
        lp.get_state().streaming = True
        hp = HighPass()
        hp.input = lp
        hp.cutoff = fixed(40.0)
        return hp

    C._compile_cache.clear()
    c = compile_node(build(), block_frames=512, rate=44100, channels=1)
    c.mega_min_channels = 1
    assert c.mega_compatible
    audio, _ = c.render(n_blocks=6)
    assert np.isfinite(audio).all()
    C._compile_cache.clear()
    c2 = compile_node(build(), block_frames=512, rate=44100, channels=1)
    c2.enable_mega = False
    ref, _ = c2.render(n_blocks=6)
    C._compile_cache.clear()
    assert np.abs(np.asarray(audio) - np.asarray(ref)).max() < 1e-6
