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
