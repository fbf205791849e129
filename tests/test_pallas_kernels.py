"""Pallas TPU kernels, validated in interpreter mode on the CPU backend
(real-hardware timing lives in bench territory)."""

import numpy as np
import pytest
import scipy.signal

from signals_tpu.compiler.filters import design_coupled
from signals_tpu.compiler.pallas_kernels import sosfilt_pallas

NYQ = 22050.0


def _saw(n_frames):
    n = np.arange(n_frames, dtype=np.float32).reshape(-1, 1)
    t = np.mod(n / np.float32(44100) * np.float32(110), np.float32(1))
    return (2 * np.mod(t - 0.5, 1) - 1).astype(np.float32)


@pytest.mark.parametrize('btype,crits', [
    ('lp', [1200.0]),
    ('hp', [500.0]),
    ('bp', [300.0, 3000.0]),
    ('bs', [300.0, 3000.0]),
])
def test_pallas_sosfilt_matches_scipy(btype, crits):
    x = _saw(1124)
    co = design_coupled(np, btype,
                        [np.array([[c]], dtype=np.float32) for c in crits],
                        NYQ)
    y64 = scipy.signal.sosfilt(co[:, 0, :6].astype(np.float64),
                               x[:, 0].astype(np.float64))
    y = np.asarray(sosfilt_pallas(co, x, interpret=True))[:, 0]
    assert np.abs(y - y64).max() <= 1e-5


def test_pallas_sosfilt_multichannel_and_padding():
    # non-multiple-of-8 length, channels needing lane padding
    rng = np.random.default_rng(3)
    x = rng.standard_normal((333, 3)).astype(np.float32)
    cut = np.array([[500.0, 2000.0, 8000.0]], dtype=np.float32)
    co = design_coupled(np, 'lp', [cut], NYQ)
    y = np.asarray(sosfilt_pallas(co, x, interpret=True))
    assert y.shape == (333, 3)
    for c in range(3):
        co1 = design_coupled(np, 'lp',
                             [np.array([[cut[0, c]]], dtype=np.float32)],
                             NYQ)
        y64 = scipy.signal.sosfilt(co1[:, 0, :6].astype(np.float64),
                                   x[:, c].astype(np.float64))
        assert np.abs(y[:, c] - y64).max() <= 1e-5
