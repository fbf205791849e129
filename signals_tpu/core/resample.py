"""Sample-rate conversion: windowed-sinc interpolation.

The reference has no resampler at all — ``FileReader`` hands the file's
raw frames to whatever engine rate the patch runs at
(``src/signals/chain/files.py:70-86``), so a 48 kHz file in a 44.1 kHz
patch plays ~8.8% slow and flat.  A production framework needs the real
thing: :func:`resample` converts between arbitrary rates with a
Kaiser-windowed sinc kernel (the textbook bandlimited-interpolation
formulation, e.g. Smith's resample algorithm), used by

* :class:`signals_tpu.nodes.files.FileReader` (``conform_rate=True``)
  to play any-rate files pitch-correct at the engine rate, and
* the ``fit`` command to accept target audio at any rate.

Formulation (vectorized, stateless, seek-stable): output sample ``k``
lives at input-time ``t[k] = k * sr_in / sr_out``; it gathers ``taps``
input samples around ``floor(t[k])`` and dots them with
``c * sinc(c * (j - frac))`` windowed by a Kaiser window, where
``c = min(1, sr_out / sr_in)`` lowpasses at the OUTPUT Nyquist when
downsampling (anti-aliasing).  Weights are normalized per output sample
so DC is exactly preserved at every fractional phase.  Everything is a
pure function of the absolute output position — no carried state — so
any block of output can be produced independently (the property
``FileReader`` needs for seek-stable block rendering).

Quality at the default ``taps=32, beta=9.0``: alias/image rejection
measured < -75 dB on full-scale sines (``tests/test_resample.py``),
passband ripple < 0.01 dB below 0.4 Nyquist.  ``taps=64`` buys ~-90 dB
where mastering-grade conversion matters.

numpy formulation (host-side consumers); the same gather+dot maps
directly to ``jnp.take`` + einsum if a device-side rate converter is
ever needed.
"""

from __future__ import annotations

import numpy as np


def _kaiser(x, half_width: float, beta: float) -> np.ndarray:
    """Kaiser window evaluated at CONTINUOUS offsets ``x`` (in taps)
    from the kernel center, zero outside ``|x| >= half_width``."""
    r = x / half_width
    inside = np.abs(r) < 1.0
    # np.i0 overflows silently for big beta*...: clamp argument domain
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - r * r))
    return np.where(inside, np.i0(arg) / np.i0(beta), 0.0)


def sinc_interpolate(x: np.ndarray, positions: np.ndarray, *,
                     cutoff: float = 1.0, taps: int = 32,
                     beta: float = 9.0) -> np.ndarray:
    """Bandlimited interpolation of ``x (frames, ch)`` at fractional
    sample ``positions (n,)``.  Out-of-range taps read as zero (matches
    ``FileReader``'s zero-fill contract for out-of-range frames).

    ``cutoff`` in (0, 1]: kernel lowpass as a fraction of the INPUT
    Nyquist — pass ``min(1, sr_out/sr_in)`` when resampling.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    frames = x.shape[0]
    half = taps // 2
    base = np.floor(positions).astype(np.int64)
    frac = positions - base                                   # (n,)
    j = np.arange(-half + 1, half + 1, dtype=np.int64)        # (taps,)
    offs = j[None, :] - frac[:, None]                         # (n, taps)
    w = cutoff * np.sinc(cutoff * offs) * _kaiser(offs, half, beta)
    # normalize: windowed sinc sums to ~1 but not exactly at every
    # fractional phase; exact normalization keeps DC flat to f64 eps
    w /= w.sum(axis=1, keepdims=True)
    idx = base[:, None] + j[None, :]                          # (n, taps)
    valid = (idx >= 0) & (idx < frames)
    gathered = x[np.clip(idx, 0, max(frames - 1, 0))]         # (n, taps, ch)
    gathered = np.where(valid[:, :, None], gathered, 0.0)
    return np.einsum('ntc,nt->nc', gathered, w)


def resample(x: np.ndarray, sr_in: int, sr_out: int, *,
             taps: int = 32, beta: float = 9.0,
             chunk: int = 1 << 16) -> np.ndarray:
    """Convert ``x`` from ``sr_in`` to ``sr_out``; returns
    ``(round(frames * sr_out / sr_in), ch)`` float32 (or 1-D if ``x``
    was 1-D).  Identity rates return ``x`` unchanged.  Work is chunked
    so long files never materialize the full ``(n, taps, ch)`` gather.
    """
    x = np.asarray(x)
    if sr_in == sr_out:
        return x
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f'rates must be positive: {sr_in} -> {sr_out}')
    mono = x.ndim == 1
    frames = x.shape[0]
    n_out = int(round(frames * sr_out / sr_in))
    ratio = sr_in / sr_out
    cutoff = min(1.0, sr_out / sr_in)
    out = np.empty((n_out, 1 if mono else x.shape[1]), dtype=np.float32)
    for start in range(0, n_out, chunk):
        stop = min(start + chunk, n_out)
        pos = np.arange(start, stop, dtype=np.float64) * ratio
        out[start:stop] = sinc_interpolate(
            x, pos, cutoff=cutoff, taps=taps, beta=beta)
    return out[:, 0] if mono else out
