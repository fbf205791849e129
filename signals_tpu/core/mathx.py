"""Cross-engine bit-exact transcendentals.

``numpy``'s and XLA's ``sin`` differ by a couple of ulps on the same
float32 inputs (different implementations).  On a plain oscillator that is
inaudible and far inside the 1e-5 parity budget, but FM stacks and
feedback loops *amplify* the divergence: a 2-ulp difference entering a
modulator's phase is multiplied by modulation indices, re-enters through
delay lines, and random-walks over thousands of blocks — the measured
cross-engine error of the FM+delay benchmark config was ~1.1e-5 with
library sines.

:func:`sin2pi` removes the divergence at the source: one polynomial whose
evaluation produces identical bits in both engines.

* Quadrant folding uses only exact f32 ops (Sterbenz subtractions,
  compares) — bit-identical everywhere.
* The Horner chain runs in **float64 and rounds to float32 once**.  A pure
  f32 chain is NOT reproducible: XLA contracts ``mul+add`` into FMAs at
  the LLVM/Mosaic level — straight through ``optimization_barrier``, which
  fences the HLO value but not a re-derived contraction — and the FMA's
  single rounding differs from numpy's two roundings by 1 ulp.  In f64,
  contraction still perturbs f64 ulps, but those vanish at the final f32
  rounding except on exact rounding-boundary ties (probability ~2^-28 per
  sample — none observed over 5e5 random inputs, and a single f32 ulp if
  one ever lands).
* Coefficients are Taylor terms of ``sin(2*pi*y)``, degree 13 —
  truncation ≤ 7e-10 relative on ``|y| <= 1/4``, far below one f32 ulp,
  so accuracy matches library sines (measured ≤ 1.6e-7 absolute vs f64
  ``np.sin``) while bits match across engines.

The f64 arithmetic is ~6 scalar-coefficient ops per sample; on TPU f64 is
emulated but the sine is a negligible slice of patch cost (fusion-boundary
HBM traffic dominates), and the pull engine is numpy-native f64.
"""

from __future__ import annotations

import contextlib
import math

import numpy as np

F32 = np.float32

#: float64 Taylor coefficients of sin(2*pi*y) = y * P(y^2),
#: P(z) = sum_n C[n] * z^n with C[n] = (-1)^n (2*pi)^(2n+1) / (2n+1)!
_SIN2PI_COEFFS = tuple(
    (-1.0) ** n * (2.0 * math.pi) ** (2 * n + 1) / math.factorial(2 * n + 1)
    for n in range(7))


def sin2pi(xp, t, exact=None):
    """``sin(2*pi*t)`` for ``t`` in ``[0, 1)``, bit-identical across
    engines.

    ``xp``: numpy or jax.numpy.  ``exact`` is accepted for interface
    symmetry with other bit-parity helpers and unused (the f64 chain needs
    no fencing).  Inputs outside ``[0, 1)`` must be range-reduced first
    (the oscillators already reduce with ``x - floor(x)``).
    """
    if xp is np:
        guard = contextlib.nullcontext()
    else:
        import jax
        guard = jax.enable_x64(True)
    # fold [0, 1) onto y in [-1/4, 1/4] with sin(2*pi*t) = -sin(2*pi*y):
    # r = t - 1/2 in [-1/2, 1/2); reflect the outer quarters.  All three
    # candidate subtractions are Sterbenz-exact.
    r = t - F32(0.5)
    y = xp.where(r > F32(0.25), F32(0.5) - r,
                 xp.where(r < F32(-0.25), F32(-0.5) - r, r))
    with guard:
        z = (y * y).astype(xp.float64)
        acc = xp.full_like(z, _SIN2PI_COEFFS[-1])
        for c in _SIN2PI_COEFFS[-2::-1]:
            acc = c + z * acc
        p = acc.astype(F32)
    return -(y * p)


def sin2pi_f32(xp, t):
    """``sin2pi`` with the Horner chain in FLOAT32 — for contexts with no
    f64 (Mosaic kernels, :func:`~signals_tpu.compiler.pallas_kernels.
    _seg_kernel_gen`).  NOT bit-identical to :func:`sin2pi` (~1e-7
    absolute) and therefore NOT cross-engine reproducible; safe only
    where a ulp of output error stays a ulp (sine is continuous — unlike
    saw/square wraps).  Same quadrant folding (exact f32 ops), same
    coefficient table: one source of truth for the polynomial."""
    F = xp.float32
    r = t - F32(0.5)
    y = xp.where(r > F32(0.25), F32(0.5) - r,
                 xp.where(r < F32(-0.25), F32(-0.5) - r, r))
    z = y * y
    acc = xp.full_like(z, F(_SIN2PI_COEFFS[-1]))
    for c in _SIN2PI_COEFFS[-2::-1]:
        acc = F(c) + z * acc
    return -(y * acc)


#: float64 Taylor coefficients 1/n! for the deterministic exp kernels
_EXP_COEFFS = tuple(1.0 / math.factorial(n) for n in range(15))
#: fdlibm hi/lo split of ln 2: k * _LN2_HI is exact for |k| < 2^20
_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_LOG2E = 1.4426950408889634074
#: 2^k lookup (exact f64 constants — exp2/pow are libm calls whose
#: rounding varies by backend; a table doesn't)
_POW2_TAB = np.ldexp(np.float64(1.0), np.arange(64))


def tanh_exact(xp, x):
    """``tanh(x)`` for float32 ``x``, bit-identical across engines — the
    :func:`sin2pi` discipline applied to the saturator.

    Library ``tanh`` differs between XLA:TPU and numpy's libm by
    O(1e-7) per call; a feedback loop (saturated tape echo) re-injects
    the difference every pass until it saturates at ~3e-5 — the one
    place the 1e-5 cross-engine parity budget used to need a carve-out
    (``bench.py TOL_NONLINEAR_FB``, retired by this function).

    Construction: everything runs in float64 **arithmetic only** (+ - *
    / floor/where/table-gather — no libm calls whose rounding could
    differ), then rounds to float32 once.

    * ``e = exp(2|x|)`` by Cody-Waite reduction (``k = round(y/ln2)``,
      ``r = y - k ln2`` via the hi/lo split, degree-9 Taylor ``exp(r)``
      — truncation 3.5e-10 relative, DETERMINISTIC and identical on
      both engines, so it never affects cross-engine bits — and exact
      ``2^k`` from a table, NOT ``exp2``, which is a libm call), then
      ``tanh = (e-1)/(e+1)``.  ``e - 1`` is an exact subtraction for
      ``e`` in [1, 2) and harmless above, so the only small-argument
      hazard is the *relative* amplification of f64 contraction noise
      (~2e-16/y) ...
    * ... which the tiny-argument identity retires: ``|x| < 5e-7`` uses
      ``tanh(x) = x`` (true to 4e-20 there) — exact in any engine.
    * ``|x| > 10``: exactly 1.0 (true tanh is within a quarter f32 ulp).

    Remaining f64 FMA contraction / non-correctly-rounded emulated
    division perturb f64 ulps only (relative noise <= 2e-10 at the
    branch floor); those vanish at the final f32 rounding except on
    rounding-boundary ties (~2^-28 per sample — the same measured-zero
    exposure :func:`sin2pi` carries).  Differentiable: the branch
    selectors (floor, where, gather) are locally constant, so gradients
    flow through the rational kernel (``learn`` fits Drive stages).
    Cost: ~30 f64 ops/sample (emulated on TPU; the saturated-echo
    bench measures 1434x realtime vs 2306x with library tanh — the
    price of retiring the 1e-4 parity carve-out, parity 1.79e-7 on
    hardware).
    """
    if xp is np:
        guard = contextlib.nullcontext()
    else:
        import jax
        guard = jax.enable_x64(True)
    with guard:
        f64 = xp.float64
        xd = xp.asarray(x).astype(f64)
        ax = xp.abs(xd)
        sign = xp.where(xd < 0.0, f64(-1.0), f64(1.0))
        y = xp.minimum(2.0 * ax, f64(40.0))

        # e = exp(y) via Cody-Waite + exact 2^k; degree-9 Taylor
        k = xp.floor(y * _LOG2E + 0.5)
        r = (y - k * _LN2_HI) - k * _LN2_LO
        acce = xp.full_like(r, _EXP_COEFFS[9])
        for c in _EXP_COEFFS[8::-1]:
            acce = c + r * acce                    # exp(r)
        ki = xp.clip(k, 0, 63).astype(xp.int32)
        if xp is np:
            pow2 = _POW2_TAB[ki]
        else:
            pow2 = xp.asarray(_POW2_TAB)[ki]
        e = acce * pow2
        t = (e - 1.0) / (e + 1.0)
        t = xp.where(ax < 5e-7, ax, t)
        t = xp.where(ax > 10.0, f64(1.0), t)
        out = (sign * t).astype(F32)
    return out


def cos2pi(xp, t, exact=None):
    """``cos(2*pi*t)`` for ``t`` in ``[0, 1)`` via the quarter-turn shift
    (the shift and re-reduction are exact ops)."""
    s = t + F32(0.25)
    s = s - xp.floor(s)
    return sin2pi(xp, s, exact)
