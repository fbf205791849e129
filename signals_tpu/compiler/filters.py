"""Butterworth filter design and IIR execution, TPU-native.

The reference designs order-2 Butterworth sections with
``scipy.signal.butter(output='sos')`` and runs them with ``sosfilt``
(``src/signals/chain/fx.py:99-121``).  Neither is traceable or
TPU-executable, and — critically — the cutoff is a *signal* (sampled per
block), so coefficients must be computed **inside** the compiled program from
traced values.

This module provides:

* :func:`design_sos` — closed-form bilinear-transform Butterworth design for
  N=2 low/high/band-pass/stop, written against a generic array namespace
  (numpy or jax.numpy).  Matches ``scipy.signal.butter`` to float32 machine
  precision (verified in ``tests/test_filters.py``); band types use explicit
  real-arithmetic complex math so no complex dtype is needed on TPU.
  Internal math runs in float64 in *both* engines (a handful of scalars per
  block per channel — trivially cheap even with TPU f64 emulation) so the
  float32-rounded coefficients are bit-identical across engines regardless
  of backend FMA-contraction behavior; IIR feedback would amplify a 1-ulp
  coefficient difference far beyond the 1e-5 parity budget.
* :func:`sosfilt_scan` — the cascade as a blockwise-parallel linear
  recurrence: each biquad (transposed direct form II) is a 2-state linear
  system ``z[n] = A z[n-1] + B x[n]``; with per-block-constant A this is
  evaluated in O(log n) depth via ``jax.lax.associative_scan`` on the VPU —
  no sequential per-frame loop on the device.
"""

from __future__ import annotations

import contextlib
import contextvars
import math

import numpy as np

F32 = np.float32

#: filter type codes — Butterworth (reference ``fx.py:124-163``) ...
LOWPASS, HIGHPASS, BANDPASS, BANDSTOP = 'lp', 'hp', 'bp', 'bs'
#: ... and the RBJ cookbook EQ biquads (no reference counterpart): peaking
#: EQ, notch, allpass, low/high shelf.  Same SOS/coupled-form contract as
#: the Butterworth codes, so every execution path (context windows,
#: streaming scan, mega windows, the packed Pallas cascade) runs them
#: unchanged.
PEAK, NOTCH, ALLPASS, LOWSHELF, HIGHSHELF = 'pk', 'nt', 'ap', 'ls', 'hs'

#: EQ types taking a gain crit (freq, gain_db, q); the others take (freq, q)
_EQ_GAIN_TYPES = (PEAK, LOWSHELF, HIGHSHELF)
_EQ_TYPES = _EQ_GAIN_TYPES + (NOTCH, ALLPASS)

_WN_MIN = 1e-5
_WN_MAX = 1.0 - 1e-5

#: EQ parameter domains.  ``q <= 0`` (e.g. an unconnected ``q`` port, which
#: reads as silence/zero) means "default Q" = 1/sqrt(2), the Butterworth-
#: slope choice.  Gain is clipped to ±40 dB (A in [0.1, 10] at the
#: ``10^(g/40)`` convention).
_Q_DEFAULT = 0.7071067811865476
_Q_MIN = 0.05
_Q_MAX = 40.0
_GAIN_DB_MAX = 40.0

#: IIR execution strategy for the compiled engine: 'assoc' (associative
#: scan), 'chunked' (state-space chunk scan), or 'pallas' (VMEM-resident
#: Pallas kernel — see :mod:`signals_tpu.compiler.pallas_kernels`).
#: Module-level so deployments can switch without code changes.
FILTER_IMPL = 'assoc'
CHUNK_FRAMES = 16

#: how mega-window filter batches execute: 'vmap' (associative scan per
#: block), 'pallas' (the batched VMEM-resident kernel,
#: :func:`signals_tpu.compiler.pallas_kernels.sosfilt_batch`), or 'auto'
#: (pallas on TPU — measured 10x the scan there — vmap elsewhere, where
#: Mosaic kernels would run interpreted)
MEGA_FILTER_IMPL = 'auto'

#: generator-fed cascade: when a packed filter family's input is a
#: plain oscillator (Sine/Saw/Square/Triangle) driven by ``Fixed``
#: controls, synthesize it INSIDE the segment kernel from iota +
#: per-lane params
#: (:func:`signals_tpu.compiler.pallas_kernels.sosfilt_segments_gen`) —
#: the packed input timeline is then never written to HBM nor DMA-read
#: back.  Participates in the graph hash, so flipping it compiles (and
#: caches) separate programs.  'auto' = on where the Pallas kernels run
#: compiled (TPU) — measured 6912x vs 4478x realtime on the 64-voice
#: device-resident bench (v5e, BENCH_full.json c4h vs c4g); eligibility
#: is probed per patch, so ineligible inputs take the lowered-producer
#: path unchanged.  Set False to force the lowered producers everywhere.
SEG_SOURCE_GEN = 'auto'

#: multi-block kernel segments: how many consecutive blocks one packed
#: cascade segment covers, carrying filter state across the blocks and
#: replaying the ``context`` warmup once per SEGMENT instead of once per
#: block.  With the default context == block_frames == 1024, per-block
#: segments spend HALF of every kernel's time replaying context; ``m``
#: blocks/segment cut the per-frame work from ``(C+F)/F`` to
#: ``(C+m*F)/(m*F)``.  For filters whose crit inputs are all
#: ``Fixed``/unconnected (:meth:`~signals_tpu.nodes.fx.CritFilter.
#: crits_static`) the carry is an invisible optimization: with
#: per-block-identical coefficients the carried state differs from the
#: replayed state only by the filter's response beyond the context
#: window, which flushes to zero in f32 —
#: measured BIT-IDENTICAL output (max abs diff 0.0 at context=512,
#: 2 kHz cutoff).  For SWEPT crits (round 5) the carry is *product
#: semantics*: state carries across the segment with per-block
#: coefficients (the kernels' ``blocks_per_seg`` mode), segments
#: aligned to absolute multiples of ``m *`` :data:`CARRY_GRID_FRAMES`,
#: and the numpy pull oracle replays the identical segmentation — see
#: :meth:`~signals_tpu.nodes.fx.CritFilter.swept_carry_m` for the
#: contract (``CritFilter.State.carry = 1`` restores reference-style
#: per-block replay).  'auto' = 8 (participates in the graph hash, so
#: flipping it compiles separate programs); 1 restores per-block
#: segments everywhere.
SEG_CARRY_BLOCKS = 'auto'


def resolve_seg_carry_blocks() -> int:
    if SEG_CARRY_BLOCKS == 'auto':
        return 8
    return max(1, int(SEG_CARRY_BLOCKS))


#: the block grid SWEPT-filter carry segments are defined on (the product
#: default block size).  Segment-carried filtering for swept crits is a
#: *semantic* feature — the numpy pull oracle and every compiled path
#: must agree on where segment boundaries fall — so the grid is a product
#: constant, not an engine parameter: carry engages only when the engine
#: block size (compiled) / the request block size (oracle) equals this.
#: Patches compiled at other block sizes keep per-block replay.
CARRY_GRID_FRAMES = 1024


def resolve_mega_impl() -> str:
    if MEGA_FILTER_IMPL == 'auto':
        return 'pallas' if default_backend() == 'tpu' else 'vmap'
    return MEGA_FILTER_IMPL


def resolve_seg_source_gen() -> bool:
    if SEG_SOURCE_GEN == 'auto':
        return default_backend() == 'tpu'
    return bool(SEG_SOURCE_GEN)


#: the platform compiled programs are PLANNED for: 'auto' consults
#: ``jax.default_backend()``; 'cpu'/'tpu' pin it.  Plan selection
#: (mega impl, generator kernel, mix epilogue) and the kernels'
#: interpret-mode defaults must follow the devices a program will RUN
#: on, not the process default — a virtual CPU validation mesh inside
#: a TPU process would otherwise get non-interpret Mosaic kernels and
#: die with "Only interpret mode is supported on CPU backend"
#: (observed: ``dryrun_multichip`` after the axon backend was already
#: initialized).  :class:`~signals_tpu.parallel.PolyPatch` pins this to
#: its mesh's platform around compile and trace.  A ``ContextVar`` so
#: the pin is per-thread/per-context: a CPU-mesh render entering the
#: pin on one thread must not leak CPU plans into a TPU patch being
#: first-traced concurrently on another (e.g. the realtime transport
#: thread).
_PLATFORM = contextvars.ContextVar('signals_tpu_platform', default='auto')


@contextlib.contextmanager
def platform_override(platform: str):
    """Pin the planning platform for the duration (compile/trace scope
    in the CURRENT thread/context)."""
    token = _PLATFORM.set(platform)
    try:
        yield
    finally:
        _PLATFORM.reset(token)


def default_backend() -> str:
    """The platform plan selection targets: the :func:`platform_override`
    pin when set, else ``jax.default_backend()`` — guarded against
    flaky accelerator plugins (the axon TPU plugin sometimes fails to
    initialize in fresh subprocesses — backend probes must not kill
    the render)."""
    pinned = _PLATFORM.get()
    if pinned != 'auto':
        return pinned
    import jax
    try:
        return jax.default_backend()
    except RuntimeError:
        return 'cpu'


def sosfilt(coeffs, x):
    """Dispatch to the configured IIR execution strategy."""
    if FILTER_IMPL == 'chunked':
        return sosfilt_chunked(coeffs, x, chunk=CHUNK_FRAMES)
    if FILTER_IMPL == 'pallas':
        from signals_tpu.compiler.pallas_kernels import sosfilt_pallas
        return sosfilt_pallas(coeffs, x)
    return sosfilt_scan(coeffs, x)


def sosfilt_stream(coeffs, x, zi):
    """Stateful cascade: continue from (and return) the coupled-form state
    ``zi`` of shape ``(nsec, 2, ch)`` — the streaming-filter primitive.
    Same associative-scan execution as :func:`sosfilt_scan`, plus the
    initial-state contribution through the cumulative transition products.
    """
    import jax
    import jax.numpy as jnp

    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    zi = jnp.asarray(zi, dtype=jnp.float32)
    nsec = coeffs.shape[0]
    n, ch_x = x.shape
    ch = max(coeffs.shape[1], ch_x, zi.shape[-1])
    x = jnp.broadcast_to(x, (n, ch))
    zf = []

    for s in range(nsec):
        rc, rs, d0, d1, d2 = (p[None] for p in
                              _coupled_params(jnp, coeffs, s))
        s1_0 = jnp.broadcast_to(zi[s, 0], (ch,))
        s2_0 = jnp.broadcast_to(zi[s, 1], (ch,))
        ac = jnp.broadcast_to(rc, (n, ch))
        as_ = jnp.broadcast_to(rs, (n, ch))
        c1 = x
        c2 = jnp.zeros_like(x)

        def combine(left, right):
            lac, las, lc1, lc2 = left
            rac, ras, rc1, rc2 = right
            return (rac * lac - ras * las,
                    ras * lac + rac * las,
                    rac * lc1 - ras * lc2 + rc1,
                    ras * lc1 + rac * lc2 + rc2)

        pc, ps, z1, z2 = jax.lax.associative_scan(
            combine, (ac, as_, c1, c2), axis=0)
        # add the initial state propagated by the cumulative rotations
        s1 = z1 + pc * s1_0 - ps * s2_0
        s2 = z2 + ps * s1_0 + pc * s2_0
        s1_prev = jnp.concatenate([s1_0[None], s1[:-1]], axis=0)
        s2_prev = jnp.concatenate([s2_0[None], s2[:-1]], axis=0)
        x = d0 * x + d1 * s1_prev + d2 * s2_prev
        zf.append(jnp.stack([s1[-1], s2[-1]]))
    return x, jnp.stack(zf)

_SQRT2 = math.sqrt(2.0)


def _design_lp_hp(xp, btype, wn):
    c = xp.tan((math.pi / 2) * wn)
    c2 = c * c
    d = 1.0 + _SQRT2 * c + c2
    a1 = 2.0 * (c2 - 1.0) / d
    a2 = (1.0 - _SQRT2 * c + c2) / d
    if btype == LOWPASS:
        b0 = c2 / d
        b1 = 2.0 * b0
    else:
        b0 = 1.0 / d
        b1 = -2.0 * b0
    one = xp.ones_like(a1)
    return xp.stack([b0, b1, b0, one, a1, a2], axis=-1)[None]  # (1, ch, 6)


def _csqrt(xp, re, im):
    """Principal complex sqrt via real arithmetic."""
    mag = xp.sqrt(xp.sqrt(re * re + im * im))
    ang = 0.5 * xp.arctan2(im, re)
    return mag * xp.cos(ang), mag * xp.sin(ang)


def _bilinear_pole(xp, re, im):
    """z = (4 + s) / (4 - s) for a complex pole s, returning (Re z, |z|^2,
    |4-s|^2) — everything the section denominator and gain need."""
    nr, ni = 4.0 + re, im
    dr, di = 4.0 - re, -im
    den = dr * dr + di * di
    zr = (nr * dr + ni * di) / den
    zmag2 = (nr * nr + ni * ni) / den
    return zr, zmag2, den


def _design_band(xp, btype, w1, w2):
    """Order-2 prototype -> order-4 band filter as two biquad sections.

    Follows scipy's zpk pipeline (buttap -> lp2bp/lp2bs -> bilinear ->
    sos) in closed form.  Prototype poles are exp(±i 3π/4); only one of each
    conjugate pair is tracked (sections pair conjugates).  The pre-warp is
    ``warped = 2*fs*tan(pi*Wn/fs)`` at fs=2 (scipy convention).
    """
    warped1 = 4.0 * xp.tan((math.pi / 2) * w1)
    warped2 = 4.0 * xp.tan((math.pi / 2) * w2)
    bw = warped2 - warped1
    wo2 = warped1 * warped2
    half = 0.5 * bw
    # one prototype pole p = exp(i 3π/4) = (-√2/2, +√2/2)
    if btype == BANDPASS:
        # lp2bp: u = p*bw/2 ; poles = u ± sqrt(u² - wo²)
        ur, ui = (-_SQRT2 / 2) * half, (_SQRT2 / 2) * half
    else:
        # lp2bs: u = (bw/2)/p = (bw/2) * conj(p)  (|p| = 1)
        ur, ui = (-_SQRT2 / 2) * half, -(_SQRT2 / 2) * half
    dr = ur * ur - ui * ui - wo2
    di = 2.0 * ur * ui
    sr, si = _csqrt(xp, dr, di)
    poles = [(ur + sr, ui + si), (ur - sr, ui - si)]

    zr_list, zmag2_list, den_list = [], [], []
    for (re, im) in poles:
        zr, zmag2, den = _bilinear_pole(xp, re, im)
        zr_list.append(zr)
        zmag2_list.append(zmag2)
        den_list.append(den)

    # gain after bilinear: k_d = k_analog * prod(4 - z_analog)/prod(4 - p_analog)
    # prod over all 4 poles = |4-P1|² |4-P2|² = den1 * den2
    pole_prod = den_list[0] * den_list[1]
    if btype == BANDPASS:
        # analog zeros: two at 0 -> prod(4 - 0) = 16 ; k_analog = bw²
        k = bw * bw * 16.0 / pole_prod
        # digital zeros: +1, +1, -1, -1 -> numerator (z-1)(z+1) per section
        nums = [(1.0, None, -1.0)] * 2   # None -> 0 middle coefficient
        zz = xp.zeros_like(k)
        n1s = [zz, zz]
    else:
        # analog zeros: ±i wo twice -> prod = (16 + wo²)² ; k_analog = 1
        k = (16.0 + wo2) ** 2 / pole_prod
        # digital zeros: conj pair at (4+i wo)/(4-i wo), |z| = 1, duplicated
        zzr = (16.0 - wo2) / (16.0 + wo2)
        nums = [(1.0, 'zz', 1.0)] * 2
        n1s = [-2.0 * zzr, -2.0 * zzr]

    sections = []
    ones = xp.ones_like(k)
    for idx in range(2):
        n0, _, n2 = nums[idx]
        n1 = n1s[idx]
        g = k if idx == 0 else ones
        sections.append(xp.stack(
            [g * n0, g * n1, g * n2,
             ones, -2.0 * zr_list[idx], zmag2_list[idx]], axis=-1))
    return xp.stack(sections, axis=0)  # (2, ch, 6)


def _design_eq(xp, btype, wn, gain_db, q):
    """RBJ audio-EQ-cookbook biquads, vectorized over channels.

    ``wn`` is the center/corner frequency normalized by Nyquist (already
    clipped to the open interval), ``gain_db`` the boost/cut in dB
    (``10^(g/40)`` convention; ignored for notch/allpass), ``q`` the
    quality factor (shelves use the Q parameterization of the shelf
    slope; ``q = _Q_DEFAULT`` gives the classic slope-1 shelf).

    **Coupled-form domain clip:** the scan kernels factor each biquad
    into a scaled rotation, which requires a *complex* pole pair.  RBJ
    responses with very low Q (a peaking cut needs ``2·Q·A > 1``, the
    others ``Q > 0.5``) have real poles; those denominators are clipped
    to the nearest complex-pair denominator (``|a1| <= 2·sqrt(a2)``,
    tiny margin) — the numerator (and thus the overall gain shape) is
    kept, the response near the clip differs from the textbook filter
    but stays finite and stable.  Musical settings never hit the clip.
    """
    w0 = math.pi * wn
    cw = xp.cos(w0)
    sw = xp.sin(w0)
    alpha = sw / (2.0 * q)
    one = xp.ones_like(cw)
    if btype == PEAK:
        A = 10.0 ** (gain_db / 40.0)
        b0, b1, b2 = 1.0 + alpha * A, -2.0 * cw, 1.0 - alpha * A
        a0, a1, a2 = 1.0 + alpha / A, -2.0 * cw, 1.0 - alpha / A
    elif btype == NOTCH:
        b0, b1, b2 = one, -2.0 * cw, one
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
    elif btype == ALLPASS:
        b0, b1, b2 = 1.0 - alpha, -2.0 * cw, 1.0 + alpha
        a0, a1, a2 = 1.0 + alpha, -2.0 * cw, 1.0 - alpha
    else:
        A = 10.0 ** (gain_db / 40.0)
        sqA = xp.sqrt(A)
        t = 2.0 * sqA * alpha
        if btype == LOWSHELF:
            b0 = A * ((A + 1.0) - (A - 1.0) * cw + t)
            b1 = 2.0 * A * ((A - 1.0) - (A + 1.0) * cw)
            b2 = A * ((A + 1.0) - (A - 1.0) * cw - t)
            a0 = (A + 1.0) + (A - 1.0) * cw + t
            a1 = -2.0 * ((A - 1.0) + (A + 1.0) * cw)
            a2 = (A + 1.0) + (A - 1.0) * cw - t
        elif btype == HIGHSHELF:
            b0 = A * ((A + 1.0) + (A - 1.0) * cw + t)
            b1 = -2.0 * A * ((A - 1.0) + (A + 1.0) * cw)
            b2 = A * ((A + 1.0) + (A - 1.0) * cw - t)
            a0 = (A + 1.0) - (A - 1.0) * cw + t
            a1 = 2.0 * ((A - 1.0) - (A + 1.0) * cw)
            a2 = (A + 1.0) - (A - 1.0) * cw - t
        else:
            raise ValueError(btype)
    b0, b1, b2 = b0 / a0, b1 / a0, b2 / a0
    a1, a2 = a1 / a0, a2 / a0
    # complex-pole-pair domain: a2 = pole radius² in (0, 1) (RBJ is
    # always stable, the upper clip is belt and braces), |a1| < 2·sqrt(a2)
    # with a relative margin far below sin²(w0_min) so valid designs —
    # including near-DC shelves, whose pole angle is tiny — never bind
    a2 = xp.clip(a2, 1e-12, 1.0 - 1e-9)
    bound = 2.0 * xp.sqrt(a2) * (1.0 - 1e-10)
    a1 = xp.clip(a1, -bound, bound)
    return xp.stack([b0, b1, b2, one, a1, a2], axis=-1)[None]  # (1, ch, 6)


def _design64(xp, btype: str, crits, nyquist):
    """The shared float64 design body of :func:`design_sos` /
    :func:`design_coupled`: crit normalization + per-type dispatch.
    Returns float64 SOS ``(nsec, ch, 6)``.  Must run inside the caller's
    x64 guard."""
    f64 = xp.float64
    crits64 = [xp.asarray(c).astype(f64).reshape(-1) for c in crits]
    if len(crits64) > 1:
        ch = max(c.shape[0] for c in crits64)
        crits64 = [xp.broadcast_to(c, (ch,)) for c in crits64]
    nyq = xp.asarray(nyquist).astype(f64)
    if btype in (LOWPASS, HIGHPASS):
        (c,) = crits64
        return _design_lp_hp(xp, btype, xp.clip(c / nyq, _WN_MIN, _WN_MAX))
    if btype in (BANDPASS, BANDSTOP):
        c1, c2 = crits64
        return _design_band(xp, btype,
                            xp.clip(c1 / nyq, _WN_MIN, _WN_MAX),
                            xp.clip(c2 / nyq, _WN_MIN, _WN_MAX))
    if btype in _EQ_TYPES:
        if btype in _EQ_GAIN_TYPES:
            freq, gain_db, q = crits64
            gain_db = xp.clip(gain_db, -_GAIN_DB_MAX, _GAIN_DB_MAX)
        else:
            freq, q = crits64
            gain_db = xp.zeros_like(freq)
        wn = xp.clip(freq / nyq, _WN_MIN, _WN_MAX)
        # q <= 0 (unconnected port reads as zero) means "default Q"
        q = xp.where(q <= 0.0, _Q_DEFAULT, q)
        q = xp.clip(q, _Q_MIN, _Q_MAX)
        return _design_eq(xp, btype, wn, gain_db, q)
    raise ValueError(btype)


def design_sos(xp, btype: str, crits, nyquist) -> 'np.ndarray':
    """Design an order-2 Butterworth filter, vectorized over channels.

    ``crits``: one (lp/hp) or two (bp/bs) cutoff arrays in hertz, each
    ``(1, ch)``; ``nyquist``: rate/2 (scalar, possibly traced); returns
    float32 SOS coefficients ``(nsec, ch, 6)`` as [b0 b1 b2 1 a1 a2].

    The reference normalizes by Nyquist and clips to [0, 1]
    (``fx.py:99-101``) — but scipy rejects the closed endpoints, so the
    reference crashes on out-of-band cutoffs; we clip to an open interval
    and stay finite instead.

    EQ type codes (:data:`PEAK` etc.) take ``crits`` = (freq_hz, gain_db,
    q) — or (freq_hz, q) for notch/allpass — and design the RBJ cookbook
    biquads instead (see :func:`_design_eq`).
    """
    if xp is np:
        guard = contextlib.nullcontext()
    else:
        import jax
        guard = jax.enable_x64(True)
    with guard:
        return _design64(xp, btype, crits, nyquist).astype(F32)


def design_coupled(xp, btype: str, crits, nyquist) -> 'np.ndarray':
    """Like :func:`design_sos` but returns ``(nsec, ch, 11)``:
    ``[b0 b1 b2 1 a1 a2 | rc rs d0 d1 d2]`` — the b/a form for reference
    implementations plus the **coupled-form** parameters used by the scan
    kernel.  The coupled taps involve a catastrophic cancellation
    (``d2 = (b2 - a2 b0 + rc d1)/rs``), so they must be derived inside the
    float64 design pipeline, not from rounded f32 coefficients.
    """
    if xp is np:
        guard = contextlib.nullcontext()
    else:
        import jax
        guard = jax.enable_x64(True)
    with guard:
        sos = _design64(xp, btype, crits, nyquist)
        b0, b1, b2 = sos[..., 0], sos[..., 1], sos[..., 2]
        a1, a2 = sos[..., 4], sos[..., 5]
        rc = -0.5 * a1
        rs = xp.sqrt(xp.maximum(a2 - 0.25 * a1 * a1, 1e-300))
        d0 = b0
        d1 = b1 - a1 * b0
        d2 = (b2 - a2 * b0 + rc * d1) / rs
        out = xp.concatenate(
            [sos, xp.stack([rc, rs, d0, d1, d2], axis=-1)], axis=-1)
        return out.astype(F32)


def _coupled_params(jnp, coeffs, s):
    """Per-section coupled-form parameters, each ``(ch,)``."""
    if coeffs.shape[-1] >= 11:
        rc = coeffs[s, :, 6]
        rs = coeffs[s, :, 7]
        d0 = coeffs[s, :, 8]
        d1 = coeffs[s, :, 9]
        d2 = coeffs[s, :, 10]
    else:
        b0, b1, b2 = coeffs[s, :, 0], coeffs[s, :, 1], coeffs[s, :, 2]
        a1, a2 = coeffs[s, :, 4], coeffs[s, :, 5]
        rc = -a1 * F32(0.5)
        rs = jnp.sqrt(jnp.maximum(a2 - a1 * a1 * F32(0.25), F32(1e-20)))
        d0 = b0
        d1 = b1 - a1 * b0
        d2 = (b2 - a2 * b0 + rc * d1) / rs
    return rc, rs, d0, d1, d2


def sosfilt_chunked(coeffs, x, *, chunk: int = 16):
    """Zero-initial-state SOS cascade as a chunked state-space scan.

    Same math as :func:`sosfilt_scan` (coupled-form biquads), but organized
    for the TPU memory hierarchy: the timeline is split into ``chunk``-frame
    blocks processed by ``lax.scan``; within a chunk, the recurrence is a
    precomputed causal convolution with the powers of the (scaled-rotation)
    transition operator — dense ``(L, L, ch)`` contractions that stay in
    VMEM/registers — and only a tiny ``(2, ch)`` state crosses chunk
    boundaries.  The associative-scan form materializes ~log N full-size
    intermediates through HBM per section; this form reads x once and
    writes y once.
    """
    import jax
    import jax.numpy as jnp

    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    nsec = coeffs.shape[0]
    n, ch_x = x.shape
    ch = max(coeffs.shape[1], ch_x)
    x = jnp.broadcast_to(x, (n, ch))
    L = chunk
    pad = (-n) % L
    xp_ = jnp.pad(x, ((0, pad), (0, 0)))
    nchunks = (n + pad) // L

    for s in range(nsec):
        rc, rs, d0, d1, d2 = _coupled_params(jnp, coeffs, s)
        rc_b = jnp.broadcast_to(rc, (ch,))
        rs_b = jnp.broadcast_to(rs, (ch,))
        # powers of the rotation: P[m] = (pc[m], ps[m]) = A^m, m = 0..L
        pcs = [jnp.ones((ch,), jnp.float32)]
        pss = [jnp.zeros((ch,), jnp.float32)]
        for _ in range(L):
            pcs.append(rc_b * pcs[-1] - rs_b * pss[-1])
            pss.append(rs_b * pcs[-2] + rc_b * pss[-1])
        pc = jnp.stack(pcs)          # (L+1, ch)
        ps = jnp.stack(pss)
        # causal in-chunk convolution operators T[k, j] = A^(k-j) e, k >= j
        k_idx = jnp.arange(L)[:, None]
        j_idx = jnp.arange(L)[None, :]
        delta = jnp.clip(k_idx - j_idx, 0, L)
        mask = (k_idx >= j_idx).astype(jnp.float32)[..., None]
        T1 = pc[delta] * mask        # (L, L, ch)
        T2 = ps[delta] * mask
        # state propagation to each in-chunk position: A^(k+1)
        pow1c = pc[1:]               # (L, ch)
        pow1s = ps[1:]

        xc = xp_.reshape(nchunks, L, ch)

        def body(s_prev, x_chunk, *, T1=T1, T2=T2, pow1c=pow1c,
                 pow1s=pow1s, d0=d0, d1=d1, d2=d2):
            s1_prev, s2_prev = s_prev
            s1c = jnp.einsum('kjc,jc->kc', T1, x_chunk)
            s2c = jnp.einsum('kjc,jc->kc', T2, x_chunk)
            s1 = s1c + pow1c * s1_prev - pow1s * s2_prev
            s2 = s2c + pow1s * s1_prev + pow1c * s2_prev
            s1m = jnp.concatenate([s1_prev[None], s1[:-1]], axis=0)
            s2m = jnp.concatenate([s2_prev[None], s2[:-1]], axis=0)
            y = d0 * x_chunk + d1 * s1m + d2 * s2m
            return (s1[-1], s2[-1]), y

        zero = jnp.zeros((ch,), jnp.float32)
        _, yc = jax.lax.scan(body, (zero, zero), xc)
        xp_ = yc.reshape(nchunks * L, ch)
    return xp_[:n]


def _rot_combine(left, right):
    """Associative combine for the coupled-form recurrence: elements are
    ``(rotation, injection)`` pairs — ``(R2 R1, R2 c1 + c2)`` with R a
    scaled rotation ≡ complex multiplication."""
    lac, las, lc1, lc2 = left
    rac, ras, rc1, rc2 = right
    return (rac * lac - ras * las,
            ras * lac + rac * las,
            rac * lc1 - ras * lc2 + rc1,
            ras * lc1 + rac * lc2 + rc2)


def _cascade_sections_prim(rc, rs, d0, d1, d2, x):
    """The SOS cascade over stacked per-section coupled taps
    (``(nsec, ch)`` each) — the op sequence :func:`sosfilt_scan` always
    ran, factored out so the custom VJP below can wrap it."""
    import jax
    import jax.numpy as jnp

    n, ch = x.shape
    for s in range(rc.shape[0]):
        ac = jnp.broadcast_to(rc[s][None], (n, ch))
        as_ = jnp.broadcast_to(rs[s][None], (n, ch))
        c1 = x
        c2 = jnp.zeros_like(x)
        _, _, s1, s2 = jax.lax.associative_scan(
            _rot_combine, (ac, as_, c1, c2), axis=0)
        zero = jnp.zeros((1, ch), dtype=jnp.float32)
        s1_prev = jnp.concatenate([zero, s1[:-1]], axis=0)
        s2_prev = jnp.concatenate([zero, s2[:-1]], axis=0)
        x = d0[s][None] * x + d1[s][None] * s1_prev + d2[s][None] * s2_prev
    return x


def _make_cascade_sections():
    """``_cascade_sections_prim`` under an ANALYTIC adjoint.

    Differentiating the associative scan's log-depth combine tree (what
    ``jax.grad`` does by default) costs ~3-4 forward scans of work plus
    the tree's saved intermediates; the adjoint of a linear recurrence
    is itself a linear recurrence, so the backward here runs ONE
    reversed associative scan per section instead.

    Derivation (per section, per channel; ``R = [[rc, -rs], [rs, rc]]``,
    state ``s_t = R s_{t-1} + e1 x_t``, output
    ``y_t = d0 x_t + d1 s1_{t-1} + d2 s2_{t-1}``):

    * adjoint state ``λ_t = Rᵀ λ_{t+1} + (d1, d2) ȳ_{t+1}``,
      ``λ_{n-1} = 0`` — a reversed-time copy of the forward recurrence
      (rotation transposed = ``rs`` negated) with injection
      ``(d1 ȳ, d2 ȳ)`` instead of ``(x, 0)``, so the SAME
      :func:`_rot_combine` scan computes it on the reversed sequence;
    * ``x̄_t = d0 ȳ_t + λ1_t``;
    * ``r̄c = Σ_t (λ1_t s1_{t-1} + λ2_t s2_{t-1})``,
      ``r̄s = Σ_t (λ2_t s1_{t-1} - λ1_t s2_{t-1})``,
      ``d̄0 = Σ_t ȳ_t x_t``, ``d̄1 = Σ_t ȳ_t s1_{t-1}``,
      ``d̄2 = Σ_t ȳ_t s2_{t-1}``.

    Sections chain in reverse (``ȳ`` of section s = ``x̄`` of s+1).
    Residuals: each section's input and lagged states — what the
    forward already materializes.  Verified against ``jax.grad`` of the
    raw primal in ``tests/test_learn.py`` /
    ``tests/test_pallas_kernels.py`` (identical to f32 reassociation).
    """
    import jax
    import jax.numpy as jnp

    f = jax.custom_vjp(_cascade_sections_prim)

    def fwd(rc, rs, d0, d1, d2, x):
        n, ch = x.shape
        nsec = rc.shape[0]
        xs, s1ps, s2ps = [], [], []
        for s in range(nsec):
            ac = jnp.broadcast_to(rc[s][None], (n, ch))
            as_ = jnp.broadcast_to(rs[s][None], (n, ch))
            _, _, s1, s2 = jax.lax.associative_scan(
                _rot_combine, (ac, as_, x, jnp.zeros_like(x)), axis=0)
            zero = jnp.zeros((1, ch), dtype=jnp.float32)
            s1_prev = jnp.concatenate([zero, s1[:-1]], axis=0)
            s2_prev = jnp.concatenate([zero, s2[:-1]], axis=0)
            xs.append(x)
            s1ps.append(s1_prev)
            s2ps.append(s2_prev)
            x = (d0[s][None] * x + d1[s][None] * s1_prev
                 + d2[s][None] * s2_prev)
        return x, (rc, rs, d0, d1, d2, xs, s1ps, s2ps)

    def bwd(res, g):
        rc, rs, d0, d1, d2, xs, s1ps, s2ps = res
        nsec = rc.shape[0]
        n, ch = g.shape
        grc, grs, gd0, gd1, gd2 = ([None] * nsec for _ in range(5))
        for s in range(nsec - 1, -1, -1):
            x_in, s1p, s2p = xs[s], s1ps[s], s2ps[s]
            gd0[s] = jnp.sum(g * x_in, axis=0)
            gd1[s] = jnp.sum(g * s1p, axis=0)
            gd2[s] = jnp.sum(g * s2p, axis=0)
            # v_t = (d1, d2) ȳ_{t+1}  (zero at t = n-1)
            zero = jnp.zeros((1, ch), dtype=jnp.float32)
            v1 = jnp.concatenate([d1[s][None] * g[1:], zero], axis=0)
            v2 = jnp.concatenate([d2[s][None] * g[1:], zero], axis=0)
            ac = jnp.broadcast_to(rc[s][None], (n, ch))
            nas = jnp.broadcast_to(-rs[s][None], (n, ch))
            _, _, u1, u2 = jax.lax.associative_scan(
                _rot_combine, (ac, nas, v1[::-1], v2[::-1]), axis=0)
            l1, l2 = u1[::-1], u2[::-1]
            grc[s] = jnp.sum(l1 * s1p + l2 * s2p, axis=0)
            grs[s] = jnp.sum(l2 * s1p - l1 * s2p, axis=0)
            g = d0[s][None] * g + l1
        return (jnp.stack(grc), jnp.stack(grs), jnp.stack(gd0),
                jnp.stack(gd1), jnp.stack(gd2), g)

    f.defvjp(fwd, bwd)
    return f


_cascade_sections = None


def _get_cascade_sections():
    global _cascade_sections
    if _cascade_sections is None:
        _cascade_sections = _make_cascade_sections()
    return _cascade_sections


def sosfilt_scan(coeffs, x):
    """Zero-initial-state SOS cascade via associative scan (jax only).

    ``coeffs``: ``(nsec, ch, 11)`` from :func:`design_coupled` (the 6-column
    b/a form from :func:`design_sos` is also accepted; coupled taps are then
    derived in f32, slightly less accurately).  ``x``: ``(N, ch)``
    (broadcast to the wider channel count).  Equivalent to filtering each
    channel with ``scipy.signal.sosfilt`` in float64, to ≲1e-5 for
    audio-range cutoffs, evaluated in O(log N) parallel depth on the VPU.

    Numerics: each biquad runs in the **coupled (normal) form** — the
    denominator's complex-conjugate pole pair (Butterworth N=2 poles are
    always complex) makes the state transition a scaled rotation, so the
    associative combine is a complex multiplication.  Products of scaled
    rotations are perfectly conditioned (norm-preserving up to |p|), unlike
    direct-form companion matrices whose f32 products lose ~50x more
    accuracy on high-Q/low-cutoff filters.
    """
    import jax.numpy as jnp

    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    nsec, ch_c = coeffs.shape[0], coeffs.shape[1]
    n, ch_x = x.shape
    ch = max(ch_c, ch_x)
    x = jnp.broadcast_to(x, (n, ch))

    if coeffs.shape[-1] >= 11:
        rc = jnp.broadcast_to(coeffs[:, :, 6], (nsec, ch))
        rs = jnp.broadcast_to(coeffs[:, :, 7], (nsec, ch))
        d0 = jnp.broadcast_to(coeffs[:, :, 8], (nsec, ch))
        d1 = jnp.broadcast_to(coeffs[:, :, 9], (nsec, ch))
        d2 = jnp.broadcast_to(coeffs[:, :, 10], (nsec, ch))
    else:
        b0 = coeffs[:, :, 0]
        b1 = coeffs[:, :, 1]
        b2 = coeffs[:, :, 2]
        a1 = coeffs[:, :, 4]
        a2 = coeffs[:, :, 5]
        rc = -a1 * F32(0.5)
        rs = jnp.sqrt(jnp.maximum(a2 - a1 * a1 * F32(0.25), F32(1e-20)))
        d0 = b0
        d1 = b1 - a1 * b0
        d2 = (b2 - a2 * b0 + rc * d1) / rs
        rc, rs, d0, d1, d2 = (jnp.broadcast_to(t, (nsec, ch))
                              for t in (rc, rs, d0, d1, d2))

    return _get_cascade_sections()(rc, rs, d0, d1, d2, x)


def sosfilt_tv(coeff_sets, set_idx, x, keep_mask):
    """Time-varying SOS cascade: per-frame coefficient-set selection plus
    a state-reset mask — the associative-scan engine behind swept-crit
    carry segments on paths the Pallas segment kernels don't cover (the
    per-block compiled step, narrow mega fallbacks).

    ``coeff_sets``: ``(K, nsec, ch, 11)`` :func:`design_coupled` rows;
    ``set_idx``: ``(n,)`` int32 selecting a set per frame; ``x``:
    ``(n, ch)``; ``keep_mask``: ``(n,)`` bool — ``False`` at frame ``t``
    drops the incoming state (both the recurrence carry and the output's
    lagged-state taps), i.e. the filter restarts from zero state at that
    frame.  Per section the recurrence is

        s_t = r_t * A_t s_{t-1} + e x_t,
        y_t = d0_t x_t + r_t * (d1_t s1_{t-1} + d2_t s2_{t-1}),

    with ``A_t`` the selected set's scaled rotation and ``r_t`` the mask —
    exactly the per-block coefficient switching + segment-boundary warmup
    restart of the Pallas carry kernels
    (:func:`~signals_tpu.compiler.pallas_kernels.sosfilt_segments_gen`
    with ``blocks_per_seg > 1``), evaluated in O(log n) depth.
    """
    import jax
    import jax.numpy as jnp

    co = jnp.asarray(coeff_sets, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    set_idx = jnp.asarray(set_idx, dtype=jnp.int32)
    n, ch_x = x.shape
    nsec, ch_c = co.shape[1], co.shape[2]
    ch = max(ch_x, ch_c)
    x = jnp.broadcast_to(x, (n, ch))
    msk = jnp.asarray(keep_mask).astype(jnp.float32).reshape(n, 1)
    for s in range(nsec):
        sel = co[:, s][set_idx]                       # (n, ch_c, 11)
        sel = jnp.broadcast_to(sel, (n, ch, 11))
        ac = sel[..., 6] * msk
        as_ = sel[..., 7] * msk
        _, _, s1, s2 = jax.lax.associative_scan(
            _rot_combine, (ac, as_, x, jnp.zeros_like(x)), axis=0)
        zero = jnp.zeros((1, ch), dtype=jnp.float32)
        s1p = jnp.concatenate([zero, s1[:-1]], axis=0)
        s2p = jnp.concatenate([zero, s2[:-1]], axis=0)
        x = (sel[..., 8] * x
             + msk * (sel[..., 9] * s1p + sel[..., 10] * s2p))
    return x
