"""Effects and filters (reference ``src/signals/chain/fx.py``).

Elementwise effects (Mix/RingMod/Gain/Amp) compile to fused VPU ops.  The
critically-tuned Butterworth filters keep the reference's *stateless
context-window* semantics — re-pull context frames, filter from zero
initial state, return the tail (``fx.py:82-106``) — but the design math
and the IIR recurrence are TPU-native closed forms
(:mod:`signals_tpu.compiler.filters`) since the cutoff is a traced
per-block signal and ``scipy`` is host-only.  Swept (non-``Fixed``) crits
additionally carry state across multi-block segments
(:meth:`CritFilter.swept_carry_m` — round 5's product semantics, closer
to a true time-varying filter and what lets the swept patch ride the
multi-block Pallas carry kernels at static-crit throughput).
"""

from __future__ import annotations

import abc
import typing

import numpy as np

from signals_tpu import SignalFlags
from signals_tpu.compiler import filters as _filters
from signals_tpu.core.state import Param, all_of, ge, instance_of
from signals_tpu.graph import (
    BlockCachingEmitter,
    ImplicitChannels,
    KernelCtx,
    Receiver,
    StatefulEmitter,
    port,
)
from signals_tpu.registry import register

F32 = np.float32


class Effect(BlockCachingEmitter, ImplicitChannels, abc.ABC):

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT


class BinaryEffect(Effect, abc.ABC):
    left: Receiver.BoundPort = port('left')
    right: Receiver.BoundPort = port('right')


@register('signals.chain.fx.Mix')
class Mix(BinaryEffect):
    """Crossfade: ``mix*L + (1-mix)*R`` with ``mix`` at block rate
    (reference ``fx.py:35-40``)."""

    mix: Receiver.BoundPort = port('mix')

    def kernel(self, ctx: KernelCtx):
        mix = ctx.in_block_rate('mix')
        return mix * ctx.in_('left') + (F32(1.0) - mix) * ctx.in_('right')


@register('signals.chain.fx.RingMod')
class RingMod(BinaryEffect):

    def kernel(self, ctx: KernelCtx):
        return ctx.in_('left') * ctx.in_('right')


@register('signals.chain.fx.Gain')
class Gain(BinaryEffect):
    """``L * R`` with the gain side sampled at block rate
    (reference ``fx.py:49-52``)."""

    def kernel(self, ctx: KernelCtx):
        return ctx.in_('left') * ctx.in_block_rate('right')


@register('signals.chain.fx.Amp')
class Amp(BinaryEffect):
    """Signed power: ``sign(L) * |L| ** R`` with the exponent at block rate.

    The reference computes ``copysign(L ** R, L)`` (``fx.py:55-60``), which is
    NaN for negative L and fractional R; the sign-magnitude form is identical
    where the reference is defined and finite everywhere.
    """

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        x = ctx.in_('left')
        exp = ctx.in_block_rate('right')
        return xp.sign(x) * xp.abs(x) ** exp


@register()
class Drive(Effect):
    """Soft saturation: ``tanh(input * drive) / tanh(drive)`` with the
    drive amount at block rate (normalized so unity passes through at low
    drive).  The classic waveshaper distortion stage the reference lacks.

    The saturator is :func:`~signals_tpu.core.mathx.tanh_exact` — library
    ``tanh`` ULP differences between XLA:TPU and numpy would otherwise
    re-inject through feedback loops and grow to ~3e-5 (the parity
    budget's one former carve-out)."""

    input: Receiver.BoundPort = port('input')
    drive: Receiver.BoundPort = port('drive')

    def kernel(self, ctx: KernelCtx):
        from signals_tpu.core.mathx import tanh_exact
        xp = ctx.xp
        x = ctx.in_('input')
        d = xp.maximum(ctx.in_block_rate('drive'), F32(1e-3))
        return tanh_exact(xp, x * d) / tanh_exact(xp, d)


@register()
class Pan(Effect):
    """Equal-power stereo panner: mono in, two channels out.  ``position``
    (block rate) in [-1, 1], left to right."""

    input: Receiver.BoundPort = port('input')
    position: Receiver.BoundPort = port('position')

    @property
    def channels(self) -> int:
        return 2

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        x = ctx.in_full('input')
        mono = (x if x.shape[1] == 1
                else xp.mean(x, axis=1, keepdims=True))
        p = xp.clip(ctx.in_block_rate('position'), F32(-1.0), F32(1.0))
        theta = (p[:, :1] + F32(1.0)) * F32(np.pi / 4)
        left = mono * xp.cos(theta)
        right = mono * xp.sin(theta)
        return xp.concatenate(
            [xp.broadcast_to(left, (ctx.nframes, 1)),
             xp.broadcast_to(right, (ctx.nframes, 1))], axis=1)


class CritFilter(StatefulEmitter, ImplicitChannels, abc.ABC):
    """Critically-tuned order-2 Butterworth filtering
    (reference ``fx.py:63-121``).

    State is recomputed from a bounded context window every block — filtering
    is a pure function of the last ``context_frames() + nframes`` input
    frames, which is what makes it compilable, seekable, and blockwise
    parallel.  Coefficients are recomputed per block from the traced cutoff
    inputs, reproducing the reference's time-varying-cutoff behavior
    (``fx.py:99-105``).

    The context length defaults to 1024 frames, not the reference's 100
    (``fx.py:82-84``): a low-cutoff filter's impulse response does not decay
    within 100 frames, so the reference's output there depends on its block
    cache's reuse pattern — an ill-defined corner.  1024 frames make the
    window approximation ~1e-7 for cutoffs down to ~150 Hz.  Set
    ``context=100`` for reference-exact windows.

    ``streaming=True`` switches to **exact IIR**: filter state is carried
    across blocks instead of recomputed from context — no window
    approximation at all, at the cost of sequential block rendering and
    position-dependent state (seeking resets it).
    """

    input: Receiver.BoundPort = port('input')

    order = 2

    class State(StatefulEmitter.State):
        #: structural: frames of input history recomputed each block
        context: int = Param(1024, validate=all_of(instance_of(int), ge(1)))
        #: structural: exact carried-state IIR instead of context windows
        streaming: bool = Param(False, validate=instance_of(bool))
        #: structural: blocks per state-carry segment for SWEPT crits
        #: (0 = engine default ``SEG_CARRY_BLOCKS``, 1 = per-block
        #: context replay — the reference's time-varying-cutoff
        #: semantics).  See :meth:`swept_carry_m`.
        carry: int = Param(0, validate=all_of(instance_of(int), ge(0)))

    @classmethod
    def flags(cls) -> SignalFlags:
        return super().flags() | SignalFlags.EFFECT

    def is_stateful(self) -> bool:
        return self._state.streaming

    @property
    def n_sections(self) -> int:
        return 2 if self.type_code() in (_filters.BANDPASS,
                                         _filters.BANDSTOP) else 1

    def init_carry(self, *, channels: int, rate: int,
                   block_frames: int) -> dict:
        return {'zi': np.zeros((self.n_sections, 2, channels),
                               dtype=F32)}

    def step(self, ctx: KernelCtx, carry: dict):
        nyquist = ctx.rate_f32 * F32(0.5)
        coeffs = _filters.design_coupled(ctx.xp, self.type_code(),
                                         self._crits(ctx), nyquist)
        x = ctx.xp.broadcast_to(ctx.in_('input'),
                                (ctx.nframes, self.channels))
        y, zf = ctx.sosfilt_stream(coeffs, x, carry['zi'])
        return y, {'zi': zf}

    def context_frames(self) -> int:
        return 0 if self._state.streaming else self._state.context

    @staticmethod
    def context_for(min_hz: float, rate: int = 44100,
                    tol: float = 1e-7) -> int:
        """Smallest 128-aligned context window whose truncation error is
        below ``tol`` for every pole frequency the filter will see at or
        above ``min_hz`` — the principled way to tune ``context`` per
        patch instead of carrying the conservative 1024-frame default.

        The window approximation truncates the filter's memory: the
        state replayed from ``C`` frames differs from the exact IIR
        state by the response to earlier input, bounded by
        ``|pole|**C = exp(-xi * 2*pi*f0/rate * C)``.  This uses
        ``xi = 0.5``, conservative against every supported design (the
        order-2 Butterworth sections have ``xi = 0.707``; band filters
        should pass their BANDWIDTH as ``min_hz``, shelf/peak EQs the
        band edge over ``sqrt(2*Q)``).  Shorter contexts make the
        compiled fast paths proportionally cheaper — the packed segment
        kernel replays ``C`` frames per block, so per-frame work is
        ``(C + F)/F`` (e.g. a 550 Hz floor gives C=512: 1.5x work
        instead of the default's 2.0x at F=1024) — while the numpy
        oracle replays the same window, so cross-engine parity is
        untouched.

        >>> CritFilter.context_for(550.0)
        512
        >>> CritFilter.context_for(150.0) >= 1024
        True
        """
        import math
        decay = 0.5 * 2.0 * math.pi * float(min_hz) / float(rate)
        n = math.log(1.0 / tol) / max(decay, 1e-12)
        return max(128, -(-int(math.ceil(n)) // 128) * 128)

    def crits_static(self) -> bool:
        """Whether every crit input (cutoff/freq/q/gain/...) is a
        ``Fixed`` or unconnected — the designed coefficients are then
        identical for every block, and multi-block carry segments
        (:data:`signals_tpu.compiler.filters.SEG_CARRY_BLOCKS`) are
        BIT-IDENTICAL to per-block context replay: the carried state
        differs from the replayed one only by the filter's response
        beyond the context window, which flushes to zero in f32 for any
        adequate context (measured: max abs diff exactly 0.0 at
        context=512, cutoff 2 kHz).  Swept filters carry too — but as
        *product semantics*, not an invisible optimization (per-block
        coefficient changes make the carried state differ from replay
        at FIRST ORDER in the sweep rate), so their segmentation is
        pinned and oracle-mirrored: see :meth:`swept_carry_m`."""
        from signals_tpu.nodes.fixed import Fixed
        for pname in self.port_names():
            if pname == 'input':
                continue
            sig = self._ports[pname].sig
            if sig is not None and type(sig) is not Fixed:
                return False
        return True

    def swept_carry_m(self, engine_m: typing.Optional[int] = None) -> int:
        """Blocks per state-carry segment for SWEPT (non-``Fixed``) crits
        — the *product semantics* of time-varying filtering on the
        compiled fast paths, round 5's closure of the dynamic/static
        throughput gap (the LFO-swept headline patch paid per-block
        context replay the static patch didn't;
        ``compiler/filters.py:92-111`` round 4).

        Semantics (identical in the numpy pull oracle and every compiled
        path): on the :data:`~signals_tpu.compiler.filters.
        CARRY_GRID_FRAMES` block grid, blocks group into segments of
        ``m`` aligned to ABSOLUTE frame multiples of ``m * F``; at each
        segment start the filter state restarts from zero and warms up
        over the ``context`` window under the segment's first block's
        coefficients; inside a segment the state carries across blocks
        while coefficients switch per block.  A pure function of
        absolute time — seekable and batch-split invariant, like the
        per-block replay it generalizes (which is the ``m = 1`` case,
        and remains the semantics at non-grid evaluations: 1-frame
        control samples, context-shifted sub-windows).

        This deliberately diverges from the reference's per-block
        zero-state replay (``/root/reference/src/signals/chain/fx.py:
        82-106``): a real time-varying filter carries state through a
        sweep; per-block restart injects boundary transients the carry
        removes — and it is what lets the swept patch ride the
        multi-block Pallas carry kernels.  ``State.carry = 1`` restores
        reference-style replay.

        Returns 1 when carry does not engage: streaming filters (exact
        carried state already), static crits (carry is bit-identical to
        replay there — handled by :meth:`_carry_blocks`), or
        ``carry = 1``.
        """
        if self._state.streaming:
            return 1
        m = self._state.carry
        if m == 0:
            m = (_filters.resolve_seg_carry_blocks() if engine_m is None
                 else engine_m)
        if m <= 1 or self.crits_static():
            return 1
        return m

    def _crits_hist(self, ctx, stride: int, count: int,
                    ahead: int = 0) -> tuple:
        """Per-crit block-rate history samples on the absolute
        ``stride``-frame grid (``(count, ch)`` each, oldest first) — the
        coefficient inputs of the swept-carry paths."""
        return tuple(ctx.in_grid_samples(p, stride, count, ahead)
                     for p in self._crit_port_names())

    def _carry_blocks(self, ctx, nb: int) -> int:
        """Blocks per state-carry segment for a DMA-input lowering: the
        largest divisor of ``nb`` within the compile-time
        ``SEG_CARRY_BLOCKS`` snapshot when the crits are static (carry is
        then bit-identical to per-block replay), else 1.  Divisor, not
        padded: unlike the generator path the input timeline ends at
        ``nb`` blocks."""
        if not self.crits_static():
            return 1
        m = min(ctx.compiler.index.seg_carry_blocks, nb)
        while nb % m:
            m -= 1
        return m

    def packed_lane_fit(self, k: int, block_frames: int):
        """Static packed lane width (``chx``) this filter would use in a
        ``k``-stream packed family, or None when the packed cascade can't
        run (context not block-aligned, or the packed lane count doesn't
        fit the segment kernel).  The single source of truth shared by
        ``CompiledPatch.packed_mega_streams`` (the plan) and
        :meth:`_family_kernel` (the lowering) — if these drifted, the
        plan could commit to k streams whose filters silently fall back
        to k separate cascades."""
        if self._state.streaming:
            return None
        C = self.context_frames()
        # sub-block contexts are fine for the segment kernel (its row
        # chunk shrinks to tile them); 128-alignment keeps the chunk a
        # vector-register multiple.  A short, pole-justified context
        # (:meth:`context_for`) cuts the kernel's per-frame replay work
        # from (C+F)/F toward 1 with UNCHANGED per-block semantics — the
        # oracle replays the same window.
        if C < 1 or C % 128:
            return None
        inp = self._ports['input'].sig
        ch_in = 1 if inp is None else inp.channels
        chs = 1
        for pname in self.port_names():
            if pname == 'input':
                continue
            sig = self._ports[pname].sig
            if sig is not None:
                chs = max(chs, sig.channels)
        chx = max(ch_in, chs)
        pk_ch = chx * k
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        if pk_ch > LANE_GROUP:
            # wider than one kernel instance (> 1024 voices): the segment
            # kernel splits whole multiples of the lane group into
            # independent calls (``sosfilt_segments``'s wide-channel
            # branch).  Single-stream only — once one stream fills a full
            # group, multi-stream packing buys nothing.
            if k != 1 or pk_ch % LANE_GROUP:
                return None
            return chx
        if pk_ch < 32 or (128 % pk_ch and pk_ch % 128):
            return None
        return chx

    @property
    def supports_mega_step(self) -> bool:
        """Streaming (exact carried-state) filters render a whole mega
        window loop-free: per-block zero-state filtering + an associative
        affine scan of the 2-state transitions over blocks + a
        data-parallel initial-state correction.  Band filters cascade two
        sections — each section's map is affine in its own state, so the
        cascade is simply the single-section algorithm applied twice in
        sequence (section 2 consumes section 1's fully corrected
        output)."""
        return self._state.streaming

    def mega_step(self, ctx: KernelCtx, carry: dict):
        """Exact streaming IIR over a whole mega window, no block loop.

        With per-block coefficients, block b maps the incoming state by
        ``z' = A_b^F z + zf_b`` where ``zf_b`` is the zero-state final
        state — an affine map composed across blocks by one associative
        scan.  The per-frame output correction for an incoming state is
        ``y[k] += d1 s1m[k] + d2 s2m[k]`` with ``(s1m, s2m) = A_b^k z_b``,
        evaluated in closed form (the coupled-form transition is a scaled
        rotation: ``A^k = rho^k Rot(k theta)``), with the powers computed
        in float64 so large ``k theta`` angles stay accurate at any
        cutoff.  Multi-section (band) filters run the algorithm once per
        section, feeding each section the previous one's corrected
        output.
        """
        import jax.numpy as jnp
        F_, nb = ctx.block_grid
        nyquist = ctx.rate_f32 * F32(0.5)
        grids = self._crits_grid(ctx)                      # each (nb, ch_i)
        chs = max(g.shape[1] for g in grids)
        crits = tuple(jnp.broadcast_to(g, (nb, chs)).reshape(1, -1)
                      for g in grids)
        coeffs = _filters.design_coupled(jnp, self.type_code(), crits,
                                         nyquist)       # (nsec, nb*chs, 11)
        nsec = coeffs.shape[0]

        x = ctx.in_('input')                               # (nb*F, ch)
        ch = max(x.shape[1], chs)
        y = jnp.broadcast_to(x, (nb * F_, ch)).reshape(nb, F_, ch)
        zfs = []
        for s in range(nsec):
            co = coeffs[s].reshape(1, nb, chs, 11).transpose(1, 0, 2, 3)
            co = jnp.broadcast_to(co, (nb, 1, ch, 11))
            y, zf_s = self._mega_step_section(ctx, co, y, carry['zi'][s],
                                              F_, nb, ch)
            zfs.append(zf_s)
        return (y.reshape(nb * F_, ch),
                {'zi': jnp.stack(zfs, axis=0)})

    @staticmethod
    def _mega_step_section(ctx, co, xb, zi_s, F_, nb, ch):
        """One section of :meth:`mega_step`: ``xb`` (nb, F, ch) input
        blocks, ``co`` (nb, 1, ch, 11) per-block coefficients, ``zi_s``
        (2, ch0) incoming coupled-form state.  Returns ``(y (nb, F, ch),
        zf (2, ch))``."""
        import jax
        import jax.numpy as jnp

        # 1. zero-state filtering per block (+ per-block final states)
        zi0 = jnp.zeros((1, 2, ch), dtype=F32)
        y0, zf = jax.vmap(
            lambda c, xs: ctx.sosfilt_stream(c, xs, zi0))(co, xb)
        # y0: (nb, F, ch); zf: (nb, 1, 2, ch)

        rc = co[:, 0, :, 6]                                # (nb, ch)
        rs = co[:, 0, :, 7]
        d1 = co[:, 0, :, 9]
        d2 = co[:, 0, :, 10]

        # 2. A_b^F by square-and-multiply (static F), then the affine scan
        pc = jnp.ones_like(rc)
        ps = jnp.zeros_like(rs)
        bc, bs = rc, rs
        n = F_
        while n:
            if n & 1:
                pc, ps = pc * bc - ps * bs, ps * bc + pc * bs
            n >>= 1
            if n:
                bc, bs = bc * bc - bs * bs, 2 * bc * bs

        def combine(older, newer):
            oac, oas, od1, od2 = older
            nac, nas, nd1, nd2 = newer
            return (nac * oac - nas * oas,
                    nas * oac + nac * oas,
                    nac * od1 - nas * od2 + nd1,
                    nas * od1 + nac * od2 + nd2)

        Pc, Ps, D1, D2 = jax.lax.associative_scan(
            combine, (pc, ps, zf[:, 0, 0, :], zf[:, 0, 1, :]), axis=0)
        zi1 = jnp.broadcast_to(zi_s[0], (ch,))
        zi2 = jnp.broadcast_to(zi_s[1], (ch,))
        Z1 = Pc * zi1 - Ps * zi2 + D1                      # (nb, ch)
        Z2 = Ps * zi1 + Pc * zi2 + D2
        z_in1 = jnp.concatenate([zi1[None], Z1[:-1]], axis=0)
        z_in2 = jnp.concatenate([zi2[None], Z2[:-1]], axis=0)

        # 3. per-frame correction: (s1m, s2m)[b, k] = A_b^k z_in[b]
        with jax.enable_x64(True):
            rho = jnp.sqrt(rc.astype(jnp.float64) ** 2
                           + rs.astype(jnp.float64) ** 2)
            theta = jnp.arctan2(rs.astype(jnp.float64),
                                rc.astype(jnp.float64))
            k = jnp.arange(F_, dtype=jnp.float64)[None, :, None]
            mag = jnp.exp(k * jnp.log(jnp.maximum(rho, 1e-300))[:, None, :])
            ang = k * theta[:, None, :]
            ck = (mag * jnp.cos(ang)).astype(F32)          # (nb, F, ch)
            sk = (mag * jnp.sin(ang)).astype(F32)
        s1m = ck * z_in1[:, None, :] - sk * z_in2[:, None, :]
        s2m = sk * z_in1[:, None, :] + ck * z_in2[:, None, :]
        y = y0 + d1[:, None, :] * s1m + d2[:, None, :] * s2m
        return y, jnp.stack([Z1[-1], Z2[-1]], axis=0)

    @abc.abstractmethod
    def type_code(self) -> str:
        """One of the :mod:`signals_tpu.compiler.filters` type codes."""
        raise NotImplementedError

    @abc.abstractmethod
    def _crits(self, ctx: KernelCtx) -> tuple:
        raise NotImplementedError

    def kernel(self, ctx: KernelCtx):
        nyquist = ctx.rate_f32 * F32(0.5)
        grid = getattr(ctx, 'block_grid', None)
        if grid is not None:
            return self._mega_kernel(ctx, grid, nyquist)
        FC = _filters.CARRY_GRID_FRAMES
        req = getattr(ctx, 'request', None)
        if req is not None:
            # numpy pull oracle: carry engages on whole-block-aligned
            # requests — including a downstream consumer's context pull
            # when its context is a block multiple (both engines then
            # see those frames as grid blocks; ragged windows take plain
            # replay in both).  See swept_carry_m's contract.
            m = self.swept_carry_m()
            loc = req.loc
            if (m > 1 and loc.shape.frames % FC == 0
                    and loc.position % FC == 0):
                return self._pull_carry_kernel(ctx, m, nyquist)
        elif getattr(ctx, 'compiler', None) is not None:
            comp = ctx.compiler
            m = self.swept_carry_m(comp.index.seg_carry_blocks)
            if (m > 1 and comp.block_frames == FC
                    and ctx.window.offset % FC == 0
                    and ctx.nframes % FC == 0
                    and ctx.window.stride == 1):
                return self._tv_carry_kernel(
                    ctx, m, nyquist, grid=(FC, ctx.nframes // FC))
        coeffs = _filters.design_coupled(ctx.xp, self.type_code(),
                                         self._crits(ctx), nyquist)
        x = ctx.in_context('input', self.context_frames())
        y = ctx.sosfilt(coeffs, x)
        return y[-ctx.nframes:]

    def _pull_carry_kernel(self, ctx, m: int, nyquist):
        """Swept-carry semantics in the pull oracle: statelessly replay
        each requested block's containing segment — ``context`` warmup
        under the segment's first block's coefficients from zero state,
        then the blocks up to the requested one with per-block
        coefficients, state threaded (in the COUPLED form — see
        ``PullCtx.sosfilt_stream``).  A pure function of the request
        (the oracle stays stateless); mirrors the compiled carry kernels
        exactly.  Multi-block requests (a downstream block-multiple
        context pull) evaluate blockwise and concatenate."""
        from signals_tpu.core import Request, Shape
        loc = ctx.request.loc
        F = _filters.CARRY_GRID_FRAMES
        n_blocks = loc.shape.frames // F
        beta0 = loc.position // F

        def one_block(beta):
            seg0 = (beta // m) * m
            zi = None
            out = None
            ch = self.channels
            for b in range(seg0, beta + 1):
                bloc = loc._replace(position=b * F,
                                    shape=Shape(F, loc.shape.channels))
                bctx = type(ctx)(self, Request(
                    requestor=ctx.request.requestor,
                    port=ctx.request.port, loc=bloc))
                coeffs = _filters.design_coupled(
                    np, self.type_code(), self._crits(bctx), nyquist)
                if b == seg0:
                    xw = bctx.in_context('input', self.context_frames())
                    ch = max(ch, xw.shape[1], coeffs.shape[1])
                    zi = np.zeros((coeffs.shape[0], 2, ch), dtype=F32)
                    y, zi = bctx.sosfilt_stream(coeffs, xw, zi)
                    out = y[-F:]
                else:
                    xb = bctx.in_('input')
                    xb = np.broadcast_to(xb, (F, max(xb.shape[1], ch)))
                    out, zi = bctx.sosfilt_stream(coeffs, xb, zi)
            return out

        blocks = [one_block(beta0 + i) for i in range(n_blocks)]
        ch = max(b.shape[1] for b in blocks)
        return np.concatenate(
            [np.broadcast_to(b, (F, ch)) for b in blocks], axis=0)

    def _tv_carry_kernel(self, ctx, m: int, nyquist, grid=None):
        """Swept-carry semantics on the compiled paths the Pallas
        segment kernels don't cover (the per-block step, narrow/odd mega
        fallbacks): each block is an independent time-varying scan
        (:func:`~signals_tpu.compiler.filters.sosfilt_tv`) over its
        ``context + m*F``-frame lookback window, with the per-frame
        coefficient selection and the segment-boundary state reset
        computed from the TRACED absolute position — correct at any
        alignment (the segment phase is dynamic), which is what lets the
        per-block transport path serve seeks anywhere while the oracle
        stays block-for-block exact."""
        F_, nb = grid if grid is not None else (ctx.nframes, 1)
        C = self.context_frames()
        count = nb + m - 1
        crit_s = self._crits_hist(ctx, F_, count, nb - 1)  # (count, ch_i)
        chs = max(g.shape[1] for g in crit_s)
        Cx = C + (m - 1) * F_
        x = ctx.in_context('input', Cx)          # (Cx + nb*F, ch)
        if ctx.xp is np:                          # window-collection pass
            ch = max(x.shape[1], chs, self.channels)
            return np.zeros((nb * F_, ch), dtype=F32)
        import jax
        import jax.numpy as jnp
        crits = tuple(jnp.broadcast_to(g, (count, chs)).reshape(1, -1)
                      for g in crit_s)
        coeffs = _filters.design_coupled(jnp, self.type_code(), crits,
                                         nyquist)  # (nsec, count*chs, 11)
        nsec = coeffs.shape[0]
        co_sets = coeffs.reshape(nsec, count, chs, 11).transpose(
            1, 0, 2, 3)                           # (count, nsec, chs, 11)
        n = C + m * F_                            # frames per block chain
        pos0 = (jnp.asarray(ctx.compiler.position, jnp.int32)
                + jnp.int32(ctx.window.offset))
        beta0 = jnp.floor_divide(pos0, jnp.int32(F_))
        b_idx = jnp.arange(nb, dtype=jnp.int32)[:, None]       # (nb, 1)
        phi = (beta0 + b_idx) % jnp.int32(m)
        t = jnp.arange(n, dtype=jnp.int32)[None, :]            # (1, n)
        a = pos0 + b_idx * jnp.int32(F_) - jnp.int32(Cx) + t
        blk_rel = (jnp.floor_divide(a, jnp.int32(F_)) - beta0
                   + jnp.int32(m - 1))            # index into co_sets
        g_t = jnp.clip(blk_rel, b_idx + jnp.int32(m - 1) - phi,
                       b_idx + jnp.int32(m - 1))
        keep = t != (jnp.int32(m - 1) - phi) * jnp.int32(F_)   # (nb, n)
        widx = (jnp.arange(nb, dtype=jnp.int32)[:, None] * F_
                + jnp.arange(n, dtype=jnp.int32)[None, :])
        xw = x[widx]                               # (nb, n, ch)
        y = jax.vmap(_filters.sosfilt_tv,
                     in_axes=(None, 0, 0, 0))(co_sets, g_t, xw, keep)
        return y[:, -F_:, :].reshape(nb * F_, y.shape[-1])

    def _family_prologue(self, ctx, grid, fam, mode):
        """Shared eligibility + memoized compute of the packed stream
        family — the SINGLE copy of the preconditions that
        :meth:`packed_lane_fit` warns must not drift between the plan
        and the lowering.  ``mode`` is ``'packed_family'`` (full packed
        output) or ``'packed_family_sum'`` (the mix-epilogue lane-group
        sums).  Returns ``(memoized array or None, chx)``."""
        F_, nb_s = grid                    # blocks per stream (= S)
        k, sf = fam
        if _filters.resolve_mega_impl() != 'pallas':
            return None, None
        chx = self.packed_lane_fit(k, F_)
        if chx is None:
            return None, None
        C = self.context_frames()
        nyquist = ctx.rate_f32 * F32(0.5)
        sib0 = ctx.at_window(0, sf)
        grids0 = self._crits_grid(sib0)
        chs = max(g.shape[1] for g in grids0)
        memo = ctx.family_memo
        mkey = (id(self), mode)
        if mkey not in memo:
            memo[mkey] = self._family_compute(
                ctx, k, sf, F_, nb_s, C, chx, chs, nyquist,
                sum_groups=chx if mode == 'packed_family_sum' else 0)
        return memo[mkey], chx

    def _family_kernel(self, ctx, grid, fam):
        """Stream-family lowering (``CompiledPatch.packed_mega_streams``):
        the patch is being lowered as ``k`` packed timeline streams and
        this window is one of them.  Run ONE packed cascade for the whole
        family (memoized on the trace) and serve this stream its lane
        slice — downstream nodes then consume the filter output in packed
        layout and the block-major unpack never materializes.

        Returns None (caller falls back to per-window lowering) when the
        packed lane count doesn't fit the segment kernel or the input
        isn't stream-lowerable.
        """
        k, sf = fam
        w = ctx.window
        if w.frames != sf or w.offset % sf or not (0 <= w.offset // sf < k):
            return None
        j = w.offset // sf
        fam_y, chx = self._family_prologue(ctx, grid, fam,
                                           'packed_family')
        if fam_y is None:
            return None
        return fam_y[:, :, j * chx:(j + 1) * chx].reshape(sf, chx)

    def family_sum(self, ctx, grid, fam):
        """Per-stream voice sums of this filter's packed-family output —
        ``(S, F, k)`` with stream ``j``'s ``chx``-lane-group sum at
        ``[..., j]`` — computed *in-kernel* (the mix epilogue: the
        full-width filtered output is never written to HBM, saving that
        write and the mix's read-back).  ``None`` when the family can't
        pack; the caller (:meth:`CompiledPatch.packed_mega_mix`) then
        sums the ordinary per-stream lowering instead."""
        fam_sum, _ = self._family_prologue(ctx, grid, fam,
                                           'packed_family_sum')
        return fam_sum

    def _family_compute(self, ctx, k, sf, F_, nb_s, C, chx, chs, nyquist,
                        sum_groups=0):
        import jax.numpy as jnp
        from signals_tpu.compiler.pallas_kernels import sosfilt_segments
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        # compile-time snapshot, not the live flag: traces are lazy, so
        # the flag state must be the one the graph hash was keyed under
        gen = (self._gen_input_spec(chx)
               if ctx.compiler.index.seg_source_gen
               and k * chx % LANE_GROUP == 0
               else None)
        xp_ = None
        if gen is None:
            sib0 = ctx.at_window(0, sf)
            xp_ = sib0.in_packed_streams('input', k, sf, C, chx)
            if xp_ is None:
                return None
        # per-stream crit grids stacked as (S, k, chs) -> flat channel dim
        per_stream = [self._crits_grid(ctx.at_window(jj * sf, sf))
                      for jj in range(k)]
        crits = []
        for p_i in range(len(per_stream[0])):
            g = jnp.stack([jnp.broadcast_to(per_stream[jj][p_i],
                                            (nb_s, chs))
                           for jj in range(k)], axis=1)    # (S, k, chs)
            crits.append(g.reshape(1, -1))
        coeffs = _filters.design_coupled(jnp, self.type_code(),
                                         tuple(crits), nyquist)
        nsec = coeffs.shape[0]
        co = coeffs.reshape(nsec, nb_s, k, chs, 11).transpose(1, 0, 2, 3, 4)
        co = jnp.broadcast_to(co, (nb_s, nsec, k, chx, 11))
        co = co.reshape(nb_s, nsec, k * chx, 11)
        if gen is not None:
            return self._family_gen(ctx, gen, co, k, sf, F_, nb_s, C,
                                    chx, sum_groups)
        # multi-block carry segments on the DMA path: for static crits an
        # m-block carry segment over the CONTIGUOUS packed timeline is
        # just a coarser segmentation — m*F_-frame segments with the
        # (per-block-identical) coefficients of their first block — so no
        # kernel change is needed; bit-identical to per-block replay (see
        # crits_static).  Unlike the generator path the timeline can't be
        # synthesized past nb_s, so m is the largest divisor of nb_s
        # within SEG_CARRY_BLOCKS instead of padding.
        if not self.crits_static() and F_ == _filters.CARRY_GRID_FRAMES:
            # SWEPT crits: carry segments with per-block coefficients
            # (blocks_per_seg) — the plan rounds S to whole segments so
            # stream starts stay on absolute boundaries; a ragged tail
            # (defensive) pads with edge-coefficient blocks whose output
            # is dropped (causal: real blocks are unaffected)
            m = self.swept_carry_m(ctx.compiler.index.seg_carry_blocks)
            if m > 1:
                import jax.numpy as jnp
                nb_p = -(-nb_s // m) * m
                co_p = (co if nb_p == nb_s else jnp.concatenate(
                    [co, jnp.broadcast_to(co[-1:], (nb_p - nb_s,)
                                          + co.shape[1:])], axis=0))
                y = sosfilt_segments(co_p, xp_, n_segments=nb_p,
                                     seg_frames=F_, context=C,
                                     sum_groups=sum_groups,
                                     blocks_per_seg=m)
                return y[:nb_s]
        m = self._carry_blocks(ctx, nb_s)
        if m > 1:
            y = sosfilt_segments(co[::m], xp_, n_segments=nb_s // m,
                                 seg_frames=m * F_, context=C,
                                 sum_groups=sum_groups)
            return y.reshape(nb_s, F_, y.shape[-1])
        return sosfilt_segments(co, xp_, n_segments=nb_s, seg_frames=F_,
                                context=C,
                                sum_groups=sum_groups)     # (S, F, k*chx)

    def _gen_input_spec(self, chx):
        """``(osc_code, osc, hz_node, phase_node)`` when this filter's
        input is a generator the segment kernel can synthesize in-kernel
        (:func:`~signals_tpu.compiler.pallas_kernels.sosfilt_segments_gen`):
        a Sine/Saw/Square/Triangle oscillator whose ``hertz``/``phase``
        are ``Fixed`` (or unconnected) with widths broadcastable to the
        packed lane count.  The discontinuous waves are synthesized
        bit-exactly; Sine runs the ``sin2pi`` Horner chain in f32
        (Mosaic has no f64) — ~1e-7 absolute vs the lowered producers,
        tolerance-level parity, safe because sine has no wraps for a
        ulp to amplify."""
        from signals_tpu.compiler.pallas_kernels import (
            OSC_SAW, OSC_SINE, OSC_SQUARE, OSC_TRIANGLE)
        from signals_tpu.nodes.fixed import Fixed
        from signals_tpu.nodes.osc import Sawtooth, Sine, Square, Triangle
        inp = self._ports['input'].sig
        code = {Sine: OSC_SINE, Sawtooth: OSC_SAW, Square: OSC_SQUARE,
                Triangle: OSC_TRIANGLE}.get(type(inp))
        if code is None:
            return None
        nodes = []
        for pname in ('hertz', 'phase'):
            sig = inp._ports[pname].sig
            if sig is not None:
                if type(sig) is not Fixed:
                    return None
                v = sig.get_state().value
                if v.shape not in ((1, 1), (1, chx)):
                    return None
            nodes.append(sig)
        return code, inp, nodes[0], nodes[1]

    def _family_gen(self, ctx, gen, co, k, sf, F_, nb_s, C, chx,
                    sum_groups):
        """Generator-fed family lowering: per-lane params from the traced
        Fixed values (edits apply without recompiling), zero input HBM
        traffic.  Layout preconditions are guaranteed by the caller's
        ``k * chx == LANE_GROUP`` gate (which forces ``chx >= 32``), so
        errors here are genuine bugs and must propagate, not silently
        demote the render to the DMA path."""
        import jax.numpy as jnp
        from signals_tpu.compiler.pallas_kernels import (
            sosfilt_segments_gen)
        code, osc_node, hz_node, ph_node = gen
        comp = ctx.compiler

        def lane_row(node):
            if node is None:
                return jnp.zeros((k * chx,), dtype=jnp.float32)
            v = comp.node_param(node, 'value').reshape(1, -1)
            v = jnp.where(comp.node_param(node, 'enabled'), v, F32(0.0))
            v = jnp.broadcast_to(v, (1, chx)).reshape(chx)
            return jnp.tile(v, k)

        hz_l = lane_row(hz_node)
        ph_l = lane_row(ph_node)
        amp = jnp.where(comp.node_param(osc_node, 'enabled'),
                        F32(1.0), F32(0.0))
        amp_l = jnp.broadcast_to(amp, (k * chx,)).astype(jnp.float32)
        j_lane = np.repeat(np.arange(k, dtype=np.int32), chx)
        toff = (comp.position + jnp.asarray(j_lane) * np.int32(sf)
                - np.int32(C))
        # multi-block carry segments (filters.SEG_CARRY_BLOCKS, snapshot
        # in the graph hash): the context warmup replays once per m
        # blocks instead of per block — (C + F)/F ~ 2x per-frame work
        # drops to (C + m*F)/(m*F).  ONLY for static crits, where the
        # carry is bit-identical to per-block replay (see crits_static);
        # swept filters keep m = 1.  Blocks pad up to a multiple of m
        # with edge coeffs; the padded rows are the streams' natural
        # continuation (the generator synthesizes past nb_s) and are
        # dropped below.
        if self.crits_static():
            m = min(ctx.compiler.index.seg_carry_blocks, nb_s)
        elif F_ == _filters.CARRY_GRID_FRAMES:
            # SWEPT crits: same carry mode, with the per-block
            # coefficients the kernel's stepping index map already
            # consumes — the round-5 closure of the dynamic/static gap
            m = self.swept_carry_m(ctx.compiler.index.seg_carry_blocks)
        else:
            m = 1
        nb_p = -(-nb_s // m) * m
        if nb_p != nb_s:
            co = jnp.concatenate(
                [co, jnp.broadcast_to(co[-1:],
                                      (nb_p - nb_s,) + co.shape[1:])],
                axis=0)
        y = sosfilt_segments_gen(
            co, toff, jnp.stack([hz_l, ph_l, amp_l]),
            n_segments=nb_p, seg_frames=F_, context=C,
            osc_code=code, rate=ctx.rate, sum_groups=sum_groups,
            blocks_per_seg=m)
        return y[:nb_s]

    def _mega_kernel(self, ctx, grid, nyquist):
        """Mega-window lowering: the window spans many blocks.  The input is
        evaluated ONCE over the whole window (+one leading context), then
        each block's context slice is gathered and filtered zero-state with
        that block's coefficients — exactly the per-block semantics, with no
        duplicated upstream computation and no block loop."""
        import jax
        import jax.numpy as jnp
        F_, nb = grid
        fam = getattr(ctx, 'packed_family', None)
        if fam is not None:
            out = self._family_kernel(ctx, grid, fam)
            if out is not None:
                return out
        if F_ == _filters.CARRY_GRID_FRAMES:
            m_sw = self.swept_carry_m(ctx.compiler.index.seg_carry_blocks)
            if m_sw > 1:
                return self._mega_carry(ctx, grid, nyquist, m_sw)
        C = self.context_frames()
        # per-block coefficients from per-block control samples (aligned to
        # a common channel count before flattening)
        grids = self._crits_grid(ctx)                      # each (nb, ch_i)
        chs = max(g.shape[1] for g in grids)
        crits = tuple(jnp.broadcast_to(g, (nb, chs)).reshape(1, -1)
                      for g in grids)                      # (1, nb*chs)
        coeffs = _filters.design_coupled(jnp, self.type_code(), crits,
                                         nyquist)          # (nsec, nb*chs, 11)
        nsec = coeffs.shape[0]
        coeffs = coeffs.reshape(nsec, nb, chs, 11).transpose(1, 0, 2, 3)
        if _filters.resolve_mega_impl() == 'pallas':
            from signals_tpu.compiler.pallas_kernels import (
                LANE_GROUP, sosfilt_batch, sosfilt_segments)
            ch_in = ctx.in_channels('input') or 1
            chx = max(ch_in, chs)
            if (C % 128 == 0 and chx >= 32
                    and (128 % chx == 0 or chx % 128 == 0)):
                # fully DMA-driven: the kernel reads the raw timeline from
                # HBM (overlapping segment windows BlockSpecs can't
                # express) and writes its tail output block-major — no
                # segment materialization, no transposes
                k = LANE_GROUP // chx
                if k > 1 and nb >= 4 * k:
                    # pack k timeline streams into the kernel's full
                    # 1024-lane group, with the producers lowered *per
                    # stream window* so the packed input materializes in
                    # one fused write (no unpacked timeline, no copy
                    # pass); see LowerCtx.in_packed_streams.  Short
                    # batches (nb < 4k) would render mostly padding —
                    # e.g. the 8-block realtime render-ahead call — and
                    # take the materialized path below instead.
                    S = -(-nb // k)
                    xp_ = ctx.in_packed_streams('input', k, S * F_, C,
                                                chx)
                    if xp_ is not None:
                        cpad = jnp.pad(coeffs, ((0, k * S - nb), (0, 0),
                                                (0, 0), (0, 0)))
                        # align coeff lanes with the packed input lanes
                        # (chs is 1 or chx by construction)
                        cpad = jnp.broadcast_to(
                            cpad, (k * S, nsec, chx, 11))
                        cpk = jnp.concatenate(
                            [cpad[j * S:(j + 1) * S] for j in range(k)],
                            axis=2)                # (S, nsec, k*chx, 11)
                        # static crits: m-block carry segments = coarser
                        # segmentation of the contiguous packed timeline
                        # (bit-identical; see _carry_blocks)
                        m = self._carry_blocks(ctx, S)
                        y = sosfilt_segments(cpk[::m], xp_,
                                             n_segments=S // m,
                                             seg_frames=m * F_, context=C)
                        # unpack stream-major: block j*S + s lives at lane
                        # block j of segment s — one transpose, not a
                        # k-operand slice concat (XLA's transpose emitter
                        # is a single coalesced pass)
                        y = y.reshape(S, F_, k, chx).transpose(2, 0, 1, 3)
                        return y.reshape(k * S * F_, chx)[:nb * F_]
                x = ctx.in_context('input', C)             # (C+N, ch)
                m = self._carry_blocks(ctx, nb)
                y = sosfilt_segments(coeffs[::m], x, n_segments=nb // m,
                                     seg_frames=m * F_, context=C)
                return y.reshape(nb * F_, y.shape[-1])
            x = ctx.in_context('input', C)                 # (C+N, ch)
            # assemble the kernel's frames-major lane layout
            # xt[r, b] = x[b*F + r]; write back only the tail F rows per
            # block — context rows warm up state inside VMEM
            ch = x.shape[1]
            if C % F_ == 0:
                # block-aligned context: the overlapping-segment gather is
                # exactly k+1 transposes of FREE reshapes of the timeline
                # (measured ~5x cheaper than a row gather on v5e)
                k = C // F_
                X = x.reshape(nb + k, F_, ch)
                xt = jnp.concatenate(
                    [X[i:i + nb].transpose(1, 0, 2) for i in range(k + 1)],
                    axis=0)                                # (C+F, nb, ch)
            else:
                idx_t = (jnp.arange(C + F_)[:, None]
                         + jnp.arange(nb)[None, :] * F_)   # (C+F, nb)
                xt = x[idx_t]                              # (C+F, nb, ch)
            yt = sosfilt_batch(coeffs, xt, tail=F_)        # (F, nb, ch')
            return yt.transpose(1, 0, 2).reshape(nb * F_, yt.shape[-1])
        x = ctx.in_context('input', C)                     # (C+N, ch)
        idx = (jnp.arange(nb)[:, None] * F_
               + jnp.arange(C + F_)[None, :])              # (nb, C+F)
        xb = x[idx]                                        # (nb, C+F, ch)
        yb = jax.vmap(ctx.sosfilt)(coeffs, xb)             # (nb, C+F, ch')
        return yb[:, -F_:, :].reshape(nb * F_, yb.shape[-1])

    def _crits_grid(self, ctx) -> tuple:
        raise NotImplementedError

    def _mega_carry(self, ctx, grid, nyquist, m: int):
        """Mega-window lowering under swept-crit carry segments
        (:meth:`swept_carry_m`).  Fast path: the DMA segment kernel with
        per-block coefficients inside each ``m``-block carry segment
        (``blocks_per_seg``) — requires the window to start on an
        absolute ``m``-block boundary, which the render drivers
        guarantee (``CompiledPatch.render`` aligns unaligned starts with
        per-block steps; plans round stream lengths).  Windows that
        cannot assume alignment (the segmented feedback scan, whose
        per-step positions shift freely) or whose geometry the kernel
        can't hold take the alignment-free time-varying scan instead
        (:meth:`_tv_carry_kernel` — the segment phase is computed from
        the traced position per block)."""
        import jax.numpy as jnp
        F_, nb = grid
        C = self.context_frames()
        aligned = (getattr(ctx.compiler, 'carry_aligned', False)
                   # the window itself must start on a segment boundary
                   # (context pulls of this filter lower it at shifted
                   # whole-block windows; their phase is handled by the
                   # TV fallback below)
                   and ctx.window.offset % (m * F_) == 0)
        if (aligned and _filters.resolve_mega_impl() == 'pallas'
                and C % 128 == 0):
            ch_in = ctx.in_channels('input') or 1
            grids = self._crits_grid(ctx)
            chs = max(g.shape[1] for g in grids)
            chx = max(ch_in, chs)
            if chx >= 32 and (128 % chx == 0 or chx % 128 == 0):
                from signals_tpu.compiler.pallas_kernels import (
                    sosfilt_segments)
                crits = tuple(jnp.broadcast_to(g, (nb, chs)).reshape(1, -1)
                              for g in grids)
                coeffs = _filters.design_coupled(
                    jnp, self.type_code(), crits, nyquist)
                nsec = coeffs.shape[0]
                co = coeffs.reshape(nsec, nb, chs, 11).transpose(
                    1, 0, 2, 3)
                x = ctx.in_context('input', C)       # (C + nb*F, ch)
                q, r = divmod(nb, m)
                outs = []
                if q:
                    y = sosfilt_segments(
                        co[:q * m], x[:C + q * m * F_],
                        n_segments=q * m, seg_frames=F_, context=C,
                        blocks_per_seg=m)
                    outs.append(y.reshape(q * m * F_, y.shape[-1]))
                if r:
                    # trailing partial segment (the window ends before
                    # the next absolute boundary): one r-block segment
                    y = sosfilt_segments(
                        co[q * m:], x[q * m * F_:],
                        n_segments=r, seg_frames=F_, context=C,
                        blocks_per_seg=r if r > 1 else 1)
                    outs.append(y.reshape(r * F_, y.shape[-1]))
                return (outs[0] if len(outs) == 1
                        else jnp.concatenate(outs, axis=0))
        if aligned:
            # narrow/odd geometries on an ALIGNED window: evaluate per
            # carry segment (gather + one in-segment stream scan) —
            # (C + m*F)/(m*F) work at any channel width.  The blockwise
            # TV scan below re-filters ~m blocks of lookback per block
            # (~m x redundant compute; it exists for DYNAMIC segment
            # phases) — routing aligned narrow mega windows through it
            # cost the master-bus bench 13x (r5 midround: 211x vs r4's
            # 2844x) until this branch.
            return self._seg_stream_carry(ctx, grid, nyquist, m)
        return self._tv_carry_kernel(ctx, m, nyquist, grid=grid)

    def _seg_stream_carry(self, ctx, grid, nyquist, m: int):
        """Aligned-window swept-carry via per-segment streaming: gather
        each carry segment's ``context + m*F`` window, warm up from zero
        under the segment-start coefficients, then one ``lax.scan``
        threads the coupled state through the m blocks with per-block
        coefficients — the same math as the Pallas carry kernels and the
        oracle, in pure JAX."""
        import jax
        import jax.numpy as jnp
        F_, nb = grid
        C = self.context_frames()
        grids = self._crits_grid(ctx)
        chs = max(g.shape[1] for g in grids)
        crits = tuple(jnp.broadcast_to(g, (nb, chs)).reshape(1, -1)
                      for g in grids)
        coeffs = _filters.design_coupled(jnp, self.type_code(), crits,
                                         nyquist)
        nsec = coeffs.shape[0]
        co = coeffs.reshape(nsec, nb, chs, 11).transpose(1, 0, 2, 3)
        x = ctx.in_context('input', C)              # (C + nb*F, ch)
        ch = x.shape[1]

        def seg_eval(co_seg, xw, mm):
            # co_seg (mm, nsec, chs, 11); xw (C + mm*F, ch)
            chx = max(ch, chs)
            z = jnp.zeros((nsec, 2, chx), dtype=np.float32)
            if C:
                _, z = _filters.sosfilt_stream(co_seg[0], xw[:C], z)

            def body(z, args):
                co_b, xb = args
                yb, z2 = _filters.sosfilt_stream(co_b, xb, z)
                return z2, yb

            xb = jnp.broadcast_to(xw[C:], (mm * F_, chx)).reshape(
                mm, F_, chx)
            _, ys = jax.lax.scan(body, z, (co_seg, xb))
            return ys.reshape(mm * F_, chx)

        q, r = divmod(nb, m)
        outs = []
        if q:
            idx = (np.arange(q)[:, None] * (m * F_)
                   + np.arange(C + m * F_)[None, :])
            xw = x[idx]                             # (q, C+m*F, ch)
            co_q = co[:q * m].reshape((q, m) + co.shape[1:])
            ys = jax.vmap(lambda c, w: seg_eval(c, w, m))(co_q, xw)
            outs.append(ys.reshape(q * m * F_, ys.shape[-1]))
        if r:
            outs.append(seg_eval(co[q * m:], x[q * m * F_:], r))
        return (outs[0] if len(outs) == 1
                else jnp.concatenate(outs, axis=0))


class SingleCritFilter(CritFilter, abc.ABC):
    cutoff: Receiver.BoundPort = port('cutoff')

    def _crit_port_names(self) -> tuple:
        return ('cutoff',)

    def _crits(self, ctx: KernelCtx) -> tuple:
        return (ctx.in_block_rate('cutoff'),)

    def _crits_grid(self, ctx) -> tuple:
        return (ctx.in_block_rate_grid('cutoff'),)


class DoubleCritFilter(CritFilter, abc.ABC):
    low: Receiver.BoundPort = port('low')
    high: Receiver.BoundPort = port('high')

    def _crit_port_names(self) -> tuple:
        return ('low', 'high')

    def _crits(self, ctx: KernelCtx) -> tuple:
        return (ctx.in_block_rate('low'), ctx.in_block_rate('high'))

    def _crits_grid(self, ctx) -> tuple:
        return (ctx.in_block_rate_grid('low'),
                ctx.in_block_rate_grid('high'))


@register('signals.chain.fx.LowPass')
class LowPass(SingleCritFilter):

    def type_code(self) -> str:
        return _filters.LOWPASS


@register('signals.chain.fx.HighPass')
class HighPass(SingleCritFilter):

    def type_code(self) -> str:
        return _filters.HIGHPASS


@register('signals.chain.fx.BandPass')
class BandPass(DoubleCritFilter):

    def type_code(self) -> str:
        return _filters.BANDPASS


@register('signals.chain.fx.BandStop')
class BandStop(DoubleCritFilter):

    def type_code(self) -> str:
        return _filters.BANDSTOP


class ParametricFilter(CritFilter, abc.ABC):
    """RBJ audio-EQ-cookbook biquads (peaking EQ, shelves, notch,
    allpass) — the parametric-EQ family the reference lacks (its only
    filters are the four Butterworth types, ``fx.py:142-163``).

    Same :class:`CritFilter` contract as the Butterworth nodes — the
    center/corner frequency, Q, and gain are *signals* sampled at block
    rate (an LFO on ``freq`` is a wah / sweepable EQ), coefficients are
    designed in float64 inside the compiled program
    (:func:`signals_tpu.compiler.filters._design_eq`), and every
    execution path (context windows, exact streaming, mega windows, the
    packed Pallas cascade, the mix epilogue) runs them unchanged.

    Port conventions: an unconnected ``q`` reads as 0 and means
    "default Q" (1/√2); an unconnected ``gain`` means 0 dB (neutral).
    Q is clipped to the coupled-form complex-pole domain — a peaking cut
    needs ``2·Q·10^(g/40) > 1`` — see the design docstring.

    Precision: resonance amplifies float32 recurrence rounding, so
    engine parity vs the float64 pull oracle scales with Q — ≤1e-5 for
    Q ≤ ~4, ~5e-5 at Q = 8, ~1e-4 at Q = 16 (flat in render length; the
    context windows are self-contained).  Measured and pinned in
    ``tests/test_eq.py``.
    """

    freq: Receiver.BoundPort = port('freq')
    q: Receiver.BoundPort = port('q')


class GainParametricFilter(ParametricFilter, abc.ABC):
    """Parametric types with a boost/cut amount: crits (freq, gain, q)."""

    gain: Receiver.BoundPort = port('gain')

    def _crit_port_names(self) -> tuple:
        return ('freq', 'gain', 'q')

    def _crits(self, ctx: KernelCtx) -> tuple:
        return (ctx.in_block_rate('freq'), ctx.in_block_rate('gain'),
                ctx.in_block_rate('q'))

    def _crits_grid(self, ctx) -> tuple:
        return (ctx.in_block_rate_grid('freq'),
                ctx.in_block_rate_grid('gain'),
                ctx.in_block_rate_grid('q'))


class GainlessParametricFilter(ParametricFilter, abc.ABC):
    """Parametric types without a gain: crits (freq, q)."""

    def _crit_port_names(self) -> tuple:
        return ('freq', 'q')

    def _crits(self, ctx: KernelCtx) -> tuple:
        return (ctx.in_block_rate('freq'), ctx.in_block_rate('q'))

    def _crits_grid(self, ctx) -> tuple:
        return (ctx.in_block_rate_grid('freq'),
                ctx.in_block_rate_grid('q'))


@register()
class Peak(GainParametricFilter):
    """Peaking (bell) EQ: boost/cut of ``gain`` dB around ``freq``,
    bandwidth set by ``q``; unity far from the center."""

    def type_code(self) -> str:
        return _filters.PEAK


@register()
class LowShelf(GainParametricFilter):
    """Low shelf: ``gain`` dB below the corner, unity above."""

    def type_code(self) -> str:
        return _filters.LOWSHELF


@register()
class HighShelf(GainParametricFilter):
    """High shelf: ``gain`` dB above the corner, unity below."""

    def type_code(self) -> str:
        return _filters.HIGHSHELF


@register()
class Notch(GainlessParametricFilter):
    """Notch: kills a narrow band around ``freq``, unity elsewhere."""

    def type_code(self) -> str:
        return _filters.NOTCH


@register()
class Allpass(GainlessParametricFilter):
    """Second-order allpass: unit magnitude everywhere, phase rotation
    around ``freq`` — the phaser/dispersion building block."""

    def type_code(self) -> str:
        return _filters.ALLPASS


@register()
class Quantize(Effect):
    """Pitch quantizer: snap a control signal in Hz to the nearest tone of
    an equal-temperament scale (semitone pitch classes in ``scale``,
    relative to ``root`` Hz).  Feed a
    :class:`~signals_tpu.nodes.noise.SampleHold` through it into an
    oscillator for the classic generative random-melody patch.  Stateless
    and elementwise (no reference counterpart).

    Parity caveat: the output is Hz-valued through log/pow
    transcendentals, so engines agree to ~2e-5 *relative* (frequency
    ulps), not the absolute audio tolerance; and inputs astronomically
    close to a tone boundary may snap differently across engines — by
    construction the output is then a legitimate scale tone either way.
    """

    input: Receiver.BoundPort = port('input')

    class State(Effect.State):
        #: semitone pitch classes of the scale (e.g. major =
        #: [[0,2,4,5,7,9,11]]); traced: re-scale without recompiling
        scale: np.ndarray = Param(
            lambda: np.arange(12, dtype=np.float32).reshape(1, -1),
            validate=lambda v: None if (isinstance(v, np.ndarray)
                                        and v.ndim == 2 and v.size > 0)
            else 'must be a non-empty 2D array',
            convert=lambda v: np.asarray(v, dtype=np.float32)
            if isinstance(v, (np.ndarray, list, tuple)) else v,
            traced=True)
        #: reference frequency of pitch class 0
        root: float = Param(261.6256, validate=ge(1.0), traced=True)

    def kernel(self, ctx: KernelCtx):
        xp = ctx.xp
        hz = xp.maximum(ctx.in_('input'), F32(1e-3))    # (F, C)
        root = ctx.xp.asarray(ctx.param('root'),
                               dtype=np.float32).reshape(())
        scale = ctx.param('scale').reshape(-1)           # (K,)
        semis = F32(12.0) * (xp.log(hz / root)
                             * F32(1.0 / np.log(2.0)))   # (F, C)
        octave = xp.floor(semis * F32(1.0 / 12.0)) * F32(12.0)
        pc = semis - octave                              # [0, 12)
        # candidate tones: scale degrees in this octave and both neighbors
        cands = xp.concatenate([scale - F32(12.0), scale,
                                scale + F32(12.0)])      # (3K,)
        dist = xp.abs(pc[:, :, None] - cands)            # (F, C, 3K)
        best = xp.argmin(dist, axis=2)
        tone = cands[best]                               # (F, C)
        return root * F32(2.0) ** ((octave + tone) * F32(1.0 / 12.0))
