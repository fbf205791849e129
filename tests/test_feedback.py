"""Loop-free delay/feedback rendering (``compiler/feedback.py``).

The affine delay-loop solver must be sample-equivalent to the per-block
scan engine (and the numpy pull oracle) for every supported structure —
and must *decline* (plan None, falling back to the scan) for structures
it cannot solve.  Reference behavior preserved throughout: block-quantized
feedback through :class:`~signals_tpu.nodes.delay.Delay`
(``src/signals/__init__.py:28-29`` declares CYCLIC; the delay semantics
are this framework's, SURVEY §7 hard part 4).
"""

import numpy as np
import pytest

from conftest import pull_blocks

import signals_tpu.compiler as C
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.delay import Delay
from signals_tpu.nodes.fixed import Fixed
from signals_tpu.nodes.fx import Drive, Gain, Mix, RingMod
from signals_tpu.nodes.osc import Sine

F = 512
RATE = 44100


def fixed(v):
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(v, dtype=np.float32))
    return f


def echo_patch(*, delay_frames=3 * F + 17, feedback=0.45):
    """sine -> mix <- gain <- delay <- mix (the classic feedback echo)."""
    osc = Sine()
    osc.hertz = fixed(110.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = delay_frames
    fb = Gain()
    fb.left = d
    fb.right = fixed(feedback)
    mix.left = osc
    mix.right = fb
    mix.mix = fixed(0.6)
    d.input = mix
    return mix, d


def render_both(root, n_blocks, *, position=0, channels=1):
    """(loop-free render, forced per-block scan render)."""
    a = compile_node(root, block_frames=F, rate=RATE,
                     channels=channels)
    fast, _ = a.render(position=position, n_blocks=n_blocks,
                       deliver_taps=False)
    C._compile_cache.clear()
    b = compile_node(root, block_frames=F, rate=RATE, channels=channels)
    b.enable_mega = False
    slow, _ = b.render(position=position, n_blocks=n_blocks,
                       deliver_taps=False)
    C._compile_cache.clear()
    return fast, slow


class TestAffineCycle:

    def test_plan_recognized(self):
        root, d = echo_patch()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        plan = c.delay_mega_plan()
        assert plan is not None
        assert plan.cyclic[id(d)]
        C._compile_cache.clear()

    def test_matches_scan_and_oracle(self):
        root, _ = echo_patch()
        fast, slow = render_both(root, 17)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(root, 17, block_frames=F, rate=RATE)
        assert np.abs(fast - oracle).max() < 1e-6

    def test_carry_continuation(self):
        root, _ = echo_patch()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        a, carry = c.render(position=0, n_blocks=9, deliver_taps=False)
        b, _ = c.render(position=9 * F, n_blocks=5, carry=carry,
                        deliver_taps=False)
        oracle = pull_blocks(root, 14, block_frames=F, rate=RATE)
        got = np.concatenate([a, b])
        assert np.abs(got - oracle).max() < 1e-6
        C._compile_cache.clear()

    def test_block_multiple_delay(self):
        root, _ = echo_patch(delay_frames=4 * F)
        fast, slow = render_both(root, 13)
        assert np.abs(fast - slow).max() < 1e-6

    def test_high_feedback_stability(self):
        # |g| close to 1: the segment scan's reassociation must not blow
        # up the error relative to the sequential evaluation
        root, _ = echo_patch(feedback=0.95)
        fast, slow = render_both(root, 25)
        assert np.abs(fast - slow).max() < 1e-5

    def test_disabled_delay_outputs_dry(self):
        root, d = echo_patch()
        d.get_state().enabled = False
        fast, slow = render_both(root, 9)
        assert np.abs(fast - slow).max() < 1e-6
        # disabled feedback = pure dry path
        osc = Sine()
        osc.hertz = fixed(110.0)
        g = Gain()
        g.left = osc
        g.right = fixed(0.6)
        dry = pull_blocks(g, 9, block_frames=F, rate=RATE)
        assert np.abs(fast - dry).max() < 1e-6

    def test_ringmod_on_cycle(self):
        # d * lfo is affine in d (lfo off-cycle)
        osc = Sine()
        osc.hertz = fixed(220.0)
        lfo = Sine()
        lfo.hertz = fixed(2.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 2 * F
        rm = RingMod()
        rm.left = d
        rm.right = lfo
        mix.left = osc
        mix.right = rm
        mix.mix = fixed(0.5)
        d.input = mix
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is not None
        C._compile_cache.clear()
        fast, slow = render_both(mix, 11)
        assert np.abs(fast - slow).max() < 1e-6


class TestNonCyclic:

    def test_shifted_read(self):
        # echo send without feedback: delay input independent of output
        osc = Sine()
        osc.hertz = fixed(330.0)
        d = Delay()
        d.get_state().frames = 2 * F + 5
        d.input = osc
        out = Mix()
        out.left = osc
        out.right = d
        out.mix = fixed(0.7)
        c = compile_node(out, block_frames=F, rate=RATE, channels=1)
        plan = c.delay_mega_plan()
        assert plan is not None and not plan.cyclic[id(d)]
        C._compile_cache.clear()
        fast, slow = render_both(out, 9)
        assert np.abs(fast - slow).max() < 1e-6

    def test_delay_chain(self):
        # d1 feeds d2 (no cycles): solves in dependency order
        osc = Sine()
        osc.hertz = fixed(110.0)
        d1 = Delay()
        d1.get_state().frames = F
        d1.input = osc
        d2 = Delay()
        d2.get_state().frames = 2 * F
        d2.input = d1
        out = Mix()
        out.left = d1
        out.right = d2
        out.mix = fixed(0.5)
        c = compile_node(out, block_frames=F, rate=RATE, channels=1)
        plan = c.delay_mega_plan()
        assert plan is not None
        assert [n for n in plan.order] == [d1, d2]
        C._compile_cache.clear()
        fast, slow = render_both(out, 8)
        assert np.abs(fast - slow).max() < 1e-6


class TestFallback:

    def test_nonlinear_loop_declines(self):
        # Drive (tanh) on the feedback path: not affine -> per-block scan
        osc = Sine()
        osc.hertz = fixed(110.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 2 * F
        shaper = Drive()
        shaper.input = d
        shaper.drive = fixed(2.0)
        mix.left = osc
        mix.right = shaper
        mix.mix = fixed(0.5)
        d.input = mix
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        # and the scan path still renders it correctly vs the oracle
        got, _ = c.render(position=0, n_blocks=7, deliver_taps=False)
        oracle = pull_blocks(mix, 7, block_frames=F, rate=RATE)
        assert np.abs(got - oracle).max() < 1e-6
        C._compile_cache.clear()

    def test_coupled_delays_decline(self):
        # two delays feeding each other: a 2-state system, scan path
        d1 = Delay()
        d1.get_state().frames = F
        d2 = Delay()
        d2.get_state().frames = F
        g1 = Gain()
        g1.left = d2
        g1.right = fixed(0.5)
        g2 = Gain()
        g2.left = d1
        g2.right = fixed(0.5)
        osc = Sine()
        osc.hertz = fixed(110.0)
        m1 = Mix()
        m1.left = osc
        m1.right = g1
        m1.mix = fixed(0.5)
        d1.input = m1
        m2 = Mix()
        m2.left = d1
        m2.right = g2
        m2.mix = fixed(0.5)
        d2.input = m2
        out = Mix()
        out.left = m1
        out.right = m2
        out.mix = fixed(0.5)
        c = compile_node(out, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        C._compile_cache.clear()

    def test_gain_exponent_on_cycle_declines(self):
        # block-rate port fed from the cycle: not frame-local
        osc = Sine()
        osc.hertz = fixed(110.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 2 * F
        g = Gain()
        g.left = osc
        g.right = d          # block-rate port on-cycle
        mix.left = osc
        mix.right = g
        mix.mix = fixed(0.5)
        d.input = mix
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        C._compile_cache.clear()


class TestFmUnderMega:

    def test_nested_block_rate_chain(self):
        """FM operator stacks sample each modulator once per block; under
        a mega window those nested block-rate chains must sample at every
        grid position (a regression: they froze at the first block)."""
        op3 = Sine()
        op3.hertz = fixed(660.0)
        i3 = Gain()
        i3.left = op3
        i3.right = fixed(1.5)
        op2 = Sine()
        op2.hertz = fixed(220.0)
        op2.phase = i3
        i2 = Gain()
        i2.left = op2
        i2.right = fixed(2.0)
        op1 = Sine()
        op1.hertz = fixed(110.0)
        op1.phase = i2
        mix = Mix()
        d = Delay()
        d.get_state().frames = 4 * F
        fb = Gain()
        fb.left = d
        fb.right = fixed(0.45)
        mix.left = op1
        mix.right = fb
        mix.mix = fixed(0.6)
        d.input = mix
        fast, slow = render_both(mix, 12)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(mix, 12, block_frames=F, rate=RATE)
        assert np.abs(fast - oracle).max() < 1e-6


class TestTapsThroughSolver:

    def test_vis_tap_feed_preserved(self):
        from signals_tpu.nodes.vis import Wave
        root, _ = echo_patch()
        tap = Wave()
        tap.input = root
        c = compile_node(tap, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is not None
        audio, _ = c.render(position=0, n_blocks=6, deliver_taps=True)
        got = tap.drain(6 * F)
        assert got, 'vis tap received no blocks through the delay solver'
        fed = np.concatenate([np.broadcast_to(b, (F, 1)) for b in got])
        assert np.allclose(fed, audio, atol=1e-6)
        C._compile_cache.clear()


class TestSegmentScan:
    """The segmented feedback scan (``CompiledPatch.segment_scan_core``):
    loops the affine solver rejects render as a ``lax.scan`` over
    D-bounded whole segments — same semantics as the per-block scan,
    paid once per ``floor(D/F)`` blocks."""

    def _drive_echo(self, delay_frames=5 * F + 17):
        osc = Sine()
        osc.hertz = fixed(110.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = delay_frames
        fb = Gain()
        fb.left = d
        fb.right = fixed(0.6)
        shaper = Drive()
        shaper.input = fb
        shaper.drive = fixed(2.5)
        mix.left = osc
        mix.right = shaper
        mix.mix = fixed(0.55)
        d.input = mix
        return mix, d

    def test_nonlinear_loop_segments(self):
        root, _ = self._drive_echo()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None          # tanh: not affine
        assert c.segment_scan_core(15) is not None  # S = 5, 3 segments
        C._compile_cache.clear()
        fast, slow = render_both(root, 15)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(root, 15, block_frames=F, rate=RATE)
        assert np.abs(fast - oracle).max() < 1e-6

    def test_coupled_pingpong_segments(self):
        osc = Sine()
        osc.hertz = fixed(220.0)
        dA = Delay()
        dA.get_state().frames = 4 * F
        dB = Delay()
        dB.get_state().frames = 6 * F + 3
        gA = Gain()
        gA.left = dB
        gA.right = fixed(0.5)
        gB = Gain()
        gB.left = dA
        gB.right = fixed(0.55)
        mixA = Mix()
        mixA.left = osc
        mixA.right = gA
        mixA.mix = fixed(0.5)
        dA.input = mixA
        dB.input = gB
        out = Mix()
        out.left = dA
        out.right = dB
        out.mix = fixed(0.5)
        c = compile_node(out, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None          # mutually coupled
        assert c.segment_scan_core(16) is not None  # S = 4
        C._compile_cache.clear()
        fast, slow = render_both(out, 16)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(out, 16, block_frames=F, rate=RATE)
        assert np.abs(fast - oracle).max() < 1e-6

    def test_streaming_filter_in_loop(self):
        # the classic dub delay: a damping filter inside the feedback
        # path; its exact-streaming state chains across segments
        from signals_tpu.nodes.fx import LowPass
        osc = Sine()
        osc.hertz = fixed(110.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 6 * F + 5
        lp = LowPass()
        lp.input = d
        lp.cutoff = fixed(1500.0)
        lp.get_state().streaming = True
        fb = Gain()
        fb.left = lp
        fb.right = fixed(0.6)
        mix.left = osc
        mix.right = fb
        mix.mix = fixed(0.55)
        d.input = mix
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        assert c.segment_scan_core(18) is not None  # S = 6
        C._compile_cache.clear()
        fast, slow = render_both(mix, 18)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(mix, 18, block_frames=F, rate=RATE)
        assert np.abs(fast - oracle).max() < 1e-6

    def test_carry_continuation(self):
        root, _ = self._drive_echo()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        a, carry = c.render(position=0, n_blocks=10, deliver_taps=False)
        b, _ = c.render(position=10 * F, n_blocks=10, carry=carry,
                        deliver_taps=False)
        oracle = pull_blocks(root, 20, block_frames=F, rate=RATE)
        got = np.concatenate([a, b])
        assert np.abs(got - oracle).max() < 1e-6
        C._compile_cache.clear()

    def test_short_delay_falls_back(self):
        # one-block delay: S_max = 1, segment scan declines, the
        # per-block scan still renders correctly
        root, _ = self._drive_echo(delay_frames=F)
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        assert c.segment_scan_core(16) is None
        got, _ = c.render(position=0, n_blocks=8, deliver_taps=False)
        oracle = pull_blocks(root, 8, block_frames=F, rate=RATE)
        assert np.abs(got - oracle).max() < 1e-6
        C._compile_cache.clear()

    def test_block_rate_pull_of_delay_segments(self):
        # a delayed signal driving a block-rate port is consumed at a
        # strided non-main window — still entirely in the past, so the
        # carried buffer serves it and the segment plan holds.  (The
        # pull engine cannot express this patch at all — Delay requires
        # block-monotonic pulls — so the check is segment vs per-block.)
        def build():
            osc = Sine()
            osc.hertz = fixed(110.0)
            mix = Mix()
            d = Delay()
            d.get_state().frames = 4 * F
            g = Gain()
            g.left = osc
            g.right = d          # block-rate pull of the delay
            shaper = Drive()
            shaper.input = g
            shaper.drive = fixed(2.0)
            mix.left = osc
            mix.right = shaper
            mix.mix = fixed(0.5)
            d.input = mix
            return mix

        mix = build()
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        assert c.segment_scan_core(16) is not None   # S = 4
        got, _ = c.render(position=0, n_blocks=16, deliver_taps=False)
        assert np.isfinite(got).all()
        C._compile_cache.clear()
        mix2 = build()
        c2 = compile_node(mix2, block_frames=F, rate=RATE, channels=1)
        c2.enable_mega = False
        ref, _ = c2.render(position=0, n_blocks=16, deliver_taps=False)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() == 0.0
        C._compile_cache.clear()

    def test_compressor_in_loop_segments(self):
        # a Compressor inside the feedback loop reads the delay at a
        # context window (W-frame lookback, entirely past frames) — the
        # carried buffer, sized D + W by the collect pass, serves it
        from signals_tpu.nodes.dyn import Compressor

        def build():
            osc = Sine()
            osc.hertz = fixed(110.0)
            mix = Mix()
            d = Delay()
            d.get_state().frames = 4 * F
            comp = Compressor()
            comp.get_state().window = 2 * F
            comp.get_state().threshold = 0.3
            comp.input = d
            g = Gain()
            g.left = comp
            g.right = fixed(0.6)
            mix.left = osc
            mix.right = g
            mix.mix = fixed(0.5)
            d.input = mix
            return mix

        mix = build()
        c = compile_node(mix, block_frames=F, rate=RATE, channels=1)
        assert c.segment_scan_core(16) is not None   # S = 4
        got, _ = c.render(position=0, n_blocks=16, deliver_taps=False)
        C._compile_cache.clear()
        mix2 = build()
        c2 = compile_node(mix2, block_frames=F, rate=RATE, channels=1)
        c2.enable_mega = False
        ref, _ = c2.render(position=0, n_blocks=16, deliver_taps=False)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() == 0.0
        C._compile_cache.clear()
        mix3 = build()
        oracle = pull_blocks(mix3, 16, block_frames=F, rate=RATE)
        assert np.abs(got - oracle).max() < 1e-6

    def test_prime_batch_tail_window(self):
        # n_blocks = 13 shares no divisor >= 2 with S_max = 5: the scan
        # runs 2 five-block segments + a 3-block tail window (a second
        # trace) instead of 13 sequential block steps
        root, _ = self._drive_echo()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        assert c.segment_scan_core(13) is not None
        got, _ = c.render(position=0, n_blocks=13, deliver_taps=False)
        oracle = pull_blocks(root, 13, block_frames=F, rate=RATE)
        assert np.abs(got - oracle).max() < 1e-6
        C._compile_cache.clear()

    def test_vis_tap_through_segments(self):
        from signals_tpu.nodes.vis import Wave
        root, _ = self._drive_echo()
        tap = Wave()
        tap.input = root
        c = compile_node(tap, block_frames=F, rate=RATE, channels=1)
        assert c.delay_mega_plan() is None
        assert c.segment_scan_core(10) is not None
        audio, _ = c.render(position=0, n_blocks=10, deliver_taps=True)
        got = tap.drain(10 * F)
        assert got, 'vis tap received no blocks through the segment scan'
        fed = np.concatenate([np.broadcast_to(b, (F, 1)) for b in got])
        assert np.allclose(fed, audio, atol=1e-6)
        C._compile_cache.clear()


class TestContextOverDelay:
    """Context (non-streaming) filters fed by a Delay: the pull engine
    must serve the filter's lookback from the delay's retained input
    line.  Regression: the old pull path re-initialized the delay carry
    on any backward request, silencing (and corrupting) every context
    filter downstream of a delay while the compiled engine rendered it
    correctly — an engine-parity break of ~0.5 full scale."""

    def _send(self):
        from signals_tpu.nodes.fx import LowPass
        osc = Sine()
        osc.hertz = fixed(110.0)
        d = Delay()
        d.get_state().frames = 6 * F + 5
        d.input = osc
        lp = LowPass()
        lp.input = d
        lp.cutoff = fixed(1500.0)
        out = Mix()
        out.left = osc
        out.right = lp
        out.mix = fixed(0.5)
        return out

    def _loop(self):
        from signals_tpu.nodes.fx import LowPass
        osc = Sine()
        osc.hertz = fixed(110.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 6 * F + 5
        lp = LowPass()
        lp.input = d
        lp.cutoff = fixed(1500.0)
        fb = Gain()
        fb.left = lp
        fb.right = fixed(0.6)
        mix.left = osc
        mix.right = fb
        mix.mix = fixed(0.55)
        d.input = mix
        return mix

    def test_context_filter_on_delay_send(self):
        root = self._send()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        got, _ = c.render(position=0, n_blocks=12, deliver_taps=False)
        C._compile_cache.clear()
        oracle = pull_blocks(self._send(), 12, block_frames=F, rate=RATE)
        err = np.abs(got - oracle).max()
        assert err < 1e-6, err
        # the echo must actually be audible past the delay horizon
        assert np.abs(oracle[7 * F:]).max() > 0.1

    def test_context_filter_in_feedback_loop(self):
        root = self._loop()
        c = compile_node(root, block_frames=F, rate=RATE, channels=1)
        # the affine solver declines (a filter convolves over time), but
        # the segment scan holds: the context filter reads the delay at a
        # pure-lookback window, served from the carried buffer
        assert c.delay_mega_plan() is None
        assert c.segment_scan_core(18) is not None   # S = 6
        got, _ = c.render(position=0, n_blocks=18, deliver_taps=False)
        C._compile_cache.clear()
        oracle = pull_blocks(self._loop(), 18, block_frames=F, rate=RATE)
        err = np.abs(got - oracle).max()
        assert err < 1e-6, err
