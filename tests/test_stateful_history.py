"""Context/history reads of *stateful* nodes, in both engines.

A context consumer (Compressor, context filter) or a block-rate port may
read a stateful node's output at a window that lies partly or wholly in
the past.  The compiled engine serves those from the node's ``hist``
carry ring (sized by the collect pass) — in per-block, mega, and
segmented-feedback lowering alike; the pull engine serves them from a
retained output line (:meth:`StatefulEmitter._read_out_history`).

Regression: the pull engine used to *re-initialize the carry to zeros*
and re-step the past from fresh state on any history request that missed
the block cache (a multi-block lookback can never hit it — the cache
holds single blocks), so every context consumer downstream of a stateful
node read differently-rendered past frames (~4e-2 error vs the compiled
engine on a reverb->compressor bus).  And the compiled mega path refused
any non-main window of a mega-stepped node outright, demoting master-bus
chains (reverb -> compressor) to the per-block scan.
"""

import numpy as np
import pytest

import signals_tpu.compiler as C
from signals_tpu.compiler import compile_node
from signals_tpu.core import ChainLayerError
from signals_tpu.graph import Request
from signals_tpu.nodes.delay import Delay
from signals_tpu.nodes.dyn import Compressor
from signals_tpu.nodes.fx import Gain, LowPass, Mix
from signals_tpu.nodes.osc import Sawtooth, Sine
from signals_tpu.nodes.reverb import Reverb
from tests.conftest import fixed, pull_blocks

F, RATE = 512, 44100


def _render(build, n, *, mega):
    root = build()
    c = compile_node(root, block_frames=F, rate=RATE, channels=1)
    if not mega:
        c.enable_mega = False
    got, _ = c.render(position=0, n_blocks=n, deliver_taps=False)
    C._compile_cache.clear()
    return np.asarray(got).reshape(n * F, -1)


def _check_all_paths(build, n=24, tol=1e-6):
    """mega/segment render == per-block render == numpy pull oracle."""
    fast = _render(build, n, mega=True)
    slow = _render(build, n, mega=False)
    assert np.abs(fast - slow).max() < tol
    oracle = pull_blocks(build(), n, block_frames=F, rate=RATE)
    assert np.abs(fast - oracle).max() < tol
    return fast


def _reverb_comp(w=2 * F):
    def build():
        osc = Sine()
        osc.hertz = fixed(220.0)
        rv = Reverb()
        rv.input = osc
        comp = Compressor()
        comp.get_state().window = w
        comp.get_state().threshold = 0.2
        comp.input = rv
        g = Gain()
        g.left = comp
        g.right = fixed(0.9)
        return g
    return build


class TestPullEngineHistory:
    def test_compressor_over_reverb_matches_compiled(self):
        build = _reverb_comp()
        slow = _render(build, 24, mega=False)
        oracle = pull_blocks(build(), 24, block_frames=F, rate=RATE)
        assert np.abs(slow - oracle).max() < 1e-6

    def test_deep_lookback_beyond_initial_retention(self):
        # W = 20 blocks > the 16-block initial retention: the keep
        # target must adapt as the clamped lookback deepens
        build = _reverb_comp(w=20 * F)
        slow = _render(build, 30, mega=False)
        oracle = pull_blocks(build(), 30, block_frames=F, rate=RATE)
        assert np.abs(slow - oracle).max() < 1e-6

    def test_midstream_attach_raises(self):
        # a history read deeper than anything retained, starting AFTER
        # the stream start (so not a restart), is an error, never
        # silence: 20 blocks rendered, retention 16 -> a read at block 2
        # needs 18 blocks of lookback
        from signals_tpu.core import BlockLoc, Shape
        rv = Reverb()
        osc = Sine()
        osc.hertz = fixed(220.0)
        rv.input = osc
        for b in range(20):
            loc = BlockLoc(position=b * F, rate=RATE,
                           shape=Shape(frames=F, channels=1))
            rv.respond(Request(requestor=None, port='t', loc=loc))
        past = BlockLoc(position=2 * F, rate=RATE,
                        shape=Shape(frames=F, channels=1))
        with pytest.raises(ChainLayerError, match='history'):
            rv.respond(Request(requestor=None, port='t', loc=past))


class TestMegaHistory:
    def test_reverb_to_compressor_rides_mega(self):
        build = _reverb_comp()
        c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
        assert c.mega_compatible and c._use_mega
        C._compile_cache.clear()
        _check_all_paths(build)

    def test_split_batch_hist_continuation(self):
        # the hist ring must chain across render calls bit-consistently
        build = _reverb_comp()
        c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
        a, carry = c.render(position=0, n_blocks=12, deliver_taps=False)
        b, _ = c.render(position=12 * F, n_blocks=12, carry=carry,
                        deliver_taps=False)
        got = np.concatenate([np.asarray(a), np.asarray(b)]).reshape(-1, 1)
        C._compile_cache.clear()
        oracle = pull_blocks(build(), 24, block_frames=F, rate=RATE)
        assert np.abs(got - oracle).max() < 1e-6

    def test_streaming_filter_to_compressor(self):
        def build():
            saw = Sawtooth()
            saw.hertz = fixed(110.0)
            lp = LowPass()
            lp.input = saw
            lp.cutoff = fixed(800.0)
            lp.get_state().streaming = True
            comp = Compressor()
            comp.get_state().window = 3 * F
            comp.get_state().threshold = 0.2
            comp.input = lp
            g = Gain()
            g.left = comp
            g.right = fixed(0.8)
            return g
        _check_all_paths(build, tol=2e-6)

    def test_stereo_master_bus(self):
        # multi-channel hist rings: a panned (stereo) source through
        # reverb -> compressor must agree across all paths per channel
        from signals_tpu.nodes.fx import Pan

        def build():
            osc = Sine()
            osc.hertz = fixed(220.0)
            pan = Pan()
            pan.input = osc
            pan.position = fixed(0.3)
            rv = Reverb()
            rv.input = pan
            comp = Compressor()
            comp.get_state().window = 2 * F
            comp.get_state().threshold = 0.2
            comp.input = rv
            g = Gain()
            g.left = comp
            g.right = fixed(0.9)
            return g

        def render(mega):
            root = build()
            c = compile_node(root, block_frames=F, rate=RATE, channels=2)
            if not mega:
                c.enable_mega = False
            got, _ = c.render(position=0, n_blocks=16, deliver_taps=False)
            C._compile_cache.clear()
            return np.asarray(got).reshape(16 * F, 2)

        fast, slow = render(True), render(False)
        assert np.abs(fast - slow).max() < 1e-6
        oracle = pull_blocks(build(), 16, block_frames=F, rate=RATE,
                             channels=2)
        assert np.abs(fast - oracle).max() < 1e-6
        assert np.abs(fast[:, 0] - fast[:, 1]).max() > 1e-3

    def test_stateful_at_block_rate_port(self):
        # the pull engine cannot express this (a block-rate pull would
        # step the node at 1-frame granularity); mega must equal the
        # per-block compiled scan, which serves it from hist
        def build():
            osc = Sine()
            osc.hertz = fixed(220.0)
            rv = Reverb()
            rv.input = osc
            g = Gain()
            g.left = osc
            g.right = rv            # block-rate pull of the reverb
            return g
        fast = _render(build, 24, mega=True)
        slow = _render(build, 24, mega=False)
        assert np.abs(fast - slow).max() == 0.0
        assert np.abs(fast).max() > 1e-3


class TestSegmentHistory:
    def test_delay_loop_with_reverb_and_compressor(self):
        # master-bus nodes inside a feedback loop: the segment scan
        # serves the reverb's context reads from its hist ring while the
        # delay serves the loop from its carried buffer
        def build():
            osc = Sine()
            osc.hertz = fixed(220.0)
            mix = Mix()
            d = Delay()
            d.get_state().frames = 6 * F
            rv = Reverb()
            rv.input = d
            comp = Compressor()
            comp.get_state().window = 2 * F
            comp.get_state().threshold = 0.25
            comp.input = rv
            fb = Gain()
            fb.left = comp
            fb.right = fixed(0.4)
            mix.left = osc
            mix.right = fb
            mix.mix = fixed(0.5)
            d.input = mix
            return mix
        c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
        assert c.segment_scan_core(24) is not None
        C._compile_cache.clear()
        _check_all_paths(build)

    def test_stream_restart_re_renders(self):
        # a re-pull from the stream start deeper than retention is a
        # RESTART: the carry re-initializes and the audio re-renders
        # bit-identically (deterministic graph), instead of raising
        def build_rv():
            osc = Sine()
            osc.hertz = fixed(220.0)
            rv = Reverb()
            rv.input = osc
            return rv
        rv = build_rv()
        first = pull_blocks(rv, 24, block_frames=F, rate=RATE)
        second = pull_blocks(rv, 24, block_frames=F, rate=RATE)
        assert np.array_equal(first, second)

    def test_delay_replay_restart(self):
        # re-pulling an echo patch from the start (transport replay in
        # the pull engine) re-initializes the delay line instead of
        # raising once the replay outruns retention — and the second
        # run is bit-identical
        def build():
            osc = Sine()
            osc.hertz = fixed(110.0)
            mix = Mix()
            d = Delay()
            d.get_state().frames = 4 * F
            fb = Gain()
            fb.left = d
            fb.right = fixed(0.5)
            mix.left = osc
            mix.right = fb
            mix.mix = fixed(0.5)
            d.input = mix
            return mix
        root = build()
        first = pull_blocks(root, 24, block_frames=F, rate=RATE)
        second = pull_blocks(root, 24, block_frames=F, rate=RATE)
        assert np.array_equal(first, second)

    def test_delay_prestream_window_serves_silence(self):
        # a fully-past window whose backing input span touches the
        # pre-stream region restarts the line and renders correctly
        # (silence here), never raising — even after cache eviction;
        # a window backed strictly inside the stream still raises
        from signals_tpu.core import BlockLoc, Shape
        d = Delay()
        d.get_state().frames = 4 * F
        osc = Sine()
        osc.hertz = fixed(220.0)
        d.input = osc
        for b in range(24):
            loc = BlockLoc(position=b * F, rate=RATE,
                           shape=Shape(frames=F, channels=1))
            d.respond(Request(requestor=None, port='t', loc=loc))
        # in-stream-backed window beyond retention (and past the block
        # cache, which keeps the last 16): a true attach, raises
        mid = BlockLoc(position=6 * F, rate=RATE,
                       shape=Shape(frames=F, channels=1))
        with pytest.raises(ChainLayerError, match='history'):
            d.respond(Request(requestor=None, port='t', loc=mid))
        # pre-stream-backed early window: restart, correct silence
        early = BlockLoc(position=F, rate=RATE,
                         shape=Shape(frames=F, channels=1))
        out = d.respond(Request(requestor=None, port='t', loc=early))
        assert np.abs(np.asarray(out)).max() == 0.0
