"""Compressor: engine parity, ratio law, blocking invariance."""

import numpy as np

import signals_tpu.compiler as comp
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.dyn import Compressor
from signals_tpu.nodes.fx import Gain, RingMod
from signals_tpu.nodes.osc import Sine, Square
from tests.conftest import fixed, pull_blocks

F, RATE = 512, 44100


def build(threshold=0.3, ratio=4.0):
    carrier = Sine()
    carrier.hertz = fixed(330.0)
    gate = Square()                 # amplitude alternates: loud/quiet
    gate.hertz = fixed(2.0)
    lvl = Gain()
    lvl.left = gate
    lvl.right = fixed(0.35)         # +-0.35 -> levels 0.85 / 0.15 with bias
    biased = RingMod()
    biased.left = carrier
    biased.right = lvl
    comp_node = Compressor()
    comp_node.input = biased
    st = comp_node.get_state()
    st.threshold = threshold
    st.ratio = ratio
    return comp_node


def test_compressor_parity():
    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    got, _ = c.render(n_blocks=40, deliver_taps=False)
    oracle = pull_blocks(build(), 40, block_frames=F, channels=1)
    assert np.abs(got - oracle).max() <= 1e-5


def test_compressor_ratio_law():
    """A steady sine above threshold lands at thresh*(rms/thresh)^(1/R)."""
    osc = Sine()
    osc.hertz = fixed(440.0)
    g = Gain()
    g.left = osc
    g.right = fixed(0.8)            # rms ~ 0.566, above thresh 0.2
    cp = Compressor()
    cp.input = g
    st = cp.get_state()
    st.threshold = 0.2
    st.ratio = 4.0
    comp._compile_cache.clear()
    c = compile_node(cp, block_frames=F, rate=RATE, channels=1)
    audio, _ = c.render(n_blocks=60, deliver_taps=False)
    tail = audio[-8192:, 0]
    rms_in = 0.8 / np.sqrt(2.0)
    expect = 0.2 * (rms_in / 0.2) ** (1 / 4.0)
    got = float(np.sqrt((tail ** 2).mean()))
    assert abs(got - expect) / expect < 0.02


def test_compressor_below_threshold_is_transparent():
    osc = Sine()
    osc.hertz = fixed(440.0)
    g = Gain()
    g.left = osc
    g.right = fixed(0.1)            # rms 0.07 < thresh 0.5
    cp = Compressor()
    cp.input = g
    comp._compile_cache.clear()
    c = compile_node(cp, block_frames=F, rate=RATE, channels=1)
    audio, _ = c.render(n_blocks=10, deliver_taps=False)
    # oracle from the actual signal under test (fresh nodes: the pull
    # engine's block caches must not serve the compiled render's graph)
    osc2 = Sine()
    osc2.hertz = fixed(440.0)
    g2 = Gain()
    g2.left = osc2
    g2.right = fixed(0.1)
    dry = pull_blocks(g2, 10, block_frames=F, channels=1)
    np.testing.assert_allclose(audio, dry[:audio.shape[0]], atol=1e-6)


def test_compressor_blocking_invariance():
    """The sliding-window envelope is a function of absolute time: a
    seeked render equals the same span of a long render."""
    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    full, _ = c.render(n_blocks=24, deliver_taps=False)
    seeked, _ = c.render(position=8 * F, n_blocks=8, deliver_taps=False)
    np.testing.assert_allclose(seeked, full[8 * F:16 * F], atol=2e-7)


def test_gate_parity():
    from signals_tpu.nodes.dyn import Gate

    def build():
        carrier = Sine()
        carrier.hertz = fixed(330.0)
        gate_sq = Square()
        gate_sq.hertz = fixed(2.0)
        lvl = Gain()
        lvl.left = gate_sq
        lvl.right = fixed(0.35)
        biased = RingMod()
        biased.left = carrier
        biased.right = lvl
        g = Gate()
        g.input = biased
        st = g.get_state()
        st.threshold = 0.2
        st.ratio = 4.0
        return g

    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    got, _ = c.render(n_blocks=24, deliver_taps=False)
    comp._compile_cache.clear()
    oracle = pull_blocks(build(), 24, block_frames=F, rate=RATE)
    assert np.abs(np.asarray(got).reshape(oracle.shape)
                  - oracle).max() < 1e-6


def test_gate_attenuates_quiet_passes_loud():
    """Static law: a loud RMS section passes at unity; a section at half
    the threshold is attenuated by ~(env/thresh)^(ratio-1)."""
    from signals_tpu.nodes.dyn import Gate

    def tone(level):
        carrier = Sine()
        carrier.hertz = fixed(330.0)
        lvl = Gain()
        lvl.left = carrier
        lvl.right = fixed(level)
        g = Gate()
        g.input = lvl
        st = g.get_state()
        st.threshold = 0.2
        st.ratio = 3.0
        st.window = 512
        return g

    comp._compile_cache.clear()
    loud = pull_blocks(tone(0.5), 12, block_frames=F, rate=RATE)
    quiet = pull_blocks(tone(0.1), 12, block_frames=F, rate=RATE)
    # steady state (after the window warms up)
    l_rms = np.sqrt((loud[6 * F:] ** 2).mean())
    q_rms = np.sqrt((quiet[6 * F:] ** 2).mean())
    assert abs(l_rms - 0.5 / np.sqrt(2)) < 0.02        # unity
    # env = 0.1/sqrt(2) ~ 0.0707 -> gain = (0.0707/0.2)^2 ~ 0.125
    expect = (0.1 / np.sqrt(2) / 0.2) ** 2 * 0.1 / np.sqrt(2)
    assert abs(q_rms - expect) < 0.2 * expect, (q_rms, expect)


def test_gate_floor_bounds_attenuation():
    from signals_tpu.nodes.dyn import Gate

    carrier = Sine()
    carrier.hertz = fixed(330.0)
    lvl = Gain()
    lvl.left = carrier
    lvl.right = fixed(0.01)                 # far below threshold
    g = Gate()
    g.input = lvl
    st = g.get_state()
    st.threshold = 0.2
    st.ratio = 6.0
    st.floor = 0.5
    comp._compile_cache.clear()
    out = pull_blocks(g, 12, block_frames=F, rate=RATE)
    rms = np.sqrt((out[6 * F:] ** 2).mean())
    assert abs(rms - 0.5 * 0.01 / np.sqrt(2)) < 0.001   # clamped at floor


def test_limiter_brick_wall_and_latency():
    """|out| <= ceiling EXACTLY at every sample (by construction), the
    dry path is delayed by exactly `lookahead`, and sub-ceiling audio
    passes bit-transparently."""
    from signals_tpu.nodes.dyn import Limiter
    from signals_tpu.nodes.noise import White

    L = 64

    def build(drive):
        src = White()
        src.get_state().seed = 11
        hot = Gain()
        hot.left = src
        hot.right = fixed(drive)
        lim = Limiter()
        lim.input = hot
        st = lim.get_state()
        st.ceiling = 0.5
        st.lookahead = L
        return lim, hot

    # hot signal: hard bound holds everywhere
    lim, hot = build(2.0)
    comp._compile_cache.clear()
    out = pull_blocks(lim, 16, block_frames=F, rate=RATE)
    assert np.abs(out).max() <= 0.5 + 1e-6, np.abs(out).max()
    # and the limiter actually worked (not silence)
    assert np.abs(out).max() > 0.45

    # quiet signal: bit-transparent, delayed by exactly L
    lim2, hot2 = build(0.3)
    comp._compile_cache.clear()
    out2 = pull_blocks(lim2, 16, block_frames=F, rate=RATE)
    src2 = White()
    src2.get_state().seed = 11
    ref = Gain()
    ref.left = src2
    ref.right = fixed(0.3)
    raw = pull_blocks(ref, 16, block_frames=F, rate=RATE)
    assert np.array_equal(out2[L:], raw[:-L])
    assert np.abs(out2[:L]).max() == 0.0      # pre-stream silence


def test_limiter_parity_all_paths():
    from signals_tpu.nodes.dyn import Limiter

    def build():
        carrier = Sine()
        carrier.hertz = fixed(330.0)
        sq = Square()
        sq.hertz = fixed(3.0)
        lvl = Gain()
        lvl.left = sq
        lvl.right = fixed(0.5)
        burst = RingMod()
        burst.left = carrier
        burst.right = lvl
        hot = Gain()
        hot.left = burst
        hot.right = fixed(3.0)
        lim = Limiter()
        lim.input = hot
        lim.get_state().ceiling = 0.8
        return lim

    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    fast, _ = c.render(n_blocks=16, deliver_taps=False)
    comp._compile_cache.clear()
    c2 = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    c2.enable_mega = False
    slow, _ = c2.render(n_blocks=16, deliver_taps=False)
    comp._compile_cache.clear()
    assert np.abs(np.asarray(fast) - np.asarray(slow)).max() < 1e-6
    oracle = pull_blocks(build(), 16, block_frames=F, rate=RATE)
    assert np.abs(np.asarray(fast).reshape(oracle.shape)
                  - oracle).max() < 1e-6
    assert np.abs(np.asarray(fast)).max() <= 0.8 + 1e-6
