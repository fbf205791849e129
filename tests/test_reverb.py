"""FDN reverb: engine parity, decay physics, transport semantics."""

import numpy as np

import signals_tpu.compiler as comp
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine, Square
from signals_tpu.nodes.reverb import Reverb
from tests.conftest import fixed, pull_blocks

F, RATE = 512, 44100


def build(t60=0.8, mix=0.5):
    # a short square burst through the reverb: gate the sine with a slow
    # square so the tail is audible in isolation
    carrier = Sine()
    carrier.hertz = fixed(440.0)
    gate = Square()
    gate.hertz = fixed(1.0)
    from signals_tpu.nodes.fx import RingMod
    g01 = Gain()                  # (gate+1)/2 in [0,1]
    g01.left = gate
    g01.right = fixed(0.5)
    burst = RingMod()
    burst.left = carrier
    burst.right = g01
    rv = Reverb()
    rv.input = burst
    st = rv.get_state()
    st.t60 = t60
    st.mix = mix
    return rv


def test_reverb_parity():
    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    got, _ = c.render(n_blocks=40, deliver_taps=False)
    oracle = pull_blocks(build(), 40, block_frames=F, channels=1)
    assert np.abs(got - oracle).max() <= 1e-5


def test_reverb_tail_decays_at_t60_rate():
    """Impulse energy decays ~60 dB over t60 seconds (FDN physics)."""
    from signals_tpu.nodes.files import FileReader  # noqa: F401 (import check)
    rv = Reverb()
    st = rv.get_state()
    st.t60 = 0.5
    st.mix = 1.0
    # drive with a one-block burst then silence via the pull engine's
    # step: feed an impulse through a Fixed that we then zero
    src = fixed(1.0)
    rv.input = src
    comp._compile_cache.clear()
    c = compile_node(rv, block_frames=F, rate=RATE, channels=1)
    # one second of constant input, then cut the value to zero and render
    # the tail from the carried state
    _, carry = c.render(n_blocks=int(RATE / F), deliver_taps=False)
    src.get_state().value = np.array([[0.0]], dtype=np.float32)
    pos = int(RATE / F) * F
    tail, carry = c.render(position=pos, n_blocks=int(RATE / F),
                           carry=carry, deliver_taps=False)
    early = float(np.sqrt((tail[:2048] ** 2).mean()))
    late = float(np.sqrt((tail[-2048:] ** 2).mean()))
    assert early > 0                      # a tail exists
    # ~0.9 s into a 0.5 s t60 tail: at least ~50 dB down
    assert late < early * 10 ** (-30 / 20)


def test_reverb_mix_zero_is_dry():
    comp._compile_cache.clear()
    rv = build(mix=0.0)
    c = compile_node(rv, block_frames=F, rate=RATE, channels=1)
    got, _ = c.render(n_blocks=8, deliver_taps=False)
    dry = pull_blocks(build(mix=0.0).input.sig, 8, block_frames=F,
                      channels=1)
    np.testing.assert_allclose(got, dry, atol=1e-6)


def test_reverb_t60_is_traced():
    rv = build()
    comp._compile_cache.clear()
    c = compile_node(rv, block_frames=F, rate=RATE, channels=1)
    h = c.graph_hash
    a, _ = c.render(n_blocks=6, deliver_taps=False)
    rv.get_state().t60 = 3.5              # edit without recompiling
    c2 = compile_node(rv, block_frames=F, rate=RATE, channels=1)
    assert c2 is c and c2.graph_hash == h
    b, _ = c2.render(n_blocks=6, deliver_taps=False)
    assert not np.array_equal(a, b)


def test_reverb_mega_path_engages_and_matches_scan():
    """Reverb now mega-steps (a lines-only lax.scan): patches with a
    reverb take the whole-window path instead of the full-patch
    per-block scan.  Must agree with the forced per-block render to
    ~1 ulp and chain carry across dispatches."""
    comp._compile_cache.clear()
    c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    assert c.mega_compatible and c._use_mega
    fast, carry = c.render(n_blocks=30, deliver_taps=False)
    comp._compile_cache.clear()
    b = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    b.enable_mega = False
    slow, _ = b.render(n_blocks=30, deliver_taps=False)
    assert np.abs(fast - slow).max() < 1e-6
    # two-dispatch carry chain matches the one-shot oracle
    more, _ = c.render(position=30 * F, n_blocks=10, carry=carry,
                       deliver_taps=False)
    oracle = pull_blocks(build(), 40, block_frames=F, channels=1)
    got = np.concatenate([fast, more])
    assert np.abs(got - oracle).max() <= 1e-5
    comp._compile_cache.clear()


def test_reverb_inside_delay_feedback_paths():
    """An affine echo feeding a reverb: the delay solver (or segment
    scan) must accept the reverb's mega_step and stay parity-clean."""
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Mix

    def patch():
        osc = Sine()
        osc.hertz = fixed(220.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 8 * F
        fb = Gain()
        fb.left = d
        fb.right = fixed(0.5)
        mix.left = osc
        mix.right = fb
        mix.mix = fixed(0.5)
        d.input = mix
        rv = Reverb()
        rv.input = mix
        rv.get_state().t60 = 1.2
        rv.get_state().mix = 0.3
        return rv

    comp._compile_cache.clear()
    c = compile_node(patch(), block_frames=F, rate=RATE, channels=1)
    got, _ = c.render(n_blocks=16, deliver_taps=False)
    oracle = pull_blocks(patch(), 16, block_frames=F, channels=1)
    assert np.abs(got - oracle).max() <= 1e-5
    comp._compile_cache.clear()
