"""Compiled-engine vs pull-interpreter parity: the oracle discipline.

Every patch is rendered both ways; max-abs difference must be ≤ 1e-5
(float32, 44.1 kHz — the BASELINE tolerance).  Most stateless paths are in
fact bit-exact because both engines share kernel definitions and the
compiled engine pins IEEE arithmetic (see ``KernelCtx.rate_f32``).
"""

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.delay import Delay
from signals_tpu.nodes.env import ADSR
from signals_tpu.nodes.fx import (
    Amp,
    BandPass,
    BandStop,
    Gain,
    HighPass,
    LowPass,
    Mix,
    RingMod,
)
from signals_tpu.nodes.noise import White
from signals_tpu.nodes.osc import Sawtooth, Sine, Square, Triangle
from signals_tpu.nodes.shape import Flatten, FlattenUnit, Merge, Select

from conftest import fixed, pull_blocks

F = 512
RATE = 44100
TOL = 1e-5


def _parity(node, *, n_blocks=16, channels=1, tol=TOL, start_block=0):
    compiled = compile_node(node, block_frames=F, rate=RATE,
                            channels=channels)
    audio, _ = compiled.render(position=start_block * F, n_blocks=n_blocks)
    oracle = pull_blocks(node, n_blocks, block_frames=F, rate=RATE,
                         channels=channels, start_block=start_block)
    err = np.abs(audio - oracle).max()
    assert err <= tol, f'engines diverge: max abs err {err}'
    return audio


@pytest.mark.parametrize('cls', [Sine, Square, Sawtooth, Triangle])
def test_oscillators(cls):
    osc = cls()
    osc.hertz = fixed(440.0)
    osc.phase = fixed(0.1)
    _parity(osc)


def test_elementwise_fx():
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    sine = Sine()
    sine.hertz = fixed(3.0)
    m = Mix()
    m.left = saw
    m.right = sine
    m.mix = fixed(0.3)
    r = RingMod()
    r.left = m
    r.right = sine
    g = Gain()
    g.left = r
    g.right = fixed(0.8)
    a = Amp()
    a.left = g
    a.right = fixed(1.5)
    _parity(a)


@pytest.mark.parametrize('mk', [
    lambda: _single(LowPass, 1200.0),
    lambda: _single(HighPass, 500.0),
    lambda: _double(BandPass, 300.0, 3000.0),
    lambda: _double(BandStop, 300.0, 3000.0),
])
def test_filters(mk):
    _parity(mk(), n_blocks=12)


def _single(cls, cutoff):
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    f = cls()
    f.input = saw
    f.cutoff = fixed(cutoff)
    return f


def _double(cls, lo, hi):
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    f = cls()
    f.input = saw
    f.low = fixed(lo)
    f.high = fixed(hi)
    return f


def test_filter_with_time_varying_cutoff():
    """LFO-modulated cutoff: coefficients recomputed per block in both
    engines (reference ``fx.py:99-105`` semantics)."""
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    lfo = Sine()
    lfo.hertz = fixed(2.0)
    g = Gain()
    g.left = lfo
    g.right = fixed(1500.0)
    off = Mix()
    off.left = g
    off.right = fixed(2000.0)
    off.mix = fixed(0.5)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = off
    _parity(lp, n_blocks=12)


def test_nested_filters():
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = fixed(4000.0)
    hp = HighPass()
    hp.input = lp
    hp.cutoff = fixed(200.0)
    # start past the context horizon: sub-context startup clamping
    # legitimately differs for *nested* filters in the first ~2 context
    # windows (documented deviation)
    _parity(hp, n_blocks=10, start_block=1)


def test_noise_parity_is_exact():
    w = White()
    w.get_state().channels = 2
    _parity(w, channels=2, tol=0.0)


def test_shape_ops():
    stereo = Merge()
    a = Sine()
    a.hertz = fixed(440.0)
    b = Sawtooth()
    b.hertz = fixed(220.0)
    stereo.left = a
    stereo.right = b
    _parity(stereo, channels=2)
    sel = Select()
    sel.input = stereo
    sel.get_state().index = 1
    _parity(sel)
    fl = Flatten()
    fl.input = stereo
    _parity(fl)
    fm = FlattenUnit()
    fm.input = stereo
    _parity(fm)


def test_adsr_parity():
    gate = Square()           # 1 Hz gate: 0.5 s on, 0.5 s off
    gate.hertz = fixed(1.0)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.01, 0.05, 0.6, 0.1
    carrier = Sine()
    carrier.hertz = fixed(330.0)
    voiced = RingMod()
    voiced.left = carrier
    voiced.right = env
    _parity(voiced, n_blocks=100)  # ~1.2 s: several gate cycles


def test_delay_straight_line():
    src = Sawtooth()
    src.hertz = fixed(220.0)
    d = Delay()
    d.get_state().frames = 2000
    d.input = src
    audio = _parity(d, n_blocks=16)
    # delayed signal: frame n equals source at n-2000
    direct = pull_blocks_src()
    np.testing.assert_allclose(audio[2000:3000, 0], direct[:1000, 0],
                               atol=1e-6)


def pull_blocks_src():
    src = Sawtooth()
    src.hertz = fixed(220.0)
    return pull_blocks(src, 16, block_frames=F, rate=RATE, channels=1)


def test_feedback_loop():
    """src -> mixer <- (delay of mixer output * feedback gain): a real
    cycle, legal through the CYCLIC delay."""
    def build():
        src = Sine()
        src.hertz = fixed(440.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 3 * F
        fb = Gain()
        fb.left = d
        fb.right = fixed(0.5)
        mix.left = src
        mix.right = fb
        mix.mix = fixed(0.6)
        d.input = mix          # the cycle
        return mix

    node = build()
    compiled = compile_node(node, block_frames=F, rate=RATE, channels=1)
    audio, _ = compiled.render(position=0, n_blocks=24)
    oracle = pull_blocks(build(), 24, block_frames=F, rate=RATE, channels=1)
    err = np.abs(audio - oracle).max()
    assert err <= TOL, err
    # echoes actually present: energy after one delay period
    assert np.abs(audio[3 * F:]).max() > 0


def test_render_is_resumable():
    """Carry round-trip: two render calls == one long render."""
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = fixed(2000.0)
    compiled = compile_node(lp, block_frames=F, rate=RATE, channels=1)
    full, _ = compiled.render(position=0, n_blocks=8)
    a, carry = compiled.render(position=0, n_blocks=4)
    b, _ = compiled.render(position=4 * F, n_blocks=4, carry=carry)
    np.testing.assert_array_equal(np.concatenate([a, b]), full)


def test_traced_edit_without_recompile():
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    compiled = compile_node(osc, block_frames=F, rate=RATE, channels=1)
    h1 = compiled.graph_hash
    a1, _ = compiled.render(n_blocks=1)
    hz.get_state().value = np.array([[880.0]], dtype=np.float32)
    from signals_tpu.compiler import compile_node as cn
    compiled2 = cn(osc, block_frames=F, rate=RATE, channels=1)
    assert compiled2 is compiled            # same graph hash -> cache hit
    assert compiled2.graph_hash == h1
    a2, _ = compiled2.render(n_blocks=1)
    assert not np.array_equal(a1, a2)       # new value took effect


def test_adsr_compiled_is_seekable():
    """The grid-stateless ADSR lowering makes envelope patches
    position-addressable: rendering a window mid-timeline equals the same
    window of a from-zero render (impossible with stepped carry)."""
    gate = Square()
    gate.hertz = fixed(3.0)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.005, 0.03, 0.5, 0.05
    carrier = Sine()
    carrier.hertz = fixed(220.0)
    voiced = RingMod()
    voiced.left = carrier
    voiced.right = env
    compiled = compile_node(voiced, block_frames=F, rate=RATE, channels=1)
    full, _ = compiled.render(position=0, n_blocks=60)
    seeked, _ = compiled.render(position=40 * F, n_blocks=10)
    np.testing.assert_array_equal(seeked, full[40 * F:50 * F])


def test_triple_nested_filters():
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    f1 = LowPass()
    f1.input = saw
    f1.cutoff = fixed(6000.0)
    f2 = HighPass()
    f2.input = f1
    f2.cutoff = fixed(150.0)
    f3 = BandPass()
    f3.input = f2
    f3.low = fixed(200.0)
    f3.high = fixed(4000.0)
    # each engine carries ~1e-5-level window/rounding differences per IIR
    # stage; three cascaded stages get a proportionate budget
    _parity(f3, n_blocks=8, start_block=2, tol=5e-5)


def test_noise_through_filter():
    w = White()
    lp = LowPass()
    lp.input = w
    lp.cutoff = fixed(1500.0)
    _parity(lp, n_blocks=10)


def test_adsr_with_noisy_gate():
    """Fast random gating: every block-grid edge path gets exercised."""
    w = White()
    env = ADSR()
    env.gate = w
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.003, 0.01, 0.4, 0.02
    _parity(env, n_blocks=60)


def test_fanout_block_rate_and_full_rate():
    """One oscillator consumed both as audio and as a block-rate control."""
    lfo = Sine()
    lfo.hertz = fixed(2.0)
    carrier = Sine()
    carrier.hertz = fixed(440.0)
    vca = Gain()
    vca.left = carrier
    vca.right = lfo          # block-rate side
    m = Mix()
    m.left = vca
    m.right = lfo            # full-rate side
    m.mix = fixed(0.5)
    _parity(m)


def test_wavetable_parity_and_matches_sine():
    from signals_tpu.nodes.wavetable import Wavetable
    wt = Wavetable()
    wt.hertz = fixed(440.0)
    audio = _parity(wt, n_blocks=8)
    # default table is a sine cycle: interpolated read tracks the analytic
    # oscillator to table-resolution accuracy
    sine = Sine()
    sine.hertz = fixed(440.0)
    ref = pull_blocks(sine, 8, block_frames=F, rate=RATE, channels=1)
    assert np.abs(audio - ref).max() < 2e-5


def test_wavetable_is_trainable():
    """The waveform itself is a differentiable parameter."""
    import jax
    from signals_tpu.learn import make_loss_fn
    from signals_tpu.nodes.wavetable import Wavetable
    wt = Wavetable()
    wt.hertz = fixed(220.0)
    compiled = compile_node(wt, block_frames=F, rate=RATE, channels=1)
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    target = pull_blocks(saw, 4, block_frames=F, rate=RATE, channels=1)
    loss_fn = make_loss_fn(compiled, target)
    grads = jax.grad(loss_fn, allow_int=True)(compiled.params())
    uid = compiled.index.info(wt).uid
    g = np.asarray(grads[uid]['table'])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_mega_window_render_matches_block_render():
    """Mega-window mode (whole batch as one traced window) is semantically
    identical to per-block rendering, including swept filters and ADSR."""
    import signals_tpu.compiler as C

    def build():
        saw = Sawtooth()
        saw.hertz = fixed(110.0)
        lfo = Sine()
        lfo.hertz = fixed(1.5)
        depth = Gain()
        depth.left = lfo
        depth.right = fixed(900.0)
        cut = Mix()
        cut.left = depth
        cut.right = fixed(2000.0)
        cut.mix = fixed(0.5)
        lp = LowPass()
        lp.input = saw
        lp.cutoff = cut
        gate = Square()
        gate.hertz = fixed(2.0)
        env = ADSR()
        env.gate = gate
        voiced = RingMod()
        voiced.left = lp
        voiced.right = env
        return voiced

    block_c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    block_c.enable_mega = False          # force the per-block path
    ref, _ = block_c.render(n_blocks=20)

    mega_root = build()
    C._compile_cache.clear()
    mega_c = compile_node(mega_root, block_frames=F, rate=RATE, channels=1)
    mega_c.enable_mega = True
    mega_c.mega_min_channels = 1
    assert mega_c.mega_compatible
    out, _ = mega_c.render(n_blocks=20)
    C._compile_cache.clear()
    assert np.abs(out - ref).max() <= 1e-5
    # seek equivalence in mega mode too
    out2, _ = mega_c.render(position=8 * F, n_blocks=4)
    assert np.abs(out2 - ref[8 * F:12 * F]).max() <= 1e-5


def test_drive_and_pan():
    from signals_tpu.nodes.fx import Drive, Pan
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    d = Drive()
    d.input = saw
    d.drive = fixed(4.0)
    _parity(d)
    p = Pan()
    p.input = saw
    lfo = Sine()
    lfo.hertz = fixed(0.5)
    p.position = lfo
    audio = _parity(p, channels=2)
    # equal-power: total power constant regardless of pan position
    power = (audio ** 2).sum(axis=1)
    saw_ref = pull_blocks_sawref() ** 2
    np.testing.assert_allclose(power, saw_ref[:, 0], rtol=1e-4, atol=1e-5)


def pull_blocks_sawref():
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    return pull_blocks(saw, 16, block_frames=F, rate=RATE, channels=1)


def test_streaming_filter_is_exact_iir():
    """streaming=True carries filter state: output equals scipy filtering
    of the ENTIRE signal (no context-window approximation), and the two
    engines agree."""
    import scipy.signal
    from signals_tpu.compiler.filters import design_coupled

    def build():
        saw = Sawtooth()
        saw.hertz = fixed(110.0)
        lp = LowPass()
        lp.get_state().streaming = True
        lp.input = saw
        lp.cutoff = fixed(300.0)   # slow filter: context mode approximates
        return lp, saw

    lp, _ = build()
    compiled = compile_node(lp, block_frames=F, rate=RATE, channels=1)
    assert compiled.carry0                       # carried state present
    audio, _ = compiled.render(n_blocks=16)

    # ground truth: whole-signal scipy filtering from zero state
    src = Sawtooth()
    src.hertz = fixed(110.0)
    x = pull_blocks(src, 16, block_frames=F, rate=RATE, channels=1)
    co = design_coupled(np, 'lp', [np.array([[300.0]], dtype=np.float32)],
                        RATE / 2)
    truth = scipy.signal.sosfilt(co[:, 0, :6].astype(np.float64),
                                 x[:, 0].astype(np.float64))
    assert np.abs(audio[:, 0] - truth).max() <= 2e-5

    # engines agree
    lp2, _ = build()
    oracle = pull_blocks(lp2, 16, block_frames=F, rate=RATE, channels=1)
    assert np.abs(audio - oracle).max() <= 2e-5

    # and streaming is resumable through the carry
    lp3, _ = build()
    from signals_tpu.compiler import _compile_cache
    _compile_cache.clear()
    c3 = compile_node(lp3, block_frames=F, rate=RATE, channels=1)
    a, carry = c3.render(n_blocks=8)
    b, _ = c3.render(position=8 * F, n_blocks=8, carry=carry)
    np.testing.assert_array_equal(np.concatenate([a, b]), audio)


def test_streaming_filter_accurate_at_extreme_cutoffs():
    """Sub-100 Hz cutoffs: a 2nd-order lowpass impulse response does not
    decay within any reasonable context window (1.5e-2 error at 40 Hz
    with the 1024-frame default) — streaming mode has no window and stays
    within ~5e-6 of whole-signal f64 filtering.

    Truth uses scipy's own f64 design: direct-form coefficients rounded
    to f32 shift a 40 Hz pole by ~1e-4 (the coefficient-sensitivity
    hazard the coupled-form f64 pipeline exists to avoid), so filtering
    with them is NOT a valid reference here."""
    import scipy.signal

    for cut in (40.0, 90.0):
        saw = Sawtooth()
        saw.hertz = fixed(55.0)
        lp = LowPass()
        lp.get_state().streaming = True
        lp.input = saw
        lp.cutoff = fixed(cut)
        compiled = compile_node(lp, block_frames=1024, rate=RATE,
                                channels=1)
        audio, _ = compiled.render(n_blocks=86)           # ~2 s

        src = Sawtooth()
        src.hertz = fixed(55.0)
        x = pull_blocks(src, 86, block_frames=1024, rate=RATE, channels=1)
        sos = scipy.signal.butter(2, cut / (RATE / 2), 'low', output='sos')
        truth = scipy.signal.sosfilt(sos, x[:, 0].astype(np.float64))
        assert np.abs(np.asarray(audio)[:, 0] - truth).max() <= 1e-5, cut


def test_pink_and_samplehold_parity_exact():
    from signals_tpu.nodes.noise import Pink, SampleHold

    p = Pink()
    p.get_state().channels = 2
    _parity(p, channels=2, tol=0.0)

    sh = SampleHold()
    sh.rate = fixed(50.0)
    audio = _parity(sh, tol=0.0)       # 16 blocks = 8192 frames ~ 9 holds
    # holds: value constant within a hold period, changes across them
    hold = int(RATE / 50.0)
    assert np.ptp(audio[:hold - 1, 0]) == 0.0
    assert len(np.unique(audio[: 8 * hold, 0])) >= 5


def test_pink_noise_spectrum_is_one_over_f():
    """Octave-band energy of 1/f noise is flat; white noise doubles per
    octave.  Check the Voss-McCartney sum is much closer to flat."""
    from signals_tpu.nodes.noise import Pink

    p = Pink()
    audio = pull_blocks(p, 128, block_frames=1024, rate=RATE, channels=1)
    x = audio[:, 0] - audio[:, 0].mean()
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / RATE)
    bands = []
    for lo in (50, 100, 200, 400, 800, 1600, 3200, 6400):
        sel = (freqs >= lo) & (freqs < 2 * lo)
        bands.append(spec[sel].sum())
    ratios = [bands[i + 1] / bands[i] for i in range(len(bands) - 1)]
    # white would be ~2.0 per octave; allow generous slack around 1.0
    assert max(ratios) < 1.45, ratios
    assert min(ratios) > 0.55, ratios


def test_quantize_snaps_to_scale():
    from signals_tpu.nodes.fx import Quantize
    from signals_tpu.nodes.noise import SampleHold

    # Hz-valued output: engines may differ by pow() ulps (~2e-5 relative),
    # so tolerances here are scaled to the frequency magnitude.
    HZ_TOL = 0.05

    q = Quantize()
    q.get_state().root = 440.0
    q.input = fixed(452.0)                 # ~0.47 semis above A
    audio = _parity(q, n_blocks=2, tol=HZ_TOL)
    assert audio[0, 0] == pytest.approx(440.0, rel=1e-5)

    # C major scale: 430 Hz (~A) must snap to A=440 (pc 9 allowed)
    q2 = Quantize()
    q2.get_state().scale = np.array([[0, 2, 4, 5, 7, 9, 11]],
                                    dtype=np.float32)
    q2.input = fixed(430.0)
    audio = _parity(q2, n_blocks=2, tol=HZ_TOL)
    assert audio[0, 0] == pytest.approx(440.0, rel=1e-4)

    # generative chain: S&H -> Quantize -> Sine, engines agree (the Hz
    # ulps integrate into phase, hence the audio-level slack)
    sh = SampleHold()
    sh.rate = fixed(30.0)
    hz = Gain()
    hz.left = sh
    hz.right = fixed(400.0)                # [0, 400) Hz
    off = Mix()
    off.left = hz
    off.right = fixed(220.0)
    off.mix = fixed(0.5)                   # 110..310 Hz
    qz = Quantize()
    qz.input = off
    osc = Sine()
    osc.hertz = qz
    _parity(osc, n_blocks=16, tol=1e-4)
    # quantizer output is locked to scale tones (few unique values)
    tones = _parity(qz, n_blocks=16, tol=HZ_TOL)
    assert len(np.unique(tones.round(2))) <= 14


def test_tanh_exact_cross_engine_bits_and_accuracy():
    """``mathx.tanh_exact``: bit-identical numpy vs jitted-jax on the
    same inputs (the property that retires the saturated-echo parity
    carve-out), and accurate to ~1 f32 ulp vs f64 ``np.tanh``."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.core.mathx import tanh_exact

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-12.0, 12.0, 20000),
        rng.uniform(-0.4, 0.4, 20000),
        rng.uniform(-1e-4, 1e-4, 5000),
        np.array([0.0, -0.0, 10.0001, -10.0001, 0.3465, -0.3465]),
    ]).astype(np.float32)
    got_np = tanh_exact(np, x)
    got_jx = np.asarray(jax.jit(lambda v: tanh_exact(jnp, v))(x))
    np.testing.assert_array_equal(got_np, got_jx)
    want = np.tanh(x.astype(np.float64))
    assert np.abs(got_np - want).max() < 2.5e-7
    # saturation tail is exactly +/-1.0 (a quarter-ulp from true tanh)
    assert (got_np[x > 10] == 1.0).all()
    assert (got_np[x < -10] == -1.0).all()


def test_drive_feedback_parity_uniform_budget():
    """The saturated-echo class of patch (tanh inside a recirculating
    delay) holds the UNIFORM 1e-5 parity budget — no nonlinear-feedback
    carve-out (bench.py's TOL_NONLINEAR_FB is retired; Drive saturates
    via tanh_exact)."""
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Drive, Gain, LowPass, Mix
    from signals_tpu.nodes.osc import Sawtooth

    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = 8 * 512 + 5
    lp = LowPass()
    lp.input = d
    lp.cutoff = fixed(2500.0)
    lp.get_state().streaming = True
    fb = Gain()
    fb.left = lp
    fb.right = fixed(0.55)
    shaper = Drive()
    shaper.input = fb
    shaper.drive = fixed(3.0)
    mix.left = saw
    mix.right = shaper
    mix.mix = fixed(0.6)
    d.input = mix
    _parity(mix, n_blocks=24, tol=1e-5)
