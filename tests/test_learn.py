"""Differentiable synthesis: gradient-based patch parameter fitting."""

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.learn import fit, make_loss_fn
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine

from conftest import fixed, pull_blocks

F = 512
RATE = 44100


def _target(freq, gain, n_blocks):
    hz = fixed(freq)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(gain)
    return pull_blocks(g, n_blocks, block_frames=F, rate=RATE, channels=1)


def test_gradients_flow_through_patch():
    import jax
    hz = fixed(300.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(0.5)
    compiled = compile_node(g, block_frames=F, rate=RATE, channels=1)
    target = _target(440.0, 0.8, 4)
    loss_fn = make_loss_fn(compiled, target)
    grads = jax.grad(loss_fn, allow_int=True)(compiled.params())
    uid = compiled.index.info(hz).uid
    assert np.isfinite(np.asarray(grads[uid]['value'])).all()
    assert np.abs(np.asarray(grads[uid]['value'])).max() > 0


def test_fit_recovers_gain():
    """Amplitude is smoothly identifiable: fitting the gain constant against
    a target rendered at a different gain must converge."""
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    vol = fixed(0.1)
    g = Gain()
    g.left = osc
    g.right = vol
    target = _target(440.0, 0.8, 4)
    result = fit(g, target, [(vol, 'value')], rate=RATE, block_frames=F,
                 steps=150, learning_rate=0.05)
    fitted = float(np.asarray(result.value_of(
        compile_node(g, block_frames=F, rate=RATE, channels=1),
        vol, 'value')).ravel()[0])
    assert abs(fitted - 0.8) < 0.05, fitted
    assert result.losses[-1] < result.losses[0] * 0.1
    # apply=True wrote back into the live node
    assert abs(float(vol.get_state().value[0, 0]) - 0.8) < 0.05


def test_fit_recovers_filter_cutoff():
    """Gradients flow through the f64 Butterworth design and the IIR scan:
    estimating a lowpass cutoff from audio converges to 0.1%."""
    from signals_tpu.nodes.fx import LowPass
    from signals_tpu.nodes.osc import Sawtooth

    def build(cut_v):
        osc = Sawtooth()
        osc.hertz = fixed(110.0)
        cut = fixed(cut_v)
        lp = LowPass()
        lp.input = osc
        lp.cutoff = cut
        return lp, cut

    tgt_root, _ = build(2000.0)
    target = pull_blocks(tgt_root, 8, block_frames=F, rate=RATE, channels=1)
    model, cut = build(600.0)
    res = fit(model, target, [(cut, 'value')], block_frames=F,
              steps=120, learning_rate=30.0)
    assert res.losses[-1] < res.losses[0] * 0.01
    fitted = float(cut.get_state().value[0, 0])
    assert abs(fitted - 2000.0) < 50, fitted


def test_fit_recovers_feedback_gain_through_segment_scan():
    """Differentiable *feedback*: the loss differentiates through the
    segmented feedback scan (``render_core`` fast-path selection), so a
    saturated echo's feedback gain is recoverable by gradient descent —
    n_blocks sequential steps never appear in the graph."""
    import jax

    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Drive, Mix

    def echo(fb_gain):
        osc = Sine()
        osc.hertz = fixed(220.0)
        mix = Mix()
        d = Delay()
        d.get_state().frames = 4 * F
        sh = Drive()
        sh.input = d
        sh.drive = fixed(1.2)
        vol = fixed(fb_gain)
        fb = Gain()
        fb.left = sh
        fb.right = vol
        mix.left = osc
        mix.right = fb
        mix.mix = fixed(0.5)
        d.input = mix
        return mix, vol

    target_root, _ = echo(0.6)
    target = pull_blocks(target_root, 20, block_frames=F, rate=RATE)

    root, vol = echo(0.1)
    c = compile_node(root, block_frames=F, rate=RATE, channels=1)
    assert c.segment_scan_core(20) is not None
    loss_fn = make_loss_fn(c, target)
    grads = jax.grad(loss_fn, allow_int=True)(c.params())
    gv = np.asarray(grads[c.index.info(vol).uid]['value'])
    assert np.isfinite(gv).all() and np.abs(gv).max() > 0

    root2, vol2 = echo(0.1)
    fit(root2, target, [(vol2, 'value')], rate=RATE, block_frames=F,
        steps=200, learning_rate=0.05)
    assert abs(float(vol2.get_state().value[0, 0]) - 0.6) < 0.05


def _subtractive_poly_root(n_voices):
    """A 64-voice-style subtractive patch in the channels layout: the
    shape whose TPU lowering engages the packed Pallas family (and the
    generator kernel) — the paths that used to be undifferentiable."""
    from signals_tpu.nodes.fx import LowPass

    from signals_tpu.nodes.osc import Sawtooth

    freqs = (110.0 * 2 ** (np.arange(n_voices) % 12 / 12.0)).astype(
        np.float32).reshape(1, -1)
    hz = fixed(freqs)
    osc = Sawtooth()
    osc.hertz = hz
    cut = fixed(2000.0)
    lp = LowPass()
    lp.input = osc
    lp.cutoff = cut
    g = Gain()
    g.left = lp
    g.right = fixed(1.0 / n_voices)
    return g, hz, cut


@pytest.mark.slow
def test_gradients_flow_through_pallas_family_paths():
    """The headline round-4 fix: ``value_and_grad`` through the packed
    Pallas cascade (MEGA_FILTER_IMPL='pallas', interpret on CPU) works
    and matches the vmap/scan lowering's gradients — the custom VJPs in
    ``compiler.pallas_kernels``.  Exercises both the DMA-fed family and
    the generator-fed family (Sawtooth + Fixed controls)."""
    import jax

    import signals_tpu.compiler as C
    import signals_tpu.compiler.filters as FI

    rng = np.random.default_rng(0)
    n_blocks = 32
    target = rng.standard_normal((n_blocks * F, 64)).astype(np.float32)

    def grads_with(mega_impl, seg_gen):
        old_m, old_g = FI.MEGA_FILTER_IMPL, FI.SEG_SOURCE_GEN
        FI.MEGA_FILTER_IMPL, FI.SEG_SOURCE_GEN = mega_impl, seg_gen
        try:
            root, hz, cut = _subtractive_poly_root(64)
            compiled = compile_node(root, block_frames=F, rate=RATE,
                                    channels=64)
            if mega_impl == 'pallas':
                assert compiled.packed_mega_streams(n_blocks) is not None
                assert (compiled.packed_gen_engaged(n_blocks)
                        == bool(seg_gen))
            loss_fn = make_loss_fn(compiled, target)
            grads = jax.grad(loss_fn, allow_int=True)(compiled.params())
            out = {}
            for node, name in ((hz, 'hz'), (cut, 'cut')):
                gv = np.asarray(
                    grads[compiled.index.info(node).uid]['value'])
                assert np.isfinite(gv).all() and np.abs(gv).max() > 0, name
                out[name] = gv
            return out
        finally:
            FI.MEGA_FILTER_IMPL, FI.SEG_SOURCE_GEN = old_m, old_g
            C._compile_cache.clear()

    ref = grads_with('vmap', False)
    for seg_gen in (False, True):
        got = grads_with('pallas', seg_gen)
        for name in ('hz', 'cut'):
            denom = np.abs(ref[name]).max()
            err = np.abs(got[name] - ref[name]).max() / denom
            assert err < 1e-2, (seg_gen, name, err)


def test_fit_recovers_cutoff_through_pallas_path():
    """End-to-end ``learn.fit`` with the packed Pallas lowering forced:
    the filter cutoff of a 64-voice subtractive patch is recovered by
    gradient descent through the kernel's custom VJP."""
    import signals_tpu.compiler as C
    import signals_tpu.compiler.filters as FI

    old_m = FI.MEGA_FILTER_IMPL
    FI.MEGA_FILTER_IMPL = 'pallas'
    try:
        tgt_root, _, tcut = _subtractive_poly_root(64)
        tcut.get_state().value = np.full((1, 1), 2000.0, np.float32)
        target = pull_blocks(tgt_root, 16, block_frames=F, rate=RATE,
                             channels=64)
        C._compile_cache.clear()
        root, _, cut = _subtractive_poly_root(64)
        cut.get_state().value = np.full((1, 1), 600.0, np.float32)
        compiled = compile_node(root, block_frames=F, rate=RATE,
                                channels=64)
        assert compiled.packed_mega_streams(16) is not None
        res = fit(root, target, [(cut, 'value')], block_frames=F,
                  rate=RATE, steps=80, learning_rate=30.0)
        assert res.losses[-1] < res.losses[0] * 0.1
        fitted = float(cut.get_state().value[0, 0])
        assert abs(fitted - 2000.0) < 100, fitted
    finally:
        FI.MEGA_FILTER_IMPL = old_m
        C._compile_cache.clear()


def test_fit_fused_dispatch_matches_per_step():
    """``steps_per_dispatch`` fuses K optimizer steps into one jitted
    ``lax.scan`` dispatch (amortizing the ~25 ms fixed remote-dispatch
    cost, BENCH_full.json p50_block_latency_ms).  The fused loop is the
    SAME step sequence — losses and the fitted value must match the
    unfused path — and a step count that is not a multiple of K
    exercises the tail chunk."""
    def build():
        hz = fixed(440.0)
        osc = Sine()
        osc.hertz = hz
        vol = fixed(0.1)
        g = Gain()
        g.left = osc
        g.right = vol
        return g, vol

    target = _target(440.0, 0.8, 4)
    g1, vol1 = build()
    r_unfused = fit(g1, target, [(vol1, 'value')], rate=RATE,
                    block_frames=F, steps=21, learning_rate=0.05,
                    steps_per_dispatch=1)
    g2, vol2 = build()
    r_fused = fit(g2, target, [(vol2, 'value')], rate=RATE,
                  block_frames=F, steps=21, learning_rate=0.05,
                  steps_per_dispatch=8)          # 8 + 8 + tail of 5
    assert len(r_fused.losses) == len(r_unfused.losses) == 21
    np.testing.assert_allclose(r_fused.losses, r_unfused.losses,
                               rtol=1e-4, atol=1e-7)
    v1 = float(vol1.get_state().value[0, 0])
    v2 = float(vol2.get_state().value[0, 0])
    assert abs(v1 - v2) < 1e-4, (v1, v2)


@pytest.mark.slow
def test_cascade_analytic_adjoint_matches_autodiff():
    """``sosfilt_scan`` carries a hand-written VJP (one reversed
    associative scan per section — the adjoint of a linear recurrence
    is a linear recurrence) instead of letting jax differentiate the
    scan's combine tree.  Its gradients must equal autodiff of the raw
    primal (``_cascade_sections_prim``) to f32 reassociation, for both
    the 11-column coupled-tap layout and the derived 6-column b/a
    branch."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler import filters as FI

    rng = np.random.default_rng(7)
    nsec, n, ch = 3, 257, 5
    co = np.zeros((nsec, ch, 11), np.float32)
    r = rng.uniform(0.6, 0.98, (nsec, ch))
    th = rng.uniform(0.05, 2.5, (nsec, ch))
    co[:, :, 6] = r * np.cos(th)
    co[:, :, 7] = r * np.sin(th)
    co[:, :, 8:11] = rng.normal(0, 0.7, (nsec, ch, 3))
    co = jnp.asarray(co)
    x = jnp.asarray(rng.normal(0, 1, (n, ch)).astype(np.float32))

    def taps(co):
        return tuple(jnp.broadcast_to(co[:, :, 6 + i], (nsec, ch))
                     for i in range(5))

    # primal: byte-for-byte the op sequence sosfilt_scan always ran
    np.testing.assert_array_equal(
        np.asarray(FI.sosfilt_scan(co, x)),
        np.asarray(FI._cascade_sections_prim(*taps(co), x)))

    def loss_cv(co, x):
        return jnp.sum(jnp.sin(FI.sosfilt_scan(co, x)))

    def loss_raw(co, x):
        return jnp.sum(jnp.sin(FI._cascade_sections_prim(*taps(co), x)))

    g_cv = jax.grad(loss_cv, argnums=(0, 1))(co, x)
    g_raw = jax.grad(loss_raw, argnums=(0, 1))(co, x)
    for a, b in zip(g_cv, g_raw):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 5e-6

    # 6-column branch: taps derived in f32; grads flow into b/a columns
    co6 = np.zeros((2, ch, 6), np.float32)
    co6[:, :, :3] = rng.normal(0, 0.5, (2, ch, 3))
    co6[:, :, 3] = 1.0
    co6[:, :, 4] = rng.uniform(-1.0, -0.2, (2, ch))
    co6[:, :, 5] = rng.uniform(0.3, 0.9, (2, ch))
    g6 = jax.grad(lambda c: jnp.sum(FI.sosfilt_scan(c, x) ** 2))(
        jnp.asarray(co6))
    g6 = np.asarray(g6)
    assert np.isfinite(g6).all() and np.abs(g6).max() > 0
    assert np.abs(g6[:, :, 3]).max() == 0        # a0 is fixed at 1


def test_fit_recovers_frequency_spectral_only():
    """Frequency estimation — the canonical differentiable-synthesis
    task: the waveform-L2 term's gradient oscillates with the beat
    phase of a detuned oscillator and drowns the spectral pull (the
    default loss leaves a 30 Hz detune unmoved), so pitch fits use
    ``spectral_loss(waveform=0.0)``.  A sine starting 30 Hz off a
    440 Hz target must converge to under 1 Hz."""
    import functools

    from signals_tpu.learn import spectral_loss

    hz = fixed(470.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(0.8)
    target = _target(440.0, 0.8, 43)
    res = fit(g, target, [(hz, 'value')], rate=RATE, block_frames=F,
              steps=300, learning_rate=0.5,
              loss=functools.partial(spectral_loss, waveform=0.0))
    fitted = float(hz.get_state().value[0, 0])
    assert abs(fitted - 440.0) < 1.0, fitted
    assert res.losses[-1] < res.losses[0] * 0.05


def test_fit_chunk_cache_reuses_compilation_across_calls():
    """Repeated fits of the same problem *shape* reuse the jitted K-step
    chunk: the target waveform, the learning rate and every
    non-trainable param ride through the cached chunk as DATA, so a
    second fit against new audio / a new lr / an edited patch param
    must (a) hit the cache and (b) honor the new values — a stale
    trace constant would silently re-fit the FIRST call's problem."""
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    vol = fixed(0.1)
    g = Gain()
    g.left = osc
    g.right = vol
    master = fixed(1.0)
    out = Gain()
    out.left = g
    out.right = master

    # fit 1: master=1.0, target amplitude 0.3 -> vol ~ 0.3
    fit(out, _target(440.0, 0.3, 4), [(vol, 'value')], rate=RATE,
        block_frames=F, steps=120, learning_rate=0.05)
    assert abs(float(vol.get_state().value[0, 0]) - 0.3) < 0.05

    compiled = compile_node(out, block_frames=F, rate=RATE, channels=1)
    cache = compiled._fit_chunk_cache
    assert len(cache) == 1, list(cache)
    chunks_before = {k: id(v) for k, v in next(iter(cache.values())).items()}

    # fit 2 — new target AND an edited non-trainable param: with
    # master=0.5 the vol matching a 0.4-amplitude target is 0.8
    master.get_state().value = np.float32([[0.5]])
    fit(out, _target(440.0, 0.4, 4), [(vol, 'value')], rate=RATE,
        block_frames=F, steps=120, learning_rate=0.05)
    assert abs(float(vol.get_state().value[0, 0]) - 0.8) < 0.05

    # same compiled patch, same cache entry, same jitted chunk objects
    assert compile_node(out, block_frames=F, rate=RATE,
                        channels=1) is compiled
    assert len(cache) == 1, list(cache)
    chunks_after = {k: id(v) for k, v in next(iter(cache.values())).items()}
    for k, ident in chunks_before.items():
        assert chunks_after[k] == ident, 'chunk was rebuilt, not cached'

    # fit 3 — learning_rate=0: the lr lives in the optimizer state, not
    # the trace; a zero-lr fit through the SAME cached chunk must leave
    # the param exactly where it is
    before = float(vol.get_state().value[0, 0])
    fit(out, _target(440.0, 0.9, 4), [(vol, 'value')], rate=RATE,
        block_frames=F, steps=16, learning_rate=0.0)
    after = float(vol.get_state().value[0, 0])
    assert after == before, (before, after)
    chunks_final = {k: id(v) for k, v in next(iter(cache.values())).items()}
    assert chunks_final[16] == chunks_after[16]


def test_fit_restages_host_inputs_per_call():
    """Host-fed inputs (file readers, control grids) are restaged every
    ``fit`` call and flow through the cached chunk as an argument — a
    fit after the host-side audio changed must see the NEW audio, not a
    snapshot baked into the first call's trace."""
    import pathlib
    import tempfile

    from signals_tpu.nodes.files import FileReader
    from signals_tpu.runtime import sndfile

    n_blocks = 4
    t = np.arange(n_blocks * F, dtype=np.float32) / RATE
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[:, None]

    def write(path, audio):
        w = sndfile.open_writer(path, rate=RATE, channels=1)
        try:
            w.write(audio.astype(np.float32))
        finally:
            w.close()

    with tempfile.TemporaryDirectory() as d:
        path = str(pathlib.Path(d) / 'src.wav')
        write(path, 0.25 * tone)
        reader = FileReader()
        reader.get_state().path = path
        vol = fixed(1.0)
        g = Gain()
        g.left = reader
        g.right = vol

        target = 0.5 * tone
        fit(g, target, [(vol, 'value')], rate=RATE, block_frames=F,
            steps=100, learning_rate=0.05)
        assert abs(float(vol.get_state().value[0, 0]) - 2.0) < 0.1

        compiled = compile_node(g, block_frames=F, rate=RATE, channels=1)

        # rewrite the file at DOUBLE the level: path unchanged, so the
        # compiled patch — and with it the fit chunk cache — is reused;
        # the restaged host reads must carry the NEW audio through the
        # cached chunk (drop the reader's fd so it reopens, as a new
        # process / the next session would)
        write(path, 0.5 * tone)
        reader._close()
        vol.get_state().value = np.float32([[1.0]])
        fit(g, target, [(vol, 'value')], rate=RATE, block_frames=F,
            steps=100, learning_rate=0.05)
        assert compile_node(g, block_frames=F, rate=RATE,
                            channels=1) is compiled
        assert len(compiled._fit_chunk_cache) == 1
        assert abs(float(vol.get_state().value[0, 0]) - 1.0) < 0.05


def test_fit_relative_lr_multiscale():
    """``relative_lr=True``: ONE default-scale learning rate fits a
    kHz-scale cutoff and a unit-scale gain in the same descent (Adam's
    absolute steps would need per-parameter rates)."""
    from signals_tpu.nodes.fx import Gain, LowPass
    from signals_tpu.nodes.osc import Sawtooth

    def build(cut_v, gain_v):
        osc = Sawtooth()
        osc.hertz = fixed(110.0)
        cut = fixed(cut_v)
        lp = LowPass()
        lp.input = osc
        lp.cutoff = cut
        vol = fixed(gain_v)
        g = Gain()
        g.left = lp
        g.right = vol
        return g, cut, vol

    tgt_root, _, _ = build(2000.0, 0.8)
    target = pull_blocks(tgt_root, 8, block_frames=F, rate=RATE, channels=1)
    model, cut, vol = build(600.0, 0.2)
    res = fit(model, target, [(cut, 'value'), (vol, 'value')],
              block_frames=F, steps=200, learning_rate=0.05,
              relative_lr=True)
    assert res.losses[-1] < res.losses[0] * 0.1
    fitted_cut = float(cut.get_state().value[0, 0])
    fitted_vol = float(vol.get_state().value[0, 0])
    assert 1500 < fitted_cut < 2800, fitted_cut
    assert abs(fitted_vol - 0.8) < 0.08, fitted_vol
