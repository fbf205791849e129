"""Pallas TPU kernels, validated in interpreter mode on the CPU backend
(real-hardware timing lives in bench territory)."""

import numpy as np
import pytest
import scipy.signal

from signals_tpu.compiler.filters import design_coupled
from signals_tpu.compiler.pallas_kernels import sosfilt_pallas

NYQ = 22050.0


def _saw(n_frames):
    n = np.arange(n_frames, dtype=np.float32).reshape(-1, 1)
    t = np.mod(n / np.float32(44100) * np.float32(110), np.float32(1))
    return (2 * np.mod(t - 0.5, 1) - 1).astype(np.float32)


@pytest.mark.parametrize('btype,crits', [
    ('lp', [1200.0]),
    ('hp', [500.0]),
    ('bp', [300.0, 3000.0]),
    ('bs', [300.0, 3000.0]),
])
def test_pallas_sosfilt_matches_scipy(btype, crits):
    x = _saw(1124)
    co = design_coupled(np, btype,
                        [np.array([[c]], dtype=np.float32) for c in crits],
                        NYQ)
    y64 = scipy.signal.sosfilt(co[:, 0, :6].astype(np.float64),
                               x[:, 0].astype(np.float64))
    y = np.asarray(sosfilt_pallas(co, x, interpret=True))[:, 0]
    assert np.abs(y - y64).max() <= 1e-5


def test_pallas_sosfilt_multichannel_and_padding():
    # non-multiple-of-8 length, channels needing lane padding
    rng = np.random.default_rng(3)
    x = rng.standard_normal((333, 3)).astype(np.float32)
    cut = np.array([[500.0, 2000.0, 8000.0]], dtype=np.float32)
    co = design_coupled(np, 'lp', [cut], NYQ)
    y = np.asarray(sosfilt_pallas(co, x, interpret=True))
    assert y.shape == (333, 3)
    for c in range(3):
        co1 = design_coupled(np, 'lp',
                             [np.array([[cut[0, c]]], dtype=np.float32)],
                             NYQ)
        y64 = scipy.signal.sosfilt(co1[:, 0, :6].astype(np.float64),
                                   x[:, c].astype(np.float64))
        assert np.abs(y[:, c] - y64).max() <= 1e-5


def _batch_ref(coeffs, x_t):
    """Reference for sosfilt_batch: per-segment scipy f64 filtering."""
    L, B, ch = x_t.shape
    out = np.zeros((L, B, ch))
    for b in range(B):
        for c in range(ch):
            out[:, b, c] = scipy.signal.sosfilt(
                coeffs[b, :, c, :6].astype(np.float64),
                x_t[:, b, c].astype(np.float64))
    return out


def test_sosfilt_batch_matches_scipy_per_segment():
    from signals_tpu.compiler.pallas_kernels import sosfilt_batch
    rng = np.random.default_rng(11)
    L, B, ch = 300, 5, 3          # exercises row AND lane padding
    x = rng.standard_normal((L, B, ch)).astype(np.float32)
    cuts = rng.uniform(200.0, 9000.0, (B, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(B)], axis=0)   # (B, 1, ch, 11)
    y = np.asarray(sosfilt_batch(co, x, interpret=True))
    assert y.shape == (L, B, ch)
    assert np.abs(y - _batch_ref(co, x)).max() <= 1e-5


def test_sosfilt_batch_tail_only():
    from signals_tpu.compiler.pallas_kernels import sosfilt_batch
    rng = np.random.default_rng(12)
    L, B, ch = 2048, 3, 2
    x = rng.standard_normal((L, B, ch)).astype(np.float32)
    cuts = rng.uniform(300.0, 5000.0, (B, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(B)], axis=0)
    full = np.asarray(sosfilt_batch(co, x, interpret=True))
    tail = np.asarray(sosfilt_batch(co, x, interpret=True, tail=1024))
    assert tail.shape == (1024, B, ch)
    np.testing.assert_array_equal(tail, full[-1024:])
    # non-chunk-aligned tail
    tail2 = np.asarray(sosfilt_batch(co, x, interpret=True, tail=700))
    np.testing.assert_array_equal(tail2, full[-700:])


def test_sosfilt_batch_two_sections():
    from signals_tpu.compiler.pallas_kernels import sosfilt_batch
    rng = np.random.default_rng(13)
    L, B, ch = 400, 2, 1
    x = rng.standard_normal((L, B, ch)).astype(np.float32)
    co = np.stack([design_coupled(
        np, 'bp', [np.array([[300.0]], np.float32),
                   np.array([[4000.0 + 500 * b]], np.float32)], NYQ)
        for b in range(B)], axis=0)             # (B, 2, 1, 11)
    y = np.asarray(sosfilt_batch(co, x, interpret=True))
    assert np.abs(y - _batch_ref(co, x)).max() <= 1e-5


def test_mega_pallas_filter_path_matches_block_render():
    """The mega-window render with the batched Pallas filter is identical
    to per-block rendering (LFO-swept cutoff + ADSR + RingMod)."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node, filters as _filters
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square
    from tests.conftest import fixed

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

    F, RATE = 512, 44100
    block_c = compile_node(build(), block_frames=F, rate=RATE, channels=1)
    ref, _ = block_c.render(n_blocks=12)

    old = _filters.MEGA_FILTER_IMPL
    _filters.MEGA_FILTER_IMPL = 'pallas'
    try:
        C._compile_cache.clear()
        mega_c = compile_node(build(), block_frames=F, rate=RATE,
                              channels=1)
        mega_c.enable_mega = True
        mega_c.mega_min_channels = 1
        assert mega_c.mega_compatible
        out, _ = mega_c.render(n_blocks=12)
        out2, _ = mega_c.render(position=4 * F, n_blocks=4)
    finally:
        _filters.MEGA_FILTER_IMPL = old
        C._compile_cache.clear()
    assert np.abs(out - ref).max() <= 1e-5
    assert np.abs(out2 - ref[4 * F:8 * F]).max() <= 1e-5


def test_sosfilt_segments_matches_batch():
    """The DMA-driven timeline-segment kernel equals the batched kernel
    fed with the materialized segment layout."""
    from signals_tpu.compiler.pallas_kernels import (sosfilt_batch,
                                                     sosfilt_segments)
    rng = np.random.default_rng(21)
    F, C, nb, ch = 256, 256, 7, 64       # odd nb exercises group padding
    T = C + nb * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    cuts = rng.uniform(300.0, 8000.0, (nb, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(nb)], axis=0)       # (nb, 1, ch, 11)

    got = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    assert got.shape == (nb, F, ch)

    idx = np.arange(C + F)[:, None] + np.arange(nb)[None, :] * F
    xt = x[idx]                                        # (C+F, nb, ch)
    ref = np.asarray(sosfilt_batch(co, xt, interpret=True, tail=F))
    np.testing.assert_allclose(got, ref.transpose(1, 0, 2), atol=1e-6)


def test_sosfilt_segments_two_sections():
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments
    rng = np.random.default_rng(22)
    F, C, nb, ch = 512, 512, 3, 32
    T = C + nb * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    co = np.stack([design_coupled(
        np, 'bp', [np.array([[200.0 + 50 * b]], np.float32),
                   np.array([[5000.0]], np.float32)], NYQ)
        for b in range(nb)], axis=0)                   # (nb, 2, 1, 11)
    got = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    ref = np.zeros_like(got)
    for b in range(nb):
        for c in range(ch):       # scalar coeffs broadcast over channels
            seg = x[b * F:b * F + C + F, c].astype(np.float64)
            y = scipy.signal.sosfilt(co[b, :, 0, :6].astype(np.float64),
                                     seg)
            ref[b, :, c] = y[-F:]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_mega_dma_segment_path_matches_vmap_poly():
    """PolyPatch (channels layout, 32 voices) renders identically with the
    DMA-segment kernel and the associative-scan mega impl."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import filters as _filters
    from signals_tpu.nodes.fx import Gain, LowPass, Mix
    from signals_tpu.nodes.osc import Sawtooth, Sine
    from signals_tpu.parallel import PolyPatch
    from tests.conftest import fixed

    def build():
        hz = fixed(110.0)
        saw = Sawtooth()
        saw.hertz = hz
        lfo = Sine()
        lfo.hertz = fixed(1.0)
        d = Gain()
        d.left = lfo
        d.right = fixed(700.0)
        cut = Mix()
        cut.left = d
        cut.right = fixed(1800.0)
        cut.mix = fixed(0.5)
        lp = LowPass()
        lp.input = saw
        lp.cutoff = cut
        return lp, hz

    freqs = np.linspace(100, 700, 32).astype(np.float32)

    def render(impl):
        old = _filters.MEGA_FILTER_IMPL
        _filters.MEGA_FILTER_IMPL = impl
        try:
            C._compile_cache.clear()
            root, hz = build()
            poly = PolyPatch(root, n_voices=32,
                             overrides={(hz, 'value'): freqs},
                             block_frames=256, rate=44100,
                             layout='channels')
            assert poly.compiled._use_mega
            audio, _ = poly.render(n_blocks=4)
            return audio
        finally:
            _filters.MEGA_FILTER_IMPL = old
            C._compile_cache.clear()

    ref = render('vmap')
    got = render('pallas')          # 32 voices -> the DMA segment kernel
    assert np.abs(got - ref).max() <= 1e-5


def test_sosfilt_segments_wide_channels():
    """256 channels (two sublane rows per segment) — the 256-voice path."""
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments
    rng = np.random.default_rng(23)
    F, C, nb, ch = 256, 256, 5, 256
    T = C + nb * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    cuts = rng.uniform(300.0, 8000.0, (nb, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(nb)], axis=0)
    got = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    assert got.shape == (nb, F, ch)
    # spot-check a handful of (segment, channel) pairs against scipy
    for b, c in ((0, 0), (2, 77), (4, 255), (3, 128)):
        seg = x[b * F:b * F + C + F, c].astype(np.float64)
        y = scipy.signal.sosfilt(co[b, :, c, :6].astype(np.float64), seg)
        assert np.abs(got[b, :, c] - y[-F:]).max() <= 1e-5


def test_sosfilt_segments_beyond_lane_group():
    """2048 channels — wider than one kernel instance (LANE_GROUP=1024):
    the lane dim splits into independent kernel calls (regression: this
    used to ZeroDivisionError, killing the 2048-voice bench config)."""
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments
    rng = np.random.default_rng(31)
    F, C, nb, ch = 128, 128, 3, 2048
    T = C + nb * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    cuts = rng.uniform(300.0, 8000.0, (nb, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(nb)], axis=0)
    got = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    assert got.shape == (nb, F, ch)
    for b, c in ((0, 0), (1, 1024), (1, 1025), (2, 2047)):
        seg = x[b * F:b * F + C + F, c].astype(np.float64)
        y = scipy.signal.sosfilt(co[b, :, c, :6].astype(np.float64), seg)
        assert np.abs(got[b, :, c] - y[-F:]).max() <= 1e-5
    # the epilogue's grouped sums stay group-aligned across the split
    s = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True,
        sum_groups=64))
    ref = got.reshape(nb, F, ch // 64, 64).sum(axis=3)
    assert np.abs(s - ref).max() <= 1e-4


def test_packed_mega_streams_matches_plain_mega():
    """The stream-packed mega render (whole patch lowered as k packed
    timeline streams; one family-wide filter cascade; per-stream mixes)
    equals the plain mega path on a 32-voice subtractive patch."""
    import jax.numpy as jnp

    import signals_tpu.compiler as C
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.parallel import PolyPatch
    from tests.conftest import fixed

    def build():
        hz = fixed(110.0)
        saw = Sawtooth()
        saw.hertz = hz
        lfo = Sine()
        lfo.hertz = fixed(1.0)
        d = Gain()
        d.left = lfo
        d.right = fixed(700.0)
        cut = Mix()
        cut.left = d
        cut.right = fixed(1800.0)
        cut.mix = fixed(0.5)
        lp = LowPass()
        lp.input = saw
        lp.cutoff = cut
        gate = Square()
        gate.hertz = fixed(2.0)
        env = ADSR()
        env.gate = gate
        st = env.get_state()
        st.attack, st.decay, st.sustain, st.release = 0.01, 0.05, 0.6, 0.1
        voiced = RingMod()
        voiced.left = lp
        voiced.right = env
        out = Gain()
        out.left = voiced
        out.right = fixed(1.0 / 32)
        return out, hz

    freqs = np.linspace(100, 700, 32).astype(np.float32)
    nb = 130              # k = 1024/32 = 32 streams -> S = 5, 30 pad blocks

    def render(force_plain):
        from signals_tpu.compiler import filters as _filters
        old = _filters.MEGA_FILTER_IMPL
        # force the pallas impl so the family path (one packed cascade
        # serving lane slices) is what runs, in interpret mode
        _filters.MEGA_FILTER_IMPL = 'pallas'
        try:
            root, hz = build()
            poly = PolyPatch(root, n_voices=32,
                             overrides={(hz, 'value'): freqs},
                             block_frames=256, rate=44100,
                             layout='channels')
            plan = poly.compiled.packed_mega_streams(nb)
            if force_plain:
                poly.compiled.packed_mega_streams = lambda n: None
            else:
                assert plan is not None, \
                    'packed-streams plan should be eligible'
            audio, _ = poly.render(n_blocks=nb)
            return audio
        finally:
            _filters.MEGA_FILTER_IMPL = old

    plain = render(True)
    packed = render(False)
    assert plain.shape == packed.shape == (nb * 256, 1)
    assert np.abs(plain - packed).max() <= 2e-5


def test_packed_mega_streams_position_offset():
    """Stream-packed rendering at position > 0 equals a continuation of
    the position-0 render (absolute-time lowering is window-invariant)."""
    from signals_tpu.nodes.fx import Gain, LowPass
    from signals_tpu.nodes.osc import Sawtooth
    from signals_tpu.parallel import PolyPatch
    from tests.conftest import fixed

    def build():
        hz = fixed(110.0)
        saw = Sawtooth()
        saw.hertz = hz
        lp = LowPass()
        lp.input = saw
        lp.cutoff = fixed(1500.0)
        g = Gain()
        g.left = lp
        g.right = fixed(1.0 / 32)
        return g, hz

    freqs = np.linspace(100, 700, 32).astype(np.float32)
    root, hz = build()
    poly = PolyPatch(root, n_voices=32, overrides={(hz, 'value'): freqs},
                     block_frames=256, rate=44100, layout='channels')
    assert poly.compiled.packed_mega_streams(128) is not None
    a0, _ = poly.render(n_blocks=128)
    a1, _ = poly.render(position=64 * 256, n_blocks=128)
    assert np.abs(a1[:64 * 256] - a0[64 * 256:]).max() <= 1e-6


def test_context_reuse_ring_matches_double_buffer():
    """The chunk-ring segment kernel (fetch each timeline chunk once)
    produces identical output to the plain double-buffered kernel.
    Locks in the ring index math (slot = chunk % window-chunks, first-use
    waits, next-step refills) in interpret mode."""
    import signals_tpu.compiler.pallas_kernels as pk
    rng = np.random.default_rng(31)
    F, C, nb, ch = 512, 512, 9, 1024    # full lane group -> group == 1,
    #                                       the ring-eligible case (narrower
    #                                       widths pack into group > 1 and
    #                                       take the plain kernel)
    T = C + nb * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    cuts = rng.uniform(300.0, 8000.0, (nb, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(nb)], axis=0)

    old = pk.SEG_CONTEXT_REUSE
    try:
        pk.SEG_CONTEXT_REUSE = True
        ring = np.asarray(pk.sosfilt_segments(
            co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
        pk.SEG_CONTEXT_REUSE = False
        plain = np.asarray(pk.sosfilt_segments(
            co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    finally:
        pk.SEG_CONTEXT_REUSE = old
    np.testing.assert_array_equal(ring, plain)


def test_sosfilt_segments_gen_bit_exact_source():
    """Generator-fed segments (interpret): the in-kernel saw is
    bit-exact vs the same primitive-op sequence evaluated in numpy, and
    the filtered output equals the DMA kernel fed that input; the
    sum_groups epilogue composes."""
    from signals_tpu.compiler.pallas_kernels import (
        OSC_SAW, sosfilt_segments, sosfilt_segments_gen)
    rng = np.random.default_rng(1)
    S, F, C = 4, 256, 256
    k, chx = 16, 64
    rate = 44100
    sf = S * F
    ch = k * chx
    hz = (110.0 * 2 ** (np.arange(chx) % 12 / 12.0)).astype(np.float32)
    hz_lane = np.tile(hz, k)
    ph = np.zeros(ch, np.float32)
    amp = np.ones(ch, np.float32)
    lanef = np.stack([hz_lane, ph, amp])
    toff = np.repeat(np.arange(k, dtype=np.int32), chx) * sf - C

    rows = np.arange(C + sf, dtype=np.int64)
    t = toff[None, :].astype(np.int64) + rows[:, None]
    tf = t.astype(np.float32)
    inv = np.float32(1.0 / rate)

    def frac(v):
        return v - np.floor(v)

    tt = frac(frac(tf * inv * hz_lane[None, :].astype(np.float32)))
    x = np.where(t >= 0,
                 np.float32(2.0) * frac(tt - np.float32(0.5))
                 - np.float32(1.0),
                 np.float32(0.0)).astype(np.float32)

    co_id = np.zeros((S, 1, ch, 11), np.float32)
    co_id[..., 8] = 1.0                       # d0 = 1: identity cascade
    got = np.asarray(sosfilt_segments_gen(
        co_id, toff, lanef, n_segments=S, seg_frames=F, context=C,
        osc_code=OSC_SAW, rate=rate, interpret=True))
    xtails = np.stack([x[b * F + C:b * F + C + F] for b in range(S)])
    assert np.abs(got - xtails).max() == 0.0   # saw wraps demand bits

    co = rng.standard_normal((S, 1, ch, 11)).astype(np.float32) * 0.1
    ref = np.asarray(sosfilt_segments(co, x, n_segments=S, seg_frames=F,
                                      context=C, interpret=True))
    got = np.asarray(sosfilt_segments_gen(
        co, toff, lanef, n_segments=S, seg_frames=F, context=C,
        osc_code=OSC_SAW, rate=rate, interpret=True))
    assert np.abs(got - ref).max() == 0.0

    gots = np.asarray(sosfilt_segments_gen(
        co, toff, lanef, n_segments=S, seg_frames=F, context=C,
        osc_code=OSC_SAW, rate=rate, interpret=True, sum_groups=chx))
    refs = ref.reshape(S, F, k, chx).sum(axis=3)
    assert np.abs(gots - refs).max() / np.abs(refs).max() < 1e-5


@pytest.mark.slow
def test_kernel_grads_match_scan_reference():
    """custom_vjp coverage: ``value_and_grad`` through the Pallas
    entrypoints (interpret mode) equals the gradient of the vmap/scan
    reference of the same math — the machinery that makes the TPU fast
    paths differentiable (``pallas_kernels._make_cv``)."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler.filters import sosfilt_scan
    from signals_tpu.compiler.pallas_kernels import (
        sosfilt_batch, sosfilt_segments)

    rng = np.random.default_rng(0)
    B, L, ch, tail = 3, 64, 4, 32
    x = jnp.asarray(rng.standard_normal((L, B, ch)), jnp.float32)
    crits = jnp.asarray(rng.uniform(500, 5000, (1, B * ch)), jnp.float32)
    co = design_coupled(jnp, 'lp', (crits,), NYQ).reshape(
        1, B, ch, 11).transpose(1, 0, 2, 3)

    def loss(co, x):
        return jnp.sum(sosfilt_batch(co, x, interpret=True,
                                     tail=tail) ** 2)

    def loss_ref(co, x):
        y = jax.vmap(sosfilt_scan, in_axes=(0, 1), out_axes=1)(co, x)
        return jnp.sum(y[L - tail:] ** 2)

    g = jax.grad(loss, argnums=(0, 1))(co, x)
    r = jax.grad(loss_ref, argnums=(0, 1))(co, x)
    for a, b in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)

    ns, sf, C, chs = 4, 128, 128, 64
    T = C + ns * sf
    x = jnp.asarray(rng.standard_normal((T, chs)), jnp.float32)
    crits = jnp.asarray(rng.uniform(500, 5000, (1, ns * chs)), jnp.float32)
    co = design_coupled(jnp, 'lp', (crits,), NYQ).reshape(
        1, ns, chs, 11).transpose(1, 0, 2, 3)
    idx = np.arange(ns)[:, None] * sf + np.arange(C + sf)[None, :]

    def loss_s(co, x):
        return jnp.sum(sosfilt_segments(
            co, x, n_segments=ns, seg_frames=sf, context=C,
            interpret=True, sum_groups=8) ** 2)

    def loss_sr(co, x):
        yb = jax.vmap(sosfilt_scan)(co, x[idx])[:, C:, :]
        return jnp.sum(yb.reshape(ns, sf, -1, 8).sum(axis=3) ** 2)

    g = jax.grad(loss_s, argnums=(0, 1))(co, x)
    r = jax.grad(loss_sr, argnums=(0, 1))(co, x)
    for a, b in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)


@pytest.mark.slow
def test_gen_kernel_grads_flow_to_oscillator_params():
    """The generator-fed cascade is differentiable in hertz/phase/amp
    (``lanef``) and coefficients; ``toff`` (int32) gets a float0
    cotangent.  Grads equal the pure-JAX synth+scan reference."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler.filters import sosfilt_scan
    from signals_tpu.compiler.pallas_kernels import (
        OSC_SINE, _gen_source_rows, sosfilt_segments_gen)

    rng = np.random.default_rng(2)
    ns, sf, C = 2, 128, 128
    crits = jnp.asarray(rng.uniform(500, 5000, (1, ns * 1024)), jnp.float32)
    co = design_coupled(jnp, 'lp', (crits,), NYQ).reshape(
        1, ns, 1024, 11).transpose(1, 0, 2, 3)
    toff = jnp.zeros((1024,), jnp.int32) - C
    lanef = jnp.stack([
        jnp.asarray(rng.uniform(100, 1000, (1024,)), jnp.float32),
        jnp.zeros((1024,), jnp.float32),
        jnp.ones((1024,), jnp.float32)])

    def loss(co, lanef):
        y = sosfilt_segments_gen(
            co, toff, lanef, n_segments=ns, seg_frames=sf, context=C,
            osc_code=OSC_SINE, rate=44100, interpret=True,
            sum_groups=1024)
        return jnp.sum(y ** 2)

    def loss_ref(co, lanef):
        x = _gen_source_rows(toff, lanef, n_segments=ns, seg_frames=sf,
                             context=C, osc_code=OSC_SINE, rate=44100)
        yb = jax.vmap(sosfilt_scan)(co, x)[:, C:, :]
        return jnp.sum(yb.reshape(ns, sf, 1, 1024).sum(axis=3) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(co, lanef)
    r = jax.grad(loss_ref, argnums=(0, 1))(co, lanef)
    assert float(jnp.linalg.norm(g[1][0])) > 0        # hz grads nonzero
    for a, b in zip(g, r):
        # primal values differ by ~1e-7 relative (kernel vs scan
        # reassociation), which the quadratic loss scales into the
        # cotangents — a relative comparison is the honest one
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_sosfilt_segments_wide_sum_groups():
    """Sum groups WIDER than one lane group (the 2048-voice mix
    epilogue): each 1024-lane kernel call reduces its own group and the
    partial columns add — matches the full-output grouped sum."""
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments

    rng = np.random.default_rng(3)
    S, F, C, ch = 2, 128, 128, 2048
    T = C + S * F
    x = rng.standard_normal((T, ch)).astype(np.float32)
    co = (rng.standard_normal((S, 1, ch, 11)) * 0.1).astype(np.float32)
    full = np.asarray(sosfilt_segments(co, x, n_segments=S, seg_frames=F,
                                       context=C, interpret=True))
    got = np.asarray(sosfilt_segments(co, x, n_segments=S, seg_frames=F,
                                      context=C, interpret=True,
                                      sum_groups=2048))
    ref = full.reshape(S, F, 1, 2048).sum(axis=3)
    assert got.shape == (S, F, 1)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_sosfilt_segments_gen_wide_lanes():
    """Generator-fed segments beyond one lane group (2048 voices): the
    wide split matches per-group calls, and the wide epilogue
    (sum_groups=2048) matches the summed full output."""
    from signals_tpu.compiler.pallas_kernels import (
        OSC_SAW, sosfilt_segments_gen)

    rng = np.random.default_rng(4)
    ns, sf, C, ch = 2, 128, 128, 2048
    co = (rng.standard_normal((ns, 1, ch, 11)) * 0.1).astype(np.float32)
    toff = np.full((ch,), -C, np.int32)
    lanef = np.stack([
        rng.uniform(100, 1000, (ch,)).astype(np.float32),
        np.zeros((ch,), np.float32),
        np.ones((ch,), np.float32)])
    wide = np.asarray(sosfilt_segments_gen(
        co, toff, lanef, n_segments=ns, seg_frames=sf, context=C,
        osc_code=OSC_SAW, rate=44100, interpret=True))
    parts = [np.asarray(sosfilt_segments_gen(
        co[:, :, j * 1024:(j + 1) * 1024, :], toff[j * 1024:(j + 1) * 1024],
        lanef[:, j * 1024:(j + 1) * 1024], n_segments=ns, seg_frames=sf,
        context=C, osc_code=OSC_SAW, rate=44100, interpret=True))
        for j in range(2)]
    np.testing.assert_array_equal(wide, np.concatenate(parts, axis=2))

    gots = np.asarray(sosfilt_segments_gen(
        co, toff, lanef, n_segments=ns, seg_frames=sf, context=C,
        osc_code=OSC_SAW, rate=44100, interpret=True, sum_groups=2048))
    ref = wide.reshape(ns, sf, 1, 2048).sum(axis=3)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(gots - ref).max() / scale < 1e-5


@pytest.mark.slow
def test_chunked_vjp_matches_plain_reference():
    """Above REF_CHUNK_SEGMENTS the scan-reference VJP runs as
    checkpointed chunks (bounded backward memory for long fits); the
    gradients are identical to the unchunked reference — chunking only
    reorders per-segment computations."""
    import jax
    import jax.numpy as jnp

    import signals_tpu.compiler.pallas_kernels as PK
    from signals_tpu.compiler.filters import sosfilt_scan

    rng = np.random.default_rng(5)
    old = PK.REF_CHUNK_SEGMENTS
    PK.REF_CHUNK_SEGMENTS = 8
    try:
        ns, sf, C, chs = 20, 64, 64, 64          # 20 > 8: chunked path
        T = C + ns * sf
        x = jnp.asarray(rng.standard_normal((T, chs)), jnp.float32)
        co = jnp.asarray(rng.standard_normal((ns, 1, chs, 11)) * 0.1,
                         jnp.float32)
        idx = np.arange(ns)[:, None] * sf + np.arange(C + sf)[None, :]

        def loss(co, x):
            return jnp.sum(PK.sosfilt_segments(
                co, x, n_segments=ns, seg_frames=sf, context=C,
                interpret=True, sum_groups=8) ** 2)

        def loss_plain(co, x):
            yb = jax.vmap(sosfilt_scan)(co, x[idx])[:, C:, :]
            return jnp.sum(yb.reshape(ns, sf, -1, 8).sum(axis=3) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(co, x)
        r = jax.grad(loss_plain, argnums=(0, 1))(co, x)
        for a, b in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4)

        # batch kernel: chunked over segments too
        B, L, ch, tail = 20, 64, 4, 32
        xt = jnp.asarray(rng.standard_normal((L, B, ch)), jnp.float32)
        cb = jnp.asarray(rng.standard_normal((B, 1, ch, 11)) * 0.1,
                         jnp.float32)

        def loss_b(cb, xt):
            return jnp.sum(PK.sosfilt_batch(cb, xt, interpret=True,
                                            tail=tail) ** 2)

        def loss_br(cb, xt):
            y = jax.vmap(sosfilt_scan, in_axes=(0, 1), out_axes=1)(cb, xt)
            return jnp.sum(y[L - tail:] ** 2)

        g = jax.grad(loss_b, argnums=(0, 1))(cb, xt)
        r = jax.grad(loss_br, argnums=(0, 1))(cb, xt)
        for a, b in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4)
    finally:
        PK.REF_CHUNK_SEGMENTS = old


def test_segments_gen_carry_blocks_const_coeffs_bit_exact():
    """Multi-block carry segments (``blocks_per_seg = m``,
    filters.SEG_CARRY_BLOCKS): with per-block-IDENTICAL coefficients the
    carried state differs from per-block context replay only by the
    filter's response beyond the context window — which flushes to zero
    in f32 — so the m > 1 output must be BIT-identical to m = 1, full
    output and mix-epilogue sums alike."""
    from signals_tpu.compiler.filters import design_coupled
    from signals_tpu.compiler.pallas_kernels import (LANE_GROUP, OSC_SAW,
                                                     sosfilt_segments_gen)
    import jax.numpy as jnp
    nb, F, C = 8, 512, 512
    rate = 44100
    lanes = LANE_GROUP
    crit = jnp.full((1, lanes), 2000.0)
    c1 = np.asarray(design_coupled(jnp, 'lp', (crit,), rate / 2))
    co = np.broadcast_to(c1[None], (nb,) + c1.shape)
    toff = np.zeros(lanes, np.int32)
    hz = np.linspace(100, 400, lanes).astype(np.float32)
    lanef = np.stack([hz, np.zeros(lanes, np.float32),
                      np.ones(lanes, np.float32)])

    def run(m, sum_groups=0):
        return np.asarray(sosfilt_segments_gen(
            co, toff, lanef, n_segments=nb, seg_frames=F, context=C,
            osc_code=OSC_SAW, rate=rate, interpret=True,
            sum_groups=sum_groups, blocks_per_seg=m))

    assert np.abs(run(1) - run(4)).max() == 0.0
    assert np.abs(run(1, sum_groups=128) - run(4, sum_groups=128)).max() \
        == 0.0


def test_segments_gen_carry_blocks_matches_carry_reference():
    """With per-block VARYING coefficients the m-block kernel computes
    the carried time-varying cascade — context warmup under the first
    block's coeffs, state threading through the blocks.  Pin it to a
    hand-written reference of exactly that math (kernel correctness,
    independent of the plan gate that keeps swept filters at m = 1)."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler.filters import (design_coupled,
                                              sosfilt_stream)
    from signals_tpu.compiler.pallas_kernels import (
        LANE_GROUP, OSC_SAW, _gen_source_rows, sosfilt_segments_gen)
    nb, F, C, m = 8, 512, 512, 4
    rate = 44100
    lanes = LANE_GROUP
    cuts = np.linspace(1500, 3000, nb).astype(np.float32)
    co = np.stack([np.asarray(design_coupled(
        jnp, 'lp', (jnp.full((1, lanes), c),), rate / 2)) for c in cuts])
    toff = np.zeros(lanes, np.int32)
    hz = np.linspace(100, 400, lanes).astype(np.float32)
    lanef = np.stack([hz, np.zeros(lanes, np.float32),
                      np.ones(lanes, np.float32)])
    got = np.asarray(sosfilt_segments_gen(
        co, toff, lanef, n_segments=nb, seg_frames=F, context=C,
        osc_code=OSC_SAW, rate=rate, interpret=True, blocks_per_seg=m))

    x = _gen_source_rows(jnp.asarray(toff), jnp.asarray(lanef),
                         n_segments=nb // m, seg_frames=m * F, context=C,
                         osc_code=OSC_SAW, rate=rate)

    def one_seg(co_m, xw):
        z0 = jnp.zeros((co_m.shape[1], 2, xw.shape[1]), jnp.float32)
        _, z = sosfilt_stream(co_m[0], xw[:C], z0)

        def body(z, args):
            co_b, xb = args
            yb, z2 = sosfilt_stream(co_b, xb, z)
            return z2, yb

        _, ys = jax.lax.scan(body, z,
                             (co_m, xw[C:].reshape(m, F, xw.shape[1])))
        return ys.reshape(m * F, xw.shape[1])

    want = np.asarray(jax.vmap(one_seg)(
        jnp.asarray(co).reshape(nb // m, m, *co.shape[1:]), x)
    ).reshape(nb, F, lanes)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.slow
def test_segments_gen_carry_blocks_grads_flow():
    """The custom VJP mirrors the m-block carry math: value_and_grad
    through ``blocks_per_seg > 1`` returns finite, nonzero gradients for
    both the coefficients and the per-lane oscillator params."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler.filters import design_coupled
    from signals_tpu.compiler.pallas_kernels import (LANE_GROUP, OSC_SAW,
                                                     sosfilt_segments_gen)
    nb, F, C, m = 4, 256, 256, 4
    rate = 44100
    lanes = LANE_GROUP
    crit = jnp.full((1, lanes), 2000.0)
    c1 = design_coupled(jnp, 'lp', (crit,), rate / 2)
    co = jnp.broadcast_to(c1[None], (nb,) + c1.shape)
    toff = jnp.zeros(lanes, jnp.int32)
    hz = jnp.linspace(100.0, 400.0, lanes).astype(jnp.float32)
    lanef = jnp.stack([hz, jnp.zeros(lanes), jnp.ones(lanes)])

    def loss(co, lanef):
        y = sosfilt_segments_gen(
            co, toff, lanef, n_segments=nb, seg_frames=F, context=C,
            osc_code=OSC_SAW, rate=rate, interpret=True,
            sum_groups=128, blocks_per_seg=m)
        return jnp.mean(y ** 2)

    val, (g_co, g_lf) = jax.value_and_grad(loss, argnums=(0, 1))(co, lanef)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g_co)).all()
    assert np.abs(np.asarray(g_lf)).max() > 0
    assert np.isfinite(np.asarray(g_lf)).all()


def test_segments_sum_lanes_on_plain_kernel_short_context():
    """The mix-epilogue in-kernel sum on the plain double-buffered kernel
    (round 4): a short pole-justified context (C=128 at F=1024 gives
    w = 9 window chunks) is a geometry the reuse ring's ``w <= 6`` VMEM
    gate cannot hold — the sum used to silently fall back to a full-width
    output + external sum, forfeiting the epilogue's HBM savings.  The
    plain kernel's sum mode must match the full output's grouped sum."""
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments
    rng = np.random.default_rng(7)
    F, C, nb, ch = 1024, 128, 4, 1024
    x = rng.standard_normal((C + nb * F, ch)).astype(np.float32)
    cuts = rng.uniform(500.0, 8000.0, (nb, ch)).astype(np.float32)
    co = np.stack([design_coupled(np, 'lp', [cuts[b:b + 1]], NYQ)
                   for b in range(nb)], axis=0)
    full = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True))
    s = np.asarray(sosfilt_segments(
        co, x, n_segments=nb, seg_frames=F, context=C, interpret=True,
        sum_groups=128))
    ref = full.reshape(nb, F, ch // 128, 128).sum(axis=3)
    assert s.shape == (nb, F, ch // 128)
    assert np.abs(s - ref).max() <= 1e-4


def test_segments_carry_coarse_static_coeffs_bit_exact():
    """Multi-block carry on the DMA path is implemented as COARSER
    segmentation (no kernel change): with per-block-identical
    coefficients, nb/m segments of m*F frames must be BIT-identical to
    nb per-block segments — the carried state differs from the replayed
    one only by the response beyond the context window, which flushes to
    zero in f32.  Checked for the full output and the in-kernel sums
    (the caller's reshape recovers block-major layout exactly)."""
    from signals_tpu.compiler.pallas_kernels import sosfilt_segments
    rng = np.random.default_rng(11)
    F, C, nb, m, ch = 512, 512, 8, 4, 1024
    x = rng.standard_normal((C + nb * F, ch)).astype(np.float32)
    co1 = design_coupled(np, 'lp',
                         [np.full((1, ch), 2000.0, np.float32)], NYQ)
    co = np.broadcast_to(np.asarray(co1)[None], (nb,) + np.shape(co1))

    def run(n_seg, seg_f, coeffs, sum_groups=0):
        return np.asarray(sosfilt_segments(
            coeffs, x, n_segments=n_seg, seg_frames=seg_f, context=C,
            interpret=True, sum_groups=sum_groups))

    per_block = run(nb, F, co)
    coarse = run(nb // m, m * F, co[::m]).reshape(nb, F, ch)
    assert np.abs(per_block - coarse).max() == 0.0
    s_pb = run(nb, F, co, sum_groups=128)
    s_co = run(nb // m, m * F, co[::m], sum_groups=128)
    assert np.abs(s_pb - s_co.reshape(nb, F, ch // 128)).max() == 0.0
