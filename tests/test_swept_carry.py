"""Swept-crit carry segments (round 5): product semantics + parity.

A non-streaming ``CritFilter`` whose crits are SWEPT (fed by non-``Fixed``
nodes) carries state across ``m`` consecutive 1024-frame blocks, with
segment boundaries at absolute multiples of ``m * F`` and the context
warmup replayed once per segment under the segment-start coefficients
(:meth:`signals_tpu.nodes.fx.CritFilter.swept_carry_m`).  These tests pin:

* the numpy pull oracle and every compiled path agree (per-block TV scan,
  mega windows, the packed family kernels);
* batch splits and unaligned starts reproduce the same absolute-aligned
  output (``CompiledPatch.render`` aligns with per-block prefixes);
* ``State.carry = 1`` opts back into the reference's per-block replay;
* static-crit patches are untouched.
"""

import numpy as np
import pytest

from conftest import fixed, pull_blocks

BLOCK, RATE = 1024, 44100


def _swept_voice(context=512, carry=0):
    from signals_tpu.nodes.fx import Gain, LowPass, Mix
    from signals_tpu.nodes.osc import Sawtooth, Sine
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    lfo = Sine()
    lfo.hertz = fixed(0.5)
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
    st = lp.get_state()
    st.context = context
    st.carry = carry
    out = Gain()
    out.left = lp
    out.right = fixed(0.9)
    return out, lp


def test_sosfilt_tv_matches_threaded_stream():
    """The time-varying scan (per-frame coefficient sets + reset mask)
    equals context warmup + per-block sosfilt_stream threading — the one
    copy of the carry recurrence the fallback paths rely on."""
    import jax.numpy as jnp
    from signals_tpu.compiler import filters as flt

    rng = np.random.default_rng(7)
    F, C, m, ch = 64, 32, 4, 3
    n = C + m * F
    x = rng.standard_normal((n, ch)).astype(np.float32)
    cuts = np.linspace(900.0, 2600.0, m * ch).reshape(m, ch)
    sets = np.stack([np.asarray(flt.design_coupled(
        np, flt.LOWPASS, (cuts[b].reshape(1, -1),), 22050.0))
        for b in range(m)])                       # (m, 1, ch, 11)
    set_idx = np.concatenate(
        [np.zeros(C, np.int32),
         np.repeat(np.arange(m, dtype=np.int32), F)])
    keep = np.ones(n, bool)
    keep[0] = False                               # reset at warmup start
    y = np.asarray(flt.sosfilt_tv(jnp.asarray(sets), set_idx, x, keep))

    z = np.zeros((1, 2, ch), np.float32)
    _, z = map(np.asarray, flt.sosfilt_stream(sets[0], x[:C], z))
    ref = []
    for b in range(m):
        yb, z = map(np.asarray, flt.sosfilt_stream(
            sets[b], x[C + b * F:C + (b + 1) * F], z))
        ref.append(yb)
    ref = np.concatenate([np.asarray(flt.sosfilt_stream(
        sets[0], x[:C], np.zeros((1, 2, ch), np.float32))[0])] + ref)
    assert np.abs(y - ref).max() < 1e-5


@pytest.mark.slow
def test_swept_carry_oracle_parity_all_paths():
    """Compiled output == pull oracle for the swept voice through the
    per-block path, chained batches, a batch-split, and an unaligned
    start (driver per-block prefix) — the absolute-aligned semantics is
    a pure function of time."""
    import jax
    from signals_tpu.compiler import compile_node

    out, lp = _swept_voice()
    c = compile_node(out, block_frames=BLOCK, rate=RATE, channels=1)
    assert c.carry_seg_align == 8

    want = pull_blocks(out, 24, block_frames=BLOCK, rate=RATE, channels=1)
    audio, _ = c.render(position=0, n_blocks=24, deliver_taps=False)
    assert np.abs(audio - want).max() < 1e-5

    # per-block chaining reproduces the same output
    carry = jax.tree.map(lambda x: x, c.carry0)
    outs = []
    for i in range(24):
        a, carry = c.render(position=i * BLOCK, n_blocks=1, carry=carry,
                            deliver_taps=False)
        outs.append(a)
    assert np.abs(np.concatenate(outs) - want).max() < 1e-5

    # batch split 8 + 16 is bit-exact vs the one-shot render
    a1, cc = c.render(position=0, n_blocks=8, deliver_taps=False)
    a2, _ = c.render(position=8 * BLOCK, n_blocks=16, carry=cc,
                     deliver_taps=False)
    assert np.abs(np.concatenate([a1, a2]) - audio).max() == 0.0

    # unaligned start: the driver renders a per-block prefix up to the
    # next absolute segment boundary, then the aligned program
    want3 = pull_blocks(out, 13, block_frames=BLOCK, rate=RATE,
                        channels=1, start_block=3)
    audio3, _ = c.render(position=3 * BLOCK, n_blocks=13,
                         deliver_taps=False)
    assert np.abs(audio3 - want3).max() < 1e-5


def test_carry_opt_out_restores_per_block_replay():
    """``State.carry = 1``: reference-style per-block zero-state replay
    in both engines (the pre-round-5 semantics), still parity-clean."""
    from signals_tpu.compiler import compile_node

    out, lp = _swept_voice(carry=1)
    assert lp.swept_carry_m() == 1
    c = compile_node(out, block_frames=BLOCK, rate=RATE, channels=1)
    assert c.carry_seg_align == 1
    want = pull_blocks(out, 12, block_frames=BLOCK, rate=RATE, channels=1)
    audio, _ = c.render(position=0, n_blocks=12, deliver_taps=False)
    assert np.abs(audio - want).max() < 1e-5

    # and carry=1 vs carry=8 genuinely differ (the semantics changed)
    out8, _ = _swept_voice(carry=8)
    c8 = compile_node(out8, block_frames=BLOCK, rate=RATE, channels=1)
    audio8, _ = c8.render(position=0, n_blocks=12, deliver_taps=False)
    assert np.abs(audio8 - audio).max() > 1e-4


def test_mega_grid_tv_path_parity():
    """The mega-window TV fallback (narrow channels force the vmap mega
    impl on CPU): same semantics through the whole-window lowering."""
    from signals_tpu.compiler import compile_node

    out, lp = _swept_voice()
    c = compile_node(out, block_frames=BLOCK, rate=RATE, channels=1)
    c.mega_min_channels = 1          # instance override: force mega
    assert c._use_mega
    want = pull_blocks(out, 16, block_frames=BLOCK, rate=RATE, channels=1)
    audio, _ = c.render(position=0, n_blocks=16, deliver_taps=False)
    assert np.abs(audio - want).max() < 1e-5


@pytest.mark.slow
def test_swept_carry_dma_family_path():
    """Swept crits on the DMA (non-generator) packed family: a noise-fed
    voice whose cutoff is LFO-swept — the input can't be synthesized
    in-kernel, so the family DMAs the packed timeline and the carry
    segments step per-block coefficients inside the segment
    (``sosfilt_segments(blocks_per_seg=m)``).  64-voice epilogue mix vs
    the sum-of-solo oracle."""
    from signals_tpu.compiler import filters as _f
    from signals_tpu.nodes.fx import CritFilter, Gain, LowPass, Mix
    from signals_tpu.nodes.noise import White
    from signals_tpu.nodes.osc import Sine

    F, NB = 1024, 32

    nz = White()
    lfo = Sine()
    lfo.hertz = fixed(0.5)
    depth = Gain()
    depth.left = lfo
    depth.right = fixed(900.0)
    cut = Mix()
    cut.left = depth
    cut.right = fixed(2000.0)
    cut.mix = fixed(0.5)
    lp = LowPass()
    lp.input = nz
    lp.cutoff = cut
    lp.get_state().context = CritFilter.context_for(550.0, RATE)
    out = Gain()
    out.left = lp
    out.right = fixed(1.0 / 8)

    import signals_tpu.compiler as C
    from signals_tpu.parallel import PolyPatch
    saved = (_f.MEGA_FILTER_IMPL, _f.SEG_SOURCE_GEN)
    _f.MEGA_FILTER_IMPL = 'pallas'
    _f.SEG_SOURCE_GEN = True         # gen must DECLINE (noise input)
    try:
        amps = np.linspace(0.5, 1.5, 64).astype(np.float32)
        poly = PolyPatch(out, n_voices=64,
                         overrides={(out._ports['right'].sig, 'value'):
                                    amps / 8},
                         block_frames=F, rate=RATE,
                         layout='channels', mix_epilogue=True)
        assert not poly.compiled.packed_gen_engaged(NB, mix_epilogue=True)
        audio, _ = poly.render(n_blocks=NB)
        oracle = pull_blocks(poly.compiled.root, NB, block_frames=F,
                             rate=RATE, channels=64
                             ).sum(axis=1, keepdims=True)
        err = np.abs(np.asarray(audio) - oracle).max() / 64
        assert err < 1e-5, err
        C._compile_cache.clear()
    finally:
        _f.MEGA_FILTER_IMPL, _f.SEG_SOURCE_GEN = saved
