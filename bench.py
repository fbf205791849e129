"""Benchmark harness: the five BASELINE configs on real hardware.

Prints ONE JSON line: the headline metric is config 4 (64-voice
subtractive patch with LFO-modulated cutoff) in ×realtime @ 44.1 kHz per
chip; ``vs_baseline`` is the ratio against the 1000× north-star
(BASELINE.md).  Details for every config land in the ``extra`` field.

Run on TPU (default backend); pass ``--cpu`` to force the CPU backend and
``--quick`` for a fast smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent XLA compilation cache: repeat bench runs (and the driver's
# runs) skip the slow tunnel compiles.  The env var alone is NOT enough
# when a platform plugin pre-imports jax at interpreter startup (config
# defaults are captured then), so utils.enable_persistent_compile_cache
# applies it via jax.config.update in main().
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/signals_tpu_xla'))

import numpy as np

RATE = 44100
BLOCK = 1024
TOL = 1e-5
#: The former TOL_NONLINEAR_FB carve-out (1e-4 for the saturated echo) is
#: RETIRED: Drive's saturator is now ``mathx.tanh_exact`` — f64
#: arithmetic-only tanh rounded to f32 once, bit-identical across
#: engines — so backend tanh ULP differences can no longer re-inject
#: through the feedback loop (they measured a stable ~3e-5 on v5e with
#: library tanh).  Every config now carries the uniform 1e-5 budget,
#: per-voice-normalized where mixes sum.
PARITY_TOL = {
    # the poly mix is a 64-voice SUM: BASELINE.md's 1e-5 max-abs budget
    # is per rendered patch, so the mix's budget is 64x
    # (check_poly_parity returns raw max-abs)
    'poly64_mix': 64 * TOL,
    'poly64_static_mix': 64 * TOL,
    'poly64_noise_mix': 64 * TOL}
F32 = np.float32


def fixed(value):
    from signals_tpu.nodes.fixed import Fixed
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(value, dtype=np.float32))
    return f


def build_sine_plot():
    """Config 1: single 440 Hz sine -> vis tap (block render + plot)."""
    from signals_tpu.nodes.osc import Sine
    from signals_tpu.nodes.vis import Wave
    osc = Sine()
    osc.hertz = fixed(440.0)
    tap = Wave()
    tap.input = osc
    return tap


def build_additive_voice():
    """Config 2 voice: one detuned sine+saw pair -> gain."""
    from signals_tpu.nodes.fx import Gain, Mix
    from signals_tpu.nodes.osc import Sawtooth, Sine
    hz = fixed(220.0)
    sine = Sine()
    sine.hertz = hz
    saw = Sawtooth()
    saw.hertz = hz
    m = Mix()
    m.left = sine
    m.right = saw
    m.mix = fixed(0.5)
    g = Gain()
    g.left = m
    g.right = fixed(1.0 / 16)
    return g, hz


def build_subtractive_voice():
    """Config 3/4 voice: saw -> LP (LFO-swept cutoff) -> ADSR envelope."""
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square
    hz = fixed(110.0)
    saw = Sawtooth()
    saw.hertz = hz
    lfo = Sine()
    lfo.hertz = fixed(0.5)
    depth = Gain()
    depth.left = lfo
    depth.right = fixed(900.0)
    cutoff = Mix()              # 2000 + LFO*900
    cutoff.left = depth
    cutoff.right = fixed(2000.0)
    cutoff.mix = fixed(0.5)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = cutoff
    # pole-justified context (CritFilter.context_for): the LFO sweep
    # floor is 0.5*2000 - 0.5*900 = 550 Hz -> 512 frames (truncation
    # ~2e-9, far inside the 1e-5 parity budget; the numpy oracle replays
    # the same window, so parity is untouched).  Round 5: the swept
    # cutoff now rides multi-block carry segments (swept_carry_m=8, the
    # oracle mirroring the segmentation), so the 512-frame context
    # replays once per 8 blocks: per-frame kernel work (512+8*1024)/
    # (8*1024) = 1.0625x, vs 1.5x at per-block replay.
    lp.get_state().context = LowPass.context_for(550.0, RATE)
    gate = Square()
    gate.hertz = fixed(2.0)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.01, 0.08, 0.6, 0.1
    voiced = RingMod()
    voiced.left = lp
    voiced.right = env
    out = Gain()
    out.left = voiced
    out.right = fixed(1.0 / 64)
    return out, hz


def build_subtractive_voice_static():
    """The config-4 voice with a FIXED cutoff — the static-crit shape
    (no LFO on the filter).  Static crits unlock two compounding kernel
    savings: ``context_for(2000) = 128`` (pole-justified window, vs the
    sweep's 512) and multi-block carry segments (SEG_CARRY_BLOCKS=8,
    bit-identical to per-block replay for per-block-identical coeffs) —
    per-frame kernel work (128 + 8*1024)/(8*1024) = 1.016x vs the
    default's 2.0x.  Measured (v5e): 64 voices 11032x realtime, 1024
    voices 994x = 1.02M voice-realtime units on one chip."""
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import Gain, LowPass, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Square
    hz = fixed(110.0)
    saw = Sawtooth()
    saw.hertz = hz
    lp = LowPass()
    lp.input = saw
    lp.cutoff = fixed(2000.0)
    lp.get_state().context = LowPass.context_for(2000.0, RATE)
    gate = Square()
    gate.hertz = fixed(2.0)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.01, 0.08, 0.6, 0.1
    voiced = RingMod()
    voiced.left = lp
    voiced.right = env
    out = Gain()
    out.left = voiced
    out.right = fixed(1.0 / 64)
    return out, hz


NOISE_CUTS_64 = np.linspace(1000.0, 4000.0, 64).astype(np.float32)


def build_noise_voice_static():
    """Noise-fed static voice (round 4): White -> fixed-cutoff LowPass ->
    Gain, the per-voice override on the CUTOFF.  The input can't be
    synthesized in-kernel (noise is no oscillator), so the packed family
    DMAs the timeline — the path that exercises multi-block carry
    segments on the DMA kernels (coarser segmentation,
    `CritFilter._carry_blocks`) and the plain-kernel in-kernel sum
    (`_seg_kernel` sum_lanes; the pole-justified C=256 context is a
    geometry the reuse ring's w<=6 gate can't hold)."""
    from signals_tpu.nodes.fx import CritFilter, Gain, LowPass
    from signals_tpu.nodes.noise import White
    nz = White()
    lp = LowPass()
    lp.input = nz
    cut = fixed(2000.0)
    lp.cutoff = cut
    lp.get_state().context = CritFilter.context_for(1000.0, RATE)
    out = Gain()
    out.left = lp
    out.right = fixed(1.0 / 64)
    return out, cut


def build_fm_delay():
    """Config 5: 3-op FM stack + delay/feedback loop + spectral tap."""
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Gain, Mix
    from signals_tpu.nodes.osc import Sine
    from signals_tpu.nodes.vis import Spec
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
    d.get_state().frames = 4 * BLOCK
    fb = Gain()
    fb.left = d
    fb.right = fixed(0.45)
    mix.left = op1
    mix.right = fb
    mix.mix = fixed(0.6)
    d.input = mix
    tap = Spec()
    tap.input = mix
    return tap


def build_saturated_echo():
    """Config 6: saturated tape echo — a NONLINEAR feedback loop (tanh
    drive on the return) the affine solver cannot close-form; renders
    via the segmented feedback scan (``CompiledPatch.segment_scan_core``:
    ``lax.scan`` over ``floor(D/F)``-block windows instead of blocks)."""
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Drive, Gain, LowPass, Mix
    from signals_tpu.nodes.osc import Sawtooth
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = 16 * BLOCK + 5    # ~0.37 s, S_max = 16
    lp = LowPass()
    lp.input = d
    lp.cutoff = fixed(2500.0)
    lp.get_state().streaming = True          # damping inside the loop
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
    return mix


def build_master_bus():
    """Config 7: a mastering chain — subtractive voice -> FDN reverb ->
    sliding-RMS compressor.  The compressor reads the reverb at a
    context-lookback window; with stateful history serving
    (``_Compiler._serve_history``) the whole chain rides the mega window
    (before round 3 any context read of a stateful node demoted the
    patch to the per-block scan)."""
    from signals_tpu.nodes.dyn import Compressor
    from signals_tpu.nodes.fx import Gain
    from signals_tpu.nodes.reverb import Reverb
    voice, _ = build_subtractive_voice()
    rv = Reverb()
    rv.input = voice
    comp = Compressor()
    st = comp.get_state()
    st.window = 2 * BLOCK
    st.threshold = 0.25
    st.ratio = 4.0
    comp.input = rv
    out = Gain()
    out.left = comp
    out.right = fixed(0.9)
    return out


def check_parity(root, *, n_blocks=43, channels=1, tol=TOL, start_block=0):
    """Compiled output vs the numpy pull-interpreter oracle.

    Uses the same (graph, n_blocks) program the perf measurement uses, so
    each config compiles exactly once per process (tunnel compiles are
    minutes each).
    """
    from signals_tpu.compiler import compile_node
    from signals_tpu.core import BlockLoc, Request, Shape
    compiled = compile_node(root, block_frames=BLOCK, rate=RATE,
                            channels=channels)
    audio, _ = compiled.render(position=start_block * BLOCK,
                               n_blocks=n_blocks, deliver_taps=False)
    oracle = []
    for i in range(start_block, start_block + n_blocks):
        loc = BlockLoc(position=i * BLOCK, rate=RATE,
                       shape=Shape(BLOCK, channels))
        block = root.respond(Request(requestor=None, port='bench', loc=loc))
        oracle.append(np.broadcast_to(block, (BLOCK, channels)))
    err = float(np.abs(audio - np.concatenate(oracle)).max())
    return err


def _poly_freqs(n_voices):
    """The detuned per-voice frequency table — ONE copy shared by the
    fetch benches, the device-resident benches and the parity check, so
    the parity evidence always validates the patch the headline times."""
    return (110.0 * 2 ** (np.arange(n_voices) % 12 / 12.0)
            * (1 + 0.001 * np.arange(n_voices))).astype(np.float32)


def check_poly_parity(n_voices=64, *, n_blocks=32,
                      builder=None, override_values=None):
    """The 64-voice mix under PRODUCT DEFAULTS (mix epilogue / generator
    kernel resolve by backend) vs the numpy pull-interpreter oracle: the
    channel-overridden V-wide root rendered per block and summed over
    voices.  ``n_blocks=32`` matters: the full-lane-group plan at 64
    voices is k=16 streams, which needs n_blocks >= 2k — fewer blocks
    would parity-check a smaller k whose path skips the in-kernel
    group-sum/generator the headline actually runs.  Returns the RAW
    max-abs error of the mix; the tolerance (PARITY_TOL) scales
    BASELINE.md's per-voice 1e-5 budget by the voice count, since the
    mix is a V-voice sum."""
    from signals_tpu.core import BlockLoc, Request, Shape
    from signals_tpu.parallel import PolyPatch
    root, hz = (builder or build_subtractive_voice)()
    vals = (_poly_freqs(n_voices) if override_values is None
            else np.asarray(override_values, dtype=np.float32))
    poly = PolyPatch(root, n_voices=n_voices,
                     overrides={(hz, 'value'): vals},
                     block_frames=BLOCK, rate=RATE, layout='channels')
    mix, _ = poly.render(n_blocks=n_blocks)
    wide_root = poly.compiled.root
    oracle = []
    for i in range(n_blocks):
        loc = BlockLoc(position=i * BLOCK, rate=RATE,
                       shape=Shape(BLOCK, n_voices))
        block = wide_root.respond(
            Request(requestor=None, port='bench', loc=loc))
        oracle.append(np.broadcast_to(block, (BLOCK, n_voices)))
    want = np.concatenate(oracle).sum(axis=1, keepdims=True)
    got = np.asarray(mix).reshape(want.shape)
    return float(np.abs(got - want).max())


def time_render(render_once, *, min_seconds=2.0, min_iters=3):
    """Steady-state wall time per call (after a warmup call)."""
    render_once()                       # warmup/compile
    times = []
    t_total = 0.0
    while t_total < min_seconds or len(times) < min_iters:
        t0 = time.perf_counter()
        render_once()
        dt = time.perf_counter() - t0
        times.append(dt)
        t_total += dt
    return float(np.median(times))


def time_render_pipelined(launch, *, n_outstanding=8, rounds=4,
                          materialize=np.asarray):
    """Sustained wall time per call with ``n_outstanding`` async dispatches
    in flight — hides the host↔device round-trip of a single call.
    ``launch(i)`` must return an (unblocked) device value;
    ``materialize`` brings it fully to the host (default np.asarray).

    Timing is to full host materialization, not ``block_until_ready``:
    under the axon tunnel the latter can return before remote execution
    finishes, producing fantasy numbers.
    """
    materialize(launch(0))              # warmup/compile
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [launch(i) for i in range(n_outstanding)]
        for o in outs:
            materialize(o)
        best = min(best, (time.perf_counter() - t0) / n_outstanding)
    return best


def bench_single(root, *, seconds=1.0, label='', channels=1,
                 pipelined=True):
    from signals_tpu.compiler import compile_node
    import jax
    compiled = compile_node(root, block_frames=BLOCK, rate=RATE,
                            channels=channels)
    n_blocks = int(round(seconds * RATE / BLOCK))
    params = compiled.params()
    host = compiled.stage_host(0, n_blocks)
    fn = compiled.render_fn(n_blocks)
    carry0 = compiled.carry0

    @jax.jit
    def run(params, carry, position, host):
        # fetch the audio only: vis/recorder taps are PASSTHRU copies of
        # the same samples, delivered on the host from the same buffer —
        # returning them too would double the bytes through the host link
        blocks, carry2, _taps = fn(params, carry, position, host)
        return blocks

    def launch(i):
        return run(params, jax.tree.map(lambda x: x, carry0), 0, host)

    if pipelined:
        t = time_render_pipelined(launch)
    else:
        t = time_render(lambda: np.asarray(launch(0)))
    samples = n_blocks * BLOCK
    return {'label': label, 'x_realtime': samples / RATE / t,
            'samples_per_sec': samples / t, 'wall_per_call_s': t}


def bench_vis(root, *, seconds=1.0, label=''):
    """Config 1 as the product actually plots it: render on device and
    fetch ONLY the vis taps' decimated display summaries
    (``CompiledPatch.render_vis`` — Wave = ~1500-point min/max envelope,
    Spec = FFT band magnitudes).  A Wave plot consumes at most 1500
    frames per 30 ms tick (reference ``ui/vis.py:17-19``); the envelope
    IS the deliverable, so full-rate audio never crosses the host link.
    """
    import jax

    from signals_tpu.compiler import compile_node
    compiled = compile_node(root, block_frames=BLOCK, rate=RATE,
                            channels=1)
    n_blocks = int(round(seconds * RATE / BLOCK))
    params = compiled.params()
    host = compiled.stage_host(0, n_blocks)
    run, _vis_nodes = compiled._vis_fn(n_blocks)
    carry0 = compiled.carry0

    def launch(i):
        return run(params, jax.tree.map(lambda x: x, carry0), 0, host)

    def materialize(out):
        summaries, _carry = out
        return {uid: np.asarray(s) for uid, s in summaries.items()}

    t = time_render_pipelined(launch, materialize=materialize)
    samples = n_blocks * BLOCK
    pts = sum(int(np.prod(np.shape(v)))
              for v in materialize(launch(0)).values())
    return {'label': label, 'x_realtime': samples / RATE / t,
            'samples_per_sec': samples / t, 'wall_per_call_s': t,
            'summary_points_fetched': pts}


def bench_fit_step(*, n_voices=64, seconds=1.0):
    """Differentiable synthesis, device-resident: one jitted
    ``value_and_grad`` optimization step (spectral loss vs a target
    rendered at a different cutoff) through the product-default TPU
    lowering — the packed Pallas cascade running under the round-4
    custom VJPs.  Only the scalar loss and a grad-norm scalar leave the
    device; ``x_realtime`` = seconds of audio differentiated (forward +
    backward) per wall second."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.compiler import compile_node
    from signals_tpu.learn import make_loss_fn
    from signals_tpu.nodes.fx import Gain, LowPass
    from signals_tpu.nodes.osc import Sawtooth

    hz = fixed(_poly_freqs(n_voices))
    saw = Sawtooth()
    saw.hertz = hz
    cut = fixed(800.0)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = cut
    g = Gain()
    g.left = lp
    g.right = fixed(1.0 / n_voices)
    compiled = compile_node(g, block_frames=BLOCK, rate=RATE,
                            channels=n_voices)
    n_blocks = int(round(seconds * RATE / BLOCK))
    engaged = compiled.packed_mega_streams(n_blocks) is not None
    params = compiled.params()
    host = compiled.stage_host(0, n_blocks)
    carry0 = compiled.carry0
    cut_uid = compiled.index.info(cut).uid

    # target: the same patch at cutoff 2500 Hz, rendered device-resident
    fn = compiled.render_fn(n_blocks)
    tgt_params = {u: dict(leaves) for u, leaves in params.items()}
    tgt_params[cut_uid]['value'] = jnp.full((1, 1), 2500.0, jnp.float32)
    target, _, _ = fn(tgt_params, jax.tree.map(jnp.asarray, carry0), 0,
                      host)
    target = target.reshape(n_blocks * BLOCK, n_voices)
    loss_fn = make_loss_fn(compiled, target)

    def merged(tp):
        out = {u: dict(leaves) for u, leaves in params.items()}
        out[cut_uid] = dict(out[cut_uid])
        out[cut_uid].update(tp)
        return out

    vg = jax.jit(jax.value_and_grad(lambda tp: loss_fn(merged(tp))))
    tp0 = {'value': jnp.asarray(params[cut_uid]['value'], jnp.float32)}

    def launch(i):
        return vg(tp0)

    def materialize(out):
        v, grads = out
        return float(v), float(jnp.sum(jnp.abs(grads['value'])))

    t = time_render_pipelined(launch, n_outstanding=4,
                              materialize=materialize)
    _, gnorm = materialize(launch(0))

    # the production shape: ``learn.fit`` fuses K optimizer steps into
    # one ``lax.scan`` dispatch (default 16), amortizing the ~25 ms
    # fixed tunnel dispatch cost that dominates the single-step number
    # above (per-step device cost is ~6-7 ms; measured 19 -> ~100
    # steps/s at K=8 on v5e)
    import optax
    K = 16
    tx = optax.adam(2.0)

    @jax.jit
    def multi(tp, opt):
        def body(carry, _):
            tp, opt = carry
            v, gr = jax.value_and_grad(lambda p: loss_fn(merged(p)))(tp)
            up, opt = tx.update(gr, opt, tp)
            return (optax.apply_updates(tp, up), opt), v

        (tp, opt), vs = jax.lax.scan(body, (tp, opt), None, length=K)
        return tp, opt, vs

    opt0 = tx.init(tp0)
    t_fused = time_render_pipelined(
        lambda i: multi(tp0, opt0), n_outstanding=4,
        materialize=lambda o: np.asarray(o[2]))
    samples = n_blocks * BLOCK
    return {'label': f'fit-step-{n_voices}v',
            'steps_per_sec': K / t_fused,
            'steps_per_dispatch': K,
            'x_realtime': K * samples / RATE / t_fused,
            'wall_per_call_s': t_fused / K,
            'steps_per_sec_single_dispatch': 1.0 / t,
            'grad_l1': gnorm,
            'packed_family_engaged': engaged,
            'source_gen_engaged': compiled.packed_gen_engaged(n_blocks)}


def bench_fit_full(*, n_voices=64, seconds=12.0, steps=300):
    """Config 9: the FLAGSHIP-SIZED fit — three per-voice parameters
    (hertz, cutoff, gain: ``3 * n_voices`` trainables) recovered
    against ``seconds`` of per-voice (stem) target audio through the
    checkpointed backward (the scan-reference VJPs chunk at
    ``pallas_kernels.REF_CHUNK_SEGMENTS``, so the bwd peak memory is one
    chunk's scan intermediates, not the whole batch's).  Records fused
    steps/s, the loss trajectory, recovered-parameter errors, and the
    device's peak memory — the numbers that say whether differentiable
    synthesis survives a real multi-second matching task.

    The voice is a TWO-PARTIAL SINE (F0 + 3*F0, shared trainable hz)
    through the swept lowpass: sines are the waveforms whose frequency
    gradient naive autodiff gets right (a sawtooth's wrap
    discontinuities' dropped delta terms bias ``d/d hz`` so descent
    diverges under any loss — measured, see
    ``learn.per_channel_spectral_loss``'s notes), and the second
    partial is what separates cutoff from gain per voice.  The loss is
    the per-channel spectral stem loss (the mix spectrum cannot
    separate voices)."""
    import jax
    import time as _time

    from signals_tpu import learn as _learn
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.fx import Gain, LowPass, Mix
    from signals_tpu.nodes.osc import Sine

    def build(hzv, cutv, volv):
        hz = fixed(np.asarray(hzv, np.float32).reshape(1, -1))
        o1 = Sine()
        o1.hertz = hz
        h3 = Gain()
        h3.left = hz
        h3.right = fixed(3.0)
        o2 = Sine()
        o2.hertz = h3
        mx = Mix()
        mx.left = o1
        mx.right = o2
        mx.mix = fixed(0.7)
        cut = fixed(np.asarray(cutv, np.float32).reshape(1, -1))
        lp = LowPass()
        lp.input = mx
        lp.cutoff = cut
        vol = fixed(np.asarray(volv, np.float32).reshape(1, -1))
        g = Gain()
        g.left = lp
        g.right = vol
        return g, hz, cut, vol

    rng = np.random.default_rng(7)
    tgt_hz = _poly_freqs(n_voices)
    tgt_cut = np.linspace(350.0, 1200.0, n_voices).astype(np.float32)
    tgt_vol = rng.uniform(0.3, 0.9, n_voices).astype(np.float32)

    root_t, *_ = build(tgt_hz, tgt_cut, tgt_vol)
    ct = compile_node(root_t, block_frames=BLOCK, rate=RATE,
                      channels=n_voices)
    n_blocks = _align_blocks(int(round(seconds * RATE / BLOCK)), ct)
    target, _ = ct.render(n_blocks=n_blocks, deliver_taps=False)

    start_hz = (tgt_hz * (1.0 + rng.uniform(-0.02, 0.02, n_voices))
                ).astype(np.float32)
    root, hz, cut, vol = build(start_hz,
                               np.full(n_voices, 800.0, np.float32),
                               np.full(n_voices, 0.5, np.float32))
    t0 = _time.perf_counter()
    res = _learn.fit(root, np.asarray(target),
                     [(hz, 'value'), (cut, 'value'), (vol, 'value')],
                     rate=RATE, block_frames=BLOCK, steps=steps,
                     learning_rate=0.005, relative_lr=True,
                     loss=_learn.per_channel_spectral_loss)
    wall = _time.perf_counter() - t0

    fit_hz = hz.get_state().value.reshape(-1)
    fit_cut = cut.get_state().value.reshape(-1)
    fit_vol = vol.get_state().value.reshape(-1)
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats()
        mem = {'peak_bytes_in_use': int(stats.get('peak_bytes_in_use', 0)),
               'bytes_in_use': int(stats.get('bytes_in_use', 0))}
    except Exception:
        pass
    samples = n_blocks * BLOCK
    return {'label': f'fit-full-{n_voices}v',
            'n_voices': n_voices, 'target_seconds': samples / RATE,
            'trainables': 3 * n_voices, 'steps': steps,
            'steps_per_sec': steps / wall,
            'x_realtime_fwd_bwd': steps * samples / RATE / wall,
            'loss_first': float(res.losses[0]),
            'loss_last': float(res.losses[-1]),
            'loss_ratio': float(res.losses[-1] / res.losses[0]),
            'hz_err_cents_median': float(np.median(np.abs(
                1200 * np.log2(fit_hz / tgt_hz)))),
            'hz_err_cents_start': float(np.median(np.abs(
                1200 * np.log2(start_hz / tgt_hz)))),
            'cut_err_rel_median': float(np.median(
                np.abs(fit_cut - tgt_cut) / tgt_cut)),
            'vol_err_rel_median': float(np.median(
                np.abs(fit_vol - tgt_vol) / tgt_vol)),
            **mem}


def bench_edit_latency():
    """Interactive edit-to-sound latency (SURVEY §7 hard part #2):
    structural edit during live playback -> first audible block of the
    new program, COLD (a never-before-compiled graph: the background
    warmup compiles while the old program keeps serving — the stream
    must not stall) and WARM (the target program already jitted: swap at
    the next batch boundary).  ``blocks_rendered_during_cold_compile``
    is the continuity evidence — the old program's output while the new
    one compiled; a synchronous swap would show ~0 there and a
    compile-long dropout."""
    import time as _time

    from signals_tpu.nodes.dev import Rack, SinkDevice
    from signals_tpu.nodes.fx import Gain, LowPass
    from signals_tpu.nodes.osc import Sine, Square

    rack = Rack()
    rack.scan()
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(1.0)
    sink = SinkDevice(rack.get_sink('null'), block_frames=BLOCK,
                      realtime=False)
    sink.get_state().channels = 1
    sink.input = g
    sink.start()
    tr = sink._transport
    deadline = _time.monotonic() + 120
    while _time.monotonic() < deadline and tr.position < 8 * BLOCK:
        _time.sleep(0.05)

    def wait_swap(t0):
        deadline = _time.monotonic() + 300
        while _time.monotonic() < deadline:
            ts = tr.last_swap_time
            if ts is not None and ts >= t0:
                return ts
            _time.sleep(0.01)
        raise RuntimeError('structural swap never landed')

    # COLD: a structure this process (and the persistent compile cache,
    # with high probability) has never seen — the context value is a
    # time-salted 128-multiple, which changes the program's shapes
    lp = LowPass()
    lp.input = osc
    lp.cutoff = fixed(1200.0)
    lp.get_state().context = 128 * (int(_time.time()) % 89 + 3)
    sq = Square()
    sq.hertz = hz
    t0 = _time.monotonic()
    pos0 = tr.position
    g.left = lp
    ts = wait_swap(t0)
    cold_ms = (ts - t0) * 1e3
    blocks_during = (tr.position - pos0) // BLOCK

    # WARM: revert (the original program is still jitted), measure the
    # revert's own latency — a pure batch-boundary swap
    _time.sleep(0.2)
    t0 = _time.monotonic()
    g.left = osc
    ts = wait_swap(t0)
    warm_ms = (ts - t0) * 1e3
    err = tr.error
    sink.stop()
    sink.close()
    batch_ms = tr.blocks_per_call * BLOCK / RATE * 1e3
    return {'edit_latency_cold_ms': cold_ms,
            'edit_latency_warm_ms': warm_ms,
            'audible_adds_up_to_batch_ms': batch_ms,
            'blocks_rendered_during_cold_compile': int(blocks_during),
            'transport_error': repr(err) if err else None}


def bench_poly(root, hz_node, n_voices, *, seconds=1.0, label='',
               layout='channels', fetch='f32'):
    """Non-``f32`` fetches encode the mix **on device** before the host
    fetch — the production bounce/stream encodings (``bounce ... mulaw``,
    :meth:`CompiledPatch.render_encoded`): ``pcm16`` = 2 bytes/sample,
    ``mulaw``/``alaw`` = 1 (G.711, bit-exact vs the CCITT coder),
    ``adpcm`` = ~0.5 (WAV IMA ADPCM payload).  Timing is to full host
    materialization of the payload; the ~30-45 MB/s tunnel link is the
    binding constraint for every fetched format."""
    import jax
    import jax.numpy as jnp
    from signals_tpu.parallel import PolyPatch
    from signals_tpu.runtime import codecs
    freqs = _poly_freqs(n_voices)
    poly = PolyPatch(root, n_voices=n_voices,
                     overrides={(hz_node, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout=layout,
                     **({'channels': 1} if layout == 'vmap' else {}))
    n_blocks = int(round(seconds * RATE / BLOCK))
    params, _ = poly.params()
    carry0 = poly.init_carry()
    host = poly.compiled.stage_host(0, n_blocks)
    fn = poly.render_fn(n_blocks)

    def encode(mix):
        mix = mix.reshape(n_blocks * BLOCK, -1)
        if fetch == 'pcm16':
            return jnp.clip(jnp.round(mix * F32(32767.0)),
                            -32768, 32767).astype(jnp.int16)
        if fetch == 'mulaw':
            return codecs.mulaw_encode(jnp, mix)
        if fetch == 'alaw':
            return codecs.alaw_encode(jnp, mix)
        if fetch == 'adpcm':
            return codecs.ima_encode_jax(mix)
        raise ValueError(f'unknown fetch encoding {fetch!r}')

    materialize = np.asarray
    if fetch == 'f32':
        def run(params, carry, position, host):
            mix, _ = fn(params, carry, position, host)
            return mix
    elif fetch == 'slac':
        # lossless: device Rice-coding (SLAC v2) of the PCM16 mix; fetch
        # the 4-byte live length first, then only the compressed bytes.
        # Bit-exact vs the PCM16 fetch (tests/test_codecs.py).
        @jax.jit
        def run(params, carry, position, host):
            mix, _ = fn(params, carry, position, host)
            return codecs.slac2_encode_jax(
                mix.reshape(n_blocks * BLOCK, -1))

        def materialize(out):
            buf, total = out
            return np.asarray(buf[:int(total)])
    else:
        @jax.jit
        def run(params, carry, position, host):
            mix, _ = fn(params, carry, position, host)
            return encode(mix)

    def launch(i):
        return run(params, jax.tree.map(lambda x: x, carry0), 0, host)

    t = time_render_pipelined(launch, materialize=materialize)
    samples = n_blocks * BLOCK
    out = {'label': label, 'n_voices': n_voices, 'layout': layout,
           'fetch': fetch, 'x_realtime': samples / RATE / t,
           'samples_per_sec': samples / t, 'wall_per_call_s': t}
    if fetch == 'slac':
        payload = materialize(launch(0))
        out['bytes_per_sample'] = payload.shape[0] / samples
    return out



def _align_blocks(n_blocks, compiled):
    """Round a chained-batch length up to the patch's carry-segment
    alignment (swept-carry filters define segment boundaries on absolute
    m-block multiples; chained batches must start on them so every loop
    iteration renders the same absolute-aligned semantics)."""
    a = getattr(compiled, 'carry_seg_align', 1)
    return -(-n_blocks // a) * a if a > 1 else n_blocks

def bench_poly_stream(root, hz_node, n_voices, *, batch_seconds=60.0,
                      batches=6, rounds=3, mix_epilogue=True):
    """Production pipelined lossless bounce: double-buffered batch
    dispatches — batch ``k``'s SLAC payload crosses the host link while
    batch ``k+1`` renders on device (the CompiledPatch.
    render_encoded_stream pattern at poly scale, with the static
    adaptively-capped slice so the transfer needs no host sync to
    start).  ``x_realtime`` counts wall from first dispatch to the last
    payload byte on host, carry chained across batches.  Bit-exactness
    (payload decodes to the device mix's PCM16) is asserted OUTSIDE the
    timed region."""
    import jax
    import jax.numpy as jnp

    from signals_tpu.parallel import PolyPatch
    from signals_tpu.runtime import codecs
    freqs = _poly_freqs(n_voices)
    poly = PolyPatch(root, n_voices=n_voices,
                     overrides={(hz_node, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels',
                     mix_epilogue=mix_epilogue)
    n_blocks = _align_blocks(int(round(batch_seconds * RATE / BLOCK)),
                             poly.compiled)
    params, _ = poly.params()
    carry0 = poly.init_carry()
    fn = poly.render_fn(n_blocks)
    host = poly.compiled.stage_host(0, n_blocks)
    samples = n_blocks * BLOCK

    @jax.jit
    def enc(params, carry, position, host):
        mix, carry2 = fn(params, carry, position, host)
        buf, total = codecs.slac2_encode_jax(mix.reshape(samples, -1))
        return buf, total, carry2

    # warmup + cap calibration + bit-exactness evidence
    buf, total, _ = enc(params, jax.tree.map(lambda x: x, carry0), 0, host)
    n0 = int(total)
    payload = np.asarray(buf[:n0])
    mix0, _ = poly.render(n_blocks=n_blocks)
    pcm = np.clip(np.round(np.asarray(mix0).reshape(samples, -1)
                           * 32767.0), -32768, 32767).astype(np.int16)
    dec = codecs.slac2_decode_np(payload, samples * pcm.shape[1],
                                 channels=pcm.shape[1])
    bit_exact = bool(np.array_equal(dec, pcm))
    step = 1 << 18
    cap = min(buf.shape[0], -(-int(n0 * 1.2) // step) * step)

    def run_stream():
        carry = jax.tree.map(lambda x: x, carry0)
        pending = []
        got = 0
        t0 = time.perf_counter()
        for k in range(batches):
            buf, total, carry = enc(params, carry,
                                    k * n_blocks * BLOCK, host)
            pending.append((buf[:cap], buf, total))
            if len(pending) >= 2:
                head, b, t = pending.pop(0)
                n = int(t)
                got += np.asarray(head)[:n].shape[0] if n <= cap else (
                    np.asarray(head).shape[0]
                    + np.asarray(b[cap:n]).shape[0])
        while pending:
            head, b, t = pending.pop(0)
            n = int(t)
            got += np.asarray(head)[:n].shape[0] if n <= cap else (
                np.asarray(head).shape[0] + np.asarray(b[cap:n]).shape[0])
        return time.perf_counter() - t0, got

    best = float('inf')
    got = 0
    for _ in range(rounds):
        wall, got = run_stream()
        best = min(best, wall)
    total_samples = batches * samples
    return {'label': f'poly-{n_voices}-slac-stream', 'n_voices': n_voices,
            'batch_seconds': n_blocks * BLOCK / RATE, 'batches': batches,
            'x_realtime': total_samples / RATE / best,
            'samples_per_sec': total_samples / best,
            'wall_total_s': best,
            'bytes_per_sample': n0 / samples,
            'payload_bit_exact_vs_pcm16': bit_exact}


def bench_poly_device(root, hz_node, n_voices, *, seconds=60.0,
                      loops=8, mix_epilogue=False, require_gen=False,
                      override_values=None):
    """Sustained render rate when only a scalar reduction leaves the
    device: each dispatch renders ``loops`` consecutive ``seconds``-long
    batches (advancing positions, like a production offline render loop),
    so the tunnel's ~29 ms per-dispatch floor is amortized and the number
    tracks the true device render rate.  ``mix_epilogue`` opts into the
    in-kernel voice-sum (:meth:`CompiledPatch.packed_mega_mix`)."""
    import jax
    import jax.numpy as jnp
    from signals_tpu.parallel import PolyPatch
    freqs = (_poly_freqs(n_voices) if override_values is None
             else np.asarray(override_values, dtype=np.float32))
    poly = PolyPatch(root, n_voices=n_voices,
                     overrides={(hz_node, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels',
                     mix_epilogue=mix_epilogue)
    n_blocks = _align_blocks(int(round(seconds * RATE / BLOCK)),
                             poly.compiled)
    if mix_epilogue and poly.compiled.packed_mega_mix(
            n_blocks, force=True) is None:
        # never publish a plain-path number under the epilogue label
        raise RuntimeError('mix epilogue did not engage for this patch')
    if require_gen and not poly.compiled.packed_gen_engaged(
            n_blocks, mix_epilogue=mix_epilogue):
        raise RuntimeError('in-kernel generator did not engage')
    params, _ = poly.params()
    carry0 = poly.init_carry()
    fn = poly.render_fn(n_blocks)

    @jax.jit
    def reduced(params, carry, position0):
        def body(i, acc):
            mix, _ = fn(params, carry, position0 + i * n_blocks * BLOCK, {})
            return acc + jnp.mean(jnp.abs(mix))
        return jax.lax.fori_loop(0, loops, body, jnp.float32(0.0))

    def launch(i):
        return reduced(params, jax.tree.map(lambda x: x, carry0), 0)

    t = time_render_pipelined(launch, n_outstanding=4)
    samples = loops * n_blocks * BLOCK
    out = {'label': f'poly-{n_voices}-device', 'n_voices': n_voices,
           'loops_per_dispatch': loops,
           'x_realtime': samples / RATE / t,
           'samples_per_sec': samples / t, 'wall_per_call_s': t}
    if mix_epilogue:
        out['mix_epilogue_engaged'] = True      # checked above
        # honest per-patch probe (require_gen merely asserts it): the
        # generator may decline at a size the 64-voice case accepts
        out['source_gen_engaged'] = bool(poly.compiled.packed_gen_engaged(
            n_blocks, mix_epilogue=mix_epilogue))
    return out


def bench_single_device(root, *, seconds=60.0, loops=8, label='',
                        channels=1):
    """Device-resident single-patch throughput: ``loops`` consecutive
    ``seconds``-long batches per dispatch with the carry chained through
    (a true production offline render loop — stateful patches advance
    their delay/filter state), fetching only a scalar reduction."""
    import jax
    import jax.numpy as jnp
    from signals_tpu.compiler import compile_node
    compiled = compile_node(root, block_frames=BLOCK, rate=RATE,
                            channels=channels)
    n_blocks = _align_blocks(int(round(seconds * RATE / BLOCK)), compiled)
    params = compiled.params()
    fn = compiled.render_fn(n_blocks)
    carry0 = compiled.carry0

    @jax.jit
    def reduced(params, carry, position0):
        def body(i, st):
            c, acc = st
            blocks, c2, _taps = fn(
                params, c, position0 + i * n_blocks * BLOCK, {})
            return (c2, acc + jnp.mean(jnp.abs(blocks)))
        _, acc = jax.lax.fori_loop(
            0, loops, body, (carry, jnp.float32(0.0)))
        return acc

    def launch(i):
        return reduced(params, jax.tree.map(jnp.asarray, carry0), 0)

    t = time_render_pipelined(launch, n_outstanding=4)
    samples = loops * n_blocks * BLOCK
    return {'label': label, 'loops_per_dispatch': loops,
            'x_realtime': samples / RATE / t,
            'samples_per_sec': samples / t, 'wall_per_call_s': t}


def bench_block_latency(root, *, channels=1):
    """Realtime-path block latencies: p50 of a single-block step call, and
    p50 per block of the production render-ahead path (the Transport
    renders 8 blocks per device call into the ring, amortizing the
    per-dispatch round trip the tunnel imposes)."""
    import jax
    from signals_tpu.compiler import compile_node
    compiled = compile_node(root, block_frames=BLOCK, rate=RATE,
                            channels=channels)
    params = compiled.params()
    carry = jax.tree.map(lambda x: x, compiled.carry0)
    host = compiled.stage_host(0, 1)
    h0 = {k: v[0] for k, v in host.items()}
    out = compiled.step(params, carry, 0, h0)
    np.asarray(out[0])
    lat = []
    carry = out[1]
    for i in range(50):
        t0 = time.perf_counter()
        out = compiled.step(params, carry, (i + 1) * BLOCK, h0)
        np.asarray(out[0])
        carry = out[1]
        lat.append(time.perf_counter() - t0)
    single = float(np.median(lat))

    ahead = 8                           # Transport.blocks_per_call
    lat8 = []
    for i in range(20):
        t0 = time.perf_counter()
        audio, _ = compiled.render(position=i * ahead * BLOCK,
                                   n_blocks=ahead, deliver_taps=False)
        lat8.append((time.perf_counter() - t0) / ahead)
    return single, float(np.median(lat8))


def _backend_or_bail(timeout_s=600.0):
    """The axon accelerator plugin initializes lazily and, when its relay
    is unreachable, blocks *forever* inside ``jax.devices()`` — which
    would end a benchmark run with no record at all.  Probe device
    discovery in a daemon thread; on timeout, print an honest zero-value
    record (pointing at the mid-round measured evidence) and exit
    instead of hanging."""
    import threading
    got = {}

    def probe():
        import jax
        got['devices'] = [str(d) for d in jax.devices()]

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if 'devices' in got:
        print(f'bench: backend up: {got["devices"]}', file=sys.stderr,
              flush=True)
        return
    result = {
        'metric': ('bench unavailable: accelerator backend unreachable '
                   f'(device discovery blocked >{int(timeout_s)}s — '
                   'axon tunnel down), NOT a performance measurement'),
        'value': 0.0,
        'unit': 'x_realtime',
        'vs_baseline': 0.0,
        'extra': {'note': ('TPU render-rate evidence measured mid-round '
                           'on this build: docs/STATUS.md "Bench" '
                           'section and BENCH_tpu_midround_r3.json '
                           '(committed, raw measurement log)')},
    }
    print(json.dumps(result))
    sys.exit(0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--quick', action='store_true')
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    else:
        _backend_or_bail()

    # Every record carries its backend: a CPU debug run must never be
    # mistaken for (or archived as) a TPU measurement.
    import jax

    from signals_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    backend = jax.default_backend()
    device_kind = str(jax.devices()[0].device_kind)
    on_accel = backend not in ('cpu',)

    # 60-second calls: each remote execution carries a ~25-75 ms fixed
    # cost through the tunnel regardless of content, so short calls
    # measure that tax, not rendering.  Production rendering batches
    # minutes of audio per dispatch (or streams through the ring).
    seconds = 0.25 if args.quick else 60.0
    n_blocks = int(round(seconds * RATE / BLOCK))
    extra = {}
    parity = {}

    def progress(msg):
        print(msg, file=sys.stderr, flush=True)

    # Only a full-length hardware sweep may write the archived record:
    # a --quick smoke run (0.25 s batches measure the dispatch tax, not
    # rendering) or a --cpu debug run gets its own file — observed live:
    # a timed-out TPU --quick run left BENCH_full.json a partial record
    record_name = ('BENCH_full.json' if on_accel and not args.quick else
                   'BENCH_quick.json' if on_accel else
                   'BENCH_quick_debug.json' if args.quick else
                   'BENCH_full_debug.json')
    record_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               record_name)

    def checkpoint_record():
        """Rewrite BENCH_full.json after every config: a run cut short
        (round timeout, tunnel drop mid-sweep) still leaves every
        completed measurement — numbers AND their parity evidence — on
        disk, flagged partial.  Fail-soft: a transient write error (disk
        full) must not abort the remaining sweep."""
        rec = {
            'metric': 'IN PROGRESS — partial record',
            'backend': backend,
            'device': device_kind,
            'extra': dict(extra),
            'partial': True,
        }
        if parity:
            rec['parity_max_abs_err'] = dict(parity)
        try:
            with open(record_path, 'w') as f:
                json.dump(rec, f, indent=1)
        except Exception as e:           # pragma: no cover - env path
            progress(f'bench: checkpoint write failed (non-fatal): {e!r}')

    def guard(key, fn):
        """Run one config measurement fail-soft: a single config blowing
        up (a transiently wedged device, an OOM at an extreme size) must
        not lose the whole benchmark record."""
        try:
            extra[key] = fn()
        except Exception as e:           # pragma: no cover - hardware path
            progress(f'bench: {key} FAILED: {e!r}')
            extra[key] = {'error': f'{type(e).__name__}: {e}'}
        checkpoint_record()

    def guard_parity(key, fn):
        """Parity oracle comparisons fail-soft too: NaN marks a parity
        check that could not run (it fails ``parity_ok`` honestly)."""
        try:
            parity[key] = fn()
        except Exception as e:           # pragma: no cover - hardware path
            progress(f'bench: parity {key} FAILED: {e!r}')
            parity[key] = float('nan')
        checkpoint_record()

    # Config order is PRIORITY order, not numeric: the record checkpoints
    # after every config, so if the run is cut short (round timeout, the
    # tunnel dropping mid-sweep) the measurements that matter most — the
    # fetched headline, then the round-3 fast-path evidence (echo /
    # master bus), then device-resident and scaling — are already on
    # disk; the cheap stateless configs run last.

    # config 4 (headline): 64-voice poly, mix device-encoded to 8-bit
    # G.711 mu-law and fetched to host — the production stream/bounce
    # encoding (``bounce <at> <path> <s> mulaw``; codec bit-exact vs the
    # CCITT coder, tests/test_codecs.py).  PCM16 / f32 / ADPCM fetches
    # reported alongside: every fetched format is bound by the ~30-45
    # MB/s host tunnel, so bytes/sample sets the ceiling.
    progress('bench: config 4 (poly-64)...')
    voice4, hz4 = build_subtractive_voice()
    guard('c4_poly64',
          lambda: bench_poly(voice4, hz4, 64, seconds=seconds,
                             label='poly-64', fetch='mulaw'))
    voice4p, hz4p = build_subtractive_voice()
    guard('c4_poly64_pcm16_fetch',
          lambda: bench_poly(voice4p, hz4p, 64, seconds=seconds,
                             label='poly-64-pcm16', fetch='pcm16'))
    voice4a, hz4a = build_subtractive_voice()
    guard('c4_poly64_adpcm_fetch',
          lambda: bench_poly(voice4a, hz4a, 64, seconds=seconds,
                             label='poly-64-adpcm', fetch='adpcm'))
    voice4s, hz4s = build_subtractive_voice()
    guard('c4_poly64_slac_lossless_fetch',
          lambda: bench_poly(voice4s, hz4s, 64, seconds=seconds,
                             label='poly-64-slac', fetch='slac'))
    # same lossless fetch at 4-minute batches: a ~1 MB SLAC payload pays
    # ~2 tunnel round-trips (~58 ms) per fetch on top of the ~50 ms
    # transfer, so 60 s batches spend half their wall on latency; a
    # 240 s bounce per dispatch (the production offline-bounce shape)
    # amortizes the round-trips across 4x the audio
    voice4s2, hz4s2 = build_subtractive_voice()
    guard('c4_poly64_slac_lossless_fetch_240s',
          lambda: bench_poly(voice4s2, hz4s2, 64, seconds=4 * seconds,
                             label='poly-64-slac-240s', fetch='slac'))
    voice4f, hz4f = build_subtractive_voice()
    guard('c4_poly64_f32_fetch',
          lambda: bench_poly(voice4f, hz4f, 64, seconds=seconds,
                             label='poly-64-f32'))
    # the production PIPELINED lossless bounce (round 5): batch k+1
    # renders while batch k's SLAC payload crosses the link — wall
    # counts first dispatch to last byte, bit-exact vs the device mix
    # 4-minute batches: 60 s batches pay ~54 ms of per-batch RTT chatter
    # against ~34 ms of payload — the production bounce shape amortizes
    # it (measured same-session on v5e: 240 s x 3 = 1190x vs 60 s x 6 =
    # 630x, with the un-pipelined 240 s control at 948x)
    progress('bench: config 4 slac STREAM (pipelined bounce)...')
    voice4st, hz4st = build_subtractive_voice()
    guard('c4_poly64_slac_stream',
          lambda: bench_poly_stream(voice4st, hz4st, 64,
                                    batch_seconds=4 * seconds,
                                    batches=2 if args.quick else 3))

    # headline parity evidence: the 64-voice mix under product defaults
    # (the exact path the device-resident headline measures) vs the numpy
    # pull oracle, normalized per voice (see check_poly_parity)
    progress('bench: poly-64 parity vs oracle...')
    guard_parity('poly64_mix', lambda: check_poly_parity(64))

    # config 6: nonlinear (saturated) feedback echo — the segmented
    # feedback scan path (the affine solver must decline; before round 3
    # this class of patch rode the per-block scan)
    progress('bench: config 6 (saturated echo)...')
    c6 = build_saturated_echo()
    guard_parity('saturated_echo',
                 lambda: check_parity(c6, n_blocks=n_blocks))
    guard('c6_saturated_echo_device_resident',
          lambda: bench_single_device(c6, seconds=seconds,
                                      label='saturated-echo-device'))

    # config 7: mastering chain (voice -> reverb -> compressor) — the
    # stateful-history mega path (context reads of stateful nodes
    # served from hist carry rings)
    progress('bench: config 7 (master bus)...')
    c7 = build_master_bus()
    guard_parity('master_bus',
                 lambda: check_parity(c7, n_blocks=n_blocks))
    guard('c7_master_bus_device_resident',
          lambda: bench_single_device(c7, seconds=seconds,
                                      label='master-bus-device'))

    # config 4b: device-resident throughput — the audio stays on device
    # (training / analysis pipelines fetch only reductions); this isolates
    # render rate from the tunnel's ~30 MB/s host-transfer bandwidth,
    # which dominates the numbers above.  Kernel-variant flags are pinned
    # per config (the library default is 'auto'): 4b/4g measure the
    # lowered-producer kernels so the 4g->4h delta isolates the
    # generator, and the 4b label stays comparable across rounds.
    from signals_tpu.compiler import filters as _fmod
    _gen_saved = _fmod.SEG_SOURCE_GEN
    _fmod.SEG_SOURCE_GEN = False
    progress('bench: config 4b (poly-64 device-resident)...')
    voice4b, hz4b = build_subtractive_voice()
    guard('c4_poly64_device_resident',
          lambda: bench_poly_device(
              voice4b, hz4b, 64,
              seconds=2 * seconds if not args.quick else seconds))

    # config 3: subtractive voice
    progress('bench: config 3 (subtractive)...')
    voice3, hz3 = build_subtractive_voice()
    guard_parity('subtractive',
                 lambda: check_parity(voice3, n_blocks=n_blocks))
    guard('c3_subtractive',
          lambda: bench_single(voice3, seconds=seconds,
                               label='subtractive-voice'))
    guard('c3_subtractive_device_resident',
          lambda: bench_single_device(voice3, seconds=seconds,
                                      label='subtractive-voice-device'))
    try:
        lat1, lat8 = bench_block_latency(voice3)
        extra['p50_block_latency_ms'] = lat1 * 1e3
        extra['p50_block_latency_renderahead_ms'] = lat8 * 1e3
    except Exception as e:               # pragma: no cover - hardware path
        progress(f'bench: latency FAILED: {e!r}')
    checkpoint_record()

    # config 5: FM + delay feedback + spectral tap
    progress('bench: config 5 (fm+delay)...')
    c5 = build_fm_delay()
    guard_parity('fm_delay',
                 lambda: check_parity(c5, n_blocks=n_blocks))
    guard('c5_fm_delay',
          lambda: bench_single(c5, seconds=seconds, label='fm+delay+spec'))

    # config 5v: the "spectral plot" half of BASELINE config 5 as the
    # product delivers it — device FFT + band pooling, only the Spec
    # bins fetched (the full-rate fetch above is tunnel-bound)
    guard('c5_fm_delay_spec_decimated',
          lambda: bench_vis(c5, seconds=seconds,
                            label='fm+delay spec device-decimated'))
    guard('c5_fm_delay_device_resident',
          lambda: bench_single_device(c5, seconds=seconds,
                                      label='fm+delay-device'))

    if not args.quick:
        # voice-scaling evidence: 4x the polyphony on the same chip
        # (shorter batches: the mega window's working set scales with
        # voices x seconds and must fit HBM)
        progress('bench: config 4c (poly-256 device-resident)...')
        voice4c, hz4c = build_subtractive_voice()
        guard('c4_poly256_device_resident',
              lambda: bench_poly_device(voice4c, hz4c, 256,
                                        seconds=seconds))
        # 8x: the best per-voice throughput point (512 x 876x realtime
        # ~ 448k voice-realtime units/chip measured)
        progress('bench: config 4d (poly-512 device-resident)...')
        voice4d, hz4d = build_subtractive_voice()
        guard('c4_poly512_device_resident',
              lambda: bench_poly_device(voice4d, hz4d, 512,
                                        seconds=seconds / 2))
        # 16x / 32x: find the voice-scaling knee (batches shrink to keep
        # the mega window's voices x seconds working set inside HBM)
        progress('bench: config 4e (poly-1024 device-resident)...')
        voice4e, hz4e = build_subtractive_voice()
        guard('c4_poly1024_device_resident',
              lambda: bench_poly_device(voice4e, hz4e, 1024,
                                        seconds=seconds / 4))
        progress('bench: config 4f (poly-2048 device-resident)...')
        voice4f2, hz4f2 = build_subtractive_voice()
        guard('c4_poly2048_device_resident',
              lambda: bench_poly_device(voice4f2, hz4f2, 2048,
                                        seconds=seconds / 8))

    # config 1: sine + plot.  The PLOT deliverable is ~1500 display
    # points (reference ui/vis.py:17-19), so the product flow renders on
    # device and fetches only the decimated envelope (render_vis) — the
    # full-rate f32 fetch stays measured alongside for continuity (it is
    # tunnel-bound: ~170 KB/s of audio through a 20-45 MB/s link).
    progress('bench: config 1 (sine+vis)...')
    c1 = build_sine_plot()
    guard_parity('sine', lambda: check_parity(c1, n_blocks=n_blocks))
    guard('c1_sine_plot',
          lambda: bench_vis(c1, seconds=seconds,
                            label='sine+vis device-decimated plot'))
    guard('c1_sine_fullfetch',
          lambda: bench_single(c1, seconds=seconds,
                               label='sine+vis full f32 fetch'))

    # config 2: 16-osc additive
    progress('bench: config 2 (additive-16)...')
    voice2, hz2 = build_additive_voice()
    guard_parity('additive',
                 lambda: check_parity(voice2, n_blocks=n_blocks))
    guard('c2_additive16',
          lambda: bench_poly(voice2, hz2, 16, seconds=seconds,
                             label='additive-16'))
    # the fetched c2 number above is f32-tunnel-bound like every fetch;
    # the device render rate of the additive patch is its own evidence
    voice2b, hz2b = build_additive_voice()
    guard('c2_additive16_device_resident',
          lambda: bench_poly_device(voice2b, hz2b, 16, seconds=seconds))

    if on_accel:
        # config 4g LAST: the in-kernel voice-sum epilogue (the filter
        # kernel emits per-stream lane-group sums; the (T, 64) filtered
        # array is never written to HBM nor read back).  Runs after
        # everything else because the epilogue kernel variant is newer
        # than the rest of the sweep — a Mosaic rejection here must not
        # cost any prior measurement (the record checkpoints per config).
        progress('bench: config 4g (poly-64 device-resident, '
                 'mix epilogue)...')
        voice4g, hz4g = build_subtractive_voice()
        guard('c4_poly64_device_resident_mixsum',
              lambda: bench_poly_device(voice4g, hz4g, 64,
                                        seconds=seconds,
                                        mix_epilogue=True))

        # config 4h: + the in-kernel generator (the saw synthesized on
        # the VPU from iota + per-lane params): the render's HBM traffic
        # is the coefficients in and the skinny per-stream sums out —
        # zero full-size passes.  Flag flip participates in the graph
        # hash, so this compiles (and caches) a separate program.
        progress('bench: config 4h (poly-64 device-resident, gen source '
                 '+ mix epilogue)...')
        voice4h, hz4h = build_subtractive_voice()
        _fmod.SEG_SOURCE_GEN = True
        try:
            guard('c4_poly64_device_resident_gen_mixsum',
                  lambda: bench_poly_device(voice4h, hz4h, 64,
                                            seconds=seconds,
                                            mix_epilogue=True,
                                            require_gen=True))
            if not args.quick:
                # configs 4i/4j: the epilogue+generator path at scale —
                # chasing the voice-units/chip ceiling (voices x
                # x_realtime); gen engagement reported per patch, not
                # assumed (source_gen_engaged in each record)
                progress('bench: config 4i (poly-512, gen+mix '
                         'epilogue)...')
                voice4i, hz4i = build_subtractive_voice()
                guard('c4_poly512_device_resident_gen_mixsum',
                      lambda: bench_poly_device(voice4i, hz4i, 512,
                                                seconds=seconds / 2,
                                                mix_epilogue=True))
                progress('bench: config 4j (poly-1024, gen+mix '
                         'epilogue)...')
                voice4j, hz4j = build_subtractive_voice()
                guard('c4_poly1024_device_resident_gen_mixsum',
                      lambda: bench_poly_device(voice4j, hz4j, 1024,
                                                seconds=seconds / 4,
                                                mix_epilogue=True))
                progress('bench: config 4k (poly-256, gen+mix '
                         'epilogue)...')
                voice4k, hz4k = build_subtractive_voice()
                guard('c4_poly256_device_resident_gen_mixsum',
                      lambda: bench_poly_device(voice4k, hz4k, 256,
                                                seconds=seconds,
                                                mix_epilogue=True))
                # config 4l (round 4): 2048 voices — the voice group now
                # spans TWO lane-group kernel calls (wide epilogue:
                # per-group in-kernel sums, partial columns added);
                # before this round 2048 voices had NO packed plan at
                # all and fell to the split mega cascades (151x)
                progress('bench: config 4l (poly-2048, gen+mix '
                         'epilogue)...')
                voice4l, hz4l = build_subtractive_voice()
                guard('c4_poly2048_device_resident_gen_mixsum',
                      lambda: bench_poly_device(voice4l, hz4l, 2048,
                                                seconds=seconds / 8,
                                                mix_epilogue=True))
                # config 4m (round 4): 4096 voices — FOUR lane-group
                # kernel calls; per-chip voice throughput stays at the
                # ~700k voice-units plateau (measured 171x = 701k)
                progress('bench: config 4m (poly-4096, gen+mix '
                         'epilogue)...')
                voice4m, hz4m = build_subtractive_voice()
                guard('c4_poly4096_device_resident_gen_mixsum',
                      lambda: bench_poly_device(voice4m, hz4m, 4096,
                                                seconds=seconds / 16,
                                                mix_epilogue=True))
                # configs 4n/4o (round 4): STATIC-crit voices (fixed
                # cutoff, no LFO) — pole-justified 128-frame context
                # (context_for) + multi-block carry segments
                # (SEG_CARRY_BLOCKS, bit-identical for static crits) cut
                # the kernel's per-frame replay work from 2.0x to 1.02x.
                # Parity-gated by its own oracle check below.
                progress('bench: config 4n (poly-64 STATIC voice, '
                         'gen+mix epilogue)...')
                voice4n, hz4n = build_subtractive_voice_static()
                guard('c4_poly64_static_gen_mixsum',
                      lambda: bench_poly_device(voice4n, hz4n, 64,
                                                seconds=seconds,
                                                mix_epilogue=True,
                                                require_gen=True))
                progress('bench: config 4o (poly-1024 STATIC voice, '
                         'gen+mix epilogue)...')
                voice4o, hz4o = build_subtractive_voice_static()
                guard('c4_poly1024_static_gen_mixsum',
                      lambda: bench_poly_device(voice4o, hz4o, 1024,
                                                seconds=seconds / 4,
                                                mix_epilogue=True))
                progress('bench: poly-64 STATIC parity vs oracle...')
                guard_parity(
                    'poly64_static_mix',
                    lambda: check_poly_parity(
                        64, builder=build_subtractive_voice_static))
                # config 4p (round 4): noise-fed static voice — the
                # DMA-input packed family with multi-block carry
                # segments + the plain-kernel in-kernel sum (the
                # generator path can't apply: noise is no oscillator)
                progress('bench: config 4p (poly-64 NOISE voice, DMA '
                         'carry + mix epilogue)...')
                voice4p, cut4p = build_noise_voice_static()
                guard('c4_poly64_noise_dma_mixsum',
                      lambda: bench_poly_device(
                          voice4p, cut4p, 64, seconds=seconds,
                          mix_epilogue=True,
                          override_values=NOISE_CUTS_64))
                progress('bench: poly-64 NOISE parity vs oracle...')
                guard_parity(
                    'poly64_noise_mix',
                    lambda: check_poly_parity(
                        64, builder=build_noise_voice_static,
                        override_values=NOISE_CUTS_64))
        finally:
            _fmod.SEG_SOURCE_GEN = _gen_saved
    else:
        _fmod.SEG_SOURCE_GEN = _gen_saved

    # config 8: differentiable synthesis — one jitted value_and_grad
    # step through the product-default lowering (round-4 custom VJPs on
    # the Pallas kernels); before round 4 this RAISED on TPU for every
    # packed/mega patch.  Runs AFTER the kernel-variant flags are
    # restored so the step differentiates the path a product fit takes
    # (gen engagement recorded per patch either way).
    progress('bench: config 8 (fit step, 64 voices)...')
    guard('c8_fit_step_64v',
          lambda: bench_fit_step(
              n_voices=64,
              seconds=1.0 if not args.quick else 0.25))

    # interactive edit-to-sound latency (round 5): structural edit
    # during live playback, cold (background compile, old program keeps
    # serving) vs warm (batch-boundary swap)
    progress('bench: edit-to-sound latency (async swap)...')
    guard('edit_latency', bench_edit_latency)

    # config 9 (round 5): the flagship-sized fit — 3 per-voice params
    # (hz, cutoff, gain = 192 trainables) against 12 s of target audio
    # through the checkpointed backward, recording convergence + memory
    progress('bench: config 9 (full-voice fit, 64 voices x 12 s)...')
    guard('c9_fit_full_voice',
          lambda: bench_fit_full(
              n_voices=64,
              seconds=12.0 if not args.quick else 1.0,
              steps=300 if not args.quick else 4))

    extra['parity_max_abs_err'] = parity
    # per-config tolerances (see PARITY_TOL); a NaN (check failed to run)
    # compares False and fails parity_ok honestly
    extra['parity_tol'] = {k: PARITY_TOL.get(k, TOL) for k in parity}
    extra['parity_ok'] = all(v <= PARITY_TOL.get(k, TOL)
                             for k, v in parity.items())

    # headline: the BASELINE.json north-star metric — x realtime per chip
    # rendering the 64-voice subtractive patch, i.e. the device-resident
    # render under product defaults, parity-gated by the poly64 oracle
    # check above.  The host-FETCHED rates (mu-law/PCM16/ADPCM/SLAC/f32)
    # stay in extras and as headline_fetched_mulaw: every fetched format
    # is bound by the ~20-45 MB/s host tunnel (bytes/sample sets the
    # ceiling), not by the chip — rounds 1-2 used the mu-law fetch as the
    # headline, so that number is still carried at top level for
    # continuity.
    metric = ('audio samples/sec/chip (x realtime @44.1kHz), 64-voice '
              'subtractive patch, device-resident render under product '
              'defaults; host-fetch rates in extras')
    headline = None
    for key, desc in (
            ('c4_poly64_device_resident_gen_mixsum',
             'in-kernel generator + mix epilogue, the TPU default path'),
            ('c4_poly64_device_resident_mixsum', 'mix epilogue'),
            ('c4_poly64_device_resident', 'plain packed cascade'),
    ):
        headline = extra.get(key, {}).get('x_realtime')
        if headline is not None:
            metric += f' [{desc}]'
            break
    # the gate is real, not prose: a missing/NaN/failed poly-64 oracle
    # check brands the headline itself, not just a buried extras flag
    if headline is not None and not (
            parity.get('poly64_mix', float('nan'))
            <= PARITY_TOL['poly64_mix']):
        metric += (' [POLY-64 PARITY UNVERIFIED THIS RUN — see '
                   'parity_max_abs_err]')
    if headline is None:
        # no device-resident 64-voice number at all this run: fall back
        # to the fetched formats rather than losing the record
        for alt, desc in (('c4_poly64', 'G.711 mu-law (8-bit)'),
                          ('c4_poly64_pcm16_fetch', 'PCM16'),
                          ('c4_poly64_f32_fetch', 'float32')):
            headline = extra.get(alt, {}).get('x_realtime')
            if headline is not None:
                metric = ('audio samples/sec/chip (x realtime @44.1kHz), '
                          '64-voice subtractive patch, mix device-encoded '
                          f'to {desc} and fetched to host (all device-'
                          'resident 64-voice configs failed this run)')
                break
    if headline is None:
        headline = 0.0
        metric += ' [ALL 64-voice configs failed this run]'
    fetched_mulaw = extra.get('c4_poly64', {}).get('x_realtime')
    if not on_accel:
        metric = ('CPU DEBUG RUN (NOT a TPU measurement): ' + metric)

    # The driver archives only the LAST ~2000 chars of stdout: print a
    # compact headline-first line (x_realtime only, rounded) so every
    # config's number survives in the record, and write the full-precision
    # detail to BENCH_full.json alongside.
    full = {
        'metric': metric,
        'value': round(headline, 1),
        'unit': 'x_realtime',
        'vs_baseline': round(headline / 1000.0, 3),
        'backend': backend,
        'device': device_kind,
        'extra': extra,
    }
    if fetched_mulaw is not None:
        # rounds 1-2 used this as the headline; carried for continuity
        full['headline_fetched_mulaw'] = round(fetched_mulaw, 1)
    with open(record_path, 'w') as f:
        json.dump(full, f, indent=1)

    def compact_val(v):
        if isinstance(v, dict):
            if 'error' in v:
                return {'error': str(v['error'])[:60]}
            if 'x_realtime' in v:
                return round(v['x_realtime'], 1)
            return {k: compact_val(x) for k, x in v.items()}
        if isinstance(v, float):
            return float(f'{v:.3g}')
        return v

    result = {
        'metric': metric,
        'value': round(headline, 1),
        'unit': 'x_realtime',
        'vs_baseline': round(headline / 1000.0, 3),
        'backend': backend,
        'device': device_kind,
        'extra': {k: compact_val(v) for k, v in extra.items()},
    }
    if fetched_mulaw is not None:
        result['headline_fetched_mulaw'] = round(fetched_mulaw, 1)
    line = json.dumps(result)
    if len(line) > 1900:                 # keep the whole line in the tail
        result['extra'] = {'truncated': f'see {record_name}'}
        line = json.dumps(result)
    print(line)
    return full


if __name__ == '__main__':
    main()
