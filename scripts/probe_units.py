"""Decompose the 64v-vs-1024v voice-units gap on the gen+epilogue path.

BENCH_full / midround r4 show ~455k voice-realtime units/chip at 64
voices (headline c4h) vs ~690-700k at 1024-4096 voices — same 1024-lane
kernel group, same per-step lane work, so the gap must be in what
surrounds the kernel (per-voice-block coefficient design, the block-rate
control chains, per-stream trace copies) or in per-segment context
replay (k=16 streams at 64 voices vs k=1 at 1024).

Ablation ladder at V=64 and V=1024, all gen+mixsum device-resident:
  full      — bench's build_subtractive_voice (LFO-swept cutoff + ADSR)
  fixcut    — cutoff fixed at 2000 Hz (kills per-block coeff redesign)
  noenv     — LFO cutoff but no ADSR/RingMod (kills post-filter chain)
  bare      — saw -> fixed-cutoff LP only

Run detached (never alongside another TPU client):
  setsid nohup python scripts/probe_units.py > /tmp/probe_units.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/signals_tpu_xla'))
# the env var alone is a no-op where a platform plugin pre-imports jax
# at interpreter startup; jax.config.update works regardless
from signals_tpu.utils import enable_persistent_compile_cache  # noqa: E402
enable_persistent_compile_cache()

import numpy as np

RATE = 44100
BLOCK = 1024

results: dict = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fixed(value):
    from signals_tpu.nodes.fixed import Fixed
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(value, dtype=np.float32))
    return f


def build_voice(kind):
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square
    hz = fixed(110.0)
    saw = Sawtooth()
    saw.hertz = hz
    lp = LowPass()
    lp.input = saw
    lp.get_state().context = LowPass.context_for(
        550.0 if kind in ('full', 'noenv') else 2000.0, RATE)
    if kind in ('full', 'noenv'):
        lfo = Sine()
        lfo.hertz = fixed(0.5)
        depth = Gain()
        depth.left = lfo
        depth.right = fixed(900.0)
        cutoff = Mix()
        cutoff.left = depth
        cutoff.right = fixed(2000.0)
        cutoff.mix = fixed(0.5)
        lp.cutoff = cutoff
    else:
        lp.cutoff = fixed(2000.0)
    if kind in ('full', 'fixcut'):
        gate = Square()
        gate.hertz = fixed(2.0)
        env = ADSR()
        env.gate = gate
        st = env.get_state()
        st.attack, st.decay, st.sustain, st.release = 0.01, 0.08, 0.6, 0.1
        voiced = RingMod()
        voiced.left = lp
        voiced.right = env
        top = voiced
    else:
        top = lp
    out = Gain()
    out.left = top
    out.right = fixed(1.0 / 64)
    return out, hz


def bench(kind, n_voices, seconds, loops=8):
    import jax
    import jax.numpy as jnp

    from signals_tpu.parallel import PolyPatch
    root, hz = build_voice(kind)
    freqs = (110.0 * 2 ** ((np.arange(n_voices) % 48) / 12.0)
             ).astype(np.float32)
    poly = PolyPatch(root, n_voices=n_voices,
                     overrides={(hz, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels',
                     mix_epilogue=True)
    n_blocks = int(round(seconds * RATE / BLOCK))
    engaged = poly.compiled.packed_mega_mix(n_blocks, force=True) is not None
    gen = poly.compiled.packed_gen_engaged(n_blocks, mix_epilogue=True)
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

    np.asarray(launch(0))               # compile + warm
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [launch(i) for i in range(4)]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / 4)
    x = loops * n_blocks * BLOCK / RATE / best
    rec = {'x_realtime': round(x, 1), 'units_k': round(n_voices * x / 1e3, 1),
           'wall_s': round(best, 4), 'epilogue': engaged, 'gen': gen,
           'seconds_per_batch': seconds, 'loops': loops}
    log(f'{kind} V={n_voices}: {rec}')
    return rec


def main():
    import jax
    log(f'backend: {jax.default_backend()} {jax.devices()}')
    for kind in ('full', 'fixcut', 'noenv', 'bare'):
        for v, sec in ((64, 60.0), (1024, 15.0)):
            key = f'{kind}_v{v}'
            try:
                results[key] = bench(kind, v, sec)
            except Exception as e:        # noqa: BLE001 - record and go on
                results[key] = {'error': f'{type(e).__name__}: {e}'}
                log(f'{key} FAILED: {e!r}')
            with open('/tmp/probe_units.json', 'w') as f:
                json.dump(results, f, indent=1)
    # equal-batch-audio control: 64v at the 1024v batch length — is the
    # gap a batch-size artifact?
    try:
        results['full_v64_short'] = bench('full', 64, 15.0)
    except Exception as e:                # noqa: BLE001
        results['full_v64_short'] = {'error': f'{type(e).__name__}: {e}'}
    with open('/tmp/probe_units.json', 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
