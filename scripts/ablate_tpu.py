"""Decompose the poly-64 device-resident cost node by node + HLO stats.

The sweep showed osc-only at 2.3 ms per audio-second (434x ceiling) vs a
~0.03 ms/s roofline — fusion-boundary overhead, not math.  This run:

  1. ablation ladder: saw -> +env -> +filter -> full, 60 s batches
  2. compiled-HLO stats per rung (fusion count, largest intermediates)
  3. chained-iterations timing of the batch IIR kernel (removes the fixed
     per-call cost that floored the sweep's raw numbers)

Run detached:
  setsid nohup python scripts/ablate_tpu.py > /tmp/ablate.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import re
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
V = 64

results: dict = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pipelined(launch, n_out=4, rounds=2):
    np.asarray(launch(0))
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [launch(i) for i in range(n_out)]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / n_out)
    return best


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
    node = saw
    if kind in ('saw_env', 'full', 'saw_env_gain'):
        gate = Square()
        gate.hertz = fixed(2.0)
        env = ADSR()
        env.gate = gate
        voiced = RingMod()
        voiced.left = node
        voiced.right = env
        node = voiced
    if kind in ('saw_lp', 'full'):
        lfo = Sine()
        lfo.hertz = fixed(0.5)
        depth = Gain()
        depth.left = lfo
        depth.right = fixed(900.0)
        cutoff = Mix()
        cutoff.left = depth
        cutoff.right = fixed(2000.0)
        cutoff.mix = fixed(0.5)
        lp = LowPass()
        lp.input = saw if kind == 'saw_lp' else node
        lp.cutoff = cutoff
        if kind == 'full':
            # reference bench topology: filter before the env ringmod
            return build_full()
        node = lp
    if kind in ('saw_env_gain', 'full'):
        out = Gain()
        out.left = node
        out.right = fixed(1.0 / 64)
        node = out
    return node, hz


def build_full():
    import bench as benchmod
    return benchmod.build_subtractive_voice()


def bench_kind(kind, seconds=60):
    import jax
    import jax.numpy as jnp
    import signals_tpu.compiler as comp
    from signals_tpu.parallel import PolyPatch
    comp._compile_cache.clear()
    root, hz = (build_full() if kind == 'full' else build_voice(kind))
    freqs = (110.0 * 2 ** (np.arange(V) % 12 / 12.0)
             * (1 + 0.001 * np.arange(V))).astype(np.float32)
    poly = PolyPatch(root, n_voices=V, overrides={(hz, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels')
    n_blocks = int(round(seconds * RATE / BLOCK))
    params, _ = poly.params()
    carry0 = poly.init_carry()
    fn = poly.render_fn(n_blocks)

    @jax.jit
    def reduced(params, carry, position):
        mix, carry2 = fn(params, carry, position, {})
        return jnp.mean(jnp.abs(mix))

    t = pipelined(lambda i: reduced(
        params, jax.tree.map(lambda x: x, carry0), 0))

    # HLO stats of the reduced program
    lowered = jax.jit(reduced).lower(
        params, jax.tree.map(lambda x: x, carry0), 0)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_fusion = len(re.findall(r'\bfusion\(', txt))
    n_loop = len(re.findall(r'kLoop|kInput|kOutput', txt))
    big = sorted(set(re.findall(r'f32\[([\d,]+)\]', txt)),
                 key=lambda s: -np.prod([int(v) for v in s.split(',')]))[:6]
    x = n_blocks * BLOCK / RATE / t
    log(f'{kind}: {x:.1f}x ({t*1e3:.0f} ms) fusions={n_fusion} '
        f'big={big[:4]}')
    results.setdefault('ablate', {})[kind] = {
        'x_realtime': round(x, 1), 'wall_ms': round(t * 1e3, 1),
        'fusions': n_fusion, 'biggest': big}
    with open(f'/tmp/hlo_{kind}.txt', 'w') as f:
        f.write(txt)


def chained_kernel():
    """True per-invocation cost of the batched IIR kernel: run it K times
    chained inside one jit, difference out the fixed call cost."""
    import jax
    import jax.numpy as jnp
    from signals_tpu.compiler.pallas_kernels import sosfilt_batch

    nb = int(round(15 * RATE / BLOCK))
    rows, lanes = 2048, nb * V
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (rows, nb, V), dtype=jnp.float32)
    coeffs = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1, 0, 0, 0.9, 0.1, 0.05, 0.1, 0.05],
                    jnp.float32).reshape(1, 1, 1, 11),
        (nb, 1, V, 11)).copy()

    def make(K):
        @jax.jit
        def run(c, x):
            y = x
            for _ in range(K):
                y = sosfilt_batch(c, y)
            return jnp.mean(jnp.abs(y))
        return run

    t1 = pipelined(lambda i: make(1)(coeffs, x))
    t9 = pipelined(lambda i: make(9)(coeffs, x))
    per = (t9 - t1) / 8
    gvs = rows * lanes / per / 1e9
    log(f'chained IIR kernel: {per*1e3:.2f} ms/invocation '
        f'({gvs:.1f} G samples/s), fixed per-call {t1*1e3:.1f} ms')
    results['chained_iir'] = {'ms_per_invocation': round(per * 1e3, 3),
                              'gvs': round(gvs, 2),
                              'fixed_call_ms': round(t1 * 1e3, 1)}


def main():
    import jax
    log(f'devices: {jax.devices()}')
    for kind in ('saw', 'saw_env', 'saw_env_gain', 'saw_lp', 'full'):
        bench_kind(kind)
    chained_kernel()
    print(json.dumps(results, indent=2))
    with open('/tmp/ablate_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
