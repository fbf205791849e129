"""Decompose the mega-render cost: patch ablation + stage microbenches.

Run detached:
  setsid nohup python scripts/mega_stages.py > /tmp/mega_stages.log 2>&1 &
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

RATE, BLOCK, V = 44100, 1024, 64
SECONDS = 120
results = {}


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


def build(kind):
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square
    hz = fixed(110.0)
    saw = Sawtooth()
    saw.hertz = hz
    node = saw
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
        lp.input = node
        lp.cutoff = cutoff
        node = lp
    if kind in ('saw_env', 'full'):
        gate = Square()
        gate.hertz = fixed(2.0)
        env = ADSR()
        env.gate = gate
        voiced = RingMod()
        voiced.left = node
        voiced.right = env
        node = voiced
    out = Gain()
    out.left = node
    out.right = fixed(1.0 / 64)
    return out, hz


def ablate():
    import jax
    import jax.numpy as jnp
    import signals_tpu.compiler as comp
    from signals_tpu.parallel import PolyPatch
    freqs = (110.0 * 2 ** (np.arange(V) % 12 / 12.0)
             * (1 + 0.001 * np.arange(V))).astype(np.float32)
    n_blocks = int(round(SECONDS * RATE / BLOCK))
    for kind in ('saw', 'saw_env', 'saw_lp', 'full'):
        comp._compile_cache.clear()
        root, hz = build(kind)
        poly = PolyPatch(root, n_voices=V, overrides={(hz, 'value'): freqs},
                         block_frames=BLOCK, rate=RATE, layout='channels')
        assert poly.compiled._use_mega
        params, _ = poly.params()
        carry0 = poly.init_carry()
        fn = poly.render_fn(n_blocks)

        @jax.jit
        def reduced(params, carry, position):
            mix, _ = fn(params, carry, position, {})
            return jnp.mean(jnp.abs(mix))

        t = pipelined(lambda i: reduced(
            params, jax.tree.map(lambda x: x, carry0), 0))
        x = n_blocks * BLOCK / RATE / t
        log(f'mega {kind}: {x:.1f}x ({t*1e3:.0f} ms / {SECONDS}s)')
        results[f'mega_{kind}'] = {'x': round(x, 1),
                                   'wall_ms': round(t * 1e3, 1)}


def stage_micro():
    """Barriered stage costs at the 120 s / 64-voice shapes."""
    import jax
    import jax.numpy as jnp
    nb = int(round(SECONDS * RATE / BLOCK))
    N = nb * BLOCK
    C = 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N + C, V), dtype=jnp.float32)

    def timeit(label, fn, *args, work_gb):
        t = pipelined(lambda i: jax.jit(fn)(*args))
        log(f'{label}: {t*1e3:.1f} ms ({work_gb/t:.0f} GB/s)')
        results[f'stage_{label}'] = round(t * 1e3, 1)

    idx_t = (jnp.arange(C + BLOCK)[:, None]
             + jnp.arange(nb)[None, :] * BLOCK)

    def gather(x):
        g = jax.lax.optimization_barrier(x[idx_t])
        return g[::97, ::7].sum()

    timeit('context_gather', gather, x,
           work_gb=(C + BLOCK) * nb * V * 4 * 2 / 1e9)

    y = jax.random.normal(key, (BLOCK, nb, V), dtype=jnp.float32)

    def transpose(y):
        t = jax.lax.optimization_barrier(y.transpose(1, 0, 2))
        return t[::97, ::7].sum()

    timeit('out_transpose', transpose, y, work_gb=BLOCK * nb * V * 4 * 2 / 1e9)

    z = jax.random.normal(key, (N, V), dtype=jnp.float32)

    def ew(z):
        a = jax.lax.optimization_barrier(z * 1.5 + 0.25)
        return a[::97, ::7].sum()

    timeit('one_elementwise_pass', ew, z, work_gb=N * V * 4 * 2 / 1e9)

    def mixdown(z):
        return z.sum(axis=1).sum()

    timeit('mixdown_reduce', mixdown, z, work_gb=N * V * 4 / 1e9)


def main():
    import jax
    log(f'devices: {jax.devices()}')
    ablate()
    stage_micro()
    print(json.dumps(results, indent=2))
    with open('/tmp/mega_stages.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
