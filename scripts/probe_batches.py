"""Probe: device-resident batch-length scaling + tap-fix fetch numbers.

Run detached:
  setsid nohup python scripts/probe_batches.py > /tmp/probe.log 2>&1 &
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


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from signals_tpu.parallel import PolyPatch
    log(f'devices: {jax.devices()}')

    root, hz = bench.build_subtractive_voice()
    freqs = (110.0 * 2 ** (np.arange(V) % 12 / 12.0)
             * (1 + 0.001 * np.arange(V))).astype(np.float32)
    poly = PolyPatch(root, n_voices=V, overrides={(hz, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels')
    params, _ = poly.params()
    carry0 = poly.init_carry()

    for seconds in (60, 120, 240):
        n_blocks = int(round(seconds * RATE / BLOCK))
        try:
            fn = poly.render_fn(n_blocks)

            @jax.jit
            def reduced(params, carry, position):
                mix, _ = fn(params, carry, position, {})
                return jnp.mean(jnp.abs(mix))

            t = pipelined(lambda i: reduced(
                params, jax.tree.map(lambda x: x, carry0), 0))
            x = n_blocks * BLOCK / RATE / t
            log(f'device-resident {seconds}s: {x:.1f}x ({t*1e3:.0f} ms)')
            results[f'dev_{seconds}s'] = round(x, 1)
        except Exception as e:
            log(f'device-resident {seconds}s FAILED: {type(e).__name__}: '
                f'{str(e)[:200]}')
            results[f'dev_{seconds}s'] = f'fail: {type(e).__name__}'

    # PCM16 fetch at 120s
    for seconds in (60, 120):
        n_blocks = int(round(seconds * RATE / BLOCK))
        try:
            fn = poly.render_fn(n_blocks)

            @jax.jit
            def as_pcm16(params, carry, position):
                mix, _ = fn(params, carry, position, {})
                return jnp.clip(jnp.round(mix * 32767.0), -32768, 32767
                                ).astype(jnp.int16)

            t = pipelined(lambda i: as_pcm16(
                params, jax.tree.map(lambda x: x, carry0), 0))
            x = n_blocks * BLOCK / RATE / t
            log(f'pcm16 fetch {seconds}s: {x:.1f}x ({t*1e3:.0f} ms)')
            results[f'pcm16_{seconds}s'] = round(x, 1)
        except Exception as e:
            log(f'pcm16 {seconds}s FAILED: {str(e)[:200]}')

    # c1 sine+vis with the tap fetch fix
    import signals_tpu.compiler as comp
    comp._compile_cache.clear()
    r = bench.bench_single(bench.build_sine_plot(), seconds=60.0,
                           label='sine+vis')
    log(f'c1 sine+vis (tap fix): {r["x_realtime"]:.1f}x')
    results['c1_tapfix'] = round(r['x_realtime'], 1)
    comp._compile_cache.clear()
    v3, _ = bench.build_subtractive_voice()
    r = bench.bench_single(v3, seconds=60.0, label='subtractive')
    log(f'c3 subtractive: {r["x_realtime"]:.1f}x')
    results['c3'] = round(r['x_realtime'], 1)
    lat1, lat8 = bench.bench_block_latency(v3)
    log(f'p50 block latency: single {lat1*1e3:.1f} ms, '
        f'render-ahead {lat8*1e3:.2f} ms/block')
    results['lat_single_ms'] = round(lat1 * 1e3, 2)
    results['lat_ahead_ms'] = round(lat8 * 1e3, 2)

    print(json.dumps(results, indent=2))
    with open('/tmp/probe_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
