"""Round-2 TPU measurement: ADSR-fix ablation, chained kernel sweep,
f64-sine parity on hardware, PCM16 fetch.

Run detached:
  setsid nohup python scripts/round2_tpu.py > /tmp/round2.log 2>&1 &
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


def ablate():
    from scripts.ablate_tpu import bench_kind, results as ares
    for kind in ('saw_env', 'full'):
        bench_kind(kind)
    results['ablate_fixed'] = ares['ablate']


def chained(call, args_fn, label, work):
    """Per-invocation cost by differencing K=1 vs K=9 chained calls."""
    import jax
    import jax.numpy as jnp

    def make(K):
        @jax.jit
        def run(c, x):
            y = x
            for _ in range(K):
                y = call(c, y)
            return jnp.mean(jnp.abs(y))
        return run

    c, x = args_fn()
    t1 = pipelined(lambda i: make(1)(c, x))
    t9 = pipelined(lambda i: make(9)(c, x))
    per = (t9 - t1) / 8
    gvs = work / per / 1e9
    log(f'{label}: {per*1e3:.2f} ms/inv ({gvs:.2f} G samples/s)')
    results.setdefault('chained', {})[label] = {
        'ms': round(per * 1e3, 3), 'gvs': round(gvs, 2)}
    return per


def kernel_sweep():
    import jax
    import jax.numpy as jnp
    from scripts.sweep_iir_kernels import _build_v1, LANE_GROUP
    from signals_tpu.compiler import filters as _filters

    nb = int(round(15 * RATE / BLOCK))
    rows = 2048
    lanes = nb * V
    lanes_pad = -(-lanes // LANE_GROUP) * LANE_GROUP
    LG = lanes_pad // LANE_GROUP
    key = jax.random.PRNGKey(0)
    work = rows * lanes_pad

    # v1 variants (tile-major, state in carry); ROW_CHUNK capped by the
    # 16 MB VMEM scope (2 x in + 2 x out double buffers at (rc, 8, 128) f32)
    for unroll in (1, 4, 8):
        for rc in (256, 512):
            call = _build_v1(rows, lanes_pad, 1, unroll, rc)

            def args():
                x = jax.random.normal(key, (rows, LG, 8, 128),
                                      dtype=jnp.float32)
                c = jnp.broadcast_to(
                    jnp.asarray([0.9, 0.1, 0.05, 0.1, 0.05], jnp.float32)
                    .reshape(1, 5, 1, 1, 1), (1, 5, LG, 8, 128)).copy()
                return c, x

            chained(lambda c, y: call(c, y), args,
                    f'v1_u{unroll}_rc{rc}', work)

    # raw associative scan at the same workload (what the in-graph path
    # does per block, batched): x (rows, lanes) vmapped? — sosfilt_scan is
    # already 2-D over (N, ch); feed (rows, lanes_pad) directly
    coeffs11 = np.zeros((1, lanes_pad, 11), np.float32)
    coeffs11[..., 6:] = [0.9, 0.1, 0.05, 0.1, 0.05]

    def args_scan():
        x = jax.random.normal(key, (rows, lanes_pad), dtype=jnp.float32)
        return jnp.asarray(coeffs11), x

    chained(lambda c, y: _filters.sosfilt_scan(c, y), args_scan,
            'assoc_scan', work)

    def args_chunked():
        return args_scan()

    chained(lambda c, y: _filters.sosfilt_chunked(c, y, chunk=16),
            args_chunked, 'chunked16', work)


def tpu_parity():
    import bench
    out = {}
    for name, builder, nb in (('sine', bench.build_sine_plot, 300),
                              ('fm_delay', bench.build_fm_delay, 600)):
        import signals_tpu.compiler as comp
        comp._compile_cache.clear()
        err = bench.check_parity(builder() if name != 'subtractive'
                                 else builder()[0], n_blocks=nb)
        log(f'TPU parity {name}: {err:.3e}')
        out[name] = err
    v, hz = bench.build_subtractive_voice()
    err = bench.check_parity(v, n_blocks=300)
    log(f'TPU parity subtractive: {err:.3e}')
    out['subtractive'] = err
    results['tpu_parity'] = out


def pcm16():
    import jax
    import jax.numpy as jnp
    import bench
    import signals_tpu.compiler as comp
    from signals_tpu.parallel import PolyPatch
    comp._compile_cache.clear()
    root, hz = bench.build_subtractive_voice()
    freqs = (110.0 * 2 ** (np.arange(V) % 12 / 12.0)
             * (1 + 0.001 * np.arange(V))).astype(np.float32)
    poly = PolyPatch(root, n_voices=V, overrides={(hz, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels')
    seconds = 60
    n_blocks = int(round(seconds * RATE / BLOCK))
    params, _ = poly.params()
    carry0 = poly.init_carry()
    fn = poly.render_fn(n_blocks)

    @jax.jit
    def as_pcm16(params, carry, position):
        mix, _ = fn(params, carry, position, {})
        return jnp.clip(jnp.round(mix * 32767.0), -32768, 32767
                        ).astype(jnp.int16)

    t = pipelined(lambda i: as_pcm16(
        params, jax.tree.map(lambda x: x, carry0), 0))
    x = n_blocks * BLOCK / RATE / t
    log(f'poly64 60s PCM16 fetch (ADSR-fixed): {x:.1f}x ({t*1e3:.0f} ms)')
    results['pcm16_fetch_60s'] = {'x_realtime': round(x, 1),
                                  'wall_ms': round(t * 1e3, 1)}


def main():
    import jax
    log(f'devices: {jax.devices()}')
    if os.environ.get('SKIP_ABLATE') != '1':
        ablate()
    kernel_sweep()
    tpu_parity()
    pcm16()
    print(json.dumps(results, indent=2))
    with open('/tmp/round2_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
