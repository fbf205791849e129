"""TPU profiling harness for the round-2 throughput war.

Measures, on the real (axon-tunneled) chip:
  1. device->host transfer bandwidth vs payload size, f32 vs int16
  2. poly-64 subtractive device-resident rate per FILTER_IMPL
  3. raw sosfilt_batch upper bound (pre-laid-out lane-major input)
  4. osc-only poly-64 (no filter) to isolate the filter's share

All timing materializes to host (np.asarray) — block_until_ready lies
through the tunnel.  Run detached:
  setsid nohup python scripts/profile_tpu.py > /tmp/profile_tpu.log 2>&1 &
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


def fetch_time(make_arr, rounds=3):
    """Median wall time to materialize a FRESH device array to host.

    A device array fetched once keeps a host-side copy under the axon
    client, so repeat np.asarray calls measure a cache hit — every timed
    fetch must be the array's first.
    """
    import jax
    ts = []
    for i in range(rounds):
        arr = make_arr(i)
        jax.block_until_ready(arr)
        t0 = time.perf_counter()
        np.asarray(arr)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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


def bench_transfer():
    import jax
    import jax.numpy as jnp
    out = {}
    add = jax.jit(lambda x, i: x + i)
    for mb in (1, 4, 16, 64):
        n = mb * 1024 * 1024 // 4
        base = jnp.arange(n, dtype=jnp.float32)
        t = fetch_time(lambda i: add(base, float(i)))
        out[f'f32_{mb}MB_MBps'] = round(mb / t, 1)
        to_i16 = jax.jit(lambda x, i: ((x + i) * 0.001).astype(jnp.int16))
        ti = fetch_time(lambda i: to_i16(base, float(i)))
        out[f'i16_{mb}MB_count_MBps'] = round(mb / 2 / ti, 1)
        log(f'transfer {mb}MB f32: {mb/t:.1f} MB/s ({t*1e3:.0f} ms); '
            f'i16 same-count: {mb/2/ti:.1f} MB/s ({ti*1e3:.0f} ms, '
            f'{t/ti:.2f}x faster wall)')
    results['transfer'] = out


def build_poly(seconds, *, filter_impl=None, no_filter=False):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from signals_tpu.compiler import filters as _filters
    if filter_impl is not None:
        _filters.FILTER_IMPL = filter_impl
    import bench as benchmod
    from signals_tpu.parallel import PolyPatch
    if no_filter:
        from signals_tpu.nodes.env import ADSR
        from signals_tpu.nodes.fx import Gain, RingMod
        from signals_tpu.nodes.osc import Sawtooth, Square
        hz = benchmod.fixed(110.0)
        saw = Sawtooth()
        saw.hertz = hz
        gate = Square()
        gate.hertz = benchmod.fixed(2.0)
        env = ADSR()
        env.gate = gate
        voiced = RingMod()
        voiced.left = saw
        voiced.right = env
        out = Gain()
        out.left = voiced
        out.right = benchmod.fixed(1.0 / 64)
        root, hznode = out, hz
    else:
        root, hznode = benchmod.build_subtractive_voice()
    freqs = (110.0 * 2 ** (np.arange(V) % 12 / 12.0)
             * (1 + 0.001 * np.arange(V))).astype(np.float32)
    poly = PolyPatch(root, n_voices=V, overrides={(hznode, 'value'): freqs},
                     block_frames=BLOCK, rate=RATE, layout='channels')
    return poly


def bench_device_resident(poly, seconds):
    import jax
    import jax.numpy as jnp
    n_blocks = int(round(seconds * RATE / BLOCK))
    params, _ = poly.params()
    carry0 = poly.init_carry()
    fn = poly.render_fn(n_blocks)

    @jax.jit
    def reduced(params, carry, position):
        mix, carry2 = fn(params, carry, position, {})
        return jnp.mean(jnp.abs(mix))

    def launch(i):
        return reduced(params, jax.tree.map(lambda x: x, carry0), 0)

    t = pipelined(launch)
    samples = n_blocks * BLOCK
    return samples / RATE / t


def bench_filters(seconds):
    out = {}
    for impl in ('assoc', 'chunked16', 'chunked32', 'chunked64'):
        from signals_tpu.compiler import filters as _filters
        import signals_tpu.compiler as comp
        comp._compile_cache.clear()
        if impl.startswith('chunked'):
            _filters.CHUNK_FRAMES = int(impl[len('chunked'):])
            name = 'chunked'
        else:
            name = impl
        log(f'compiling poly-64 with FILTER_IMPL={impl} ...')
        t0 = time.perf_counter()
        poly = build_poly(seconds, filter_impl=name)
        x = bench_device_resident(poly, seconds)
        log(f'FILTER_IMPL={impl}: {x:.1f}x realtime '
            f'(total incl compile {time.perf_counter()-t0:.0f}s)')
        out[impl] = round(x, 1)
    results['filter_impl_device_resident_x'] = out


def bench_no_filter(seconds):
    import signals_tpu.compiler as comp
    comp._compile_cache.clear()
    log('compiling osc-only poly-64 ...')
    poly = build_poly(seconds, no_filter=True)
    x = bench_device_resident(poly, seconds)
    log(f'osc-only poly-64: {x:.1f}x realtime')
    results['no_filter_device_resident_x'] = round(x, 1)


def bench_sosfilt_batch_raw(seconds):
    """Upper bound: batched pallas cascade on pre-laid-out lane-major data."""
    import jax
    import jax.numpy as jnp
    from signals_tpu.compiler import filters as _filters
    from signals_tpu.compiler.pallas_kernels import sosfilt_batch
    nb = int(round(seconds * RATE / BLOCK))
    C = 1024
    L = C + BLOCK
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (L, nb, V), dtype=jnp.float32)
    cut = np.linspace(800, 3000, nb * V).reshape(nb, V).astype(np.float32)
    coeffs = _filters.design_coupled(
        np, _filters.LOWPASS, (cut.reshape(1, -1),), RATE / 2)
    coeffs = jnp.asarray(
        coeffs.reshape(1, nb, V, 11).transpose(1, 0, 2, 3))  # (nb,1,V,11)

    @jax.jit
    def run(coeffs, x):
        y = sosfilt_batch(coeffs, x)
        return jnp.mean(jnp.abs(y[-BLOCK:]))

    def launch(i):
        return run(coeffs, x)

    log('compiling raw sosfilt_batch ...')
    t = pipelined(launch)
    filtered_samples = L * nb * V
    audio_samples = nb * BLOCK
    log(f'sosfilt_batch raw: {audio_samples / RATE / t:.1f}x realtime-equiv '
        f'({filtered_samples / t / 1e9:.2f} G voice-samples/s '
        f'incl context x2)')
    results['sosfilt_batch_raw'] = {
        'x_realtime_equiv': round(audio_samples / RATE / t, 1),
        'gvs_per_s': round(filtered_samples / t / 1e9, 3),
        'wall_s': t,
    }

    # streaming shape: no context, frames = nb*BLOCK contiguous, but
    # batched over nb lanes-blocks with zero state (context-free upper
    # bound of a two-pass streaming design)
    x2 = jax.random.normal(key, (BLOCK, nb, V), dtype=jnp.float32)

    @jax.jit
    def run2(coeffs, x):
        y = sosfilt_batch(coeffs, x)
        return jnp.mean(jnp.abs(y))

    def launch2(i):
        return run2(coeffs, x2)

    log('compiling raw sosfilt_batch (no-context shape) ...')
    t2 = pipelined(launch2)
    log(f'sosfilt_batch no-context: {audio_samples / RATE / t2:.1f}x '
        f'realtime-equiv')
    results['sosfilt_batch_nocontext'] = {
        'x_realtime_equiv': round(audio_samples / RATE / t2, 1),
        'wall_s': t2,
    }


def main():
    seconds = float(os.environ.get('PROFILE_SECONDS', '15'))
    log(f'profiling with {seconds}s batches')
    import jax
    log(f'devices: {jax.devices()}')
    bench_transfer()
    bench_no_filter(seconds)
    bench_filters(seconds)
    bench_sosfilt_batch_raw(seconds)
    print(json.dumps(results, indent=2))
    with open('/tmp/profile_tpu_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
