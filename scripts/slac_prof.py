"""Attribute SLAC2 device-encode time on the real TPU.

Times, per 60 s mono batch (the bench c4 mix length):

1. the encode front half only (residuals -> plan -> per-block word
   table ``rows``), i.e. everything except stream compaction,
2. the full encode with ``SLAC2_COMPACT = 'loop'`` (sequential
   fori_loop row writer),
3. the full encode with ``SLAC2_COMPACT = 'gather'`` (vectorized
   searchsorted + gather),

so the compaction strategies can be chosen from measurement, not
guessed.  Run only when no other process is on the TPU (the axon
tunnel serializes clients):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/slac_prof.py
"""

import sys
import time

import numpy as np


def timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)           # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from signals_tpu.runtime import codecs

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    n = 60 * 44100
    t = np.arange(n, dtype=np.float64)
    x = (0.3 * np.sin(2 * np.pi * 440 * t / 44100)
         + 0.05 * rng.normal(size=n)).astype(np.float32)[:, None]
    x = jax.device_put(jnp.asarray(x))

    @jax.jit
    def front(x):
        # mirror of slac2_encode_jax up to (and including) the
        # per-block word table; returns reductions so nothing is DCE'd
        pcm = codecs._slac_pcm16(jnp, x)
        nn = pcm.shape[0]
        N = codecs.SLAC_BLOCK
        nb = -(-nn // N)
        s = jnp.concatenate([pcm, jnp.zeros(nb * N - nn, dtype=jnp.int32)])
        cand = codecs._slac2_residual_cands(jnp, s)
        zz3 = ((cand << 1) ^ (cand >> 31)).reshape(4, nb, N)
        order, k, zz = codecs._slac2_plan(jnp, zz3)
        kcol = k[:, None]
        q = zz >> kcol
        esc = q >= codecs.SLAC2_Q0
        ln = jnp.where(esc, codecs._SLAC2_ESC_LEN, q + 1 + kcol)
        cum = jnp.cumsum(ln, axis=1, dtype=jnp.int32)
        starts = cum - ln
        total_bits = cum[:, -1]
        zzu = zz.astype(jnp.uint32)
        qs = jnp.minimum(q, codecs.SLAC2_Q0).astype(jnp.uint32)
        zz_k = zzu & ((jnp.uint32(1) << kcol.astype(jnp.uint32)) - 1)
        ne_c0 = ((jnp.uint32(1) << qs) - 1) | (zz_k << (qs + 1))
        ne_c1 = zz_k >> (31 - qs)
        zz20 = zzu & jnp.uint32((1 << codecs.SLAC2_RAW) - 1)
        e_c0 = jnp.uint32((1 << codecs.SLAC2_Q0) - 1) | (zz20 << codecs.SLAC2_Q0)
        e_c1 = zz20 >> (32 - codecs.SLAC2_Q0)
        c0 = jnp.where(esc, e_c0, ne_c0)
        c1 = jnp.where(esc, e_c1, ne_c1)
        sh = (starts & 31).astype(jnp.uint32)
        w0 = starts >> 5
        hi = lambda v: (v >> 1) >> (31 - sh)
        v0 = c0 << sh
        v1 = hi(c0) | (c1 << sh)
        v2 = hi(c1)
        n_words = codecs._SLAC2_MAX_BITS // 32
        wi = jnp.arange(n_words, dtype=jnp.int32)
        d = w0[:, :, None] - wi[None, None, :]
        zero = jnp.uint32(0)
        contrib = jnp.where(d == 0, v0[:, :, None],
                            jnp.where(d == -1, v1[:, :, None],
                                      jnp.where(d == -2, v2[:, :, None],
                                                zero)))
        words = jnp.sum(contrib, axis=1, dtype=jnp.uint32)
        return words.sum(), total_bits.sum()

    dt = timeit(front, x)
    print(f'front half (no compaction): {dt*1e3:8.2f} ms')

    for strategy in ('loop', 'gather'):
        codecs.SLAC2_COMPACT = strategy
        enc = jax.jit(codecs.slac2_encode_jax)
        dt = timeit(enc, x)
        print(f'full encode [{strategy:6s}]:     {dt*1e3:8.2f} ms')

    # sanity: the two strategies agree on device
    codecs.SLAC2_COMPACT = 'loop'
    b1, t1 = jax.jit(codecs.slac2_encode_jax)(x)
    codecs.SLAC2_COMPACT = 'gather'
    b2, t2 = jax.jit(codecs.slac2_encode_jax)(x)
    a1 = np.asarray(b1)[:int(t1)]
    a2 = np.asarray(b2)[:int(t2)]
    assert np.array_equal(a1, a2), 'strategies disagree on device!'
    print(f'agree on device: {int(t1)} bytes '
          f'({int(t1)/(n*2):.3f}x pcm16 size)')


if __name__ == '__main__':
    main()
