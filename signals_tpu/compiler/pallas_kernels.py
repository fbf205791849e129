"""Pallas TPU kernels for the hot DSP ops.

The one op XLA doesn't schedule well for this workload is the IIR
recurrence: ``jax.lax.associative_scan`` materializes ~log N full-size
intermediates through HBM per biquad section, making filtering
memory-bound.  :func:`sosfilt_pallas` runs the whole cascade **inside
VMEM**: the timeline is processed in 8-frame chunks (one VPU sublane tile);
within a chunk the coupled-form recurrence is an unrolled causal
combination with precomputed powers of the scaled-rotation transition, and
only a ``(1, lanes)`` state row crosses chunks.  HBM traffic is exactly
one read of x and one write of y.

Voices/channels ride the lane dimension (the framework's channel-voices
layout), so a 64..128-voice filter bank costs the same as one voice.
"""

from __future__ import annotations

import functools
import typing

import numpy as np

F32 = np.float32

CHUNK = 8          # sublane tile height
LANES = 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _section_kernel(x_ref, pc_ref, ps_ref, taps_ref, out_ref, *,
                    nchunks: int):
    """One biquad section over the whole (padded) timeline.

    ``pc_ref``/``ps_ref``: (CHUNK+1, C) powers of the pole rotation
    (cos/sin parts, rows 0..CHUNK); ``taps_ref``: (3, C) = [d0, d1, d2];
    ``x_ref``/``out_ref``: (nchunks*CHUNK, C).
    """
    import jax
    import jax.numpy as jnp

    pc = pc_ref[:, :]            # (CHUNK+1, C)
    ps = ps_ref[:, :]
    d0 = taps_ref[0:1, :]        # (1, C)
    d1 = taps_ref[1:2, :]
    d2 = taps_ref[2:3, :]
    pow1c = pc[1:, :]            # (CHUNK, C): A^(k+1) for k=0..CHUNK-1
    pow1s = ps[1:, :]

    def body(i, state):
        s1_prev, s2_prev = state                   # (1, C) each
        import jax.numpy as jnp
        x_chunk = x_ref[pl_ds(i)]                  # (CHUNK, C)
        # causal in-chunk combination: s_c[k] = Σ_{j<=k} A^(k-j) e x[j]
        s1c = pc[0:1, :] * x_chunk                 # d = 0 term (A^0 e = [1,0])
        s2c = ps[0:1, :] * x_chunk
        for d in range(1, CHUNK):                  # static unroll
            shifted = jnp.pad(x_chunk[:CHUNK - d], ((d, 0), (0, 0)))
            s1c = s1c + pc[d:d + 1, :] * shifted
            s2c = s2c + ps[d:d + 1, :] * shifted
        # carry-in contribution: A^(k+1) s_prev
        s1 = s1c + pow1c * s1_prev - pow1s * s2_prev
        s2 = s2c + pow1s * s1_prev + pow1c * s2_prev
        # y[k] = d0 x[k] + d1 s1[k-1] + d2 s2[k-1]
        s1m = jnp.concatenate([s1_prev, s1[:-1]], axis=0)
        s2m = jnp.concatenate([s2_prev, s2[:-1]], axis=0)
        out_ref[pl_ds(i)] = d0 * x_chunk + d1 * s1m + d2 * s2m
        return (s1[-1:], s2[-1:])

    import jax.numpy as jnp
    zero = jnp.zeros((1, x_ref.shape[1]), dtype=jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (zero, zero))


def pl_ds(i):
    import jax.experimental.pallas as pl
    return (pl.ds(i * CHUNK, CHUNK), slice(None))


@functools.lru_cache(maxsize=64)
def _build_section_call(n_padded: int, c_padded: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks = n_padded // CHUNK
    kernel = functools.partial(_section_kernel, nchunks=nchunks)

    def call(x, pc, ps, taps):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_padded, c_padded),
                                           np.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, pc, ps, taps)

    return jax.jit(call)


LANE_GROUP = 1024          # lanes per kernel instance, viewed as (8, 128)
ROW_CHUNK = 512            # frames streamed per grid step (sweep winner;
#                            VMEM: 4 double-buffered (512,8,128) f32 = 8 MB)
ROW_UNROLL = 8             # rows per fori iteration (loop-overhead amortizer)
SEG_DMA_PARTS = 8          # concurrent row-part DMAs per transfer (engine
#                            parallelism; single 2 MB copies run ~75 GB/s)
SEG_SLOTS = 2              # in/out buffer slots (prefetch depth slots-1)
SEG_CONTEXT_REUSE = True   # chunk-ring xbuf: fetch each timeline chunk once
#                            (consecutive windows overlap by the context);
#                            ~1.35 GB less input DMA on the 64-voice
#                            bench.  (An earlier draft started each
#                            refill DMA twice on a semaphore waited once
#                            — a count leak that faulted the device
#                            NONDETERMINISTICALLY and cost a day of
#                            hardware bisection; interpret mode executes
#                            DMAs synchronously and hid it completely.)


def _make_powers(params, nsec):
    """Per-section powers of the pole rotation, ``A^d`` for d = 1..8, as
    (8, 128) vreg pairs.  Loop-invariant: callers compute these once per
    grid step, outside the row loop."""
    powers = []
    for s in range(nsec):
        prc, prs = params[s][0], params[s][1]
        pcs, pss = [prc], [prs]
        for _ in range(7):
            pcs.append(prc * pcs[-1] - prs * pss[-1])
            pss.append(prs * pcs[-2] + prc * pss[-1])
        powers.append((pcs, pss))
    return powers


def _chunk8_cascade(v, state, params, powers, nsec):
    """Eight rows of the biquad cascade as causal combinations.

    The per-row recurrence has a ~4-op serial dependence between
    consecutive rows, which makes the row loop *latency*-bound on the VPU
    (~34 cycles/row measured on v5e, vs ~7 ops of real work).  Expanding
    the state over an 8-row window removes the chain:

        s[k] = sum_{d=0..k} A^d e x[k-d]  +  A^(k+1) s_prev

    where ``A`` is the section's scaled-rotation transition — every term
    is an independent FMA on precomputed powers of ``A`` (``powers``,
    from :func:`_make_powers`); the only serial edge is ``s_prev``
    between chunks.  ~2x the FLOPs of the serial form, but throughput-
    bound instead of latency-bound.

    ``v``: list of 8 input vregs; returns ``(outputs, new_state)``.
    """
    st = list(state)
    for s in range(nsec):
        _prc, _prs, d0, d1, d2 = params[s]
        pcs, pss = powers[s]
        s1p, s2p = st[2 * s], st[2 * s + 1]
        y = []
        c1p, c2p = s1p, s2p                # state after row k-1
        for k in range(8):
            y.append(d0 * v[k] + d1 * c1p + d2 * c2p)
            # balanced-tree sums: left-associated accumulation would be
            # a k-deep serial add chain per row — the whole point here
            # is breaking dependence chains
            t1 = [v[k]] + [pcs[d - 1] * v[k - d] for d in range(1, k + 1)]
            t1.append(pcs[k] * s1p - pss[k] * s2p)
            t2 = [pss[d - 1] * v[k - d] for d in range(1, k + 1)]
            t2.append(pcs[k] * s2p + pss[k] * s1p)
            c1p = _tree_sum(t1)
            c2p = _tree_sum(t2)
        st[2 * s], st[2 * s + 1] = c1p, c2p
        v = y
    return v, tuple(st)


def _tree_sum(terms):
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]

def _coef_params(coef_ref, nsec: int, blk=None):
    """Per-section coupled taps from the coeff BlockSpec block.  With
    ``blk`` (a traced chunk-local coefficient-block index, carry mode)
    the block holds the segment's WHOLE per-block tile stack
    ``(nsec, 5, 1, m*8, 128)`` — fetched once per segment, amortized
    over its chunks — and the tile is a dynamic in-VMEM sublane slice.
    (Per-step BlockSpec tiles measured ~10-16 us of unoverlapped fetch
    per grid step on v5e — 1.7x the whole kernel — whether the index
    map was affine or not; one block per segment makes the fetch 1/17th
    as frequent and fully hidden.)"""
    from jax.experimental import pallas as pl
    if blk is None:
        return [tuple(coef_ref[s, k, 0] for k in range(5))
                for s in range(nsec)]
    return [tuple(coef_ref[s, k, 0, pl.ds(blk * 8, 8), :]
                  for k in range(5))
            for s in range(nsec)]


def _run_cascade(params, xread, ybuf, yslot, state_ref, *, nsec: int,
                 row_chunk: int, unroll: int):
    """The biquad cascade over one row chunk: rows come from ``xread(r)``
    (a VMEM input slot, or the generator's synthesized chunk), filtered
    rows land in ``ybuf[yslot]``, and the (2*nsec, 8, 128) carry crosses
    chunks in ``state_ref``.  ``params``: per-section coupled taps from
    :func:`_coef_params`.  The ONE copy of the recurrence shared by
    the DMA kernels (:func:`_seg_kernel`, :func:`_seg_kernel_reuse`) and
    the generator kernel (:func:`_seg_kernel_gen`) — their numerics must
    never drift.
    """
    import jax

    def load_state():
        return tuple(state_ref[i] for i in range(2 * nsec))

    def one_row(r, state):
        val = xread(r)
        st = list(state)
        for s in range(nsec):
            prc_, prs_, d0, d1, d2 = params[s]
            s1, s2 = st[2 * s], st[2 * s + 1]
            y = d0 * val + d1 * s1 + d2 * s2
            st[2 * s] = prc_ * s1 - prs_ * s2 + val
            st[2 * s + 1] = prs_ * s1 + prc_ * s2
            val = y
        ybuf[yslot, r] = val
        return tuple(st)

    # with input DMA out of the way, the serial recurrence's dependence
    # chain (~23 cycles/row measured) is the floor — the 8-row causal-
    # combination cascade breaks it (2x the FLOPs, no serial edge within
    # a chunk)
    if unroll == 8:
        powers = _make_powers(params, nsec)

        def body(i, state):
            r0 = i * 8
            v = [xread(r0 + j) for j in range(8)]
            y, state = _chunk8_cascade(v, state, params, powers, nsec)
            for j in range(8):
                ybuf[yslot, r0 + j] = y[j]
            return state
    else:
        def body(i, state):
            r0 = i * unroll
            for j in range(unroll):
                state = one_row(r0 + j, state)
            return state

    state = jax.lax.fori_loop(0, row_chunk // unroll, body, load_state())
    for i in range(2 * nsec):
        state_ref[i] = state[i]


def _group_sum_chunk(ybuf, yslot, row_chunk: int, sum_lanes: int):
    """Reduce each contiguous ``sum_lanes``-lane group of the filtered
    chunk to its sum (the mix epilogue): 8 per-sublane (row_chunk, 128)
    x (128, 128) MXU matmuls against iota-built 0/1 group matrices.
    HIGHEST precision: default MXU precision rounds f32 operands through
    bf16 passes; with a 0/1 matrix HIGHEST makes the reduction exact f32
    adds.  Shared by the DMA and generator kernels."""
    import jax
    import jax.numpy as jnp

    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    acc = jnp.zeros((row_chunk, 128), dtype=jnp.float32)
    for s in range(8):
        m = (((s * 128 + lane) // sum_lanes) == col).astype(jnp.float32)
        acc = acc + jnp.dot(ybuf[yslot, :, s, :], m,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return acc



def _batch_kernel(coef_ref, x_ref, out_ref, state_ref, *, nsec: int,
                  rows: int, unroll: int):
    """One (lane_group, row_chunk) grid step of the batched cascade.

    ``x_ref``/``out_ref``: (rows, 1, 8, 128) — tile-major: each row load is
    one native (8, 128) vreg, no lane/sublane reshuffle.  ``coef_ref``:
    (nsec, 5, 1, 8, 128) per-lane [rc rs d0 d1 d2].  The recurrence state
    lives in the fori-loop *carry* (vector registers, not VMEM traffic);
    ``state_ref`` only persists it across row chunks of the same lane
    group (grid iterates row chunks innermost).  Measured 5.4x the
    state-in-scratch row-reshuffle form on v5e.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rc_idx = pl.program_id(1)
    params = [tuple(coef_ref[s, k, 0] for k in range(5))
              for s in range(nsec)]

    def init_state():
        return tuple(jnp.zeros((8, 128), jnp.float32)
                     for _ in range(2 * nsec))

    def load_state():
        return tuple(state_ref[i] for i in range(2 * nsec))

    state0 = jax.lax.cond(rc_idx == 0, init_state, load_state)

    def one_row(r, state):
        v = x_ref[r, 0]
        st = list(state)
        for s in range(nsec):
            prc, prs, d0, d1, d2 = params[s]
            s1, s2 = st[2 * s], st[2 * s + 1]
            y = d0 * v + d1 * s1 + d2 * s2
            st[2 * s] = prc * s1 - prs * s2 + v
            st[2 * s + 1] = prs * s1 + prc * s2
            v = y
        out_ref[r, 0] = v
        return tuple(st)

    if unroll == 8:
        powers = _make_powers(params, nsec)

        def body(i, state):
            r0 = i * 8
            v = [x_ref[r0 + j, 0] for j in range(8)]
            y, state = _chunk8_cascade(v, state, params, powers, nsec)
            for j in range(8):
                out_ref[r0 + j, 0] = y[j]
            return state
    else:
        def body(i, state):
            r0 = i * unroll
            for j in range(unroll):
                state = one_row(r0 + j, state)
            return state

    state = jax.lax.fori_loop(0, rows // unroll, body, state0)
    for i in range(2 * nsec):
        state_ref[i] = state[i]


@functools.lru_cache(maxsize=64)
def _build_batch_call(n_rows: int, n_lanes: int, nsec: int, tail_rows: int,
                      interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lane_groups = n_lanes // LANE_GROUP
    row_chunks = n_rows // ROW_CHUNK
    # chunks before this one warm up state only; their output-block index
    # clamps to 0 and is overwritten by the first real chunk (row chunks
    # iterate innermost/ascending, so the last writer wins)
    c_chunks = (n_rows - tail_rows) // ROW_CHUNK
    unroll = ROW_UNROLL if ROW_CHUNK % ROW_UNROLL == 0 else 1
    kernel = functools.partial(_batch_kernel, nsec=nsec, rows=ROW_CHUNK,
                               unroll=unroll)

    def call(coeffs, x):
        return pl.pallas_call(
            kernel,
            grid=(lane_groups, row_chunks),
            in_specs=[
                pl.BlockSpec((nsec, 5, 1, 8, 128),
                             lambda lg, rc: (0, 0, lg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_CHUNK, 1, 8, 128),
                             lambda lg, rc: (rc, lg, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_CHUNK, 1, 8, 128),
                lambda lg, rc: (jnp.maximum(rc - c_chunks, 0), lg, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (tail_rows, lane_groups, 8, 128), np.float32),
            scratch_shapes=[pltpu.VMEM((nsec * 2, 8, 128), np.float32)],
            interpret=interpret,
        )(coeffs, x)

    return jax.jit(call)


def sosfilt_batch(coeffs, x_t, *, interpret: typing.Optional[bool] = None,
                  tail: typing.Optional[int] = None):
    """Batched zero-state cascade: frames sequential, everything else in
    lanes at full VPU width.

    ``x_t``: ``(L, B, ch)`` — L frames of B independent segments (e.g. the
    per-block context slices of a mega window) × ch channels/voices.
    ``coeffs``: ``(B, nsec, ch, 11)`` per-segment ``design_coupled`` output.
    Returns ``(L, B, ch)``, or only the last ``tail`` rows when given —
    context rows then warm the state up in VMEM without ever being written
    back to HBM.  One HBM read of x and one write of y.

    Differentiable: the primal runs the Pallas kernel; the VJP runs
    through the associative-scan reference (see the autodiff section).
    """
    import jax.numpy as jnp

    if interpret is None:
        # Mosaic kernels only target TPU; interpret everywhere else (the
        # CPU path exists for tests and the virtual 8-device mesh)
        from signals_tpu.compiler.filters import default_backend
        interpret = default_backend() != 'tpu'
    x_t = jnp.asarray(x_t, dtype=jnp.float32)
    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    L, B, ch = x_t.shape
    nsec = coeffs.shape[1]
    # broadcast channel axes to a common width
    chc = coeffs.shape[2]
    chx = max(ch, chc)
    x_t = jnp.broadcast_to(x_t, (L, B, chx))
    coeffs = jnp.broadcast_to(coeffs, (B, nsec, chx, 11))
    if tail is None:
        tail = L
    return _batch_cv(int(tail), bool(interpret))(coeffs, x_t)


def _sosfilt_batch_impl(coeffs, x_t, *, interpret: bool, tail: int):
    """Kernel body of :func:`sosfilt_batch` on canonical (broadcast, f32)
    inputs."""
    import jax.numpy as jnp

    L, B, chx = x_t.shape
    nsec = coeffs.shape[1]
    lanes = B * chx
    lanes_pad = _round_up(lanes, LANE_GROUP)
    rows_pad = _round_up(L, ROW_CHUNK)
    tail_pad = min(_round_up(tail, ROW_CHUNK), rows_pad)
    x2 = x_t.reshape(L, lanes)
    # leading zero padding is invisible through a zero-initial-state
    # causal filter; lane padding has zero coefficients (outputs zeros)
    x2 = jnp.pad(x2, ((rows_pad - L, 0), (0, lanes_pad - lanes)))
    x4 = x2.reshape(rows_pad, lanes_pad // LANE_GROUP, 8, 128)

    # pack per-lane parameters [rc rs d0 d1 d2] as (nsec, 5, LG, 8, 128)
    sel = jnp.stack([coeffs[..., 6], coeffs[..., 7], coeffs[..., 8],
                     coeffs[..., 9], coeffs[..., 10]], axis=0)  # (5,B,nsec,ch)
    sel = sel.transpose(2, 0, 1, 3).reshape(nsec, 5, lanes)
    sel = jnp.pad(sel, ((0, 0), (0, 0), (0, lanes_pad - lanes)))
    sel = sel.reshape(nsec, 5, lanes_pad // LANE_GROUP, 8, 128)

    call = _build_batch_call(rows_pad, lanes_pad, nsec, tail_pad, interpret)
    y = call(sel, x4)                       # (tail_pad, LG, 8, 128)
    y = y.reshape(tail_pad, lanes_pad)
    return y[tail_pad - tail:, :lanes].reshape(tail, B, chx)


def sosfilt_pallas(coeffs, x, *, interpret: bool = False):
    """Drop-in equivalent of
    :func:`signals_tpu.compiler.filters.sosfilt_scan` running as a Pallas
    kernel.  ``coeffs``: (nsec, ch, 11) from ``design_coupled``;
    ``x``: (N, ch).  Differentiable via the scan reference VJP."""
    import jax.numpy as jnp

    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    n, ch_x = x.shape
    ch = max(coeffs.shape[1], ch_x)
    x = jnp.broadcast_to(x, (n, ch))
    return _pallas_cv(bool(interpret))(coeffs, x)


def _sosfilt_pallas_impl(coeffs, x, *, interpret: bool):
    import jax.numpy as jnp
    from signals_tpu.compiler.filters import _coupled_params

    nsec = coeffs.shape[0]
    n, ch = x.shape

    n_pad = _round_up(n, CHUNK)
    c_pad = _round_up(ch, LANES)
    xp_ = jnp.pad(x, ((0, n_pad - n), (0, c_pad - ch)))
    call = _build_section_call(n_pad, c_pad, interpret)

    for s in range(nsec):
        rc, rs, d0, d1, d2 = _coupled_params(jnp, coeffs, s)
        rc = jnp.pad(jnp.broadcast_to(rc, (ch,)), (0, c_pad - ch))
        rs = jnp.pad(jnp.broadcast_to(rs, (ch,)), (0, c_pad - ch))
        pcs = [jnp.ones((c_pad,), jnp.float32)]
        pss = [jnp.zeros((c_pad,), jnp.float32)]
        for _ in range(CHUNK):
            pcs.append(rc * pcs[-1] - rs * pss[-1])
            pss.append(rs * pcs[-2] + rc * pss[-1])
        pc = jnp.stack(pcs)                       # (CHUNK+1, c_pad)
        ps = jnp.stack(pss)
        taps = jnp.stack([
            jnp.pad(jnp.broadcast_to(d0, (ch,)), (0, c_pad - ch)),
            jnp.pad(jnp.broadcast_to(d1, (ch,)), (0, c_pad - ch)),
            jnp.pad(jnp.broadcast_to(d2, (ch,)), (0, c_pad - ch)),
        ])
        xp_ = call(xp_, pc, ps, taps)
    return xp_[:n, :ch]


# --- timeline-segment cascade with in-kernel DMA ------------------------------
#
# The mega filter path used to materialize the per-segment context layout
# in HBM (k+1 transposes of the timeline) and transpose the tail output
# back to block-major afterwards — ~35 ms of a 120 s render.  This kernel
# reads the raw (T, V) timeline straight from HBM with manually
# double-buffered DMAs (each lane group's segments are overlapping row
# windows, which BlockSpec index maps cannot express) and writes its tail
# output block-major, eliminating all three passes.


def _seg_kernel(coef_ref, x_hbm, out_hbm, xbuf, ybuf, state_ref,
                in_sems, out_sems, *scratch, nsec: int, row_chunk: int,
                c_chunks: int, seg_frames: int, group: int, v: int,
                unroll: int, parts: int, slots: int, sum_lanes: int = 0,
                coeff_blocks: int = 1, cpb: int = 1):
    """One (lane_group, row_chunk) grid step.

    Lanes are ``group`` consecutive segments x ``v`` channels (group*v =
    1024).  ``x_hbm``: (T, v) timeline; ``out_hbm``: (n_segments_pad, F, v)
    block-major tail output.  ``xbuf``/``ybuf``: (slots, row_chunk, 8,
    128) revolving buffers (prefetch depth ``slots - 1``); ``in_sems``/
    ``out_sems``: (slots, group, parts) DMA semaphores; ``state_ref``:
    (2*nsec, 8, 128) carry across row chunks of one lane group.

    When ``group == 1`` (the packed-to-1024-lane layout) each transfer is
    split into ``parts`` contiguous row-part DMAs in flight concurrently —
    a single 2 MB copy leaves most of the DMA engines idle (measured 33 ms
    vs 24 ms for 8 strided per-segment copies on v5e); row-parts keep both
    endpoints contiguous AND saturate the engines.

    ``sum_lanes > 0`` (``group == 1`` only) is the mix-epilogue mode of
    :func:`_seg_kernel_reuse` on the plain double-buffered pipeline: each
    contiguous ``sum_lanes``-lane group reduces to its sum in-kernel
    (``scratch[0]`` = (slots, row_chunk, 128) sum buffer) and only the
    skinny sums DMA out — the geometry the reuse ring can't hold (short
    pole-justified contexts, multi-block carry segments) keeps the
    epilogue's HBM savings.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lg = pl.program_id(0)
    rc = pl.program_id(1)
    n_rc = pl.num_programs(1)
    step = lg * n_rc + rc
    # lane index = g*v + ch within the group's 1024 lanes; segment g's
    # channels land at sublane (g*v)//128, lane offset (g*v)%128

    # callers pad channels to vpad = round_up(chx, 128), so a segment
    # always owns whole sublane rows; x_hbm is (T, subs, 128)
    subs = v // 128
    part_rows = row_chunk // parts

    def in_dma(slot, lg_, rc_, g, p):
        seg = lg_ * group + g
        src_row = seg * seg_frames + rc_ * row_chunk + p * part_rows
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_row, part_rows)],
            xbuf.at[slot, pl.ds(p * part_rows, part_rows),
                    g * subs:(g + 1) * subs, :],
            in_sems.at[slot, g, p])

    def start_in(slot, step_):
        lg_ = step_ // n_rc
        rc_ = step_ % n_rc
        for g in range(group):
            for p in range(parts):
                in_dma(slot, lg_, rc_, g, p).start()

    def wait_in(slot, step_):
        lg_ = step_ // n_rc
        rc_ = step_ % n_rc
        for g in range(group):
            for p in range(parts):
                in_dma(slot, lg_, rc_, g, p).wait()

    sbuf = scratch[0] if sum_lanes else None

    def out_dma_p(slot_, lg_, rc_, g, p):
        seg = lg_ * group + g
        dst_row = rc_ * row_chunk - c_chunks * row_chunk + p * part_rows
        if sum_lanes:
            return pltpu.make_async_copy(
                sbuf.at[slot_, pl.ds(p * part_rows, part_rows), :],
                out_hbm.at[seg, pl.ds(dst_row, part_rows)],
                out_sems.at[slot_, g, p])
        return pltpu.make_async_copy(
            ybuf.at[slot_, pl.ds(p * part_rows, part_rows),
                    g * subs:(g + 1) * subs, :],
            out_hbm.at[seg, pl.ds(dst_row, part_rows)],
            out_sems.at[slot_, g, p])

    def out_dma(slot_, lg_, rc_, g):
        class _Batch:
            def start(self):
                for p in range(parts):
                    out_dma_p(slot_, lg_, rc_, g, p).start()

            def wait(self):
                for p in range(parts):
                    out_dma_p(slot_, lg_, rc_, g, p).wait()
        return _Batch()

    slot = step % slots
    n_steps = pl.num_programs(0) * n_rc

    # prefetch depth = slots - 1: step 0 fills slots 0..slots-2, then each
    # step keeps the pipeline slots-1 transfers ahead
    @pl.when(step == 0)
    def _():
        for s_ in range(slots - 1):
            start_in(s_, s_)

    @pl.when(step + slots - 1 < n_steps)
    def _():
        start_in((step + slots - 1) % slots, step + slots - 1)

    wait_in(slot, step)

    # out DMAs of the step that last used this ybuf slot must complete
    # before the compute below overwrites it
    @pl.when(step >= slots)
    def _():
        prev = step - slots
        prc = prev % n_rc

        @pl.when(prc >= c_chunks)
        def _():
            for g in range(group):
                out_dma(prev % slots, prev // n_rc, prc, g).wait()

    @pl.when(rc == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    if coeff_blocks == 1:
        blk = None
    else:
        blk = jnp.minimum(jnp.maximum(rc - c_chunks, 0) // cpb,
                          coeff_blocks - 1)
    _run_cascade(_coef_params(coef_ref, nsec, blk),
                 lambda r: xbuf[slot, r], ybuf, slot,
                 state_ref, nsec=nsec, row_chunk=row_chunk,
                 unroll=unroll)

    @pl.when(rc >= c_chunks)
    def _():
        if sum_lanes:
            sbuf[slot] = _group_sum_chunk(ybuf, slot, row_chunk,
                                          sum_lanes)
        for g in range(group):
            out_dma(slot, lg, rc, g).start()

    # drain: the final step waits for the last ``slots`` steps' output
    # DMAs (earlier ones were waited by the step >= slots rule)
    last = pl.num_programs(0) * n_rc - 1

    @pl.when(step == last)
    def _():
        for back in range(slots - 1, -1, -1):
            prev = step - back
            prc = prev % n_rc

            @pl.when((prev >= 0) & (prc >= c_chunks))
            def _(prev=prev, prc=prc):
                for g in range(group):
                    out_dma(prev % slots, prev // n_rc, prc, g).wait()


def _seg_kernel_reuse(coef_ref, x_hbm, out_hbm, xbuf, ybuf, state_ref,
                      in_sems, out_sems, *scratch, nsec: int,
                      row_chunk: int, c_chunks: int, seg_frames: int,
                      unroll: int, parts: int, total_chunks: int,
                      sum_lanes: int = 0):
    """Context-reusing variant of :func:`_seg_kernel` for ``group == 1``
    (the packed 1024-lane layout).

    ``sum_lanes > 0`` is the **mix-epilogue** mode
    (:meth:`CompiledPatch.packed_mega_mix`): instead of DMA-ing the full
    (row_chunk, 1024) filtered chunk to HBM, the kernel reduces each
    contiguous ``sum_lanes``-lane group (one packed stream's voices) to
    its sum via per-sublane MXU matmuls with a 0/1 group matrix and
    writes only the (row_chunk, 128)-padded sums — the full-width y is
    never materialized, saving its HBM write *and* the consumer's
    read-back (the two largest passes of a voice-mix render).  ``scratch``
    then carries one extra ``sbuf`` (2, row_chunk, 128) output buffer.

    Consecutive lane groups' windows overlap by the context rows: with
    context = F, plain double-buffering DMAs every timeline row twice.
    Here ``xbuf`` is a ring indexed by *absolute* timeline chunk
    (``slot = chunk % w``, ``w`` = chunks per window): each chunk is
    fetched exactly once; the next group's leading (context) chunks are
    already resident from the previous group's tail.  Refill rule: the
    last consumer of chunk ``a`` is step ``(a//t, a%t)`` (``t`` = tail
    chunks per group), which — after its compute — issues the DMA for
    chunk ``a + w`` into the slot it just vacated; first use of a fetched
    chunk (``rc >= w - t``, or every step of group 0) waits its
    semaphore.  Input DMA traffic drops 2x (context = F).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lg = pl.program_id(0)
    rc = pl.program_id(1)
    n_rc = pl.num_programs(1)
    step = lg * n_rc + rc
    part_rows = row_chunk // parts
    w = n_rc                          # chunks per window
    t = w - c_chunks                  # tail (new) chunks per group
    a_cur = lg * t + rc               # absolute chunk consumed this step

    def chunk_dma(a, p):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(a * row_chunk + p * part_rows, part_rows)],
            xbuf.at[a % w, pl.ds(p * part_rows, part_rows), :, :],
            in_sems.at[a % w, p])

    @pl.when(step == 0)
    def _():
        for a0 in range(min(w, total_chunks)):
            for p in range(parts):
                chunk_dma(a0, p).start()

    # refill: the previous step was the last consumer of its chunk when
    # its rc < t; its slot now takes the chunk one window ahead.  Issued
    # at the *top* of the following step so the DMA has a full grid step
    # of slack behind the vacating reader (same slack as the plain
    # double-buffer pattern).
    prev = step - 1
    prc_prev = prev % n_rc
    a_prev = (prev // n_rc) * t + prc_prev

    @pl.when((step >= 1) & (prc_prev < t) & (a_prev + w < total_chunks))
    def _():
        for p in range(parts):
            chunk_dma(a_prev + w, p).start()

    # first use of a freshly fetched chunk: wait its DMA.  (Group 0's
    # chunks all arrive from the prologue; later groups' leading w - t
    # chunks are already resident and already waited.)
    @pl.when((rc >= w - t) | (lg == 0))
    def _():
        for p in range(parts):
            chunk_dma(a_cur, p).wait()

    # ybuf: plain double buffer over *output* steps
    yslot = step % 2
    sbuf = scratch[0] if sum_lanes else None

    def out_copy(yslot_, lg_, rc_, p):
        if sum_lanes:
            dst_row = (rc_ * row_chunk - c_chunks * row_chunk
                       + p * part_rows)
            return pltpu.make_async_copy(
                sbuf.at[yslot_, pl.ds(p * part_rows, part_rows), :],
                out_hbm.at[lg_, pl.ds(dst_row, part_rows)],
                out_sems.at[yslot_, p])
        return _seg_out_dma(out_hbm, ybuf, out_sems, yslot_, lg_, rc_, p,
                            row_chunk, part_rows, c_chunks, pl, pltpu)

    @pl.when(step >= 2)
    def _():
        prev = step - 2
        prc = prev % n_rc

        @pl.when(prc >= c_chunks)
        def _():
            for p in range(parts):
                out_copy(prev % 2, prev // n_rc, prc, p).wait()

    @pl.when(rc == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    xslot = a_cur % w
    _run_cascade(_coef_params(coef_ref, nsec),
                 lambda r: xbuf[xslot, r], ybuf, yslot,
                 state_ref, nsec=nsec, row_chunk=row_chunk,
                 unroll=unroll)

    @pl.when(rc >= c_chunks)
    def _():
        if sum_lanes:
            sbuf[yslot] = _group_sum_chunk(ybuf, yslot, row_chunk,
                                           sum_lanes)
        for p in range(parts):
            out_copy(yslot, lg, rc, p).start()

    # (the refill for the slot this step vacates is issued at the TOP of
    # the next step — see above; issuing it here as well would start the
    # same DMA twice on a semaphore waited once, leaking a count that a
    # later chunk sharing the slot consumes before its data lands)

    last = pl.num_programs(0) * n_rc - 1

    @pl.when(step == last)
    def _():
        for back in (1, 0):
            prev = step - back
            prc = prev % n_rc

            @pl.when((prev >= 0) & (prc >= c_chunks))
            def _(prev=prev, prc=prc):
                for p in range(parts):
                    out_copy(prev % 2, prev // n_rc, prc, p).wait()


def _seg_out_dma(out_hbm, ybuf, out_sems, yslot, lg_, rc_, p, row_chunk,
                 part_rows, c_chunks, pl, pltpu):
    """Output DMA of one row part (group == 1: a segment is a lane group)."""
    dst_row = rc_ * row_chunk - c_chunks * row_chunk + p * part_rows
    return pltpu.make_async_copy(
        ybuf.at[yslot, pl.ds(p * part_rows, part_rows), :, :],
        out_hbm.at[lg_, pl.ds(dst_row, part_rows)],
        out_sems.at[yslot, p])


@functools.lru_cache(maxsize=32)
def _build_seg_call(T: int, v: int, nsec: int, n_segments: int,
                    seg_frames: int, context: int, interpret: bool,
                    reuse_flag: bool, dma_parts: int, slots_flag: int,
                    sum_lanes: int = 0, coeff_blocks: int = 1):
    """``reuse_flag``/``dma_parts``/``slots_flag`` are the SEG_* module
    flags, required arguments so they participate in the lru_cache key —
    flipping a flag at runtime (tests, hardware bisections) can then
    never silently serve a kernel built under the previous
    configuration.

    ``coeff_blocks = m > 1``: each segment's ``seg_frames`` tail spans
    ``m`` equal coefficient blocks — the coeff BlockSpec index map steps
    to the block's tile at each in-segment block boundary (context
    chunks warm up under the segment's FIRST block), mirroring
    :func:`_build_seg_gen_call`'s carry mode for the DMA-input path.
    Callers lay the coefficient tiles out (lane-group, block)-major (see
    :func:`_sosfilt_segments_impl`)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    group = LANE_GROUP // v           # segments per lane group
    n_seg_pad = _round_up(n_segments, group)
    lane_groups = n_seg_pad // group
    L = context + seg_frames
    m = max(1, int(coeff_blocks))
    if seg_frames % m:
        raise ValueError(f'{seg_frames}-frame segments do not tile '
                         f'{m} coefficient blocks')
    row_chunk = ROW_CHUNK
    # chunks must tile the context and the tail exactly (output DMAs copy
    # whole chunks into the (F, v) tail region); with coefficient blocks,
    # also each block (the coeff index map steps at block boundaries)
    while (context % row_chunk or seg_frames % row_chunk
           or (seg_frames // m) % row_chunk):
        row_chunk //= 2
    chunks_per_seg = L // row_chunk
    c_chunks = context // row_chunk
    tail = seg_frames
    unroll = ROW_UNROLL if row_chunk % ROW_UNROLL == 0 else 1
    parts = (dma_parts if group == 1 and row_chunk % dma_parts == 0
             else 1)
    slots = slots_flag
    w = chunks_per_seg
    t_chunks = w - c_chunks
    reuse = (reuse_flag and group == 1 and c_chunks >= 1
             and t_chunks >= 1 and w <= 6 and m == 1)
    if sum_lanes and not (group == 1 and sum_lanes <= LANE_GROUP
                          and LANE_GROUP % sum_lanes == 0
                          and LANE_GROUP // sum_lanes <= 128):
        # the group matrix has 128 columns: more than 128 groups
        # (sum_lanes < 8) cannot be represented — fall back.  Groups
        # WIDER than 128 lanes are fine: a group then spans several
        # 128-lane sublane slices and _group_sum_chunk accumulates the
        # slices into the same output column (512-voice streams give 2
        # columns, a 1024-voice stream gives 1).
        # mix-epilogue mode needs the packed 1024-lane layout (group ==
        # 1); callers fall back to the full-output kernel + an external
        # grouped sum.  Both the reuse ring AND the plain double-
        # buffered kernel implement it — geometries the ring can't hold
        # (short pole-justified contexts, multi-block carry segments)
        # keep the in-kernel sum.
        raise ValueError('sum_lanes requires the packed 1024-lane layout')
    if reuse:
        total_chunks = (lane_groups - 1) * t_chunks + w
        # parts=1: the ring issues each chunk several steps ahead of
        # its first use, so single whole-chunk DMAs are fully latency-
        # hidden and part-splitting buys nothing (measured neutral on
        # the double-buffered kernel too).
        parts = 1
        kernel = functools.partial(
            _seg_kernel_reuse, nsec=nsec, row_chunk=row_chunk,
            c_chunks=c_chunks, seg_frames=seg_frames, unroll=unroll,
            parts=parts, total_chunks=total_chunks, sum_lanes=sum_lanes)
        x_slots, y_slots = w, 2
    else:
        kernel = functools.partial(
            _seg_kernel, nsec=nsec, row_chunk=row_chunk,
            c_chunks=c_chunks, seg_frames=seg_frames, group=group, v=v,
            unroll=unroll, parts=parts, slots=slots, sum_lanes=sum_lanes,
            coeff_blocks=m, cpb=(seg_frames // m) // row_chunk)
        x_slots = y_slots = slots

    out_dims = ((n_seg_pad, tail, 128) if sum_lanes
                else (n_seg_pad, tail, v // 128, 128))
    scratch = [
        pltpu.VMEM((x_slots, row_chunk, 8, 128), np.float32),
        pltpu.VMEM((y_slots, row_chunk, 8, 128), np.float32),
        pltpu.VMEM((2 * nsec, 8, 128), np.float32),
        pltpu.SemaphoreType.DMA((x_slots, group, parts)
                                if not reuse
                                else (x_slots, parts)),
        pltpu.SemaphoreType.DMA((y_slots, group, parts)
                                if not reuse
                                else (y_slots, parts)),
    ]
    if sum_lanes:
        scratch.append(pltpu.VMEM((y_slots, row_chunk, 128), np.float32))

    def coeff_idx(lg, rc):
        return (0, 0, lg, 0, 0)

    def call(coeffs, x):
        # x: (T_pad, v) — or (T_pad, v//128, 128) for wide channels —
        # with T_pad covering the padded segment range
        return pl.pallas_call(
            kernel,
            grid=(lane_groups, chunks_per_seg),
            in_specs=[
                pl.BlockSpec((nsec, 5, 1, m * 8, 128), coeff_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(out_dims, np.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(coeffs, x)

    return jax.jit(call)


def _seg_coeff_sel(coeffs, nsec, n_segments, n_seg_pad, group, vpad):
    """Per-lane kernel coefficients: lane = (segment % group)*ch + c
    within the group's 1024 lanes; groups stacked on the leading axis.
    (nsec, 5, lane_groups, 8, 128) from (n_segments, nsec, vpad, 11)."""
    import jax.numpy as jnp
    sel = jnp.stack([coeffs[..., 6], coeffs[..., 7], coeffs[..., 8],
                     coeffs[..., 9], coeffs[..., 10]], axis=0)
    sel = jnp.pad(sel, ((0, 0), (0, n_seg_pad - n_segments), (0, 0),
                        (0, 0)))
    # (5, n_seg_pad, nsec, vpad) -> (nsec, 5, LG, group*vpad=1024)
    sel = sel.transpose(2, 0, 1, 3).reshape(
        nsec, 5, n_seg_pad // group, group * vpad)
    return sel.reshape(nsec, 5, n_seg_pad // group, 8, 128)


def sosfilt_segments(coeffs, x, *, n_segments: int, seg_frames: int,
                     context: int,
                     interpret: typing.Optional[bool] = None,
                     sum_groups: int = 0, blocks_per_seg: int = 1):
    """Filter ``n_segments`` overlapping timeline segments, zero-state,
    with per-segment coefficients, returning only each segment's tail.

    ``x``: ``(context + n_segments*seg_frames, ch)`` contiguous timeline;
    segment ``b`` spans rows ``[b*seg_frames, b*seg_frames + context +
    seg_frames)``.  ``coeffs``: ``(n_segments, nsec, ch, 11)``.  Returns
    ``(n_segments, seg_frames, ch)`` **block-major** — the layout the
    mega window needs, produced directly by the kernel's output DMAs (no
    transposes, no materialized segment expansion).

    Requires ``ch`` to divide 128 and ``context % row-chunk == 0``;
    callers fall back to :func:`sosfilt_batch` otherwise.

    ``sum_groups = g`` returns each contiguous ``g``-lane group's SUM
    instead of the full lanes — shape ``(n_segments, seg_frames, ch//g)``
    — computed *inside* the kernel (the mix epilogue: the full-width
    output is never written to HBM).  Falls back to the full kernel + an
    external grouped sum when the epilogue layout doesn't apply; the
    fallback sums in a different order, so results agree to f32
    reassociation (~1 ulp per summand), not bit-exactly.

    ``blocks_per_seg = m > 1``: every ``m`` consecutive coefficient
    blocks form ONE state-carry segment (``m * seg_frames`` frames, one
    ``context`` warmup under the first block's coefficients, per-block
    coefficients inside) — the swept-filter carry mode on the DMA-input
    path, mirroring :func:`sosfilt_segments_gen`.  Requires
    ``n_segments % m == 0``.

    Differentiable: the primal runs the Pallas kernel; the VJP runs
    through the associative-scan reference (see the autodiff section).
    """
    import jax.numpy as jnp

    if interpret is None:
        from signals_tpu.compiler.filters import default_backend
        interpret = default_backend() != 'tpu'
    blocks_per_seg = max(1, int(blocks_per_seg))
    if n_segments % blocks_per_seg:
        raise ValueError(f'n_segments {n_segments} must be a multiple of '
                         f'blocks_per_seg {blocks_per_seg}')
    x = jnp.asarray(x, dtype=jnp.float32)
    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    T, ch = x.shape
    nsec = coeffs.shape[1]
    chc = coeffs.shape[2]
    chx = max(ch, chc)
    x = jnp.broadcast_to(x, (T, chx))
    coeffs = jnp.broadcast_to(coeffs, (n_segments, nsec, chx, 11))
    # the scan-reference VJP gathers each segment's full window: extend the
    # timeline so every window is in range (the kernel pads internally too)
    T_need = context + n_segments * seg_frames
    if T_need > T:
        x = jnp.pad(x, ((0, T_need - T), (0, 0)))
    return _segments_cv(int(n_segments), int(seg_frames), int(context),
                        bool(interpret), int(sum_groups),
                        int(blocks_per_seg))(coeffs, x)


def _sosfilt_segments_impl(coeffs, x, *, n_segments: int, seg_frames: int,
                           context: int, interpret: bool, sum_groups: int,
                           blocks_per_seg: int = 1):
    """Kernel body of :func:`sosfilt_segments` on canonical (broadcast,
    f32, window-padded) inputs.  Recursions (wide-channel split, lane
    packing, epilogue fallback) stay inside the impl so the custom-VJP
    boundary wraps the whole computation exactly once."""
    import jax
    import jax.numpy as jnp

    m = max(1, int(blocks_per_seg))
    T, chx = x.shape
    nsec = coeffs.shape[1]
    if 128 % chx and chx % 128:
        raise ValueError(f'channel count {chx} must divide (or be a '
                         f'multiple of) 128')
    if chx < 32:
        # narrow channel counts mean heavy zero-padding and tiny DMAs —
        # the transposed-layout path (sosfilt_batch) is the right kernel
        raise ValueError(f'channel count {chx} too narrow for the '
                         f'DMA-segment kernel (needs >= 32)')

    if chx > LANE_GROUP:
        # wider than one kernel instance (> 1024 voices): channels are
        # independent through an SOS cascade, so split the lane dim into
        # LANE_GROUP-wide kernel calls and concatenate.  sum_groups stays
        # valid: a group's width divides LANE_GROUP (enforced by the
        # epilogue gates), so no group straddles a split boundary.
        if chx % LANE_GROUP:
            raise ValueError(f'channel count {chx} > {LANE_GROUP} must be '
                             f'a multiple of {LANE_GROUP}')
        if sum_groups and sum_groups > LANE_GROUP:
            # a sum group (e.g. the 2048-voice master mix) spans several
            # lane-group kernel calls: each call reduces its own full
            # group in-kernel and the partial columns add up — the wide
            # mix epilogue
            if sum_groups % LANE_GROUP or chx % sum_groups:
                raise ValueError(f'sum_groups {sum_groups} must be a '
                                 f'multiple of {LANE_GROUP} dividing the '
                                 f'channel count {chx}')
            cols = jnp.concatenate([
                _sosfilt_segments_impl(
                    coeffs[:, :, j * LANE_GROUP:(j + 1) * LANE_GROUP, :],
                    x[:, j * LANE_GROUP:(j + 1) * LANE_GROUP],
                    n_segments=n_segments, seg_frames=seg_frames,
                    context=context, interpret=interpret,
                    sum_groups=LANE_GROUP, blocks_per_seg=m)
                for j in range(chx // LANE_GROUP)], axis=2)
            return cols.reshape(n_segments, seg_frames, -1,
                                sum_groups // LANE_GROUP).sum(axis=3)
        parts = [
            _sosfilt_segments_impl(
                coeffs[:, :, j * LANE_GROUP:(j + 1) * LANE_GROUP, :],
                x[:, j * LANE_GROUP:(j + 1) * LANE_GROUP],
                n_segments=n_segments, seg_frames=seg_frames,
                context=context, interpret=interpret,
                sum_groups=sum_groups, blocks_per_seg=m)
            for j in range(chx // LANE_GROUP)]
        return jnp.concatenate(parts, axis=2)

    if sum_groups and chx < 128:
        # narrow layouts take the lane-packing recursion below, which the
        # epilogue kernel doesn't cover: full output + external sum
        y = _sosfilt_segments_impl(coeffs, x, n_segments=n_segments,
                                   seg_frames=seg_frames, context=context,
                                   interpret=interpret, sum_groups=0,
                                   blocks_per_seg=m)
        if chx % sum_groups:
            raise ValueError(f'sum_groups {sum_groups} must divide the '
                             f'channel count {chx}')
        return y.reshape(n_segments, seg_frames, -1,
                         sum_groups).sum(axis=3)

    if chx < 128:
        # lane packing: Mosaic DMA lanes come in 128s, so a 64-channel
        # patch would waste half of every vector op and every DMA byte on
        # zero padding.  Instead pack k = 128/chx *segment streams* into
        # the lane dim: stream j covers segments [j*S, (j+1)*S) and its
        # timeline is the plain slice x[j*S*F : j*S*F + C + S*F] — the
        # packed input is k slices concatenated on lanes, the kernel runs
        # at full width on S segments, and the output unpacks with a
        # lane-split + segment-axis concat.  Bit-exact: identical math
        # per lane, only the lane assignment changes.  (Packing further,
        # to the full 1024-lane group, is *worse* here: the k-way minor-
        # dim concat is an unfused HBM pass whose cost grows with k —
        # 13.9 ms at k=16 vs ~5 ms at k=2 on v5e for a 2.7 GB pack.  The
        # fx mega path avoids the pack pass entirely by lowering the
        # producer per stream window — see ``LowerCtx.in_packed_streams``
        # — and passes 1024-lane input straight in.)
        k = 128 // chx
        # carry mode: streams must hold whole carry segments so stream
        # starts stay segment-aligned (padding is then whole segments of
        # zero-coefficient blocks, dropped below)
        S = -(-n_segments // (k * m)) * m
        F_, C_ = seg_frames, context
        T_need = C_ + k * S * F_
        if T_need > T:
            x = jnp.pad(x, ((0, T_need - T), (0, 0)))
        xp_ = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(x, j * S * F_, C_ + S * F_)
             for j in range(k)], axis=1)         # (C + S*F, 128)
        cpad = jnp.pad(coeffs, ((0, k * S - n_segments), (0, 0), (0, 0),
                                (0, 0)))
        cpk = jnp.concatenate(
            [cpad[j * S:(j + 1) * S] for j in range(k)], axis=2)
        y = _sosfilt_segments_impl(cpk, xp_, n_segments=S, seg_frames=F_,
                                   context=C_, interpret=interpret,
                                   sum_groups=0, blocks_per_seg=m)
        y = jnp.concatenate(
            [y[:, :, j * chx:(j + 1) * chx] for j in range(k)], axis=0)
        return y[:n_segments]

    # Mosaic DMA slices must be 128-lane aligned on hardware: pad the
    # channel dim up to a full tile (zero lanes carry zero coefficients)
    vpad = _round_up(chx, 128)
    if vpad != chx:
        x = jnp.pad(x, ((0, 0), (0, vpad - chx)))
        coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, vpad - chx), (0, 0)))

    group = LANE_GROUP // vpad
    # carry mode (m > 1): the kernel's grid unit is a CARRY SEGMENT of
    # m coefficient blocks (m*seg_frames tail frames, one context
    # warmup); padding happens at carry-segment granularity and the
    # coefficient tiles are laid out (lane-group, in-segment-block)-major
    # so the kernel's stepping index map finds block b of lane group lg
    # at tile lg*m + b
    n_units = n_segments // m
    unit_frames = m * seg_frames
    n_unit_pad = _round_up(n_units, group)
    # padded segments read rows past the timeline end: extend with zeros
    T_need = context + n_unit_pad * unit_frames
    if T_need > T:
        x = jnp.pad(x, ((0, T_need - T), (0, 0)))

    if m == 1:
        sel = _seg_coeff_sel(coeffs, nsec, n_segments, n_unit_pad, group,
                             vpad)
    else:
        cpad = jnp.pad(coeffs, ((0, n_unit_pad * m - n_segments), (0, 0),
                                (0, 0), (0, 0)))
        lgs, blks, gs = np.meshgrid(np.arange(n_unit_pad // group),
                                    np.arange(m), np.arange(group),
                                    indexing='ij')
        perm = ((lgs * group + gs) * m + blks).reshape(-1)
        sel = _seg_coeff_sel(cpad[perm], nsec, n_unit_pad * m,
                             n_unit_pad * m, group, vpad)
        sel = sel.reshape(nsec, 5, n_unit_pad // group, m * 8, 128)

    x = x.reshape(x.shape[0], vpad // 128, 128)
    if sum_groups:
        if chx % sum_groups:
            raise ValueError(f'sum_groups {sum_groups} must divide the '
                             f'channel count {chx}')
        try:
            call = _build_seg_call(int(x.shape[0]), vpad, nsec,
                                   n_units, unit_frames, context,
                                   interpret, SEG_CONTEXT_REUSE,
                                   SEG_DMA_PARTS, SEG_SLOTS,
                                   sum_lanes=sum_groups, coeff_blocks=m)
        except ValueError:
            # epilogue layout unavailable (reuse disabled, huge context):
            # full kernel + external grouped sum — same values up to f32
            # reassociation, none of the pass savings
            y = _sosfilt_segments_impl(coeffs, x.reshape(x.shape[0], vpad),
                                       n_segments=n_segments,
                                       seg_frames=seg_frames,
                                       context=context, interpret=interpret,
                                       sum_groups=0, blocks_per_seg=m)
            return y.reshape(n_segments, seg_frames, -1,
                             sum_groups).sum(axis=3)
        y = call(sel, x)                     # (n_unit_pad, m*F, 128)
        y = y[:n_units, :, :chx // sum_groups]
        return y.reshape(n_segments, seg_frames, y.shape[-1])
    call = _build_seg_call(int(x.shape[0]), vpad, nsec, n_units,
                           unit_frames, context, interpret,
                           SEG_CONTEXT_REUSE, SEG_DMA_PARTS, SEG_SLOTS,
                           coeff_blocks=m)
    y = call(sel, x)
    y = y.reshape(y.shape[0], y.shape[1], vpad)  # (n_unit_pad, m*F, vpad)
    y = y[:n_units, :, :chx]
    return y.reshape(n_segments, seg_frames, chx)


# --- generator-fed segments: zero-input-DMA cascade --------------------------
#
# When the packed family's input is a plain oscillator with Fixed controls
# (the subtractive-voice shape: saw -> LP), the input timeline is a pure
# function of the absolute frame index and per-lane constants — so instead
# of lowering the producers to HBM (one full write) and DMA-reading them
# back (one full read), the kernel synthesizes each chunk's rows from an
# iota and (8, 128) per-lane parameter tiles.  Combined with the mix
# epilogue, a 64-voice subtractive render's HBM traffic drops to the
# coefficients in and the skinny per-stream sums out.

OSC_SINE, OSC_SQUARE, OSC_SAW, OSC_TRIANGLE = 0, 1, 2, 3


def _seg_kernel_gen(coef_ref, toff_ref, lanef_ref, out_hbm, xgen, ybuf,
                    state_ref, out_sems, *scratch, nsec: int,
                    row_chunk: int, c_chunks: int, seg_frames: int,
                    unroll: int, osc_code: int, sum_lanes: int,
                    coeff_blocks: int = 1, cpb: int = 1):
    """Generator-fed variant of :func:`_seg_kernel_reuse` (group == 1,
    the packed 1024-lane family layout): no input DMA at all — each
    chunk's rows are synthesized on the VPU.

    ``toff_ref`` (8, 128) int32: per-lane absolute frame offset
    (``position + stream*sf - context``); ``lanef_ref`` (4, 8, 128) f32:
    per-lane hertz, phase, amplitude (``enabled`` gates folded into the
    values by the caller) and the broadcast ``1/rate``.  The oscillator
    arithmetic replicates ``nodes/osc.py``'s exact op sequence — int32
    frame -> f32, ``(t * inv_rate) * hz``, range reduction as
    ``x - floor(x)``.  ``inv_rate`` rides as a runtime INPUT, not a
    baked constant: the compiler path fences it with an
    optimization_barrier precisely so ``inv_rate * hz`` cannot fold into
    one differently-rounded constant — a 1-ulp phase difference flips
    saw/square wraps into full-amplitude spikes against the oracle.
    Pre-timeline rows (t < 0) are zero, matching
    ``LowerCtx.in_packed_streams``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lg = pl.program_id(0)
    rc = pl.program_id(1)
    n_rc = pl.num_programs(1)
    step = lg * n_rc + rc
    f32 = jnp.float32

    # ---- synthesize this chunk's input rows --------------------------------
    r_i = jax.lax.broadcasted_iota(jnp.int32, (row_chunk, 8, 128), 0)
    t_i = toff_ref[...][None] + (lg * seg_frames + rc * row_chunk) + r_i
    tf = t_i.astype(f32)
    hz = lanef_ref[0][None]
    ph = lanef_ref[1][None]
    amp = lanef_ref[2][None]
    inv_rate = lanef_ref[3][None]

    def frac(v):
        return v - jnp.floor(v)

    turns = frac(tf * inv_rate * hz)
    tt = frac(turns + ph)
    if osc_code == OSC_SINE:
        # the f32 sin2pi chain (Mosaic has no f64): NOT bit-exact vs the
        # lowered producers (~1e-7 absolute), but sine is continuous —
        # a ulp of phase error stays a ulp of output error, far inside
        # the 1e-5 parity budget.  The discontinuous waves below DO need
        # the bit-exact treatment (a ulp at a wrap is ±2.0).
        from signals_tpu.core.mathx import sin2pi_f32
        x = sin2pi_f32(jnp, tt)
    elif osc_code == OSC_SQUARE:
        x = jnp.sign(f32(0.5) - frac(tt))
    elif osc_code == OSC_SAW:
        x = f32(2.0) * frac(tt - f32(0.5)) - f32(1.0)
    else:                                   # OSC_TRIANGLE
        t3 = tt - f32(0.25)
        x = ((f32(4.0) * (f32(0.5) * frac(t3 * f32(2.0))) - f32(1.0))
             * jnp.sign(frac(t3) - f32(0.5)))
    x = jnp.where(t_i >= 0, amp * x, f32(0.0))
    xgen[...] = x

    # ---- cascade + output (double-buffered, as _seg_kernel_reuse) ----------
    yslot = step % 2
    sbuf = scratch[0] if sum_lanes else None

    def out_copy(yslot_, lg_, rc_):
        dst_row = rc_ * row_chunk - c_chunks * row_chunk
        if sum_lanes:
            return pltpu.make_async_copy(
                sbuf.at[yslot_, pl.ds(0, row_chunk), :],
                out_hbm.at[lg_, pl.ds(dst_row, row_chunk)],
                out_sems.at[yslot_, 0])
        return pltpu.make_async_copy(
            ybuf.at[yslot_, pl.ds(0, row_chunk), :, :],
            out_hbm.at[lg_, pl.ds(dst_row, row_chunk)],
            out_sems.at[yslot_, 0])

    @pl.when(step >= 2)
    def _():
        prev = step - 2
        prc = prev % n_rc

        @pl.when(prc >= c_chunks)
        def _():
            out_copy(prev % 2, prev // n_rc, prc).wait()

    @pl.when(rc == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    if coeff_blocks == 1:
        blk = None
    else:
        blk = jnp.minimum(jnp.maximum(rc - c_chunks, 0) // cpb,
                          coeff_blocks - 1)
    _run_cascade(_coef_params(coef_ref, nsec, blk),
                 lambda r: xgen[r], ybuf, yslot, state_ref,
                 nsec=nsec, row_chunk=row_chunk, unroll=unroll)

    @pl.when(rc >= c_chunks)
    def _():
        if sum_lanes:
            sbuf[yslot] = _group_sum_chunk(ybuf, yslot, row_chunk,
                                           sum_lanes)
        out_copy(yslot, lg, rc).start()

    last = pl.num_programs(0) * n_rc - 1

    @pl.when(step == last)
    def _():
        for back in (1, 0):
            prev = step - back
            prc = prev % n_rc

            @pl.when((prev >= 0) & (prc >= c_chunks))
            def _(prev=prev, prc=prc):
                out_copy(prev % 2, prev // n_rc, prc).wait()


@functools.lru_cache(maxsize=32)
def _build_seg_gen_call(nsec: int, n_segments: int, seg_frames: int,
                        context: int, interpret: bool, osc_code: int,
                        sum_lanes: int, blocks_per_seg: int = 1):
    """``n_segments`` counts coefficient BLOCKS; with ``blocks_per_seg =
    m > 1`` the kernel's grid groups every ``m`` consecutive blocks into
    one state-carry segment of ``m * seg_frames`` frames whose context
    warmup runs once, under the first block's coefficients.  The
    segment's WHOLE per-block coefficient stack rides one BlockSpec
    block (callers reshape to ``(nsec, 5, n_seg, m*8, 128)``), fetched
    once per segment and sliced per chunk in-VMEM
    (:func:`_coef_params`)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sum_lanes and not (8 <= sum_lanes <= LANE_GROUP
                          and LANE_GROUP % sum_lanes == 0):
        # >= 8 keeps the group count <= the group matrix's 128 columns;
        # groups wider than 128 lanes span sublane slices and accumulate
        # (see _group_sum_chunk)
        raise ValueError('sum_lanes must give <= 128 groups')
    m = max(1, int(blocks_per_seg))
    if n_segments % m:
        raise ValueError(f'{n_segments} blocks do not tile '
                         f'{m}-block segments')
    row_chunk = ROW_CHUNK
    while context % row_chunk or seg_frames % row_chunk:
        row_chunk //= 2
    cpb = seg_frames // row_chunk              # chunks per coeff block
    seg_total = m * seg_frames                 # frames per carry segment
    n_seg = n_segments // m
    chunks_per_seg = (context + seg_total) // row_chunk
    c_chunks = context // row_chunk
    unroll = ROW_UNROLL if row_chunk % ROW_UNROLL == 0 else 1
    kernel = functools.partial(
        _seg_kernel_gen, nsec=nsec, row_chunk=row_chunk,
        c_chunks=c_chunks, seg_frames=seg_total, unroll=unroll,
        osc_code=osc_code, sum_lanes=sum_lanes, coeff_blocks=m,
        cpb=cpb)
    out_dims = ((n_seg, seg_total, 128) if sum_lanes
                else (n_seg, seg_total, 8, 128))
    scratch = [
        pltpu.VMEM((row_chunk, 8, 128), np.float32),      # xgen
        pltpu.VMEM((2, row_chunk, 8, 128), np.float32),   # ybuf
        pltpu.VMEM((2 * nsec, 8, 128), np.float32),       # state
        pltpu.SemaphoreType.DMA((2, 1)),                  # out sems
    ]
    if sum_lanes:
        scratch.append(pltpu.VMEM((2, row_chunk, 128), np.float32))

    def coeff_idx(lg, rc):
        return (0, 0, lg, 0, 0)

    def call(coeffs, toff, lanef):
        return pl.pallas_call(
            kernel,
            grid=(n_seg, chunks_per_seg),
            in_specs=[
                pl.BlockSpec((nsec, 5, 1, m * 8, 128), coeff_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(out_dims, np.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(coeffs, toff, lanef)

    return jax.jit(call)


def sosfilt_segments_gen(coeffs, toff, lanef, *, n_segments: int,
                         seg_frames: int, context: int, osc_code: int,
                         rate: int,
                         interpret: typing.Optional[bool] = None,
                         sum_groups: int = 0, blocks_per_seg: int = 1):
    """:func:`sosfilt_segments` with the input synthesized IN-KERNEL from
    an oscillator spec — zero input HBM traffic.

    ``coeffs``: ``(n_segments, nsec, 1024, 11)`` (the full 1024-lane
    family layout is required); ``toff``: ``(1024,)`` int32 per-lane
    absolute frame offsets; ``lanef``: ``(3, 1024)`` f32 per-lane
    (hertz, phase, amplitude) — ``1/rate`` is appended internally as a
    runtime input row (see the kernel's folding note).  ``sum_groups``
    as in
    :func:`sosfilt_segments` (the mix epilogue composes).  Returns
    ``(n_segments, seg_frames, 1024)`` or the group sums.

    ``blocks_per_seg = m > 1``: every ``m`` consecutive coefficient
    blocks share ONE state-carry segment — the ``context`` warmup (under
    the first block's coefficients) is replayed once per segment instead
    of once per block, cutting the kernel's per-frame work from
    ``(context + F) / F`` to ``(context + m*F) / (m*F)`` (~2x -> ~9/8 at
    the default context == F, m == 8).  Blocks after the first in a
    segment see carried — strictly longer — state history; see
    :data:`signals_tpu.compiler.filters.SEG_CARRY_BLOCKS` for the
    semantics contract.  Requires ``n_segments % m == 0`` (callers pad
    with continuation blocks and drop them).
    """
    import jax.numpy as jnp

    if interpret is None:
        from signals_tpu.compiler.filters import default_backend
        interpret = default_backend() != 'tpu'
    blocks_per_seg = max(1, int(blocks_per_seg))
    if n_segments % blocks_per_seg:
        raise ValueError(f'n_segments {n_segments} must be a multiple of '
                         f'blocks_per_seg {blocks_per_seg}')
    coeffs = jnp.asarray(coeffs, dtype=jnp.float32)
    lanes = coeffs.shape[2]
    if lanes % LANE_GROUP:
        raise ValueError('generator-fed segments need whole '
                         f'{LANE_GROUP}-lane family groups, got '
                         f'{lanes} lanes')
    toff = jnp.asarray(toff, dtype=jnp.int32).reshape(lanes)
    lanef = jnp.asarray(lanef, dtype=jnp.float32).reshape(3, lanes)
    if lanes > LANE_GROUP:
        # > 1024 voices: independent per-lane-group kernel calls, exactly
        # as sosfilt_segments' wide-channel split.  Sum groups spanning
        # several lane groups (the wide mix epilogue) reduce per group
        # in-kernel and add the partial columns.
        sg_part = min(sum_groups, LANE_GROUP) if sum_groups else 0
        if sum_groups and (sum_groups % sg_part or lanes % sum_groups):
            raise ValueError(f'sum_groups {sum_groups} must divide the '
                             f'lane count {lanes} in whole lane groups')
        LG = LANE_GROUP
        cols = jnp.concatenate([
            sosfilt_segments_gen(
                coeffs[:, :, j * LG:(j + 1) * LG, :], toff[j * LG:(j + 1) * LG],
                lanef[:, j * LG:(j + 1) * LG], n_segments=n_segments,
                seg_frames=seg_frames, context=context, osc_code=osc_code,
                rate=rate, interpret=interpret, sum_groups=sg_part,
                blocks_per_seg=blocks_per_seg)
            for j in range(lanes // LG)], axis=2)
        if sum_groups and sum_groups > LANE_GROUP:
            return cols.reshape(n_segments, seg_frames, -1,
                                sum_groups // LANE_GROUP).sum(axis=3)
        return cols
    return _segments_gen_cv(int(n_segments), int(seg_frames), int(context),
                            int(osc_code), int(rate), bool(interpret),
                            int(sum_groups),
                            int(blocks_per_seg))(coeffs, toff, lanef)


def _sosfilt_segments_gen_impl(coeffs, toff, lanef, *, n_segments: int,
                               seg_frames: int, context: int,
                               osc_code: int, rate: int, interpret: bool,
                               sum_groups: int, blocks_per_seg: int = 1):
    import jax.numpy as jnp

    nsec = coeffs.shape[1]
    sel = _seg_coeff_sel(coeffs, nsec, n_segments, n_segments, 1,
                         LANE_GROUP)
    if blocks_per_seg > 1:
        # whole-segment coefficient blocks: each lane group's m tiles
        # ride ONE BlockSpec block (fetched once per segment and sliced
        # in-kernel), so the fetch amortizes over the segment's chunks
        sel = sel.reshape(nsec, 5, n_segments // blocks_per_seg,
                          blocks_per_seg * 8, 128)
    toff = toff.reshape(8, 128)
    lanef = lanef.reshape(3, 8, 128)
    inv_row = jnp.full((1, 8, 128), jnp.float32(1.0 / rate),
                       dtype=jnp.float32)
    lanef = jnp.concatenate([lanef, inv_row], axis=0)
    call = _build_seg_gen_call(nsec, n_segments, seg_frames, context,
                               interpret, osc_code, sum_groups,
                               blocks_per_seg)
    y = call(sel, toff, lanef)
    # m > 1: the kernel returns (n_segments/m, m*seg_frames, ...) —
    # contiguous per-block rows, so the block-major views are reshapes
    if sum_groups:
        return y[:, :, :LANE_GROUP // sum_groups].reshape(
            n_segments, seg_frames, LANE_GROUP // sum_groups)
    return y.reshape(n_segments, seg_frames, LANE_GROUP)


def _gen_source_rows(toff, lanef, *, n_segments: int, seg_frames: int,
                     context: int, osc_code: int, rate: int, seg0=0):
    """Pure-JAX mirror of the generator kernel's in-kernel synthesis
    (:func:`_seg_kernel_gen`): ``(n_segments, context + seg_frames,
    LANE_GROUP)`` input rows from per-lane oscillator parameters (for
    segments ``seg0..seg0 + n_segments``, ``seg0`` possibly traced —
    the chunked-VJP path synthesizes per chunk).  Same op sequence as
    the kernel (up to the inv_rate constant folding, which only matters
    for bit-exactness, not gradients)."""
    import jax.numpy as jnp

    f32 = jnp.float32
    seg = ((jnp.int32(seg0) + jnp.arange(n_segments, dtype=jnp.int32))
           * jnp.int32(seg_frames))[:, None, None]
    row = jnp.arange(context + seg_frames,
                     dtype=jnp.int32)[None, :, None]
    t_i = toff[None, None, :] + seg + row
    tf = t_i.astype(f32)
    hz = lanef[0][None, None, :]
    ph = lanef[1][None, None, :]
    amp = lanef[2][None, None, :]
    inv_rate = f32(1.0 / rate)

    def frac(v):
        return v - jnp.floor(v)

    turns = frac(tf * inv_rate * hz)
    tt = frac(turns + ph)
    if osc_code == OSC_SINE:
        from signals_tpu.core.mathx import sin2pi_f32
        x = sin2pi_f32(jnp, tt)
    elif osc_code == OSC_SQUARE:
        x = jnp.sign(f32(0.5) - frac(tt))
    elif osc_code == OSC_SAW:
        x = f32(2.0) * frac(tt - f32(0.5)) - f32(1.0)
    else:                                   # OSC_TRIANGLE
        t3 = tt - f32(0.25)
        x = ((f32(4.0) * (f32(0.5) * frac(t3 * f32(2.0))) - f32(1.0))
             * jnp.sign(frac(t3) - f32(0.5)))
    return jnp.where(t_i >= 0, amp * x, f32(0.0))


# --- autodiff: custom VJPs for the kernel entrypoints -------------------------
#
# Mosaic kernels have no JVP/transpose rules, so ``jax.value_and_grad``
# through a compiled patch on the TPU fast paths (packed streams, mega
# filters, the mix epilogue, the generator cascade) used to raise.  Every
# public entrypoint above is wrapped in ``jax.custom_vjp``: the primal
# stays the Pallas kernel; the backward differentiates the pure-JAX
# associative-scan reference of the SAME math (a vmap of
# ``filters.sosfilt_scan`` — the function the kernels are parity-tested
# against in ``tests/test_pallas_kernels.py``), so gradients are exact
# for the scan lowering and match the kernel's values to f32
# reassociation.  The backward re-runs the scan forward once (as its own
# residuals) plus the scan backward — a cost paid only by training steps
# (``learn.fit``), never by plain renders.


def _make_cv(prim, ref, nondiff_idx=()):
    """``jax.custom_vjp`` wrapper: primal/fwd = ``prim`` (the Pallas
    path), bwd = VJP of ``ref`` (the scan reference) at the primal
    inputs.  ``nondiff_idx``: positional indices of integer-dtype array
    args (their cotangent is ``float0``)."""
    import jax

    f = jax.custom_vjp(prim)

    def fwd(*args):
        return prim(*args), args

    def bwd(res, g):
        diff_idx = [i for i in range(len(res)) if i not in nondiff_idx]

        def at_diff(*dargs):
            full = list(res)
            for i, a in zip(diff_idx, dargs):
                full[i] = a
            return ref(*full)

        _, vjp = jax.vjp(at_diff, *[res[i] for i in diff_idx])
        cts = iter(vjp(g))
        return tuple(
            np.zeros(np.shape(res[i]), dtype=jax.dtypes.float0)
            if i in nondiff_idx else next(cts)
            for i in range(len(res)))

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=64)
def _pallas_cv(interpret: bool):
    from signals_tpu.compiler.filters import sosfilt_scan

    return _make_cv(
        functools.partial(_sosfilt_pallas_impl, interpret=interpret),
        sosfilt_scan)


@functools.lru_cache(maxsize=64)
def _batch_cv(tail: int, interpret: bool):
    import jax

    from signals_tpu.compiler.filters import sosfilt_scan

    def prim(coeffs, x_t):
        return _sosfilt_batch_impl(coeffs, x_t, interpret=interpret,
                                   tail=tail)

    def ref(coeffs, x_t):
        import jax.numpy as jnp
        L, B, ch = x_t.shape
        if B <= REF_CHUNK_SEGMENTS:
            y = jax.vmap(sosfilt_scan, in_axes=(0, 1),
                         out_axes=1)(coeffs, x_t)
            return y[L - tail:]
        # checkpointed segment chunks (see REF_CHUNK_SEGMENTS): bwd peak
        # memory = one chunk's scan intermediates
        CH = REF_CHUNK_SEGMENTS
        n_pad = -(-B // CH) * CH
        xb = jnp.pad(x_t.transpose(1, 0, 2),
                     ((0, n_pad - B), (0, 0), (0, 0)))
        cb = jnp.pad(coeffs, ((0, n_pad - B), (0, 0), (0, 0), (0, 0)))

        @jax.checkpoint
        def chunk_fn(args):
            co_c, x_c = args
            y = jax.vmap(sosfilt_scan)(co_c, x_c)     # (CH, L, ch)
            return y[:, L - tail:]

        y = jax.lax.map(chunk_fn, (cb.reshape((n_pad // CH, CH)
                                              + cb.shape[1:]),
                                   xb.reshape((n_pad // CH, CH)
                                              + xb.shape[1:])))
        y = y.reshape((n_pad,) + y.shape[2:])[:B]     # (B, tail, ch)
        return y.transpose(1, 0, 2)

    return _make_cv(prim, ref)


#: backward-pass segment chunking: above this many segments the scan
#: reference runs as a ``lax.map`` of ``jax.checkpoint``-ed chunks, so
#: the VJP's peak memory is one chunk's scan intermediates instead of
#: the whole batch's (a 60 s 64-voice fit would otherwise hold ~15 GB
#: of associative-scan residuals — over HBM).  Exact: chunking only
#: reorders identical per-segment computations.
REF_CHUNK_SEGMENTS = 64


def _chunked_segments_ref(n_segments, seg_frames, context, sum_groups,
                          seg_ref):
    """``seg_ref(coeffs_chunk, xb_chunk) -> (chunk, F, ch')`` lifted to
    the full segment batch: plain vmap when small, checkpointed
    ``lax.map`` over :data:`REF_CHUNK_SEGMENTS`-segment chunks when
    large."""
    import jax
    import jax.numpy as jnp

    def ref(coeffs, x):
        def gather(seg0, count):
            idx = (seg0 * seg_frames
                   + jnp.arange(count)[:, None] * seg_frames
                   + jnp.arange(context + seg_frames)[None, :])
            return x[idx]                      # (count, C+F, ch)

        if n_segments <= REF_CHUNK_SEGMENTS:
            yb = seg_ref(coeffs, gather(0, n_segments))
        else:
            CH = REF_CHUNK_SEGMENTS
            n_pad = -(-n_segments // CH) * CH
            cpad = jnp.pad(coeffs, ((0, n_pad - n_segments),) + ((0, 0),)
                           * (coeffs.ndim - 1))
            co_chunks = cpad.reshape((n_pad // CH, CH) + cpad.shape[1:])
            starts = jnp.arange(n_pad // CH, dtype=jnp.int32) * CH

            @jax.checkpoint
            def chunk_fn(args):
                co_c, s0 = args
                return seg_ref(co_c, gather(s0, CH))

            yb = jax.lax.map(chunk_fn, (co_chunks, starts))
            yb = yb.reshape((n_pad,) + yb.shape[2:])[:n_segments]
        if sum_groups:
            yb = yb.reshape(n_segments, seg_frames, -1,
                            sum_groups).sum(axis=3)
        return yb

    return ref


@functools.lru_cache(maxsize=64)
def _segments_cv(n_segments: int, seg_frames: int, context: int,
                 interpret: bool, sum_groups: int,
                 blocks_per_seg: int = 1):
    import jax

    from signals_tpu.compiler.filters import sosfilt_scan

    m = max(1, int(blocks_per_seg))

    def prim(coeffs, x):
        return _sosfilt_segments_impl(
            coeffs, x, n_segments=n_segments, seg_frames=seg_frames,
            context=context, interpret=interpret, sum_groups=sum_groups,
            blocks_per_seg=m)

    if m == 1:
        def seg_ref(co_c, xb_c):
            return jax.vmap(sosfilt_scan)(co_c, xb_c)[:, context:, :]

        return _make_cv(prim, _chunked_segments_ref(
            n_segments, seg_frames, context, sum_groups, seg_ref))

    # carry mode: the reference threads per-block coefficients through
    # each m-block segment with sosfilt_stream — the kernel's semantics
    # exactly (context warmup under block 0's coeffs, carried state)
    unit_frames = m * seg_frames

    def seg_ref(co_c, xb_c):
        from signals_tpu.compiler.filters import sosfilt_stream
        import jax.numpy as jnp

        def one_seg(co_m, xw):
            # co_m: (m, nsec, ch, 11); xw: (C + m*F, ch)
            nsec_, ch = co_m.shape[1], xw.shape[1]
            z = jnp.zeros((nsec_, 2, ch), dtype=jnp.float32)
            if context:
                _, z = sosfilt_stream(co_m[0], xw[:context], z)

            def body(z, args):
                co_b, xb = args
                yb, z2 = sosfilt_stream(co_b, xb, z)
                return z2, yb

            xb = xw[context:].reshape(m, seg_frames, ch)
            _, ys = jax.lax.scan(body, z, (co_m, xb))
            return ys.reshape(unit_frames, ch)

        return jax.vmap(one_seg)(co_c, xb_c)

    inner = _chunked_segments_ref(n_segments // m, unit_frames, context,
                                  0, seg_ref)

    def ref(coeffs, x):
        co_m = coeffs.reshape((n_segments // m, m) + coeffs.shape[1:])
        yb = inner(co_m, x)
        yb = yb.reshape(n_segments, seg_frames, yb.shape[-1])
        if sum_groups:
            yb = yb.reshape(n_segments, seg_frames, -1,
                            sum_groups).sum(axis=3)
        return yb

    return _make_cv(prim, ref)


@functools.lru_cache(maxsize=64)
def _segments_gen_cv(n_segments: int, seg_frames: int, context: int,
                     osc_code: int, rate: int, interpret: bool,
                     sum_groups: int, blocks_per_seg: int = 1):
    import jax

    from signals_tpu.compiler.filters import sosfilt_scan

    m = max(1, int(blocks_per_seg))

    def prim(coeffs, toff, lanef):
        return _sosfilt_segments_gen_impl(
            coeffs, toff, lanef, n_segments=n_segments,
            seg_frames=seg_frames, context=context, osc_code=osc_code,
            rate=rate, interpret=interpret, sum_groups=sum_groups,
            blocks_per_seg=m)

    seg_total = m * seg_frames
    n_carry = n_segments // m         # state-carry segments

    def chunk(co_c, toff, lanef, s0, count):
        # co_c: (count, m, nsec, ch, 11) per-block coeffs of `count`
        # carry segments starting at segment index s0
        x = _gen_source_rows(toff, lanef, n_segments=count,
                             seg_frames=seg_total, context=context,
                             osc_code=osc_code, rate=rate, seg0=s0)
        if m == 1:
            return jax.vmap(sosfilt_scan)(co_c[:, 0], x)[:, context:, :]

        from signals_tpu.compiler.filters import sosfilt_stream
        import jax.numpy as jnp

        def one_seg(co_m, xw):
            # the kernel's m-block carry semantics exactly: context rows
            # warm up from zero under block 0's coeffs, then the state
            # threads through the m blocks with per-block coeffs
            nsec_, ch = co_m.shape[1], xw.shape[1]
            z0 = jnp.zeros((nsec_, 2, ch), dtype=jnp.float32)
            _, z = sosfilt_stream(co_m[0], xw[:context], z0)

            def body(z, args):
                co_b, xb = args
                yb, z2 = sosfilt_stream(co_b, xb, z)
                return z2, yb

            xb = xw[context:].reshape(m, seg_frames, ch)
            _, ys = jax.lax.scan(body, z, (co_m, xb))
            return ys.reshape(seg_total, ch)

        return jax.vmap(one_seg)(co_c, x)

    def ref(coeffs, toff, lanef):
        import jax.numpy as jnp
        co_m = coeffs.reshape((n_carry, m) + coeffs.shape[1:])
        # each carry segment is m blocks long: shrink the chunk so bwd
        # peak memory stays one REF_CHUNK_SEGMENTS-block window
        CH = max(1, REF_CHUNK_SEGMENTS // m)
        if n_carry <= CH:
            yb = chunk(co_m, toff, lanef, 0, n_carry)
        else:
            # checkpointed chunks: bwd peak memory = one chunk's scan
            # intermediates (see REF_CHUNK_SEGMENTS); synthesis is
            # recomputed per chunk, which is nearly free
            n_pad = -(-n_carry // CH) * CH
            cpad = jnp.pad(co_m, ((0, n_pad - n_carry),) + ((0, 0),)
                           * (co_m.ndim - 1))
            co_chunks = cpad.reshape((n_pad // CH, CH) + cpad.shape[1:])
            starts = jnp.arange(n_pad // CH, dtype=jnp.int32) * CH

            @jax.checkpoint
            def chunk_fn(args):
                co_c, s0 = args
                return chunk(co_c, toff, lanef, s0, CH)

            yb = jax.lax.map(chunk_fn, (co_chunks, starts))
            yb = yb.reshape((n_pad,) + yb.shape[2:])[:n_carry]
        yb = yb.reshape(n_segments, seg_frames, yb.shape[-1])
        if sum_groups:
            yb = yb.reshape(n_segments, seg_frames, -1,
                            sum_groups).sum(axis=3)
        return yb

    return _make_cv(prim, ref, nondiff_idx=(1,))
