"""The patch compiler: one fused XLA program per patch.

The reference *interprets* the node graph per block — depth-first Python
recursion with per-node dispatch and per-port shape checks on the audio
thread (``src/signals/chain/dev.py:167-179`` →
``chain/__init__.py:256-315``).  This module performs the architectural
inversion: the patch DAG is traced **once** into a single jitted function

    ``step(params, carry, position, host) -> (block, carry', taps)``

and rendering is ``jax.lax.scan`` over block positions — no Python in the
hot loop, every node fused by XLA onto the VPU/MXU.

Key mechanics
-------------

* **Windows.**  Every reference request loc maps to a static ``Window
  (offset, frames)`` relative to the block start: the main block is
  ``(0, F)``, block-rate sampling is ``(offset, 1)``
  (``forward_at_block_rate``), and filter context is the pair
  ``(offset-C, C)`` + ``(offset, F)`` (``forward_with_context``).  Lowering
  is memoized per ``(node, window)`` — fan-out becomes SSA sharing, which
  subsumes the reference's per-node block cache (``chain/__init__.py:420-457``).
* **Start-of-timeline.**  The reference clamps context windows at position 0
  (``BlockLoc.before``); compiled shapes are static, so context frames before
  0 are instead zero-masked — identical through any zero-initial-state causal
  filter.
* **Traced vs structural state.**  Traced params (constants' values, seeds,
  ``enabled``) are program inputs — editable per step without recompiling.
  Structural state (channel counts, file paths, delay lengths) is baked in;
  the compile cache is keyed by a canonical graph hash that covers it.
* **Stateful nodes** (delay lines, envelopes) thread a carry pytree through
  the scan; each also keeps an output-history ring in the carry so context
  windows reaching *before* the current block are served statically.
* **Host boundary.**  File readers / capture devices become program inputs
  (staged per scan); visualization taps and file writers become extra
  program outputs delivered to the nodes after each device step.
"""

from __future__ import annotations

import hashlib
import typing

import numpy as np

from signals_tpu import PortName, SignalFlags
from signals_tpu.core import ChainLayerError
from signals_tpu.graph import (
    Emitter,
    KernelCtx,
    Receiver,
    StatefulEmitter,
)

F32 = np.float32


class CompileError(ChainLayerError):
    pass


class Window(typing.NamedTuple):
    """A static request window relative to the current render position.

    ``stride`` > 1 makes it a *grid window*: ``frames`` one-frame samples
    spaced ``stride`` apart (frame k at ``offset + k*stride``) — how
    block-rate control signals are lowered in the mega-window render mode
    (one sample per block, for all blocks, in one trace).
    """
    offset: int
    frames: int
    stride: int = 1

    @property
    def end(self) -> int:
        return self.offset + (self.frames - 1) * self.stride + 1


class _NodeInfo:
    """Per-node compile-time record."""

    def __init__(self, node: Emitter, uid: str):
        self.node = node
        self.uid = uid
        self.windows: set[Window] = set()

    @property
    def min_offset(self) -> int:
        return min((w.offset for w in self.windows), default=0)


def _is_delay(node) -> bool:
    from signals_tpu.nodes.delay import Delay
    return isinstance(node, Delay)


def _is_grid_stateless(node) -> bool:
    """Node offering a carry-free grid-history lowering (``grid_kernel``) —
    the compiler prefers it over the step/carry path because patches
    without carry render loop-free."""
    return getattr(node, 'is_grid_stateless', False)


def _is_stateful(node) -> bool:
    return isinstance(node, StatefulEmitter) and node.is_stateful()


def _is_tap(node) -> bool:
    return bool(node.flags() & (SignalFlags.VIS | SignalFlags.RECORDER))


def _is_host_source(node) -> bool:
    return getattr(node, 'is_host_source', False)


def _subgraph_streamable(node) -> bool:
    """Whether ``node``'s upstream closure can lower at arbitrary
    block-aligned sub-windows of a mega window: every node is either plain
    stateless or grid-stateless (pure functions of absolute frames), and
    none is a tap (taps register their output at the *main* window only —
    lowering them solely at stream sub-windows would drop their feed)."""
    seen: set = set()

    def walk(n) -> bool:
        if id(n) in seen:
            return True
        seen.add(id(n))
        if _is_delay(n) or _is_host_source(n) or _is_tap(n):
            return False
        if _is_stateful(n) and not _is_grid_stateless(n):
            return False
        return all(walk(p.sig) for p in getattr(n, '_ports', {}).values()
                   if p.sig is not None)

    return walk(node)


def _packed_k_ok(k, kmax, n_blocks, filters, block_frames,
                 ctx_extra=0, *, min_k=2) -> bool:
    """Sanity gate for a packed-stream count ``k`` — the ONE copy of the
    eligibility rules shared by the base planner's k-search
    (:meth:`CompiledPatch.packed_mega_streams`) and the mix plan's
    full-group override (:meth:`CompiledPatch._mix_plan_k`), so the two
    can never silently drift.

    Floor: short batches (the 8-block realtime render-ahead call) keep
    the per-block vmap path — packing there buys nothing and would break
    its bit-stability across batch sizes.  Cap: padding streams render
    the timeline's true continuation and are dropped, but covering more
    than twice the requested blocks is waste no layout bonus justifies.
    ``ctx_extra`` (frames of non-filter context windows, e.g. a long-IR
    :class:`~signals_tpu.nodes.conv.Convolve`) is re-pulled *per stream*:
    packing is declined when that redundancy exceeds one extra pass of
    the batch — the single mega window (which pulls context once) wins
    there.
    """
    return (min_k <= k <= kmax and n_blocks >= max(16, 2 * k)
            and k * (-(-n_blocks // k)) <= 2 * n_blocks
            and k * ctx_extra <= n_blocks * block_frames
            and all(f.packed_lane_fit(k, block_frames) is not None
                    for f in filters))


def _voice_linear_to_root(filt, root) -> bool:
    """Soundness proof for the mix epilogue
    (:meth:`CompiledPatch.packed_mega_mix`): every path from ``filt``'s
    output to ``root`` is *linear in the filter output* with
    *voice-broadcast* (channels == 1) multiplicative coefficients, so the
    voice sum commutes with the whole post-filter chain:
    ``sum_v root_v = A * sum_v y_v + sum_v root_v|_{y:=0}`` with ``A``
    voice-constant.

    Allowed path node types (the filter's downstream closure):

    * ``Mix`` — affine in left/right; the ``mix`` weight must be
      non-descended and mono (it multiplies).
    * ``RingMod`` — exactly one side descended; the other side must be
      mono (it is the coefficient).
    * ``Gain`` — descended through ``left`` only (``right`` is the
      block-rate gain side: a descended gain would be *block-sampled*,
      which the full-rate sum identity does not cover); ``right`` mono.

    ``enabled`` gating preserves linearity (``where(e, lin, 0)``).
    Anything else (Amp/Drive power laws, shape ops, taps) rejects.
    """
    from signals_tpu.nodes.fx import Gain, Mix, RingMod
    desc = {id(filt)}
    frontier = [filt]
    path_nodes = []
    while frontier:
        n = frontier.pop()
        for _pname, recv in n._outputs:
            if id(recv) not in desc:
                desc.add(id(recv))
                path_nodes.append(recv)
                frontier.append(recv)
    if id(root) not in desc:
        return False
    for n in path_nodes:
        t = type(n)
        if t is Mix:
            msig = n._ports['mix'].sig
            if msig is not None and (id(msig) in desc
                                     or msig.channels != 1):
                return False
        elif t in (Gain, RingMod):
            dports = [p for p in ('left', 'right')
                      if (s := n._ports[p].sig) is not None
                      and id(s) in desc]
            if t is Gain and dports != ['left']:
                return False
            if t is RingMod and len(dports) != 1:
                return False
            other = 'right' if dports == ['left'] else 'left'
            osig = n._ports[other].sig
            if osig is not None and osig.channels != 1:
                return False
        else:
            return False
    return True


class _GraphIndex:
    """Stable node numbering + the canonical structural hash."""

    def __init__(self, root: Emitter, block_frames: int, rate: int,
                 channels: int):
        from signals_tpu.compiler import filters as _filters
        self.block_frames = block_frames
        self.rate = rate
        self.channels = channels
        #: SEG_SOURCE_GEN snapshot: the flag is read here, where the
        #: graph hash that keys the compile cache is computed, and
        #: NOWHERE later — traces happen lazily (render_fn on first
        #: call), so consulting the mutable global at trace time would
        #: let a flag flip make a patch's traces disagree with its hash
        #: (and with the packed_gen_engaged probe)
        self.seg_source_gen = _filters.resolve_seg_source_gen()
        #: SEG_CARRY_BLOCKS snapshot, same contract as above
        self.seg_carry_blocks = _filters.resolve_seg_carry_blocks()
        self.infos: dict[int, _NodeInfo] = {}
        self.order: list[Emitter] = []
        self._walk(root)

    def _walk(self, node: Emitter) -> None:
        if id(node) in self.infos:
            return
        uid = f'n{len(self.order)}'
        self.infos[id(node)] = _NodeInfo(node, uid)
        self.order.append(node)
        if isinstance(node, Receiver):
            for name in node.port_names():
                inp = node._ports[name].sig
                if inp is not None:
                    self._walk(inp)

    def info(self, node: Emitter) -> _NodeInfo:
        return self.infos[id(node)]

    def graph_hash(self) -> str:
        from signals_tpu.compiler import filters as _filters
        h = hashlib.sha3_256()
        h.update(f'F={self.block_frames};R={self.rate};C={self.channels};'
                 f'I={_filters.FILTER_IMPL};M={_filters.MEGA_FILTER_IMPL};'
                 f'G={self.seg_source_gen};B={self.seg_carry_blocks}'
                 .encode())
        for node in self.order:
            info = self.info(node)
            h.update(f'|{info.uid}:{node.cls_name()}'.encode())
            state = node.get_state()
            for name in sorted(type(state).param_names()):
                param = type(state)._params[name]
                if param.traced:
                    # traced values are inputs; only array *shape* is
                    # structural (channel inference reads it)
                    v = getattr(state, name)
                    if isinstance(v, np.ndarray):
                        h.update(f';{name}@{v.shape}'.encode())
                else:
                    h.update(f';{name}={getattr(state, name)!r}'.encode())
            extra = getattr(node, 'structural_extra', None)
            if extra is not None:
                # node-defined structural identity beyond its params —
                # e.g. Convolve folds the IR file's (mtime, taps) in so
                # an on-disk edit recompiles instead of serving the
                # baked-in stale spectrum
                h.update(f';X={extra()}'.encode())
            if isinstance(node, Receiver):
                for pname in node.port_names():
                    inp = node._ports[pname].sig
                    if inp is not None:
                        h.update(f';{pname}<-{self.info(inp).uid}'.encode())
        return h.hexdigest()


# --- window-collection pass (dry run with dummy numpy blocks) ---------------


class _CollectCtx(KernelCtx):
    """Runs kernels on zero-filled numpy blocks purely to discover which
    windows each node requests of its inputs (and so how much history
    stateful nodes must retain)."""

    xp = np

    def __init__(self, compiler: '_Compiler', node: Emitter, window: Window):
        self.compiler = compiler
        self.node = node
        self.window = window
        self.rate = compiler.rate
        self.nframes = window.frames

    @property
    def frame_range(self):
        return np.zeros((self.nframes, 1), dtype=F32)

    @property
    def frame_range_int(self):
        return np.zeros((self.nframes, 1), dtype=np.int32)

    def _input(self, name: PortName) -> typing.Optional[Emitter]:
        return self.node._ports[name].sig

    def _dummy(self, inp: typing.Optional[Emitter], frames: int):
        ch = 1 if inp is None else inp.channels
        return np.zeros((frames, ch), dtype=F32)

    def in_(self, name: PortName):
        inp = self._input(name)
        if inp is not None:
            self.compiler.collect(inp, self.window)
        return self._dummy(inp, self.nframes)

    def in_block_rate(self, name: PortName):
        inp = self._input(name)
        if inp is not None:
            if self.window.stride > 1:
                # mirrors LowerCtx.in_block_rate: a grid-sampled node
                # samples its block-rate inputs at the same grid
                self.compiler.collect(inp, self.window)
            else:
                self.compiler.collect(inp, Window(self.window.offset, 1))
        return self._dummy(inp, 1 if self.window.stride == 1
                           else self.window.frames)

    def in_context(self, name: PortName, context_frames: int):
        inp = self._input(name)
        if inp is not None:
            self.compiler.collect(
                inp, Window(self.window.offset - context_frames,
                            context_frames))
            self.compiler.collect(inp, self.window)
        return self._dummy(inp, context_frames + self.nframes)

    def in_grid_samples(self, name: PortName, stride: int, count: int,
                        ahead: int = 0):
        # mirrors LowerCtx.in_grid_samples exactly: one strided window,
        # oldest first, newest ``ahead`` grid steps past the anchor
        inp = self._input(name)
        if inp is not None:
            anchor_off = stride * (self.window.offset // stride)
            start = anchor_off - (count - 1 - ahead) * stride
            self.compiler.collect(inp, Window(start, count, stride=stride))
        return self._dummy(inp, count)

    def in_channels(self, name: PortName) -> typing.Optional[int]:
        inp = self._input(name)
        return None if inp is None else inp.channels

    def param(self, name: str):
        return getattr(self.node._state, name)

    def sosfilt(self, coeffs, x):
        coeffs = np.asarray(coeffs)
        ch = max(coeffs.shape[1], x.shape[1])
        return np.zeros((x.shape[0], ch), dtype=F32)

    def sosfilt_stream(self, coeffs, x, zi):
        coeffs = np.asarray(coeffs)
        ch = max(coeffs.shape[1], x.shape[1], np.asarray(zi).shape[-1])
        return (np.zeros((x.shape[0], ch), dtype=F32),
                np.zeros_like(np.asarray(zi)))


# --- lowering pass -----------------------------------------------------------


class LowerCtx(KernelCtx):
    """Traces node kernels into the fused program (jax.numpy)."""

    def __init__(self, compiler: '_Compiler', node: Emitter, window: Window):
        import jax.numpy as jnp
        self.xp = jnp
        self.compiler = compiler
        self.node = node
        self.window = window
        self.rate = compiler.rate
        self.nframes = window.frames

    @property
    def block_grid(self):
        """(block_frames, n_blocks) when this window spans multiple blocks
        (the mega-window render mode), else None.  Kernels with block-rate
        internals (filters) branch on it."""
        w = self.window
        F = self.compiler.block_frames
        if (self.compiler.mega and w.stride == 1 and w.frames > F
                and w.frames % F == 0 and w.offset % F == 0):
            return F, w.frames // F
        return None

    @property
    def rate_f32(self):
        # barrier keeps XLA from algebraically rewriting rate arithmetic
        # (e.g. x/rate -> x * (1/rate)), which would break bit-parity with
        # the numpy pull engine
        import jax
        import jax.numpy as jnp
        return jax.lax.optimization_barrier(jnp.float32(self.rate))

    @property
    def inv_rate_f32(self):
        # barrier blocks reassociation of (x * inv_rate) * hz into
        # x * (inv_rate * hz), which would round differently from numpy
        import jax
        import jax.numpy as jnp
        return jax.lax.optimization_barrier(jnp.float32(1.0 / self.rate))

    def exact(self, x):
        import jax
        return jax.lax.optimization_barrier(x)

    @property
    def _frame_ints(self):
        import jax.numpy as jnp
        w = self.window
        return (self.compiler.position + jnp.int32(w.offset)
                + jnp.int32(w.stride)
                * jnp.arange(w.frames, dtype=jnp.int32).reshape(-1, 1))

    @property
    def frame_range(self):
        return self._frame_ints.astype(F32)

    @property
    def frame_range_int(self):
        return self._frame_ints

    def _input(self, name: PortName) -> typing.Optional[Emitter]:
        return self.node._ports[name].sig

    def in_(self, name: PortName):
        import jax.numpy as jnp
        inp = self._input(name)
        if inp is None:
            return jnp.zeros((1, 1), dtype=F32)
        return self.compiler.lower(inp, self.window)

    def in_block_rate(self, name: PortName):
        import jax.numpy as jnp
        inp = self._input(name)
        if inp is None:
            return jnp.zeros((1, 1), dtype=F32)
        grid = self.block_grid
        if grid is not None:
            # mega window: one sample per block, upsampled piecewise-
            # constant — identical per-frame values to per-block rendering
            F, n_blocks = grid
            g = self.in_block_rate_grid(name)
            return jnp.repeat(g, F, axis=0)
        if self.window.stride > 1:
            # this node is itself being sampled at a grid of positions
            # (a nested block-rate chain — e.g. an FM operator's phase
            # input — under a mega window): its block-rate inputs must be
            # sampled at the SAME grid, one value per grid position,
            # exactly as per-block rendering samples them at each block
            # start.  A single sample at the window offset here silently
            # froze every downstream modulator at its first-block value.
            return self.compiler.lower(inp, self.window)
        return self.compiler.lower(inp, Window(self.window.offset, 1))

    def in_block_rate_grid(self, name: PortName):
        """Raw per-block control samples ``(n_blocks, ch)`` of a mega
        window (for kernels that consume block-rate values structurally,
        e.g. filter coefficient design)."""
        import jax.numpy as jnp
        inp = self._input(name)
        F, n_blocks = self.block_grid
        if inp is None:
            return jnp.zeros((n_blocks, 1), dtype=F32)
        g = self.compiler.lower(
            inp, Window(self.window.offset, n_blocks, stride=F))
        return jnp.broadcast_to(g, (n_blocks, inp.channels))

    def in_grid_samples(self, name: PortName, stride: int, count: int,
                        ahead: int = 0):
        import jax.numpy as jnp
        inp = self._input(name)
        if inp is None:
            return jnp.zeros((count, 1), dtype=F32)
        ch = inp.channels
        # rendering positions are stride(=block)-aligned, so the absolute
        # grid maps to static window offsets; one strided window covers all
        # samples (oldest first)
        anchor_off = stride * (self.window.offset // stride)
        start = anchor_off - (count - 1 - ahead) * stride
        g = self.compiler.lower(inp, Window(start, count, stride=stride))
        g = jnp.broadcast_to(g, (count, ch))
        idx = (self.compiler.position + jnp.int32(start) + jnp.int32(stride)
               * jnp.arange(count, dtype=jnp.int32).reshape(-1, 1))
        return jnp.where(idx >= 0, g, F32(0.0))

    def in_context(self, name: PortName, context_frames: int):
        import jax.numpy as jnp
        inp = self._input(name)
        n, frames = context_frames, self.nframes
        if inp is None:
            return jnp.zeros((n + frames, 1), dtype=F32)
        ch = inp.channels
        before = self.compiler.lower(inp, Window(self.window.offset - n, n))
        main = self.compiler.lower(inp, self.window)
        x = jnp.concatenate([jnp.broadcast_to(before, (n, ch)),
                             jnp.broadcast_to(main, (frames, ch))], axis=0)
        # zero frames before the start of the timeline (reference clamps
        # them away, ``BlockLoc.before``; zeros are equivalent through a
        # zero-initial-state causal consumer)
        idx = (self.compiler.position + jnp.int32(self.window.offset - n)
               + jnp.arange(n + frames, dtype=jnp.int32).reshape(-1, 1))
        return jnp.where(idx >= 0, x, F32(0.0))

    def in_channels(self, name: PortName) -> typing.Optional[int]:
        inp = self._input(name)
        return None if inp is None else inp.channels

    @property
    def packed_family(self) -> typing.Optional[tuple]:
        """``(k, stream_frames)`` when the whole patch is being lowered as
        ``k`` packed timeline streams (:meth:`CompiledPatch.
        packed_mega_streams`), else None.  Filter kernels key off it to
        run ONE packed cascade for the whole family and serve each stream
        window a lane slice of it."""
        return getattr(self.compiler, 'packed_family', None)

    def at_window(self, offset: int, frames: int) -> 'LowerCtx':
        """A sibling ctx for the same node at another (window-coordinate)
        window — for kernels that coordinate work across a packed stream
        family."""
        return LowerCtx(self.compiler, self.node, Window(offset, frames))

    @property
    def family_memo(self) -> dict:
        """Per-trace scratch dict for family-wide memoization."""
        return self.compiler._memo

    def in_packed_streams(self, name: PortName, k: int, stream_frames: int,
                          context_frames: int, width: int):
        """Lower the input as ``k`` time-shifted stream windows packed on
        the channel axis: column block ``j`` holds the input over window
        ``[j*stream_frames - context_frames, (j+1)*stream_frames)`` (window
        coordinates), each stream broadcast to ``width`` channels —
        ``(context + stream_frames, k*width)`` total.

        Each stream is an *independently traced* expression, so XLA fuses
        the producers straight into the packed concat: the packed timeline
        materializes in one HBM write with no separate unpacked array and
        no copy pass (a materialize-then-concat pack of the same data
        measured 13.9 ms/2.7 GB on v5e — a full memory pass).  Streams
        past the mega range lower to the timeline's true continuation
        (callers drop the padded segments' output).

        Returns ``None`` when the input subgraph cannot lower at
        sub-windows (stateful/delay/host-fed/tap nodes) — callers fall
        back to packing a materialized window.

        Fan-out note: the per-stream windows share nothing with a
        main-window lowering of the same input (the memo is keyed by
        window), so an input that also feeds another consumer is
        *computed* twice.  That is the intended trade: producer compute
        fuses and is nearly free on this workload (a full 64-voice
        osc/env chain is ~5 ms/120 s), while the copy pass this avoids
        is a full HBM read+write.
        """
        import jax.numpy as jnp
        inp = self._input(name)
        if inp is None:
            return None
        if not _subgraph_streamable(inp):
            return None
        L = context_frames + stream_frames
        cols = []
        for j in range(k):
            off = self.window.offset + j * stream_frames - context_frames
            seg = self.compiler.lower(inp, Window(off, L))
            seg = jnp.broadcast_to(seg, (L, width))
            # pre-timeline context frames are zero (reference clamps them
            # away; same rule as in_context)
            idx = (self.compiler.position + jnp.int32(off)
                   + jnp.arange(L, dtype=jnp.int32).reshape(-1, 1))
            cols.append(jnp.where(idx >= 0, seg, F32(0.0)))
        return jnp.concatenate(cols, axis=1)

    def param(self, name: str):
        return self.compiler.node_param(self.node, name)

    def sosfilt(self, coeffs, x):
        from signals_tpu.compiler import filters as _filters
        return _filters.sosfilt(coeffs, x)

    def sosfilt_stream(self, coeffs, x, zi):
        from signals_tpu.compiler import filters as _filters
        return _filters.sosfilt_stream(coeffs, x, zi)


def _host_key(uid: str, w: Window) -> str:
    """Stable name of a host-staged input window (stride disambiguates a
    strided control-grid window from a contiguous one at the same span)."""
    suffix = f',{w.stride}' if w.stride != 1 else ''
    return f'{uid}@{w.offset},{w.frames}{suffix}'


class _Compiler:
    """One trace of one patch at one (block_frames, rate, channels)."""

    def __init__(self, index: _GraphIndex):
        self.index = index
        self.rate = index.rate
        self.block_frames = index.block_frames
        # set during trace:
        self.position = None
        self.params = None
        self.carry_in = None
        self.carry_out: dict = {}
        self.host = None
        self.taps: dict[str, typing.Any] = {}
        self._memo: dict[tuple[int, Window], typing.Any] = {}
        self._collected: set[tuple[int, Window]] = set()
        self._stateful_done: set[int] = set()
        self._delays_pending: set[int] = set()
        #: (block_frames, n_blocks) when tracing one mega window over the
        #: whole batch (LowerCtx.block_grid keys off it)
        self.mega: typing.Optional[tuple] = None
        #: (k, stream_frames) when the batch is lowered as k packed
        #: timeline streams (CompiledPatch.packed_mega_streams)
        self.packed_family: typing.Optional[tuple] = None
        #: whether this trace's window positions are guaranteed to start
        #: on absolute carry-segment boundaries (the render drivers align
        #: them; see CritFilter.swept_carry_m).  The segmented feedback
        #: scan, whose per-step positions shift freely, leaves it False —
        #: swept-carry filters then take the alignment-free TV scan.
        self.carry_aligned = False
        #: id(delay) -> full input timeline ``concat(buf, u)`` covering
        #: frames [-B, total) — set by the delay-mega solver
        #: (CompiledPatch.delay_mega_core); _lower_delay serves windows
        #: from it instead of the per-block carry read
        self.delay_solved: dict[int, typing.Any] = {}
        #: id(delay) -> float: substitute this delay's output with a
        #: constant (the g/h extraction traces of the affine loop solver)
        self.delay_const: dict[int, float] = {}
        #: id(node) -> float: substitute ANY node's lowered output with a
        #: constant — the linear-coefficient extraction traces of the mix
        #: epilogue (:meth:`CompiledPatch.packed_mega_mix`)
        self.node_const: dict[int, float] = {}

    # -- window collection --------------------------------------------------

    def collect(self, node: Emitter, window: Window) -> None:
        key = (id(node), window)
        if key in self._collected:
            return
        self._collected.add(key)
        info = self.index.info(node)
        info.windows.add(window)
        if window.end > self.block_frames:
            raise CompileError(
                f'window {window} of {node.cls_name()} extends past the '
                f'block end')
        if _is_host_source(node):
            return
        if _is_delay(node):
            # delay output comes from history; its input is pulled at the
            # main window each step
            inp = node._ports['input'].sig
            if inp is not None:
                self.collect(inp, Window(0, self.block_frames))
            return
        if _is_grid_stateless(node):
            for pname, stride, count in node.grid_windows(
                    self.block_frames, self.rate):
                inp = node._ports[pname].sig
                if inp is None:
                    continue
                # the exact strided window grid_kernel will request via
                # in_grid_samples: when this node is itself lowered at a
                # window spanning nb grid cells (nested grid nodes, mega
                # windows), it samples count + nb - 1 points with
                # ahead = nb - 1 — mirror that here or host-fed inputs
                # stage the wrong window
                anchor_off = stride * (window.offset // stride)
                nb = max(1, 1 + (window.end - 1 - anchor_off) // stride)
                total = count + nb - 1
                start = anchor_off - (count - 1) * stride
                self.collect(inp, Window(start, total, stride=stride))
            return
        if _is_stateful(node):
            # stateful nodes step once per block at the main window
            ctx = _CollectCtx(self, node, Window(0, self.block_frames))
            carry = node.init_carry(channels=node.channels, rate=self.rate,
                                    block_frames=self.block_frames)
            node.step(ctx, carry)
            return
        node.kernel(_CollectCtx(self, node, window))

    # -- param / carry plumbing ----------------------------------------------

    def node_param(self, node: Emitter, name: str):
        uid = self.index.info(node).uid
        return self.params[uid][name]

    @staticmethod
    def extract_params(index: _GraphIndex) -> dict:
        """Read traced param values off the live graph into the params
        pytree (called before every render, so edits take effect without
        recompiling)."""
        params: dict[str, dict[str, np.ndarray]] = {}
        for node in index.order:
            state = node.get_state()
            leaves = {}
            for pname, param in type(state)._params.items():
                if param.traced:
                    v = getattr(state, pname)
                    if isinstance(v, bool):
                        leaves[pname] = np.asarray(v)
                    elif isinstance(v, (int, np.integer)):
                        leaves[pname] = np.asarray(v, dtype=np.int32)
                    elif isinstance(v, np.ndarray):
                        leaves[pname] = np.asarray(v, dtype=F32)
                    else:
                        leaves[pname] = np.asarray(v, dtype=F32)
            if leaves:
                params[index.info(node).uid] = leaves
        return params

    def init_carry(self) -> dict:
        carry: dict[str, dict[str, np.ndarray]] = {}
        for node in self.index.order:
            info = self.index.info(node)
            hist = max(0, -info.min_offset)
            if _is_grid_stateless(node):
                continue            # lowered carry-free
            if _is_delay(node):
                carry[info.uid] = node.init_carry(
                    channels=node.channels, rate=self.rate,
                    block_frames=self.block_frames, history=hist)
            elif _is_stateful(node):
                c = node.init_carry(channels=node.channels, rate=self.rate,
                                    block_frames=self.block_frames)
                if hist > 0:
                    c['hist'] = np.zeros((hist, node.channels), dtype=F32)
                carry[info.uid] = c
        return carry

    # -- lowering -------------------------------------------------------------

    def lower(self, node: Emitter, window: Window):
        import jax.numpy as jnp
        key = (id(node), window)
        if key in self._memo:
            return self._memo[key]
        const = self.node_const.get(id(node))
        if const is not None:
            return jnp.full((1, 1), F32(const))
        info = self.index.info(node)
        uid = info.uid

        if _is_host_source(node):
            result = self.host[_host_key(uid, window)]
        elif _is_delay(node):
            result = self._lower_delay(node, window)
        elif _is_grid_stateless(node):
            ctx = LowerCtx(self, node, window)
            result = jnp.asarray(
                node.grid_kernel(ctx, self.block_frames), dtype=F32)
            enabled = self.node_param(node, 'enabled')
            result = jnp.where(enabled, result, F32(0.0))
        elif _is_stateful(node):
            result = self._lower_stateful(node, window)
        else:
            ctx = LowerCtx(self, node, window)
            result = jnp.asarray(node.kernel(ctx), dtype=F32)
            result = self._apply_enabled(node, window, result)

        main_frames = (self.mega[0] * self.mega[1] if self.mega
                       else self.block_frames)
        if _is_tap(node) and window == Window(0, main_frames):
            self.taps[uid] = jnp.broadcast_to(
                result, (main_frames, node.channels))
        self._memo[key] = result
        return result

    def _apply_enabled(self, node: Emitter, window: Window, result):
        import jax.numpy as jnp
        enabled = self.node_param(node, 'enabled')
        if node.flags() & SignalFlags.PASSTHRU:
            inp = node._ports['input'].sig
            alt = (jnp.zeros((1, 1), dtype=F32) if inp is None
                   else self.lower(inp, window))
            result, alt = jnp.broadcast_arrays(result, alt)
            return jnp.where(enabled, result, alt)
        return jnp.where(enabled, result, F32(0.0))

    def _serve_history(self, node: Emitter, window: Window, current):
        """Serve any sub-window of [-H, M) from history + the current main
        block (M = block frames, or the whole window in mega mode)."""
        import jax.numpy as jnp
        info = self.index.info(node)
        uid = info.uid
        hist = self.carry_in.get(uid, {}).get('hist')
        main_frames = (self.mega[0] * self.mega[1] if self.mega
                       else self.block_frames)
        cur = jnp.broadcast_to(current, (main_frames, node.channels))
        if hist is None:
            full = cur
            base = 0
        else:
            full = jnp.concatenate([hist, cur], axis=0)
            base = hist.shape[0]
        start = base + window.offset
        span = (window.frames - 1) * window.stride + 1
        if start < 0 or start + span > full.shape[0]:
            raise CompileError(
                f'{node.cls_name()} history too short for window {window}')
        return full[start:start + span:window.stride]

    def _lower_stateful(self, node: StatefulEmitter, window: Window):
        """One main-window step (``mega_step`` over the whole window in
        mega mode, ``step`` over one block otherwise), memoized; any
        other requested window — context lookbacks, block-rate samples,
        all non-future by the collect pass — is served from the node's
        ``hist`` carry ring + the main block via ``_serve_history``."""
        import jax.numpy as jnp
        info = self.index.info(node)
        uid = info.uid
        if self.mega is not None:
            F, nb = self.mega
            main = Window(0, nb * F)
            step = node.mega_step
        else:
            main = Window(0, self.block_frames)
            step = node.step
        mkey = (id(node), main)
        if id(node) not in self._stateful_done:
            self._stateful_done.add(id(node))
            ctx = LowerCtx(self, node, main)
            carry = {k: v for k, v in self.carry_in[uid].items()
                     if k != 'hist'}
            block, new_carry = step(ctx, carry)
            block = jnp.asarray(block, dtype=F32)
            block = jnp.broadcast_to(block, (main.frames, node.channels))
            enabled = self.node_param(node, 'enabled')
            block = jnp.where(enabled, block, F32(0.0))
            out_carry = dict(new_carry)
            if 'hist' in self.carry_in[uid]:
                h = self.carry_in[uid]['hist'].shape[0]
                out_carry['hist'] = jnp.concatenate(
                    [self.carry_in[uid]['hist'], block], axis=0)[-h:]
            self.carry_out[uid] = out_carry
            self._memo[mkey] = block
        current = self._memo[mkey]
        if window == main:
            return current
        return self._serve_history(node, window, current)

    def _lower_delay(self, node, window: Window):
        """Delay output is a pure read of the input-history ring; the input
        itself is lowered lazily at the main window (possibly *after* nodes
        that consume this output — that is what breaks feedback cycles).

        Two additional modes serve the loop-free delay solver
        (:meth:`CompiledPatch.delay_mega_core`): a *substituted* delay
        lowers to a constant (the affine g/h extraction traces), and a
        *solved* delay serves any window as a slice of its precomputed
        full input timeline."""
        import jax.numpy as jnp
        const = self.delay_const.get(id(node))
        if const is not None:
            return jnp.full((1, 1), F32(const))
        D = node.delay_frames(self.rate)
        solved = self.delay_solved.get(id(node))
        if solved is not None:
            # solved covers input frames [-B, total); output[t] = input[t-D]
            B = solved.shape[0] - (self.mega[0] * self.mega[1]
                                   if self.mega else self.block_frames)
            start = B - D + window.offset
            if start < 0:
                raise CompileError(
                    f'{node.cls_name()}: delay history too short for '
                    f'{window}')
            span = (window.frames - 1) * window.stride + 1
            out = solved[start:start + span:window.stride]
            enabled = self.node_param(node, 'enabled')
            return jnp.where(enabled, out, F32(0.0))
        info = self.index.info(node)
        uid = info.uid
        buf = self.carry_in[uid]['buf']          # (B, ch): frames [pos-B, pos)
        B = buf.shape[0]
        if D < window.end:
            raise CompileError(
                f'{node.cls_name()}: delay of {D} frames is shorter than '
                f'one block ({self.block_frames}); feedback delays must be '
                f'at least one block long')
        start = B + window.offset - D
        if start < 0:
            raise CompileError(
                f'{node.cls_name()}: delay buffer too short for {window}')
        span = (window.frames - 1) * window.stride + 1
        out = buf[start:start + span:window.stride]
        self._delays_pending.add(id(node))
        enabled = self.node_param(node, 'enabled')
        return jnp.where(enabled, out, F32(0.0))

    def finalize_delays(self, main: typing.Optional[Window] = None) -> None:
        """After the sink and taps are lowered, lower every delay's input at
        the main window and emit its buffer update.  Lowering one delay's
        input may reference other delays' outputs (their reads come from
        carry, so no cycle); every delay in the index gets its buffer
        advanced.  ``main`` defaults to the single-block window; the
        segmented feedback scan passes its whole-segment window."""
        import jax.numpy as jnp
        if main is None:
            main = Window(0, self.block_frames)
        for node in self.index.order:
            if not _is_delay(node):
                continue
            uid = self.index.info(node).uid
            buf = self.carry_in[uid]['buf']
            B = buf.shape[0]
            inp = node._ports['input'].sig
            if inp is None:
                block = jnp.zeros((main.frames, node.channels), dtype=F32)
            else:
                block = jnp.broadcast_to(
                    self.lower(inp, main),
                    (main.frames, node.channels))
            self.carry_out[uid] = {
                'buf': jnp.concatenate([buf, block], axis=0)[-B:]}

    def passthrough_carry(self) -> None:
        """Any carry entries not produced during lowering pass through."""
        for uid, c in self.carry_in.items():
            if uid not in self.carry_out:
                self.carry_out[uid] = c


class CompiledPatch:
    """A patch compiled at fixed (block_frames, rate, channels).

    ``step(params, carry, position, host)`` renders one block;
    ``render_fn(n_blocks)`` returns a jitted scan over that many blocks.
    ``params()`` re-reads traced state off the live graph, so node edits
    apply without recompilation.
    """

    def __init__(self, root: Emitter, *, block_frames: int, rate: int,
                 channels: int):
        import jax

        self.root = root
        self.block_frames = block_frames
        self.rate = rate
        self.channels = channels
        self.index = _GraphIndex(root, block_frames, rate, channels)
        self.graph_hash = self.index.graph_hash()

        compiler = _Compiler(self.index)
        # pass 1: discover windows (dry numpy run)
        compiler.collect(root, Window(0, block_frames))
        self.carry0 = compiler.init_carry()
        self._host_spec = self._collect_host_spec(compiler)
        self.tap_nodes = {
            self.index.info(n).uid: n for n in self.index.order
            if _is_tap(n)}

        index = self.index

        def step_core(params, carry, position, host):
            import jax.numpy as jnp
            comp = _Compiler(index)
            comp.params = params
            comp.carry_in = carry
            comp.position = position
            comp.host = host
            block = comp.lower(root, Window(0, block_frames))
            block = jnp.broadcast_to(block, (block_frames, channels))
            comp.finalize_delays()
            comp.passthrough_carry()
            return block, comp.carry_out, comp.taps

        self._step_core = step_core
        self.step = jax.jit(step_core, donate_argnums=(1,))
        self._render_cache: dict[int, typing.Any] = {}
        self._encoded_cache: dict[tuple, typing.Any] = {}
        self._vis_cache: dict[int, typing.Any] = {}
        self._align_sensitive_cache: dict[int, bool] = {}

    def _collect_host_spec(self, compiler: _Compiler) -> list[tuple]:
        """(node, window, key) for every host-fed input discovered in the
        collection pass."""
        spec = []
        seen = set()
        for node in self.index.order:
            if not _is_host_source(node):
                continue
            uid = self.index.info(node).uid
            for w in sorted(self.index.info(node).windows):
                key = _host_key(uid, w)
                if key not in seen:
                    seen.add(key)
                    spec.append((node, w, key))
        return spec

    # -- public API -----------------------------------------------------------

    def params(self) -> dict:
        return _Compiler.extract_params(self.index)

    def stage_host(self, position: int, n_blocks: int = 1) -> dict:
        """Read every host-fed input for ``n_blocks`` blocks starting at
        ``position``.  Returns key -> (n_blocks, frames, ch) arrays."""
        out = {}
        for node, w, key in self._host_spec:
            if w.stride == 1:
                out[key] = np.stack(
                    [node.host_read(
                        position + i * self.block_frames + w.offset,
                        w.frames, self.rate) for i in range(n_blocks)],
                    axis=0)
                continue
            # strided control-grid window: one frame per grid step.
            # Consecutive blocks share all but `step` grid points, so read
            # each unique point once and assemble the blocks by slicing.
            step, rem = divmod(self.block_frames, w.stride)
            if rem == 0:
                base0 = position + w.offset
                n_uniq = w.frames + (n_blocks - 1) * step
                uniq = np.concatenate(
                    [node.host_read(base0 + j * w.stride, 1, self.rate)
                     for j in range(n_uniq)], axis=0)
                out[key] = np.stack(
                    [uniq[i * step:i * step + w.frames]
                     for i in range(n_blocks)], axis=0)
                continue
            out[key] = np.stack(
                [np.concatenate(
                    [node.host_read(position + i * self.block_frames
                                    + w.offset + k * w.stride, 1, self.rate)
                     for k in range(w.frames)], axis=0)
                 for i in range(n_blocks)], axis=0)
        return out

    def _host_slice(self, staged: dict, i: int) -> dict:
        return {k: v[i] for k, v in staged.items()}

    #: scan unroll factor for the block loop.  Unrolling was measured NOT
    #: to improve honest (host-materialized) throughput on the axon TPU
    #: tunnel while inflating compile time several-fold, so the default is
    #: no unrolling; kept as a knob for directly-attached TPU hosts.
    scan_unroll = 1

    #: mega-window rendering (one traced window for the whole batch) is the
    #: default for compatible stateless patches: upstream audio is computed
    #: once (no per-block context re-evaluation) and filters run the
    #: batched VMEM-resident Pallas cascade on TPU — measured ~10x the
    #: per-block associative scan.  Set False to force per-block rendering.
    enable_mega = True

    #: plain (non-packed) mega only engages at this channel width or above
    #: for *stateless* patches: narrow frames-major (N, ch<8) arrays lay
    #: across mostly-idle VPU lanes, where the per-block vmapped path
    #: tiles better (measured on v5e).  Narrow stateless patches instead
    #: take the stream-packed path (:meth:`packed_mega_streams`, adaptive
    #: lane packing); stateful mega-steppable patches always prefer mega —
    #: their alternative is a sequential block scan, worse at any width.
    mega_min_channels = 8

    @property
    def _context_extra(self) -> int:
        """Frames of non-filter context windows in the patch (long-FIR
        nodes like :class:`~signals_tpu.nodes.conv.Convolve`).  The
        per-block path re-pulls this much upstream audio *every block*
        and the packed-stream path every stream; only the single mega
        window pulls it once — so both plan gates weigh it.  CritFilters
        are excluded: their (small) context is served by the batched /
        packed cascade machinery, not by per-window re-pulls."""
        from signals_tpu.nodes.fx import CritFilter
        return sum(n.context_frames() for n in self.index.order
                   if not isinstance(n, CritFilter))

    @property
    def _use_mega(self) -> bool:
        if not (self.enable_mega and self.mega_compatible):
            return False
        return (self.channels >= self.mega_min_channels
                or bool(self.carry0)
                # narrow stateless patches normally tile better per-block,
                # but a large context window (long-IR convolution) makes
                # per-block re-evaluation dominate: ctx/F x redundant
                # upstream compute per block vs one pull under mega
                or self._context_extra >= 4 * self.block_frames)

    @property
    def mega_compatible(self) -> bool:
        """Whether the patch can render a whole batch as one mega window:
        no delays (feedback is genuinely sequential), no host-fed sources,
        and any stateful node must offer either a carry-free grid lowering
        or a whole-window ``mega_step`` (e.g. streaming filters, whose
        carried state propagates through the window via an associative
        scan instead of a block loop).  Consumers may sample a
        mega-stepped node at any non-future window (context lookbacks,
        block-rate grids): the collect pass sizes a ``hist`` carry ring
        and the compiler serves those windows from history + the
        window-wide main block (``_Compiler._serve_history``)."""
        for node in self.index.order:
            if _is_delay(node) or _is_host_source(node):
                return False
            if _is_stateful(node) and not _is_grid_stateless(node):
                if not getattr(node, 'supports_mega_step', False):
                    return False
        return True

    def mega_core(self, n_blocks: int):
        """Un-jitted mega-window render ``(params, carry, position0, host)
        -> (blocks (n, F, ch), carry, taps)``: the whole batch is ONE
        traced window — controls lower to per-block grid samples, filters
        batch their context slices internally (warming state in VMEM via
        the batched Pallas cascade), upstream audio is computed exactly
        once.  Requires :attr:`mega_compatible`."""
        import jax.numpy as jnp
        index = self.index
        root = self.root
        channels = self.channels
        F = self.block_frames

        def many(params, carry, position0, host_staged):
            comp = _Compiler(index)
            comp.mega = (F, n_blocks)
            comp.carry_aligned = True
            comp.params = params
            comp.carry_in = carry
            comp.position = jnp.int32(position0)
            comp.host = {}
            block = comp.lower(root, Window(0, n_blocks * F))
            block = jnp.broadcast_to(block, (n_blocks * F, channels))
            comp.passthrough_carry()
            taps = {uid: t.reshape(n_blocks, F, -1)
                    for uid, t in comp.taps.items()}
            return block.reshape(n_blocks, F, channels), comp.carry_out, taps

        return many

    def delay_mega_plan(self):
        """The patch's :class:`~signals_tpu.compiler.feedback.DelayPlan`
        (cached), or None when its delay feedback cannot be solved
        loop-free.  See :mod:`signals_tpu.compiler.feedback`."""
        if not self.enable_mega:
            return None
        if not hasattr(self, '_delay_plan'):
            from signals_tpu.compiler import feedback
            self._delay_plan = feedback.plan_delays(
                self.index, self.block_frames, self.rate)
        return self._delay_plan

    def delay_mega_core(self, n_blocks: int, plan):
        """Un-jitted loop-free render of a delay/feedback patch: the whole
        batch is ONE mega window; each delay line is *solved* up front —
        out-of-cycle delays read their (already lowered) input timeline
        shifted, in-cycle delays solve the affine recurrence
        ``u[t] = g[t] u[t-D] + h[t]`` with one associative scan over
        D-frame segments (``g``/``h`` extracted by lowering the loop
        expression with the delay output substituted by 0 and 1 — sound
        because :func:`~signals_tpu.compiler.feedback.plan_delays` proved
        the loop frame-local affine).  Everything downstream then lowers
        exactly like :meth:`mega_core`.

        Semantics preserved from the per-block engine: block-quantized
        feedback (delay >= one block), buffer carry-in/out, ``enabled``
        gating on the delay output (buffer still advances while
        disabled), zero pre-timeline context.
        """
        import jax
        import jax.numpy as jnp
        index = self.index
        root = self.root
        channels = self.channels
        F = self.block_frames
        rate = self.rate
        total = n_blocks * F
        main = Window(0, total)

        def sub_trace(comp, inp, delay, const):
            """Lower ``inp`` at the main window with ``delay``'s output
            substituted by ``const`` (fresh memo: every value downstream
            of the substitution differs between traces; XLA CSEs the
            shared off-cycle subexpressions)."""
            sub = _Compiler(index)
            sub.mega = comp.mega
            sub.carry_aligned = comp.carry_aligned
            sub.params = comp.params
            sub.carry_in = comp.carry_in
            sub.position = comp.position
            sub.host = comp.host
            sub.delay_solved = comp.delay_solved
            sub.delay_const = {id(delay): const}
            return sub.lower(inp, main)

        def many(params, carry, position0, host_staged):
            comp = _Compiler(index)
            comp.mega = (F, n_blocks)
            comp.carry_aligned = True
            comp.params = params
            comp.carry_in = carry
            comp.position = jnp.int32(position0)
            comp.host = {}
            for node in plan.order:
                uid = index.info(node).uid
                inp = node._ports['input'].sig
                D = node.delay_frames(rate)
                buf = jnp.asarray(carry[uid]['buf'], dtype=F32)
                B = buf.shape[0]
                ch = node.channels
                if inp is None:
                    u = jnp.zeros((total, ch), dtype=F32)
                elif not plan.cyclic[id(node)]:
                    u = jnp.broadcast_to(comp.lower(inp, main), (total, ch))
                else:
                    h = jnp.broadcast_to(
                        sub_trace(comp, inp, node, 0.0), (total, ch))
                    g = jnp.broadcast_to(
                        sub_trace(comp, inp, node, 1.0), (total, ch)) - h
                    # a disabled delay outputs zeros (g drops out) but its
                    # buffer still advances with the input
                    enabled = comp.node_param(node, 'enabled')
                    g = jnp.where(enabled, g, F32(0.0))
                    pre = buf[B - D:]              # last D input frames
                    n_seg = -(-total // D)
                    pad = n_seg * D - total
                    gp = jnp.pad(g, ((0, pad), (0, 0))).reshape(
                        n_seg, D, ch)
                    hp = jnp.pad(h, ((0, pad), (0, 0))).reshape(
                        n_seg, D, ch)

                    def combine(older, newer):
                        oa, ob = older
                        na, nb_ = newer
                        return (na * oa, na * ob + nb_)

                    A, Bc = jax.lax.associative_scan(
                        combine, (gp, hp), axis=0)
                    u = (A * pre[None] + Bc).reshape(n_seg * D, ch)[:total]
                    if inp.channels == ch:
                        # SSA: downstream consumers of the loop node reuse
                        # the solved timeline instead of recomputing it
                        comp._memo[(id(inp), main)] = u
                in_full = jnp.concatenate([buf, u], axis=0)
                comp.delay_solved[id(node)] = in_full
                comp.carry_out[uid] = {'buf': in_full[-B:]}
            block = comp.lower(root, main)
            block = jnp.broadcast_to(block, (total, channels))
            # memo injection can cut taps / stateful nodes off the root
            # walk — force them so tap feeds and carries are produced
            for node in index.order:
                if _is_tap(node) or (
                        _is_stateful(node)
                        and not _is_grid_stateless(node)
                        and not _is_delay(node)):
                    comp.lower(node, main)
            comp.passthrough_carry()
            taps = {uid: t.reshape(n_blocks, F, -1)
                    for uid, t in comp.taps.items()}
            return block.reshape(n_blocks, F, channels), comp.carry_out, taps

        return many

    def segment_scan_core(self, n_blocks: int):
        """Segmented feedback scan, or None: the general fast path for
        delay feedback the closed-form solver rejects (nonlinear
        saturated loops, mutually-coupled ping-pong pairs, longer
        dependency cycles).

        Inside a window of ``S`` blocks with ``S * F <= D`` for every
        delay, every delay read is served entirely from the carried
        buffer — there is NO cycle within the window, whatever the loop
        topology — so the window lowers exactly like a mega window
        (stateful nodes mega-step, producers trace once over ``S*F``
        frames) and one ``lax.scan`` chains segments.  Per-step scan
        overhead is paid once per ``S`` blocks instead of per block, and
        each step is ``S``-fold wider vectorized work.

        ``S`` is the largest divisor of ``n_blocks`` within the delay
        bound when that divisor is near the bound (one trace, no tail);
        otherwise ``S`` is the bound itself and the remainder renders as
        one extra *tail* window after the scan (a second trace — e.g. a
        prime ``n_blocks = 13`` with ``S_max = 5`` runs 2 five-block
        segments + a 3-block tail instead of falling back to 13
        sequential block steps).  Semantics are identical to the
        per-block scan: block-quantized feedback, carried buffers,
        ``enabled`` gating, the same ``finalize_delays`` buffer advance.
        """
        import jax
        import jax.numpy as jnp
        if not self.enable_mega or n_blocks < 2:
            return None
        if not hasattr(self, '_segment_S'):
            from signals_tpu.compiler import feedback
            self._segment_S = feedback.segment_blocks(
                self.index, self.block_frames, self.rate)
        s_max = min(self._segment_S, n_blocks)
        if s_max < 2:
            return None
        S = max((s for s in range(1, s_max + 1) if n_blocks % s == 0),
                default=1)
        if S < max(2, s_max // 2):
            S = s_max                    # pay a tail trace for wide segments
        n_seg, rem = divmod(n_blocks, S)
        index = self.index
        root = self.root
        channels = self.channels
        F = self.block_frames

        def make_seg(s_blocks: int):
            main = Window(0, s_blocks * F)

            def seg(params, carry, position0):
                comp = _Compiler(index)
                comp.mega = (F, s_blocks)
                comp.params = params
                comp.carry_in = carry
                comp.position = jnp.int32(position0)
                comp.host = {}
                block = comp.lower(root, main)
                block = jnp.broadcast_to(block, (s_blocks * F, channels))
                comp.finalize_delays(main)
                comp.passthrough_carry()
                taps = {uid: t.reshape(s_blocks, F, -1)
                        for uid, t in comp.taps.items()}
                return (block.reshape(s_blocks, F, channels),
                        comp.carry_out, taps)

            return seg

        seg = make_seg(S)
        tail = make_seg(rem) if rem else None

        def many(params, carry, position0, host_staged):
            if n_seg == 1:
                blocks, carry2, taps = seg(params, carry, position0)
            else:
                def body(c, s):
                    blocks, c2, taps = seg(
                        params, c,
                        jnp.int32(position0) + s * jnp.int32(S * F))
                    return c2, (blocks, taps)

                carry2, (blocks, taps) = jax.lax.scan(
                    body, carry, jnp.arange(n_seg, dtype=jnp.int32))
                blocks = blocks.reshape(n_seg * S, F, channels)
                taps = {uid: t.reshape(n_seg * S, F, -1)
                        for uid, t in taps.items()}
            if tail is not None:
                tblocks, carry2, ttaps = tail(
                    params, carry2,
                    jnp.int32(position0) + jnp.int32(n_seg * S * F))
                blocks = jnp.concatenate([blocks, tblocks], axis=0)
                taps = {uid: jnp.concatenate([taps[uid], ttaps[uid]],
                                             axis=0)
                        for uid in taps}
            return blocks, carry2, taps

        return many

    def packed_mega_streams(self, n_blocks: int, *, force_k=None):
        """Stream-packed mega render plan, or ``None`` when ineligible.

        Splits the batch into ``k = 1024 // channels`` timeline *streams*
        and lowers the WHOLE patch once per stream window, side by side:
        stream ``j`` covers blocks ``[j*S, (j+1)*S)``.  Every elementwise
        node fuses per stream as usual, and a context filter lowers as ONE
        packed Pallas cascade serving each stream a lane slice
        (``CritFilter._family_kernel``) — so the filter's output is
        consumed *in packed layout* by its stream's downstream chain, and
        the (n*F, ch) block-major result is never materialized.  The
        caller reduces each stream (e.g. the polyphony master mix) and
        concatenates only the skinny reductions — on the 64-voice bench
        this removes the 2.7 GB unpack transpose entirely.

        Eligible when the patch is mega-compatible, carry-free, fully
        stream-lowerable (no stateful/delay/host/tap nodes), the voice
        width divides the 1024-lane kernel group, and every context
        filter's packed lane count fits the segment kernel.

        Returns ``(many, k, S)`` with
        ``many(params, carry, position0, host) -> (streams, carry')``,
        ``streams`` a length-``k`` list of ``(S*F, channels)`` arrays
        (blocks beyond ``n_blocks`` are the timeline's true continuation —
        drop them after reducing).
        """
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        V = self.channels
        if (V < 1 or self.carry0 or not self.enable_mega
                or not self.mega_compatible or n_blocks < 2):
            return None
        if not _subgraph_streamable(self.root):
            return None
        F = self.block_frames
        from signals_tpu.nodes.fx import CritFilter
        filters = [n for n in self.index.order
                   if isinstance(n, CritFilter)]
        # adaptive stream count: any k with k*V a sane lane width and
        # n_blocks >= k qualifies; cost = blocks actually rendered
        # (covered = k*ceil(n/k) — padding streams render the timeline's
        # continuation and are dropped), with a bonus for the full
        # 1024-lane group where the context-reuse ring kernel halves the
        # cascade's input DMA.  This is what lets narrow (mono) patches
        # lane-pack (k = 32, the segment kernel's minimum lane width)
        # instead of being locked out by a fixed k = 1024 // V.  k is
        # capped at 32 because every stream is an independently traced
        # copy of the whole patch — the price of the copy-free pack —
        # and hundreds of copies explode compile time.
        from signals_tpu.compiler import filters as _filters
        # non-Pallas backends run each stream's filter as its own
        # associative scan — 32 traced copies of those compile for
        # minutes on CPU, so cap lower there (narrow patches then fall
        # back to the vmapped per-block path, which CPU prefers anyway)
        kmax = 32 if _filters.resolve_mega_impl() == 'pallas' else 8
        ctx_extra = self._context_extra
        best_k = None
        best_cost = None
        if force_k is not None:
            # caller-pinned stream count, bypassing the k-search and its
            # k >= 2 floor.  Used by the mix epilogue at V >= LANE_GROUP
            # (1024+ voices): k = 1 is no packing win by itself (it is
            # the mega window's layout), but it is the full-lane-group
            # layout the in-kernel voice sum and generator require.
            # Beyond one group (V a multiple of 1024) the segment kernel
            # splits lanes into independent per-group calls.
            k = force_k
            if ((k * V <= LANE_GROUP
                 or (k == 1 and V % LANE_GROUP == 0))
                    and _packed_k_ok(k, kmax, n_blocks, filters, F,
                                     ctx_extra, min_k=1)):
                best_k = k
        else:
            align0 = self.carry_seg_align
            pk = LANE_GROUP
            while pk >= 32:
                if pk % V == 0:
                    k = pk // V
                    if _packed_k_ok(k, kmax, n_blocks, filters, F,
                                    ctx_extra):
                        S_k = -(-n_blocks // k)
                        if align0 > 1:
                            # swept-carry alignment rounds streams up to
                            # whole segments — charge the real coverage
                            S_k = -(-S_k // align0) * align0
                        covered = k * S_k
                        cost = covered * (0.85 if pk == LANE_GROUP
                                          else 1.0)
                        if best_cost is None or cost < best_cost:
                            best_k, best_cost = k, cost
                pk //= 2
        if best_k is None:
            return None
        k = best_k
        S = -(-n_blocks // k)
        # swept-carry filters: streams must hold whole carry segments so
        # every stream start lands on an absolute segment boundary (the
        # carry semantics' alignment contract — CritFilter.swept_carry_m)
        align = self.carry_seg_align
        if align > 1:
            S = -(-S // align) * align
        index = self.index
        root = self.root
        channels = V

        def many(params, carry, position0, host_staged):
            import jax.numpy as jnp
            comp = _Compiler(index)
            comp.mega = (F, S)
            comp.packed_family = (k, S * F)
            comp.carry_aligned = True
            comp.params = params
            comp.carry_in = carry
            comp.position = jnp.int32(position0)
            comp.host = {}
            outs = []
            for j in range(k):
                r = comp.lower(root, Window(j * S * F, S * F))
                outs.append(jnp.broadcast_to(r, (S * F, channels)))
            comp.passthrough_carry()
            return outs, comp.carry_out

        return many, k, S

    #: mix epilogue (:meth:`packed_mega_mix`): fold the voice-sum
    #: master mix INTO the packed filter kernel so the full (T, V)
    #: filtered array is never written to HBM nor read back — the two
    #: largest memory passes of a device-resident poly render (measured
    #: 4478x vs 4224x on the 64-voice bench; 6912x composed with the
    #: in-kernel generator — v5e, BENCH_full.json).  ``PolyPatch``
    #: engages it by default on TPU per-instance via the ``force``
    #: argument — never by mutating this attribute, which lives on the
    #: compile-cached object shared across PolyPatch instances.
    enable_mix_epilogue = False

    def packed_mega_mix(self, n_blocks: int, *, base=None, force=False):
        """Stream-packed render of the VOICE SUM ``sum_ch root`` — the
        polyphony master mix — with the voice reduction folded into the
        filter kernel (the mix epilogue), or ``None`` when ineligible.

        Eligibility: the packed-stream plan applies
        (:meth:`packed_mega_streams`); the patch has exactly one context
        ``CritFilter``, whose packed lane width equals the voice count
        and fills the kernel's full 1024-lane group; and every path from
        the filter to the root is voice-broadcast-linear
        (:func:`_voice_linear_to_root`).  Then per stream ``j``::

            sum_v root_v = A * ysum_j + S0_j
            A    = (S1_j - S0_j) / V        (voice-constant by the proof)
            S0_j = sum_v root_v | y := 0    (dry paths; often folds to 0)
            S1_j = sum_v root_v | y := 1
            ysum_j = in-kernel lane-group sum of the filter's stream j

        ``S0``/``S1`` are constant-substitution traces (the same trick as
        the affine delay solver) — fused elementwise reductions that
        never touch HBM.  Returns ``(many_mix, k, S)``;
        ``many_mix(params, carry, position0, host) -> (mixes, carry')``
        with ``mixes`` a length-``k`` list of ``(S*F, 1)`` per-stream
        voice sums.  Numerics: the voice sum is reassociated (kernel
        group-sum vs per-voice chains), so results match the plain
        packed path to f32 reassociation, not bit-exactly.
        """
        if not (force or self.enable_mix_epilogue):
            return None
        base = self._packed_base_for_mix(n_blocks, base)
        if base is None:
            return None
        _, k, S = base
        V = self.channels
        if V < 2:
            return None
        from signals_tpu.nodes.fx import CritFilter
        filters = [n for n in self.index.order
                   if isinstance(n, CritFilter)]
        if len(filters) != 1:
            return None
        f = filters[0]
        F = self.block_frames
        if f.channels != V:
            return None
        if not _voice_linear_to_root(f, self.root):
            return None
        k = self._mix_plan_k(n_blocks, k, f)
        S = -(-n_blocks // k)
        align = self.carry_seg_align
        if align > 1:
            S = -(-S // align) * align
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        # the in-kernel lane-group sum needs the full-group packed layout
        # with exactly V lanes per stream (one group, or — at k == 1 —
        # whole multiples of the group, reduced per group and added);
        # other layouts keep the algebra but sum an ordinary per-stream
        # lowering instead
        use_kernel_sum = (f.packed_lane_fit(k, F) == V
                          and k * V % LANE_GROUP == 0)
        index = self.index
        root = self.root

        def many_mix(params, carry, position0, host_staged):
            import jax.numpy as jnp
            comp = _Compiler(index)
            comp.mega = (F, S)
            comp.packed_family = (k, S * F)
            comp.carry_aligned = True
            comp.params = params
            comp.carry_in = carry
            comp.position = jnp.int32(position0)
            comp.host = {}
            ctx = LowerCtx(comp, f, Window(0, S * F))
            ysum = (f.family_sum(ctx, (F, S), (k, S * F))
                    if use_kernel_sum else None)          # (S, F, k)|None
            enabled_f = comp.node_param(f, 'enabled')

            def sub_sum(const, w):
                """Voice sum of the root with the filter output
                substituted by ``const`` (fresh memo per trace; XLA CSEs
                the shared subexpressions across the 0/1 traces)."""
                sub = _Compiler(index)
                sub.mega = comp.mega
                sub.packed_family = comp.packed_family
                sub.carry_aligned = comp.carry_aligned
                sub.params = comp.params
                sub.carry_in = comp.carry_in
                sub.position = comp.position
                sub.host = comp.host
                sub.node_const = {id(f): const}
                r = sub.lower(root, w)
                return jnp.broadcast_to(r, (S * F, V)).sum(
                    axis=1, keepdims=True)

            inv_v = F32(1.0 / V)
            mixes = []
            for j in range(k):
                w = Window(j * S * F, S * F)
                if ysum is not None:
                    # family_sum output is pre-gate; apply the filter's
                    # enabled gating exactly as lower() would
                    ys = jnp.where(enabled_f,
                                   ysum[:, :, j].reshape(S * F, 1),
                                   F32(0.0))
                else:
                    # backend without the in-kernel path: ordinary
                    # per-stream lowering (already gated), summed — the
                    # algebra still holds, none of the pass savings
                    ys = jnp.broadcast_to(
                        comp.lower(f, w), (S * F, V)).sum(
                        axis=1, keepdims=True)
                s0 = sub_sum(0.0, w)
                s1 = sub_sum(1.0, w)
                mixes.append((s1 - s0) * (ys * inv_v) + s0)
            comp.passthrough_carry()
            return mixes, comp.carry_out

        return many_mix, k, S

    def _packed_base_for_mix(self, n_blocks: int, base=None):
        """The packed-stream base plan the MIX-EPILOGUE paths build on:
        the ordinary k-search plan, or — at the full-lane-group voice
        width (1024) where the k-search's k >= 2 floor leaves no plan —
        the pinned single-stream layout (``force_k=1``: no packing win
        by itself, but the epilogue still saves the full-width HBM
        write/read).  The SINGLE copy shared by :meth:`packed_mega_mix`,
        :meth:`packed_gen_engaged` and ``PolyPatch``'s render wiring, so
        an engagement probe can never claim a plan the render won't
        take."""
        if base is None:
            base = self.packed_mega_streams(n_blocks)
        if base is None:
            from signals_tpu.compiler.pallas_kernels import LANE_GROUP
            if (self.channels >= LANE_GROUP
                    and self.channels % LANE_GROUP == 0):
                base = self.packed_mega_streams(n_blocks, force_k=1)
        return base

    def _mix_plan_k(self, n_blocks: int, k_base: int, f) -> int:
        """Stream count for the mix-epilogue plan: prefer the FULL
        1024-lane group when it is sane for this batch size — the
        in-kernel voice sum (and generator source) save full-size HBM
        passes, worth far more than the padding-waste delta the base
        cost model optimizes — else keep the base plan's ``k``."""
        from signals_tpu.compiler import filters as _filters
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        V = self.channels
        F = self.block_frames
        if LANE_GROUP % V:
            return k_base
        k_full = LANE_GROUP // V
        kmax = 32 if _filters.resolve_mega_impl() == 'pallas' else 8
        if k_full != k_base and _packed_k_ok(k_full, kmax, n_blocks,
                                             [f], F, self._context_extra):
            return k_full
        return k_base

    def packed_gen_engaged(self, n_blocks: int, *,
                           mix_epilogue: bool = False) -> bool:
        """Whether a packed render at this batch size would synthesize
        the filter input IN-KERNEL (``filters.SEG_SOURCE_GEN`` snapshot
        taken at compile time, the pallas family path available, and
        every context filter's input an eligible generator at the
        full-lane-group layout).  Benchmarks use this so a silently
        declined generator path can never publish under its label.

        ``mix_epilogue`` must mirror how the render will actually run:
        the epilogue plan overrides the stream count with the full lane
        group (:meth:`_mix_plan_k`), which can make the generator layout
        reachable at batch sizes where the base plan's k declines it —
        probing the wrong plan's k would over- or under-claim."""
        from signals_tpu.compiler import filters as _f
        if not self.index.seg_source_gen:
            return False
        if _f.resolve_mega_impl() != 'pallas':
            # _family_prologue requires the pallas family path; without
            # it the generator kernel is unreachable no matter what the
            # flag says
            return False
        base = (self._packed_base_for_mix(n_blocks) if mix_epilogue
                else self.packed_mega_streams(n_blocks))
        if base is None:
            return False
        _, k, _S = base
        from signals_tpu.compiler.pallas_kernels import LANE_GROUP
        from signals_tpu.nodes.fx import CritFilter
        filters = [n for n in self.index.order
                   if isinstance(n, CritFilter)]
        if not filters:
            return False
        if mix_epilogue and len(filters) == 1:
            # the epilogue plan overrides k with the full lane group
            # when sane — probe the k that trace will actually use
            k = self._mix_plan_k(n_blocks, k, filters[0])
        F = self.block_frames
        for f in filters:
            chx = f.packed_lane_fit(k, F)
            if (chx is None or k * chx % LANE_GROUP
                    or f._gen_input_spec(chx) is None):
                return False
        return True

    @property
    def carry_seg_align(self) -> int:
        """Blocks-per-segment alignment the patch's SWEPT-carry filters
        impose on mega/packed render windows (1 = none): the lcm of every
        engaged filter's ``swept_carry_m``.  Mega renders must start at
        positions that are multiples of this many blocks for the Pallas
        carry kernels' batch-relative segmentation to coincide with the
        absolute-aligned product semantics; :meth:`render` aligns
        unaligned starts with per-block steps (which compute the segment
        phase dynamically and are correct anywhere)."""
        import math as _math
        from signals_tpu.compiler import filters as _filters
        from signals_tpu.nodes.fx import CritFilter
        if self.block_frames != _filters.CARRY_GRID_FRAMES:
            return 1
        m = 1
        for n in self.index.order:
            if isinstance(n, CritFilter):
                mm = n.swept_carry_m(self.index.seg_carry_blocks)
                m = m * mm // _math.gcd(m, mm)
        return m

    def render_core(self, n_blocks: int):
        """Un-jitted ``(params, carry, position0, host_staged) ->
        (blocks (n, F, ch), carry', taps_staged)`` on the fastest
        eligible lowering — the differentiable core that
        :meth:`render_fn` jits and :func:`signals_tpu.learn.make_loss_fn`
        differentiates through (so parameter fitting pays mega/segment
        dispatch costs, not ``n_blocks`` sequential steps).

        Stateless patches (empty carry — no delays/envelopes) have fully
        independent blocks, so the block loop vanishes into a ``vmap`` over
        positions: one device launch for the whole batch, instead of a
        while-loop paying per-iteration overhead (~70 µs/block measured
        through the tunnel).  Stateful patches scan.
        """
        import jax
        import jax.numpy as jnp
        step_core = self._step_core
        F = self.block_frames
        unroll = max(1, min(self.scan_unroll, n_blocks))
        stateless = not self.carry0

        def positions_of(position0):
            return (jnp.int32(position0)
                    + jnp.int32(F) * jnp.arange(n_blocks, dtype=jnp.int32))

        packed = (self.packed_mega_streams(n_blocks)
                  if n_blocks > 1 else None)
        delay_plan = (self.delay_mega_plan() if n_blocks > 1 else None)
        if packed is not None:
            # stream-packed mega render: the whole patch lowers as k
            # packed timeline streams (narrow patches lane-pack with an
            # adaptive k); block-major output assembles with one
            # stack+reshape (a single coalesced write)
            many_s, k, S = packed
            ch = self.channels

            def many(params, carry, position0, host_staged):
                outs, carry2 = many_s(params, carry, position0,
                                      host_staged)    # k x (S*F, ch)
                blocks = jnp.stack(outs).reshape(
                    k * S * F, ch)[:n_blocks * F]
                return blocks.reshape(n_blocks, F, ch), carry2, {}
        elif self._use_mega and n_blocks > 1:
            many = self.mega_core(n_blocks)
        elif delay_plan is not None:
            many = self.delay_mega_core(n_blocks, delay_plan)
        elif (seg_many := self.segment_scan_core(n_blocks)) is not None:
            # feedback the solver rejects (nonlinear loops, coupled
            # delay pairs): scan whole D-bounded segments, not blocks
            many = seg_many
        elif stateless:
            def many(params, carry, position0, host_staged):
                def one(pos, host):
                    block, _, taps = step_core(params, {}, pos, host)
                    return block, taps

                blocks, taps = jax.vmap(one)(positions_of(position0),
                                             host_staged)
                return blocks, carry, taps
        else:
            def many(params, carry, position0, host_staged):
                def body(c, inp):
                    pos, host = inp
                    block, c2, taps = step_core(params, c, pos, host)
                    return c2, (block, taps)

                carry2, (blocks, taps) = jax.lax.scan(
                    body, carry, (positions_of(position0), host_staged),
                    unroll=unroll)
                return blocks, carry2, taps

        return many

    def _plan_alignment_sensitive(self, n_blocks: int) -> bool:
        """Whether ``render_core(n_blocks)`` picks a plan whose
        swept-carry lowering assumes window starts on absolute segment
        boundaries (the Pallas carry paths under ``carry_aligned``:
        packed streams, mega, the delay solver) — mirrors render_core's
        branch order.  The per-block vmap/scan paths and the segmented
        feedback scan compute the segment phase DYNAMICALLY (the TV
        scan), so they need no driver alignment — in particular the
        realtime transport's short batches must never trigger the
        per-block alignment prefix (observed: post-seek compile storms
        and underruns in the 65 s soak when they did)."""
        if n_blocks <= 1:
            return False
        cache = self._align_sensitive_cache
        if n_blocks not in cache:
            cache[n_blocks] = (
                self.packed_mega_streams(n_blocks) is not None
                or self._use_mega
                or self.delay_mega_plan() is not None)
        return cache[n_blocks]

    def render_fn(self, n_blocks: int):
        """Jitted :meth:`render_core` (cached per batch size)."""
        import jax
        if n_blocks in self._render_cache:
            return self._render_cache[n_blocks]
        fn = jax.jit(self.render_core(n_blocks), donate_argnums=(1,))
        self._render_cache[n_blocks] = fn
        return fn

    def render(self, *, position: int = 0, n_blocks: int = 1,
               carry: typing.Optional[dict] = None,
               deliver_taps: bool = True):
        """Render ``n_blocks`` blocks; returns (audio (n*F, ch), carry').

        Tap blocks (visualization, file writers) are delivered to their
        nodes' ``consume_tap`` on the host after the device call.

        Starts that don't land on an absolute carry-segment boundary
        (swept-carry filters, :attr:`carry_seg_align`) render a
        per-block prefix up to the next boundary — the single-block path
        computes the segment phase dynamically — then continue with the
        aligned multi-block program, so the output equals the oracle's
        absolute-aligned semantics at ANY start position.
        """
        import jax
        align = self.carry_seg_align
        F = self.block_frames
        if (align > 1 and n_blocks > 1 and position % F == 0
                and (position // F) % align
                and self._plan_alignment_sensitive(n_blocks)):
            pre = min(align - (position // F) % align, n_blocks)
            if carry is None:
                carry = jax.tree.map(lambda x: x, self.carry0)
            chunks = []
            for i in range(pre):
                a, carry = self.render(
                    position=position + i * F, n_blocks=1, carry=carry,
                    deliver_taps=deliver_taps)
                chunks.append(a)
            if n_blocks > pre:
                a, carry = self.render(
                    position=position + pre * F, n_blocks=n_blocks - pre,
                    carry=carry, deliver_taps=deliver_taps)
                chunks.append(a)
            return np.concatenate(chunks, axis=0), carry
        params = self.params()
        if carry is None:
            carry = jax.tree.map(lambda x: x, self.carry0)
        host = self.stage_host(position, n_blocks)
        blocks, carry2, taps = self.render_fn(n_blocks)(
            params, carry, position, host)
        audio = np.asarray(blocks).reshape(n_blocks * self.block_frames,
                                           self.channels)
        if deliver_taps:
            for uid, node in self.tap_nodes.items():
                # disabled side-effect nodes pass audio through but must not
                # record/queue (reference PASSTHRU semantics)
                if not node.get_state().enabled:
                    continue
                if uid in taps:
                    arr = np.asarray(taps[uid])
                    for i in range(n_blocks):
                        node.consume_tap(
                            arr[i], position + i * self.block_frames,
                            self.rate)
        return audio, carry2

    def _vis_fn(self, n_blocks: int):
        import jax
        import jax.numpy as jnp

        from signals_tpu.nodes.vis import Vis
        if n_blocks in self._vis_cache:
            return self._vis_cache[n_blocks]
        inner = self.render_core(n_blocks)
        F = self.block_frames
        rate = self.rate
        vis_nodes = {uid: node for uid, node in self.tap_nodes.items()
                     if isinstance(node, Vis)}

        @jax.jit
        def run(params, carry, position, host):
            blocks, carry2, taps = inner(params, carry, position, host)
            out = {}
            for uid, node in vis_nodes.items():
                if uid in taps:
                    x = taps[uid].reshape(n_blocks * F, -1)
                    out[uid] = node.tap_summary(jnp, x, rate)
            return out, carry2

        self._vis_cache[n_blocks] = (run, vis_nodes)
        return self._vis_cache[n_blocks]

    def render_vis(self, *, position: int = 0, n_blocks: int = 1,
                   carry: typing.Optional[dict] = None):
        """Render on device and fetch ONLY the vis taps' decimated
        display summaries (``Vis.tap_summary``: Wave = per-pixel min/max
        envelope, Spec = FFT band magnitudes) — ~1500 points per tap
        instead of full-rate f32 audio.  A Wave plot consumes at most
        1500 frames per 30 ms tick (reference ``ui/vis.py:17-19``), so
        shipping the raw samples through the 20-45 MB/s host tunnel to
        draw it is pure waste; the full-rate tap array never leaves the
        device (XLA dead-code-eliminates the unfetched outputs).

        Returns ``({uid: np.ndarray summary}, carry')`` and delivers each
        summary to its node's ``consume_summary`` (plots pick them up via
        ``Vis.render`` when no full-rate blocks are queued).
        """
        import jax
        params = self.params()
        if carry is None:
            carry = jax.tree.map(lambda x: x, self.carry0)
        host = self.stage_host(position, n_blocks)
        run, vis_nodes = self._vis_fn(n_blocks)
        out, carry2 = run(params, carry, position, host)
        frames = n_blocks * self.block_frames
        summaries = {}
        for uid, s in out.items():
            node = vis_nodes[uid]
            if not node.get_state().enabled:
                # device arrays transfer lazily: skipping np.asarray here
                # skips the host fetch for disabled taps (the on-device
                # summary compute still runs — ~1500 elements, negligible
                # — keeping `enabled` a traced edit, never a retrace)
                continue
            arr = np.asarray(s)
            summaries[uid] = arr
            node.consume_summary(arr, frames, position, self.rate)
        return summaries, carry2

    def render_encoded(self, *, position: int = 0, n_blocks: int = 1,
                       carry: typing.Optional[dict] = None,
                       subtype: str = 'mulaw', deliver_taps: bool = True):
        """Like :meth:`render`, but the sample encoding runs **on device**
        and raw payload bytes are fetched: 1 byte/sample (mu-law/A-law),
        2 (PCM16), ~0.5 (IMA ADPCM) or ~0.4-1.5 **lossless**
        (``'slac'`` — Rice-coded bit-exact PCM16, signal-dependent)
        instead of 4-byte floats.  The host link — not the render rate — bounds
        bounce/stream throughput, so device-side encoding is the
        production path for long bounces.

        Returns ``(payload: np.ndarray, frames, carry')`` where payload is
        uint8 (int16 for ``'pcm16'``) in exactly the WAV ``data``-chunk
        layout for the subtype (:mod:`signals_tpu.runtime.codecs`).
        """
        import jax
        params = self.params()
        if carry is None:
            carry = jax.tree.map(lambda x: x, self.carry0)
        host = self.stage_host(position, n_blocks)
        fn = self._encoded_fn(n_blocks, subtype)
        payload, carry2, taps = fn(params, carry, position, host)
        if subtype == 'slac':
            # (worst-case buffer, live length): fetch the 4-byte length,
            # then slice so only compressed bytes cross the host link
            buf, total = payload
            payload = buf[:int(total)]
        frames = n_blocks * self.block_frames
        if deliver_taps:
            for uid, node in self.tap_nodes.items():
                if not node.get_state().enabled:
                    continue
                if uid in taps:
                    arr = np.asarray(taps[uid])
                    for i in range(n_blocks):
                        node.consume_tap(
                            arr[i], position + i * self.block_frames,
                            self.rate)
        return np.asarray(payload), frames, carry2

    #: streaming-fetch slice granularity for the SLAC live length: the
    #: worst-case device buffer is ~2 bytes/sample, but typical payloads
    #: are ~0.4; the stream fetches a STATIC slice (dispatchable before
    #: the host knows the live length, so the transfer overlaps the next
    #: batch's render) sized adaptively from the previous batch's
    #: observed length, rounded to this step so retraces stay rare.
    STREAM_CAP_STEP = 1 << 18
    #: initial cap guess, bytes per sample (SLAC's typical rate + margin)
    STREAM_CAP_GUESS = 0.6

    def render_encoded_stream(self, *, position: int = 0, n_blocks: int,
                              batch_blocks: int,
                              subtype: str = 'slac',
                              carry: typing.Optional[dict] = None,
                              deliver_taps: bool = True):
        """Pipelined batched :meth:`render_encoded`: yields ``(payload,
        frames)`` per batch with batch ``k+1``'s render DISPATCHED (its
        carry dependency stays on device) before batch ``k``'s payload is
        fetched — the host-link transfer then overlaps the next batch's
        device render, which is what pushes long lossless bounces past
        the sequential render→fetch wall (round-4 verdict: every
        host-delivery path sat below the 1000x north star while the link
        itself had headroom; the residual was exactly this
        serialization).

        For ``'slac'`` the live compressed length is only known on
        device, and fetching it before slicing would re-serialize the
        pipeline (the dynamic slice dispatch lands behind the next
        batch's queued render).  Instead a STATIC slice of
        adaptively-capped length is dispatched immediately after each
        render — transferable concurrently with the following render —
        and the rare overshoot (cap < live length) fetches the remainder
        with a second, dynamic slice.  The cap starts at
        :attr:`STREAM_CAP_GUESS` bytes/sample and tracks 1.25x the last
        observed length, rounded to :attr:`STREAM_CAP_STEP` so the slice
        program retraces only when the signal's compressibility moves
        materially.

        Every yielded payload is independently decodable (each batch
        encodes from fresh codec state); the ``.slac`` v3 container
        (``runtime/sndfile.SlacWriter``) concatenates them losslessly.
        """
        import jax
        import jax.numpy as jnp
        params = self.params()
        if carry is None:
            carry = jax.tree.map(lambda x: x, self.carry0)
        align = self.carry_seg_align
        if align > 1:
            batch_blocks = -(-batch_blocks // align) * align
        F = self.block_frames
        worst = None
        cap = None
        if subtype == 'slac':
            worst_bps = 2.25        # escape-coded ceiling + headers
            worst = int(batch_blocks * F * self.channels * worst_bps)
            cap = min(worst, -(-int(batch_blocks * F * self.channels
                                    * self.STREAM_CAP_GUESS)
                               // self.STREAM_CAP_STEP)
                      * self.STREAM_CAP_STEP)

        pending: list = []
        pos = position
        done = 0

        def dispatch():
            nonlocal carry, pos, done
            nb = min(batch_blocks, n_blocks - done)
            fn = self._encoded_fn(nb, subtype)
            host = self.stage_host(pos, nb)
            payload, carry, taps = fn(params, carry, pos, host)
            if subtype == 'slac':
                buf, total = payload
                # static-cap slice: dispatchable NOW (no host sync), so
                # its transfer overlaps the next batch's render
                head = buf[:cap] if cap < worst else buf
                pending.append((head, buf, total, nb, pos, taps))
            else:
                pending.append((payload, None, None, nb, pos, taps))
            pos += nb * F
            done += nb

        def adapt(observed: int):
            nonlocal cap
            want = min(worst, -(-int(observed * 1.25)
                                // self.STREAM_CAP_STEP)
                       * self.STREAM_CAP_STEP)
            cap = max(want, self.STREAM_CAP_STEP)

        while done < n_blocks and len(pending) < 2:
            dispatch()
        while pending:
            head, buf, total, nb, p0, taps = pending.pop(0)
            if done < n_blocks:
                dispatch()
            if subtype == 'slac':
                n = int(total)
                if n <= head.shape[0]:
                    out = np.asarray(head)[:n]
                else:
                    out = np.concatenate(
                        [np.asarray(head),
                         np.asarray(buf[head.shape[0]:n])])
                adapt(n)
            else:
                out = np.asarray(head)
            if deliver_taps and self.tap_nodes:
                for uid, node in self.tap_nodes.items():
                    if not node.get_state().enabled:
                        continue
                    if uid in taps:
                        arr = np.asarray(taps[uid])
                        for i in range(nb):
                            node.consume_tap(arr[i], p0 + i * F, self.rate)
            yield out, nb * F

    def _encoded_fn(self, n_blocks: int, subtype: str):
        import jax
        import jax.numpy as jnp
        from signals_tpu.runtime import codecs
        key = (n_blocks, subtype)
        if key in self._encoded_cache:
            return self._encoded_cache[key]
        inner = self.render_fn(n_blocks)
        F = self.block_frames
        ch = self.channels

        def encode(mix):
            if subtype == 'pcm16':
                return jnp.clip(jnp.round(mix * np.float32(32767.0)),
                                -32768, 32767).astype(jnp.int16)
            if subtype == 'mulaw':
                return codecs.mulaw_encode(jnp, mix)
            if subtype == 'alaw':
                return codecs.alaw_encode(jnp, mix)
            if subtype == 'adpcm':
                return codecs.ima_encode_jax(mix)
            if subtype == 'slac':
                return codecs.slac2_encode_jax(mix)
            raise ValueError(f'unsupported device encoding {subtype!r}')

        @jax.jit
        def run(params, carry, position, host):
            blocks, carry2, taps = inner(params, carry, position, host)
            mix = blocks.reshape(n_blocks * F, ch)
            return encode(mix), carry2, taps

        self._encoded_cache[key] = run
        return run


_compile_cache: dict[str, CompiledPatch] = {}
_COMPILE_CACHE_MAX = 32


def compile_node(root: Emitter, *, block_frames: int, rate: int,
                 channels: typing.Optional[int] = None) -> CompiledPatch:
    """Compile (with caching keyed on the canonical graph hash) the patch
    rooted at ``root``."""
    if channels is None:
        channels = root.channels
    index = _GraphIndex(root, block_frames, rate, channels)
    key = index.graph_hash()
    cached = _compile_cache.get(key)
    if cached is not None and cached.root is root:
        return cached
    compiled = CompiledPatch(root, block_frames=block_frames, rate=rate,
                             channels=channels)
    if len(_compile_cache) >= _COMPILE_CACHE_MAX:
        _compile_cache.pop(next(iter(_compile_cache)))
    _compile_cache[key] = compiled
    return compiled
