"""Polyphony and multi-chip scaling.

The reference is single-voice, single-process (SURVEY §2b: no parallelism of
any kind).  On TPU, polyphony is a *data axis*: one compiled patch program is
``vmap``-ped over a leading voice axis (per-voice parameter overrides:
pitches, gates, detunes), and the master mix is a sum over that axis — one
fused program for the whole polyphonic instrument.

Scaling beyond one chip shards the voice axis over a
``jax.sharding.Mesh`` with ``shard_map``: each chip renders its voice shard
and the master mix is a ``psum`` over ICI.  Carried state (delay lines,
envelopes) stays voice-sharded, so no state ever crosses chips — the only
inter-chip traffic is the mixed block (frames × channels floats per block).
"""

from __future__ import annotations

import typing

import numpy as np

from signals_tpu.compiler import CompiledPatch, compile_node
from signals_tpu.graph import Emitter

F32 = np.float32

Override = typing.Union[np.ndarray, typing.Sequence]


class PolyPatch:
    """A patch rendered as ``n_voices`` parallel instances.

    ``overrides`` maps ``(node, param_name)`` to a per-voice array whose
    leading dimension is ``n_voices``; each entry must broadcast against the
    node's scalar parameter shape.  All other parameters are shared.

    Two layouts:

    * ``layout='channels'`` (default) — voices ride the **channel axis**:
      overridden constants become ``(1, V)`` arrays and every kernel
      processes all voices as one wide multichannel block, with a final
      channel sum as the master mix.  On TPU the channel axis is the
      minor-most (lane) dimension, so the VPU runs all voices per
      instruction — measured ~2x the vmap layout.  Requires a mono voice
      patch and overrides targeting scalar-shaped params.
    * ``layout='vmap'`` — a leading voice batch axis via ``jax.vmap``.
      Fully general (any per-voice param, multichannel voices).

    Both layouts shard over a device ``mesh``: vmap shards the batch
    axis, channels shards the lane axis (per-device param/carry slices);
    in both, the master mix is a psum over ICI.

    >>> # poly = PolyPatch(root, n_voices=64,
    >>> #                  overrides={(hz_node, 'value'): freqs})
    >>> # audio, carry = poly.render(n_blocks=43)
    """

    def __init__(self,
                 root: Emitter,
                 *,
                 n_voices: int,
                 overrides: dict,
                 block_frames: int = 1024,
                 rate: int = 44100,
                 channels: typing.Optional[int] = None,
                 mesh=None,
                 layout: typing.Optional[str] = None,
                 axis_name: str = 'voices',
                 mix_epilogue: typing.Optional[bool] = None):
        if layout is None:
            layout = 'vmap' if mesh is not None else 'channels'
        if layout not in ('channels', 'vmap'):
            raise ValueError(layout)
        # plan for the platform the mesh's devices actually are: a CPU
        # validation mesh inside a TPU process must get scan/interpret
        # plans, not Mosaic kernels (filters.platform_override) — the
        # pin scopes every compile and trace this instance performs
        self._platform: typing.Optional[str] = None
        if mesh is not None:
            # always pin (not just when it differs from the default NOW):
            # the trace runs at first render call, where the process
            # default may have flipped since construction
            p = str(np.asarray(mesh.devices).flat[0].platform).lower()
            if p in ('cpu', 'gpu', 'tpu'):
                self._platform = p
        with self._platform_ctx():
            self._build(root, n_voices=n_voices, overrides=overrides,
                        block_frames=block_frames, rate=rate,
                        channels=channels, mesh=mesh, layout=layout,
                        axis_name=axis_name, mix_epilogue=mix_epilogue)

    def _platform_ctx(self):
        if self._platform is None:
            import contextlib
            return contextlib.nullcontext()
        from signals_tpu.compiler import filters as _filters
        return _filters.platform_override(self._platform)

    def _wrap_platform(self, fn):
        """Re-enter the platform pin around ``fn``: jit TRACES run at
        first call, and the kernels' interpret-mode defaults resolve at
        trace time."""
        if self._platform is None:
            return fn
        import functools

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with self._platform_ctx():
                return fn(*args, **kwargs)

        return wrapped

    def _build(self,
               root: Emitter,
               *,
               n_voices: int,
               overrides: dict,
               block_frames: int,
               rate: int,
               channels: typing.Optional[int],
               mesh,
               layout: str,
               axis_name: str,
               mix_epilogue: typing.Optional[bool]) -> None:
        if mix_epilogue is None:
            # default: on where the epilogue kernel runs compiled (TPU) —
            # measured 4478x vs 4224x realtime on the 64-voice device-
            # resident bench, and it composes with the in-kernel
            # generator for 6912x (v5e, BENCH_full.json c4g/c4h).
            # packed_mega_mix still proves eligibility per patch; an
            # ineligible patch rides the plain packed path unchanged.
            # Numerics: the voice sum reassociates (kernel group sums),
            # agreeing with the plain path to f32 reassociation — pass
            # False for bit-stable plain sums.
            from signals_tpu.compiler.filters import default_backend
            mix_epilogue = default_backend() == 'tpu'
        self.layout = layout
        self.n_voices = n_voices
        self.mesh = mesh
        self.axis_name = axis_name
        self._mix_epilogue = mix_epilogue and layout == 'channels'
        self._render_cache: dict[int, typing.Any] = {}
        self._fit_chunk_cache: dict = {}
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            # a 1-device mesh isn't sharding — nothing to decline there
            if (n_dev > 1
                    and n_voices < n_dev * MIN_EFFICIENT_VOICES_PER_DEVICE):
                # the efficiency policy: sharding this narrow is measured
                # SLOWER in total than fewer devices — warn, don't block
                # (the virtual-mesh validation paths shard tiny patches
                # on purpose)
                _warn_narrow_shard(n_voices, n_dev, 'PolyPatch')

        if layout == 'channels':
            # Voices ride the channel/lane axis.  With a mesh, the lane
            # axis is sharded: the graph compiles at the per-device voice
            # count and shard_map feeds each device its slice of the
            # stacked params (mix reduction becomes a psum over ICI).
            n_local = n_voices
            if mesh is not None:
                n_dev = int(np.prod(mesh.devices.shape))
                if n_voices % n_dev:
                    raise ValueError(
                        f'n_voices={n_voices} not divisible by the '
                        f'{n_dev}-device mesh')
                n_local = n_voices // n_dev
            self._n_local = n_local
            #: (node, pname, voice_axis, global stacked array)
            self._channel_overrides: list[tuple] = []
            # note: installs the (per-device slice of the) stacked values
            # into the live nodes' states (the patch *becomes* V-channel)
            for (node, pname), values in overrides.items():
                arr = np.asarray(values, dtype=F32)
                if arr.shape[0] != n_voices:
                    raise ValueError(
                        f'override for {pname!r} has leading dim '
                        f'{arr.shape[0]}, expected n_voices={n_voices}')
                state = node.get_state()
                old = getattr(state, pname)
                # accept an already-stacked row count too: constructing a
                # second PolyPatch over the same root must re-install the
                # same layout, not re-stack the stacked value (a (1, V)
                # scalar row used to re-stack into a bogus (V, V) track)
                if not (isinstance(old, np.ndarray)
                        and old.shape[0] in (1, n_voices)):
                    raise ValueError(
                        f'channel layout requires single-row array params; '
                        f'{pname!r} is {old!r} — use layout="vmap"')
                # the OVERRIDE's rank picks the layout (the state's shape
                # is mutated by this very install, so it cannot): 1-D =
                # one scalar per voice, 2-D = per-voice event rows
                if arr.ndim == 1:
                    # scalar param: voices become columns of a (1, V) row
                    stacked = arr.reshape(1, n_voices)
                    axis = 1
                else:
                    # row param (e.g. a (1, E) event track): voices become
                    # rows of a (V, E) array — per-channel tracks
                    stacked = np.ascontiguousarray(np.broadcast_to(
                        arr.reshape(n_voices, -1), (n_voices, old.shape[1])))
                    axis = 0
                local = (stacked if mesh is None else np.ascontiguousarray(
                    stacked[:, :n_local] if axis == 1
                    else stacked[:n_local]))
                setattr(state, pname, local)
                self._channel_overrides.append((node, pname, axis, stacked))
            if root.channels != n_local:
                raise ValueError(
                    f'patch does not propagate the voice channel axis: root '
                    f'has {root.channels} channels, expected {n_local}; '
                    f'use layout="vmap"')
            # interior explicit-channel nodes (Delay) must carry the
            # voice lanes too when their INPUT does — the root check
            # alone misses them when a widened path reconverges (e.g. an
            # osc->mix dry path makes the root V-wide while the feedback
            # Delay stays mono and dies in an obscure broadcast at trace
            # time).  A genuinely mono sidechain (all inputs width <=
            # declared channels) broadcasts only at its consumer and is
            # legal, so it must not be rejected.
            from signals_tpu.graph import ExplicitChannels
            stack = [root]
            visited = set()
            while stack:
                n = stack.pop()
                if id(n) in visited:
                    continue
                visited.add(id(n))
                if (isinstance(n, ExplicitChannels)
                        and n.channels != n_local):
                    for p in getattr(n, '_ports', {}).values():
                        if p.sig is None:
                            continue
                        try:
                            w = p.sig.channels
                        except Exception:
                            continue
                        if w > n.channels:
                            raise ValueError(
                                f'channels layout: {n.cls_name()} '
                                f'declares {n.channels} explicit '
                                f'channel(s) but its input is {w} wide '
                                f'(voices ride the channel axis) — set '
                                f'its channels to {n_local} (voices per '
                                f'device) or use layout="vmap"')
                if hasattr(n, '_ports'):
                    stack.extend(p.sig for p in n._ports.values()
                                 if p.sig is not None)
            self.compiled = compile_node(root, block_frames=block_frames,
                                         rate=rate, channels=n_local)
            # the mix-epilogue opt-in stays per-PolyPatch (passed as
            # force= at plan time): compile_node caches CompiledPatch
            # per root, so mutating a flag on it would leak this
            # instance's choice into every other PolyPatch sharing the
            # compilation.
            self._out_channels = 1 if channels is None else channels
            return

        self.compiled: CompiledPatch = compile_node(
            root, block_frames=block_frames, rate=rate, channels=channels)
        self._overrides = {}
        index = self.compiled.index
        for (node, pname), values in overrides.items():
            uid = index.info(node).uid
            arr = np.asarray(values, dtype=F32)
            if arr.shape[0] != n_voices:
                raise ValueError(
                    f'override for {pname!r} has leading dim '
                    f'{arr.shape[0]}, expected n_voices={n_voices}')
            self._overrides[(uid, pname)] = arr

    # -- parameter staging ---------------------------------------------------

    def set_override(self, node, pname: str, values) -> None:
        """Update a per-voice override's stacked values live (no
        recompilation).  In the mesh-sharded channels layout the live node
        state only holds one device's slice, so per-voice edits must go
        through here; in every other layout editing the node state
        directly also works."""
        arr = np.asarray(values, dtype=F32)
        if arr.shape[0] != self.n_voices:
            raise ValueError(
                f'override for {pname!r} has leading dim {arr.shape[0]}, '
                f'expected n_voices={self.n_voices}')
        if self.layout == 'channels':
            for i, (n, p, axis, stacked) in enumerate(
                    self._channel_overrides):
                if n is node and p == pname:
                    new = (arr.reshape(1, self.n_voices) if axis == 1
                           else np.ascontiguousarray(np.broadcast_to(
                               arr.reshape(self.n_voices, -1),
                               stacked.shape)))
                    self._channel_overrides[i] = (n, p, axis, new)
                    local = (new if self.mesh is None
                             else np.ascontiguousarray(
                                 new[:, :self._n_local] if axis == 1
                                 else new[:self._n_local]))
                    setattr(node.get_state(), pname, local)
                    return
            raise KeyError((node, pname))
        uid = self.compiled.index.info(node).uid
        if (uid, pname) not in self._overrides:
            raise KeyError((node, pname))
        self._overrides[(uid, pname)] = arr

    def params(self) -> tuple[dict, dict]:
        """(params pytree with overridden leaves stacked, in_axes pytree)."""
        base = self.compiled.params()
        if self.layout == 'channels':
            if self.mesh is not None:
                # live states hold the per-device slice (the compile
                # shape); feed the full stacked arrays — per-voice edits
                # go through set_override, which refreshes both
                index = self.compiled.index
                for node, pname, _axis, stacked in self._channel_overrides:
                    base[index.info(node).uid][pname] = stacked
            return base, None
        axes = {uid: {k: None for k in leaves}
                for uid, leaves in base.items()}
        for (uid, pname), arr in self._overrides.items():
            leaf = np.asarray(base[uid][pname])
            if arr.ndim == 1:          # (V,) scalars -> (V, 1, 1, ...)
                arr = arr.reshape((self.n_voices,) + (1,) * leaf.ndim)
            stacked = np.broadcast_to(
                arr, (self.n_voices, *leaf.shape)).astype(leaf.dtype)
            base[uid][pname] = stacked
            axes[uid][pname] = 0
        return base, axes

    def init_carry(self) -> dict:
        """Per-voice carried state."""
        import jax
        if self.layout == 'channels':
            if self.mesh is not None:
                # per-channel state tiled out to the global voice width
                # (initial values are channel-uniform)
                n_dev = self.n_voices // self._n_local

                def widen(x):
                    if x.ndim and x.shape[-1] == self._n_local:
                        return np.ascontiguousarray(
                            np.concatenate([x] * n_dev, axis=-1))
                    return x.copy()

                return jax.tree.map(widen, self.compiled.carry0)
            # stateful nodes already carry V channels in this layout
            return jax.tree.map(lambda x: x.copy(), self.compiled.carry0)
        return jax.tree.map(
            lambda x: np.broadcast_to(x[None], (self.n_voices, *x.shape)).copy(),
            self.compiled.carry0)

    # -- rendering -----------------------------------------------------------

    def _channel_specs(self, params, carry):
        """(params, carry) PartitionSpec pytrees for the channels layout:
        overridden leaves shard their voice axis; carried state shards its
        channel (last) axis; everything else replicates."""
        import jax
        from jax.sharding import PartitionSpec as P
        ax = self.axis_name
        index = self.compiled.index
        sharded = {(index.info(node).uid, pname): axis
                   for node, pname, axis, _ in self._channel_overrides}
        pspecs = {}
        for uid, leaves in params.items():
            pspecs[uid] = {}
            for pname, leaf in leaves.items():
                axis = sharded.get((uid, pname))
                if axis is None:
                    pspecs[uid][pname] = P()
                else:
                    spec = [None] * np.ndim(leaf)
                    spec[axis] = ax
                    pspecs[uid][pname] = P(*spec)

        def cspec(leaf):
            if np.ndim(leaf) and leaf.shape[-1] == self.n_voices:
                return P(*([None] * (np.ndim(leaf) - 1)), ax)
            return P()

        return pspecs, jax.tree.map(cspec, carry)

    def _make_render_channels(self, n_blocks: int):
        import jax
        import jax.numpy as jnp

        compiled = self.compiled
        F = compiled.block_frames
        step_core = compiled._step_core
        out_ch = self._out_channels
        V = compiled.channels          # per-device voice lanes

        stateless = not compiled.carry0

        packed = (compiled.packed_mega_streams(n_blocks)
                  if n_blocks > 1 else None)
        # packed_mega_mix must be consulted even when `packed` is None:
        # at the full-lane-group voice width (1024) the k-search leaves
        # no base plan, but the mix plan pins its own single-stream base
        # (CompiledPatch._packed_base_for_mix) — gating on `packed` here
        # silently dropped those renders to the plain mega path while
        # the engagement probes still said "engaged"
        mixplan = (compiled.packed_mega_mix(n_blocks, base=packed,
                                            force=True)
                   if n_blocks > 1 and self._mix_epilogue else None)
        if mixplan is not None:
            # mix epilogue: the filter kernel itself emits per-stream
            # voice sums — the full (T, V) filtered array is never
            # written to HBM and this mix never reads it back
            many_m, k, S = mixplan

            def mega_mixsum(params, carry, position0, host_staged):
                mixes, carry2 = many_m(params, carry, position0,
                                       host_staged)  # k x (S*F, 1)
                mix = jnp.concatenate(mixes, axis=0)[:n_blocks * F]
                mix = mix.reshape(n_blocks, F, 1)
                return (jnp.broadcast_to(mix, (n_blocks, F, out_ch)),
                        carry2)

            return self._finalize_channels(mega_mixsum)

        if packed is not None:
            # stream-packed mega: the patch lowers as k timeline
            # streams side by side; the filter runs one packed
            # cascade and each stream's downstream chain (and this
            # master mix) consumes its lane slice — only the skinny
            # per-stream mixes are ever concatenated
            many_s, k, S = packed

            def mega_packed(params, carry, position0, host_staged):
                outs, carry2 = many_s(params, carry, position0,
                                      host_staged)  # k x (S*F, V)
                mixes = [o.sum(axis=1, keepdims=True) for o in outs]
                mix = jnp.concatenate(mixes, axis=0)[:n_blocks * F]
                mix = mix.reshape(n_blocks, F, 1)
                return (jnp.broadcast_to(mix, (n_blocks, F, out_ch)),
                        carry2)

            return self._finalize_channels(mega_packed)

        whole = None
        if compiled._use_mega and n_blocks > 1:
            # mega window: the whole voice batch renders as one traced
            # window (context dedup + the batched VMEM-resident filter),
            # then mixes down over the voice/channel lanes; carried state
            # (e.g. streaming filters) propagates via associative scans
            # inside the window, not a block loop
            whole = compiled.mega_core(n_blocks)
        elif n_blocks > 1:
            plan = compiled.delay_mega_plan()
            if plan is not None:
                # delay/feedback voices: solve the loops (affine segment
                # scan), then the same window-wide mixdown
                whole = compiled.delay_mega_core(n_blocks, plan)
        if whole is not None:
            def mega_many(params, carry, position0, host_staged):
                blocks, carry2, _taps = whole(params, carry, position0,
                                              host_staged)    # (n, F, V)
                mix = blocks.sum(axis=2, keepdims=True)
                return jnp.broadcast_to(mix, (n_blocks, F, out_ch)), carry2

            return self._finalize_channels(mega_many)

        def many(params, carry, position0, host_staged):
            positions = (jnp.int32(position0)
                         + jnp.int32(F) * jnp.arange(n_blocks,
                                                     dtype=jnp.int32))

            def mixdown(block):
                mix = jnp.broadcast_to(block, (F, V)).sum(
                    axis=1, keepdims=True)
                return jnp.broadcast_to(mix, (F, out_ch))

            if stateless:
                # independent blocks: one launch, no loop
                def one(pos, host):
                    block, _, _ = step_core(params, {}, pos, host)
                    return mixdown(block)

                return jax.vmap(one)(positions, host_staged), carry

            def body(c, inp):
                pos, host = inp
                block, c2, _taps = step_core(params, c, pos, host)
                return c2, mixdown(block)

            carry2, mix = jax.lax.scan(body, carry,
                                       (positions, host_staged),
                                       unroll=max(1, min(
                                           self.compiled.scan_unroll,
                                           n_blocks)))
            return mix, carry2

        return self._finalize_channels(many)

    def _finalize_channels(self, many):
        """Jit the channels-layout render; with a mesh, wrap it in
        shard_map over the voice-lane axis — each device renders its voice
        shard against its param/carry slices and the master mix is a psum
        over ICI (the only inter-chip traffic).  Returns ``(raw,
        jitted)``: the raw (shard_map-wrapped but un-jitted) callable is
        what :meth:`fit` differentiates — shard_map is differentiable
        (the psum transposes) and the fit step supplies its own jit."""
        import jax
        from jax.sharding import PartitionSpec as P

        if self.mesh is None:
            return many, jax.jit(many, donate_argnums=(1,))

        import functools
        shard_map = getattr(jax, 'shard_map', None)
        if shard_map is not None:
            # jax.shard_map replaced check_rep with check_vma
            shard_map = functools.partial(shard_map, check_vma=False)
        else:
            from jax.experimental.shard_map import shard_map as _sm
            shard_map = functools.partial(_sm, check_rep=False)
        ax = self.axis_name
        params, _ = self.params()
        carry = self.init_carry()
        pspecs, cspecs = self._channel_specs(params, carry)

        def sharded(params, carry, position0, host_staged):
            mix, carry2 = many(params, carry, position0, host_staged)
            return jax.lax.psum(mix, ax), carry2

        f = shard_map(sharded, mesh=self.mesh,
                      in_specs=(pspecs, cspecs, P(), P()),
                      out_specs=(P(), cspecs))
        return f, jax.jit(f, donate_argnums=(1,))

    def _make_render(self, n_blocks: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        if self.layout == 'channels':
            return self._make_render_channels(n_blocks)

        compiled = self.compiled
        F = compiled.block_frames
        step_core = compiled._step_core
        _, axes = self.params()
        n_voices = self.n_voices

        def voice_step(params, carry, position, host):
            block, carry2, _taps = step_core(params, carry, position, host)
            return jnp.broadcast_to(block, (F, compiled.channels)), carry2

        vstep = jax.vmap(voice_step, in_axes=(axes, 0, None, None),
                         out_axes=(0, 0))

        def many(params, carry, position0, host_staged):
            positions = (jnp.int32(position0)
                         + jnp.int32(F) * jnp.arange(n_blocks,
                                                     dtype=jnp.int32))

            def body(c, inp):
                pos, host = inp
                blocks, c2 = vstep(params, c, pos, host)
                return c2, blocks.sum(axis=0)   # master mix over voices

            carry2, mix = jax.lax.scan(body, carry,
                                       (positions, host_staged),
                                       unroll=max(1, min(
                                           self.compiled.scan_unroll,
                                           n_blocks)))
            return mix, carry2

        if self.mesh is None:
            return many, jax.jit(many, donate_argnums=(1,))

        # -- voice-sharded over the mesh: the vmapped voice axis is laid out
        # across devices; the per-block sum over voices becomes a psum over
        # ICI under sharding propagation.
        from jax.sharding import NamedSharding
        mesh = self.mesh
        ax = self.axis_name
        voice_sharding = NamedSharding(mesh, P(ax))
        replicated = NamedSharding(mesh, P())

        def shard_leaf_params(axes_leaf):
            return voice_sharding if axes_leaf == 0 else replicated

        params_shardings = jax.tree.map(shard_leaf_params, axes,
                                        is_leaf=lambda x: x is None or x == 0)
        carry_shardings = jax.tree.map(lambda _: voice_sharding,
                                       self.compiled.carry0)
        return many, jax.jit(
            many,
            in_shardings=(params_shardings, carry_shardings, None, None),
            out_shardings=(replicated, carry_shardings),
            donate_argnums=(1,))

    def _render_pair(self, n_blocks: int):
        if n_blocks not in self._render_cache:
            with self._platform_ctx():
                raw, jitted = self._make_render(n_blocks)
            # jit traces at first CALL: keep the platform pin wrapped
            # around both so trace-time kernel decisions (interpret
            # mode) follow the mesh, not the process default backend
            self._render_cache[n_blocks] = (self._wrap_platform(raw),
                                            self._wrap_platform(jitted))
        return self._render_cache[n_blocks]

    def render_fn(self, n_blocks: int):
        return self._render_pair(n_blocks)[1]

    def _raw_render_fn(self, n_blocks: int):
        """The un-jitted render callable (shard_map-wrapped under a
        channels-layout mesh): what :meth:`fit` differentiates — the fit
        step wraps it in its own jit, and the jitted render's carry
        donation must not apply under an autodiff trace."""
        return self._render_pair(n_blocks)[0]

    def render(self, *, position: int = 0, n_blocks: int = 1,
               carry: typing.Optional[dict] = None):
        """Render the master mix; returns ``(audio (n*F, ch), carry')``."""
        params, _ = self.params()
        if carry is None:
            carry = self.init_carry()
        host = self.compiled.stage_host(position, n_blocks)
        mix, carry2 = self.render_fn(n_blocks)(params, carry, position, host)
        F = self.compiled.block_frames
        ch = (self._out_channels if self.layout == 'channels'
              else self.compiled.channels)
        audio = np.asarray(mix).reshape(n_blocks * F, ch)
        return audio, carry2

    def fit(self, target, trainable, *, steps: int = 200,
            learning_rate: float = 0.02, loss=None,
            steps_per_dispatch: int = None, position: int = 0,
            apply: bool = True, relative_lr: bool = False):
        """Gradient-fit parameters of the poly patch against target MIX
        audio — distributed differentiable synthesis as an API.

        ``trainable``: ``(node, pname)`` pairs; a pair naming a per-voice
        override trains the whole stacked per-voice array (so e.g. 64
        per-voice gains fit simultaneously against one mixed target).
        The loss renders through the SAME lowering ``render`` uses: on a
        mesh-sharded channels-layout patch each device differentiates
        its voice shard and the master-mix psum transposes into a
        broadcast of the loss cotangent over ICI — the gradient's only
        cross-device traffic is the same skinny mix the forward ships.

        ``loss`` defaults to :func:`signals_tpu.learn.spectral_loss`;
        ``steps_per_dispatch`` fuses K adam steps per dispatch (see
        :func:`signals_tpu.learn.fused_descent`).  With ``apply=True``
        fitted overrides are written back via :meth:`set_override`
        (mesh-safe) and fitted shared params into the live node states.
        ``relative_lr=True`` scales each parameter's Adam step by
        ``max(|initial|, 0.01)`` so one rate serves mixed scales (see
        :func:`signals_tpu.learn.fit`).
        Returns a :class:`signals_tpu.learn.FitResult`.
        """
        import jax
        import jax.numpy as jnp

        from signals_tpu.learn import (FitResult, _conform_target,
                                       _merge_train, _split_train,
                                       fused_descent,
                                       resolve_steps_per_dispatch,
                                       spectral_loss)

        compiled = self.compiled
        F = compiled.block_frames
        target, n_blocks = _conform_target(np.asarray(target, dtype=F32),
                                           F)
        loss = spectral_loss if loss is None else loss
        raw = self._raw_render_fn(n_blocks)
        host = compiled.stage_host(position, n_blocks)
        params, _ = self.params()
        carry0 = jax.tree.map(jnp.asarray, self.init_carry())
        ch = (self._out_channels if self.layout == 'channels'
              else compiled.channels)
        index = compiled.index
        train_keys = {(index.info(node).uid, pname)
                      for node, pname in trainable}
        train = _split_train(params, train_keys)

        def loss_fn(tp, target, host, full_params):
            mix, _ = raw(_merge_train(full_params, tp), carry0,
                         jnp.int32(position), host)
            audio = mix.reshape(n_blocks * F, ch)
            return loss(audio, target)

        # cross-call fit cache (same contract as learn.fit): target,
        # host-staged inputs, learning rate and the non-trainable params
        # are chunk *inputs*, so re-fitting this PolyPatch only ever
        # compiles once per (trainable set, target length, loss, K) shape
        K = resolve_steps_per_dispatch(steps, steps_per_dispatch)
        cache_key = (tuple(sorted(train_keys)), n_blocks, position,
                     loss if loss is not spectral_loss else None, K)
        params_dev = jax.tree.map(jnp.asarray, params)
        lr_scale = (jax.tree.map(
            lambda v: jnp.maximum(jnp.abs(jnp.asarray(v)), 0.01), train)
            if relative_lr else None)
        train, losses = fused_descent(
            loss_fn, train, steps=steps, learning_rate=learning_rate,
            steps_per_dispatch=steps_per_dispatch,
            loss_args=(target, host, params_dev),
            chunk_cache=self._fit_chunk_cache.setdefault(cache_key, {}),
            lr_scale=lr_scale)

        final = _merge_train(params, train)
        if apply:
            overrides = ({(n, p): axis for n, p, axis, _
                          in self._channel_overrides}
                         if self.layout == 'channels' else
                         {(node, pname): 0 for node, pname in [
                             (n, p) for n, p in trainable
                             if (index.info(n).uid, p) in self._overrides]})
            for node, pname in trainable:
                uid = index.info(node).uid
                fitted = np.asarray(final[uid][pname])
                axis = overrides.get((node, pname))
                if axis is not None:
                    # per-voice override: route through set_override so
                    # mesh-sharded layouts refresh their device slices
                    per_voice = fitted[0] if axis == 1 else fitted
                    self.set_override(node, pname, per_voice)
                else:
                    state = node.get_state()
                    current = getattr(state, pname)
                    if isinstance(current, np.ndarray):
                        setattr(state, pname, fitted.astype(current.dtype))
                    else:
                        setattr(state, pname, float(fitted))
        return FitResult(params=final, losses=np.asarray(losses))


#: Lane-efficiency knee, measured (MULTICHIP_r03.json tail): 8
#: voices/device cost ~3x the per-voice wall of one 64-voice program —
#: the VPU's 128-lane vectors run mostly empty on narrow shards, so
#: spreading few voices over many chips makes total throughput WORSE
#: than fewer chips.  Sharding below this width warns (PolyPatch) and
#: the mesh factory auto-declines it (voice_mesh(n_voices=...)).
MIN_EFFICIENT_VOICES_PER_DEVICE = 64


def efficient_device_count(n_voices: int, available: int) -> int:
    """Largest device count (>= 1, <= available) keeping voices/device
    at or above :data:`MIN_EFFICIENT_VOICES_PER_DEVICE`."""
    return max(1, min(available,
                      n_voices // MIN_EFFICIENT_VOICES_PER_DEVICE))


def _warn_narrow_shard(n_voices: int, n_devices: int, where: str) -> None:
    import warnings
    per = n_voices / max(n_devices, 1)
    warnings.warn(
        f'{where}: {n_voices} voices over {n_devices} devices = '
        f'{per:.0f} voices/device, below the measured lane-efficiency '
        f'knee ({MIN_EFFICIENT_VOICES_PER_DEVICE}); narrow shards run '
        f'the VPU mostly empty (~3x the per-voice cost at 8/device vs '
        f'64/device, MULTICHIP_r03.json) — use '
        f'voice_mesh(n_voices={n_voices}) (auto-caps at '
        f'{efficient_device_count(n_voices, n_devices)} device(s) here) '
        f'or fewer devices for HIGHER total throughput',
        RuntimeWarning, stacklevel=3)


def voice_mesh(n_devices: typing.Optional[int] = None,
               axis_name: str = 'voices',
               platform: typing.Optional[str] = None,
               n_voices: typing.Optional[int] = None):
    """A 1-D device mesh over the voice axis (all devices by default).

    ``platform='cpu'`` selects the virtual host devices explicitly — the
    path used when validating sharding without multi-chip hardware (the
    default backend may be a single tunneled TPU chip).

    ``n_voices`` engages the efficiency policy: with ``n_devices`` not
    pinned, the mesh is capped at :func:`efficient_device_count` so every
    shard keeps at least :data:`MIN_EFFICIENT_VOICES_PER_DEVICE` lanes
    (spreading fewer is measured SLOWER in total); with ``n_devices``
    pinned below the knee, a RuntimeWarning says so.
    """
    import jax
    from jax.sharding import Mesh
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'need {n_devices} {platform or "default"} devices, have '
                f'{len(devices)}; set XLA_FLAGS='
                f'--xla_force_host_platform_device_count={n_devices} before '
                f'JAX initializes')
        if (n_voices is not None and n_devices > 1
                and n_voices < n_devices * MIN_EFFICIENT_VOICES_PER_DEVICE):
            _warn_narrow_shard(n_voices, n_devices, 'voice_mesh')
        devices = devices[:n_devices]
    elif n_voices is not None:
        devices = devices[:efficient_device_count(n_voices, len(devices))]
    return Mesh(np.array(devices), (axis_name,))
