"""Differentiable synthesis: fit patch parameters to target audio.

New TPU-native capability with no reference counterpart: because the whole
patch compiles to one pure JAX program, the rendered audio is differentiable
with respect to every traced parameter (oscillator frequencies, constants,
envelope times, filter cutoffs feeding through the closed-form Butterworth
design and the associative-scan IIR).  ``fit`` runs gradient descent (optax)
on selected parameters against a target waveform — synth parameter
estimation / "patch matching" as a first-class framework feature, and the
training step that multi-chip sharding (``__graft_entry__.dryrun_multichip``)
distributes.
"""

from __future__ import annotations

import typing

import numpy as np

from signals_tpu.compiler import CompiledPatch, compile_node
from signals_tpu.graph import Emitter

F32 = np.float32


def _frames_half_hop(x, n):
    """Frame a 1-D signal into ``(frames, n)`` windows at hop ``n // 2``
    WITHOUT a gather: even-offset windows are one reshape, odd-offset
    windows one shifted reshape.  A gather's transpose is a scatter-add
    — measured ~4 ms per fit step on v5e, more than the entire filter
    backward — while a slice+reshape transposes to a pad.  Frame ORDER
    differs from the sliding order (evens then odds); every consumer
    here reduces over frames, so only f32 summation order changes."""
    import jax.numpy as jnp
    T = x.shape[0]
    hop = n // 2
    n_even = (T - n) // n + 1
    even = x[:n_even * n].reshape(n_even, n)
    if T - hop >= n:
        n_odd = (T - hop - n) // n + 1
        odd = x[hop:hop + n_odd * n].reshape(n_odd, n)
        return jnp.concatenate([even, odd], axis=0)
    return even


def spectral_loss(pred, target, *, fft_sizes=(256, 1024), waveform=1.0):
    """Multi-resolution magnitude-spectrum L1 + waveform L2 — the standard
    differentiable-audio loss family (better-behaved gradients through
    oscillator phase than plain L2).  Multichannel signals contribute
    their channel MEAN (the mono mix) to the spectral term — fitting a
    64-voice patch should match the *mix's* spectrum, not voice 0's —
    while the waveform L2 stays per-channel.

    ``waveform`` weights the L2 term.  For FREQUENCY estimation set it
    to 0 (``functools.partial(spectral_loss, waveform=0.0)`` as
    ``fit``'s ``loss``): a detuned oscillator's waveform-L2 gradient
    oscillates with the beat phase and drowns the spectral pull —
    measured on a 440 Hz sine target, fits starting 12-30 Hz off do not
    move under the default loss but converge to <0.2 Hz spectral-only.
    Amplitude/filter parameters are fine (and better-conditioned) with
    the default 1.0."""
    import jax.numpy as jnp
    loss = waveform * jnp.mean((pred - target) ** 2)
    pm = pred.mean(axis=1)
    tm = target.mean(axis=1)
    for n in fft_sizes:
        if pred.shape[0] < n:
            continue
        win = jnp.hanning(n).astype(jnp.float32)
        ps = jnp.abs(jnp.fft.rfft(_frames_half_hop(pm, n) * win, axis=-1))
        ts = jnp.abs(jnp.fft.rfft(_frames_half_hop(tm, n) * win, axis=-1))
        loss = loss + jnp.mean(jnp.abs(ps - ts)) / len(fft_sizes)
    return loss


class FitResult(typing.NamedTuple):
    params: dict
    losses: np.ndarray

    def value_of(self, compiled: CompiledPatch, node: Emitter, pname: str):
        uid = compiled.index.info(node).uid
        return np.asarray(self.params[uid][pname])


def per_channel_spectral_loss(pred, target, *, fft_sizes=(1024, 4096),
                              waveform: float = 0.0,
                              log_eps: float = 1e-4):
    """Multi-resolution magnitude + log-magnitude spectral L1 computed
    PER CHANNEL — the stem-matching loss for per-voice parameter
    recovery.  :func:`spectral_loss` compares the channel-MEAN (mix)
    spectrum, which cannot separate voices; here each channel's own
    spectrum pulls its own parameters, which is what makes per-voice
    frequency fitting conditioned at all.

    Practical notes measured while building the flagship fit benchmark
    (``bench.py bench_fit_full``):

    * keep ``waveform`` at 0 when frequencies are trainable — at
      multi-second durations the waveform-L2 term's frequency basin is
      half a beat cycle (~0.3 Hz), far narrower than any realistic
      mistuning, and its oscillating gradient drowns the spectral pull;
    * frequency gradients are only trustworthy through waveforms whose
      implementation is a SMOOTH composition (sines): naive autodiff of
      a sawtooth drops the wrap discontinuities' delta terms, biasing
      ``d saw/d hz`` so descent diverges under ANY loss (and the
      triangle's ``sign()``-based implementation degenerates the same
      way) — the standard reason differentiable-synthesis systems fit
      sinusoidal models;
    * the log-magnitude term is what keeps low-level partials (a
      filtered 3rd harmonic) pulling their share.
    """
    import jax.numpy as jnp
    loss = (waveform * jnp.mean((pred - target) ** 2)
            if waveform else 0.0)
    for n in fft_sizes:
        if pred.shape[0] < n:
            continue
        win = jnp.hanning(n).astype(jnp.float32)[None, :, None]
        hop = n // 2
        nfr = (pred.shape[0] - n) // hop + 1
        idx = (np.arange(nfr)[:, None] * hop + np.arange(n)[None, :])
        ps = jnp.abs(jnp.fft.rfft(pred[idx] * win, axis=1))
        ts = jnp.abs(jnp.fft.rfft(target[idx] * win, axis=1))
        loss = loss + (jnp.mean(jnp.abs(ps - ts))
                       + jnp.mean(jnp.abs(jnp.log(ps + log_eps)
                                          - jnp.log(ts + log_eps)))
                       ) / len(fft_sizes)
    return loss


def make_loss_core(compiled: CompiledPatch, n_blocks: int, *,
                   position: int = 0,
                   loss: typing.Callable = None):
    """A pure ``loss_fn(params, target, host) -> scalar`` rendering the
    patch for ``n_blocks`` blocks.  Target AND the host-staging dict are
    *arguments* (not trace constants), so one compilation serves every
    target — and every snapshot of host-fed inputs — of the same shape:
    the cacheable core behind :func:`make_loss_fn` and the cross-call
    fit cache (:func:`fit`)."""
    import jax

    import jax.numpy as jnp

    F = compiled.block_frames
    loss = spectral_loss if loss is None else loss
    # differentiate through the fastest eligible lowering (mega window,
    # delay solver, segmented feedback scan, vmap) — same selection as
    # render_fn, so fitting an echo patch pays segments, not n_blocks
    # sequential steps
    many = compiled.render_core(n_blocks)
    carry0 = jax.tree.map(jnp.asarray, compiled.carry0)

    def loss_fn(params, target, host):
        blocks, _, _ = many(params, carry0, jnp.int32(position), host)
        audio = blocks.reshape(n_blocks * F, compiled.channels)
        return loss(audio, target)

    return loss_fn


def _conform_target(target, F: int):
    """Trim to whole blocks, promote to f32 2-D; returns (target, n).

    Raises for targets shorter than one block: the render is a whole
    number of blocks, so a short target would broadcast-fail deep
    inside the jitted loss with an opaque shape error."""
    if target.shape[0] < F:
        raise ValueError(
            f'target has {target.shape[0]} frames; fitting needs at '
            f'least one whole {F}-frame block (pad the audio or lower '
            'block_frames)')
    import jax.numpy as jnp
    n_blocks = target.shape[0] // F
    target = jnp.asarray(target[:n_blocks * F], dtype=jnp.float32)
    if target.ndim == 1:
        target = target[:, None]
    return target, n_blocks


def make_loss_fn(compiled: CompiledPatch, target: np.ndarray, *,
                 position: int = 0,
                 loss: typing.Callable = None):
    """A pure ``loss_fn(params) -> scalar`` rendering the patch over the
    target's duration."""
    target, n_blocks = _conform_target(target, compiled.block_frames)
    core = make_loss_core(compiled, n_blocks, position=position, loss=loss)
    host = compiled.stage_host(position, n_blocks)
    return lambda params: core(params, target, host)


def resolve_steps_per_dispatch(steps: int,
                               steps_per_dispatch: int = None) -> int:
    """The fused chunk length ``K`` — ONE policy: callers keying chunk
    caches on K (``fit``, ``PolyPatch.fit``) must agree with the chunks
    :func:`fused_descent` actually builds."""
    if steps_per_dispatch is None:
        return max(1, min(16, int(steps)))
    return max(1, int(steps_per_dispatch))


def fused_descent(loss_fn, train, *, steps: int, learning_rate: float,
                  steps_per_dispatch: int = None, loss_args=(),
                  chunk_cache: dict = None, lr_scale=None):
    """Adam on ``loss_fn(train, *loss_args) -> scalar``, K steps fused
    per jitted ``lax.scan`` dispatch (see :func:`fit`): every remote
    execution carries a fixed ~25 ms dispatch cost, so a per-step Python
    loop caps at ~19 steps/s while the fused loop measures 300+ on the
    64-voice fit (v5e).  Returns ``(train', losses)``; the shared
    optimizer loop of :func:`fit` and ``PolyPatch.fit``.

    ``loss_args`` are threaded through the jitted chunk as *data* (the
    target waveform, the host-staging dict, the non-trainable param
    snapshot), and the learning rate rides inside the optimizer state
    (``optax.inject_hyperparams``) — so neither changing the target nor
    the learning rate retraces, and nothing call-specific is ever baked
    into the cached trace as a constant.

    ``chunk_cache`` (dict) persists the jitted chunk functions across
    calls: pass the same dict again and the ~10 s forward+backward
    compilation of the first fit is skipped entirely (measured on v5e:
    a second 64-voice fit call goes 14 s -> the pure dispatch cost).
    The CALLER guarantees cache validity — entries are only reusable
    for the same ``loss_fn`` math, ``train`` structure and
    ``loss_args`` shapes (see :func:`fit`'s cache key).

    ``lr_scale``: optional pytree matching ``train`` of per-leaf step
    multipliers, threaded through the jitted chunk as DATA (changing it
    never retraces).  Adam's steps are gradient-scale-free but
    parameter-scale-absolute — one ``learning_rate`` cannot serve a
    0.8 gain and a 2000 Hz cutoff at once; per-leaf multipliers of
    ``max(|p0|, floor)`` make the step RELATIVE to each parameter's
    own magnitude (see :func:`fit` ``relative_lr``)."""
    import jax
    import optax

    # NB: a 0-d ndarray, not np.float32(...) — optax's inject_hyperparams
    # silently declines to inject numpy *scalar* hyperparams (they'd bake
    # into the cached trace as constants; tested in test_learn.py)
    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=np.asarray(learning_rate, dtype=np.float32))
    opt_state = tx.init(train)

    K = resolve_steps_per_dispatch(steps, steps_per_dispatch)
    chunk_cache = {} if chunk_cache is None else chunk_cache

    import jax.numpy as jnp
    scale = (jax.tree.map(lambda v: jnp.ones_like(jnp.asarray(v)), train)
             if lr_scale is None else lr_scale)

    def make_chunk(length):
        @jax.jit
        def run(train_params, opt_state, loss_args, scale):
            def body(carry, _):
                tp, st = carry
                value, grads = jax.value_and_grad(loss_fn)(tp, *loss_args)
                updates, st = tx.update(grads, st, tp)
                updates = jax.tree.map(jnp.multiply, updates, scale)
                tp = optax.apply_updates(tp, updates)
                return (tp, st), value

            (tp, st), values = jax.lax.scan(
                body, (train_params, opt_state), None, length=length)
            return tp, st, values

        return run

    losses: list = []
    remaining = steps
    while remaining > 0:
        k = min(K, remaining)
        run = chunk_cache.get(k)
        if run is None:
            run = chunk_cache[k] = make_chunk(k)
        train, opt_state, values = run(train, opt_state, loss_args, scale)
        losses.extend(float(v) for v in np.asarray(values))
        remaining -= k
    return train, losses


def _split_train(params, train_keys):
    """The trainable sub-pytree of ``params`` as f32 jnp leaves (frozen
    leaves include bools/ints like ``enabled``, which jax.grad
    rejects)."""
    import jax.numpy as jnp
    train: dict = {}
    for uid, p in train_keys:
        train.setdefault(uid, {})[p] = jnp.asarray(params[uid][p],
                                                   dtype=jnp.float32)
    return train


def _merge_train(params, train_params):
    """Overlay the trainable leaves onto the full params pytree (pure —
    safe under jit with both as traced arguments)."""
    out = {uid: dict(leaves) for uid, leaves in params.items()}
    for uid, leaves in train_params.items():
        for p, v in leaves.items():
            out[uid][p] = v
    return out


def fit(root: Emitter,
        target: np.ndarray,
        trainable: typing.Collection[tuple[Emitter, str]],
        *,
        rate: int = 44100,
        block_frames: int = 1024,
        steps: int = 200,
        learning_rate: float = 0.02,
        loss: typing.Callable = None,
        apply: bool = True,
        steps_per_dispatch: int = None,
        relative_lr: bool = False) -> FitResult:
    """Gradient-fit the ``(node, param)`` pairs in ``trainable`` so the patch
    rendered at ``root`` matches ``target``.

    With ``apply=True`` the fitted values are written back into the live
    nodes' states (so a subsequent render/dump picks them up).

    ``steps_per_dispatch``: how many optimizer steps run fused inside ONE
    jitted ``lax.scan`` dispatch (default ``min(16, steps)``).  Every
    remote execution carries a fixed dispatch cost (~25 ms through the
    axon tunnel — ``BENCH_full.json p50_block_latency_ms``) that a
    per-step Python loop pays per step; fusing amortizes it across K
    steps (measured on v5e: the 64-voice 1 s fit goes 19 -> ~100
    steps/s at K=8).  The fused loop is step-for-step identical math —
    same order, same updates — so losses/params match ``1`` (the
    unfused path) exactly up to compiler reassociation.

    Repeated fits are cheap: the jitted K-step chunk is cached on the
    compiled patch keyed by (trainable set, target length, loss, K), and
    the target, the learning rate AND every non-trainable param value
    ride through it as data — so re-fitting against new audio, sweeping
    learning rates, or editing other patch params between fits all skip
    the ~10 s forward+backward compilation (only a new *shape* of
    problem retraces).  Pass the same ``loss`` callable object to hit
    the cache (a fresh ``functools.partial`` is a fresh key).

    ``relative_lr=True`` makes ``learning_rate`` a RELATIVE step: each
    parameter steps ``learning_rate * max(|p0|, 0.01)`` per update, so
    one rate serves parameters of any scale (a 0.8 gain and a 2000 Hz
    cutoff fit together at the default — Adam's steps are
    gradient-scale-free but parameter-scale-absolute).  The multipliers
    ride through the cached chunk as data — never a retrace.
    """
    compiled = compile_node(root, block_frames=block_frames, rate=rate)
    target, n_blocks = _conform_target(target, compiled.block_frames)
    core = make_loss_core(compiled, n_blocks, loss=loss)
    params = compiled.params()
    index = compiled.index
    train_keys = {(index.info(node).uid, pname)
                  for node, pname in trainable}
    train = _split_train(params, train_keys)

    def loss_train(tp, target, host, full_params):
        return core(_merge_train(full_params, tp), target, host)

    K = resolve_steps_per_dispatch(steps, steps_per_dispatch)
    cache_root = compiled.__dict__.setdefault('_fit_chunk_cache', {})
    cache_key = (tuple(sorted(train_keys)), n_blocks,
                 loss if loss is not None else None, K)
    # one host->device transfer per fit call, not per chunk dispatch;
    # host-fed inputs restage per call so the cached chunk never sees
    # a stale snapshot
    import jax
    import jax.numpy as jnp
    params_dev = jax.tree.map(jnp.asarray, params)
    host = compiled.stage_host(0, n_blocks)
    lr_scale = (jax.tree.map(
        lambda v: jnp.maximum(jnp.abs(jnp.asarray(v)), 0.01), train)
        if relative_lr else None)
    train, losses = fused_descent(
        loss_train, train, steps=steps, learning_rate=learning_rate,
        steps_per_dispatch=steps_per_dispatch,
        loss_args=(target, host, params_dev),
        chunk_cache=cache_root.setdefault(cache_key, {}),
        lr_scale=lr_scale)

    final = _merge_train(params, train)
    if apply:
        for node, pname in trainable:
            uid = index.info(node).uid
            fitted = np.asarray(final[uid][pname])
            state = node.get_state()
            current = getattr(state, pname)
            if isinstance(current, np.ndarray):
                setattr(state, pname, fitted.astype(current.dtype))
            else:
                setattr(state, pname, float(fitted))

    return FitResult(params=final, losses=np.asarray(losses))
