"""Stateless, seek-stable random numbers.

The reference's white noise is unseeded ``np.random.rand``
(``src/signals/chain/noise.py:23``) — nondeterministic, and deterministic only
while a block lives in the 16-entry cache.  A TPU program cannot carry hidden
host RNG state, and seekable timelines demand that noise at frame *n* is a
pure function of *n*.  So noise here is **counter-based**: a uint32 avalanche
hash of ``(seed, frame_index, channel)`` mapped to [0, 1).  Identical in both
engines (numpy and jax.numpy wrap uint32 arithmetic identically), so noise is
sample-exact across engines, seeks, and replays.

The mixer is the finalizer of Ellis's ``lowbias32`` hash (public domain), a
standard 2-round xor-shift/multiply avalanche.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = 0x9E3779B9
_MIX1 = 0x7FEB352D
_MIX2 = 0x846CA68B
_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35


def uniform01(xp, seed, frame_idx, n_channels: int, *, salt: int = 0):
    """Uniform [0, 1) floats of shape ``(frames, n_channels)``.

    ``frame_idx``: integer column ``(frames, 1)`` of absolute frame indices
    (negative context indices wrap through uint32 — still deterministic).
    ``seed`` may be a traced scalar.  ``salt`` (host int) selects an
    independent stream for the same seed (octave rows of pink noise etc.);
    ``salt=0`` is the unsalted stream.
    """
    u32 = xp.uint32
    f = frame_idx.astype(u32)
    c = xp.arange(n_channels, dtype=u32).reshape(1, -1)
    s = xp.asarray(seed).astype(u32)
    x = (f * u32(_GOLDEN)) ^ (c * u32(_C1)) ^ (s * u32(_C2))
    if salt:
        x = x ^ u32((salt * _MIX1) & 0xFFFFFFFF)
    x = x ^ (x >> u32(16))
    x = x * u32(_MIX1)
    x = x ^ (x >> u32(15))
    x = x * u32(_MIX2)
    x = x ^ (x >> u32(16))
    # top 24 bits -> [0, 1) exactly representable in float32
    return (x >> u32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24))
