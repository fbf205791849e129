"""Test configuration: JAX on a virtual 8-device CPU mesh.

Tests force the CPU backend (the TPU tunnel is slow to compile against and
tests must not depend on hardware); multi-chip sharding tests use the 8
virtual host devices.  ``bench.py`` is the TPU path.
"""

import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent XLA cache: repeat suite runs skip recompiling the big mega/
# segment programs (keyed by HLO hash, so code changes recompile; set via
# config.update because jax is pre-imported in this image and env vars
# are captured before conftest runs)
from signals_tpu.utils import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(
    os.path.expanduser('~/.cache/signals_tpu_xla_tests'))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from signals_tpu.core import BlockLoc, Request, Shape  # noqa: E402
import signals_tpu.compiler  # noqa: E402

# scan unrolling trades compile time for steady-state throughput; tests
# only care about semantics, so keep compiles fast
signals_tpu.compiler.CompiledPatch.scan_unroll = 1


@pytest.fixture
def rate():
    return 44100


@pytest.fixture
def block_frames():
    return 512


def pull_blocks(node, n_blocks, *, block_frames=512, rate=44100, channels=1,
                start_block=0):
    """Drive the pull engine like the reference audio callback
    (``dev.py:167-179``) and return the concatenated full-shape audio."""
    out = []
    for i in range(start_block, start_block + n_blocks):
        loc = BlockLoc(position=i * block_frames, rate=rate,
                       shape=Shape(frames=block_frames, channels=channels))
        block = node.respond(Request(requestor=None, port='test', loc=loc))
        out.append(np.broadcast_to(block, (block_frames, channels)))
    return np.concatenate(out, axis=0)


def fixed(value):
    from signals_tpu.nodes.fixed import Fixed
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(value, dtype=np.float32))
    return f
