"""The driver entry points must keep compiling: jittable forward step and
the mesh-sharded training-step dryrun (8 virtual CPU devices)."""

import sys
import pathlib

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import __graft_entry__ as graft


def test_entry_forward_jits():
    fn, args = graft.entry()
    out, carry = jax.jit(fn)(*args)
    assert out.shape == (1024, 1)
    assert np.isfinite(np.asarray(out)).all()
    # second step continues from carry
    out2, _ = jax.jit(fn)(args[0], carry, 1024)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_dryrun_multichip():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
