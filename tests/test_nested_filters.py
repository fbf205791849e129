"""Nested (cascaded) filters: cross-engine deviation bound, pinned.

A filter whose input is another filter compares differently across the
two engines than a single filter does: each engine computes the inner
filter's context-window output with its own IIR implementation (scipy
TDF2 in the pull oracle, coupled-form scan/Pallas in the compiled
engine), and the outer filter amplifies the tiny implementation
difference at its context boundary.  Measured steady-state deviation:

* nested static cutoffs:      ~1.3e-6
* either/both cutoffs swept:  ~1.8e-5   (-95 dBFS)

far below audibility but above the 1e-5 single-filter budget.  These
tests pin the bounds (with ~3x headroom) so any regression of the
cascade numerics is caught; the bound is documented in
docs/ARCHITECTURE.md ("nested filters").  All five benchmark configs use
single filters and hold <=2e-7 (bench parity gate).
"""

import numpy as np
import pytest

import signals_tpu.compiler as comp
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.fx import Gain, HighPass, LowPass, Mix
from signals_tpu.nodes.osc import Sawtooth, Sine
from tests.conftest import fixed, pull_blocks

pytestmark = pytest.mark.slow   # compile-heavy: full-suite tier

F, RATE = 1024, 44100


def build(sweep_inner: bool, sweep_outer: bool):
    saw = Sawtooth()
    saw.hertz = fixed(110.0)
    if sweep_inner:
        lfo = Sine()
        lfo.hertz = fixed(1.3)
        d = Gain()
        d.left = lfo
        d.right = fixed(800.0)
        cut = Mix()
        cut.left = d
        cut.right = fixed(1500.0)
        cut.mix = fixed(0.5)
    else:
        cut = fixed(1500.0)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = cut
    if sweep_outer:
        lfo2 = Sine()
        lfo2.hertz = fixed(0.7)
        d2 = Gain()
        d2.left = lfo2
        d2.right = fixed(300.0)
        cut2 = Mix()
        cut2.left = d2
        cut2.right = fixed(900.0)
        cut2.mix = fixed(0.5)
    else:
        cut2 = fixed(900.0)
    hp = HighPass()
    hp.input = lp
    hp.cutoff = cut2
    return hp


@pytest.mark.parametrize('sweep_inner,sweep_outer,bound', [
    (False, False, 5e-6),
    (True, False, 5e-5),
    (False, True, 5e-5),
    (True, True, 5e-5),
])
def test_nested_filter_deviation_pinned(sweep_inner, sweep_outer, bound):
    comp._compile_cache.clear()
    c = compile_node(build(sweep_inner, sweep_outer), block_frames=F,
                     rate=RATE, channels=1)
    got, _ = c.render(n_blocks=40, deliver_taps=False)
    oracle = pull_blocks(build(sweep_inner, sweep_outer), 40,
                         block_frames=F, channels=1)
    err = float(np.abs(got - oracle).max())
    assert err <= bound, (sweep_inner, sweep_outer, err)


def test_nested_filter_deviation_does_not_grow():
    """The deviation is bounded steady-state, not an accumulating drift:
    late blocks deviate no more than the pinned bound."""
    comp._compile_cache.clear()
    c = compile_node(build(True, True), block_frames=F, rate=RATE,
                     channels=1)
    got, _ = c.render(position=60 * F, n_blocks=20, deliver_taps=False)
    root = build(True, True)
    oracle = pull_blocks(root, 20, block_frames=F, channels=1,
                         start_block=60)
    assert float(np.abs(got - oracle).max()) <= 5e-5
