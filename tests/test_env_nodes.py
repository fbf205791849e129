"""ADSR envelope semantics (new node; gate-driven, block-rate edges)."""

import numpy as np

from signals_tpu.core import BlockLoc, Request, Shape
from signals_tpu.nodes.env import ADSR
from signals_tpu.nodes.osc import Square

from conftest import fixed, pull_blocks

RATE = 44100
F = 256


def _env(attack=0.01, decay=0.05, sustain=0.5, release=0.05, gate_hz=2.0):
    gate = Square()
    gate.hertz = fixed(gate_hz)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = (attack, decay, sustain,
                                                   release)
    return env


def test_envelope_shape():
    env = _env(attack=0.01, decay=0.05, sustain=0.5, release=0.05,
               gate_hz=2.0)
    # gate: ON for first 0.25 s, off 0.25 s...
    audio = pull_blocks(env, int(0.5 * RATE / F), block_frames=F, rate=RATE)
    a = audio[:, 0]
    n_attack = int(0.01 * RATE)
    # rises monotonically through the attack
    assert np.all(np.diff(a[:n_attack]) >= 0)
    assert abs(a[n_attack] - 1.0) < 0.05
    # decays to sustain
    n_ads = int((0.01 + 0.05) * RATE)
    assert abs(a[n_ads + 100] - 0.5) < 0.05
    # release after gate off (0.25 s): decays toward zero
    n_off = int(0.25 * RATE)
    n_rel_end = n_off + int(0.05 * RATE)
    assert a[n_rel_end + 200] < 0.02
    assert np.all(a >= 0) and np.all(a <= 1.0 + 1e-6)


def test_envelope_block_rate_edges():
    """Gate edges are detected at block granularity by design — the edge
    lands on the first frame of the block where the gate sample flips."""
    env = _env(gate_hz=2.0)
    audio = pull_blocks(env, int(0.3 * RATE / F), block_frames=F, rate=RATE)
    a = audio[:, 0]
    assert a[0] == 0.0          # attack starts from zero level
    assert a.max() > 0.9


def test_retrigger_from_current_level():
    """A fast gate retriggers the attack from the envelope's current level
    (no click to zero)."""
    env = _env(attack=0.1, decay=0.5, sustain=0.8, release=0.5,
               gate_hz=8.0)   # period shorter than attack+release
    audio = pull_blocks(env, int(0.5 * RATE / F), block_frames=F, rate=RATE)
    a = audio[:, 0]
    # envelope never snaps discontinuously: max per-block-boundary jump
    # stays bounded by the attack/release slopes at block scale
    jumps = np.abs(np.diff(a))
    assert jumps.max() < 0.01
