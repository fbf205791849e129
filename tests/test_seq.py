"""Note sequencing (gate/pitch event tracks)."""

import numpy as np

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.env import ADSR
from signals_tpu.nodes.fx import RingMod
from signals_tpu.nodes.osc import Sine
from signals_tpu.nodes.seq import GateSeq, PitchSeq

from conftest import fixed, pull_blocks

F = 512
RATE = 44100


def _melody():
    # (start_s, dur_s, hertz)
    return [(0.00, 0.10, 220.0),
            (0.15, 0.10, 330.0),
            (0.30, 0.15, 440.0)]


def test_gate_seq_activity():
    g = GateSeq()
    g.set_events([(e[0], e[1]) for e in _melody()], rate=RATE)
    audio = pull_blocks(g, 45, block_frames=F, rate=RATE)[:, 0]
    t = np.arange(len(audio)) / RATE
    assert audio[int(0.05 * RATE)] == 1.0
    assert audio[int(0.12 * RATE)] == 0.0
    assert audio[int(0.20 * RATE)] == 1.0
    assert audio[int(0.50 * RATE)] == 0.0
    assert set(np.unique(audio)) <= {0.0, 1.0}


def test_pitch_seq_sample_and_hold():
    p = PitchSeq()
    p.set_events(_melody(), rate=RATE)
    audio = pull_blocks(p, 45, block_frames=F, rate=RATE)[:, 0]
    assert audio[int(0.05 * RATE)] == 220.0
    assert audio[int(0.12 * RATE)] == 220.0      # held between notes
    assert audio[int(0.20 * RATE)] == 330.0
    assert audio[int(0.40 * RATE)] == 440.0      # held after the last


def test_seq_parity_and_loop():
    gate = GateSeq()
    gate.set_events([(0.0, 0.05), (0.1, 0.05)], rate=RATE)
    gate.get_state().loop = int(0.2 * RATE)
    pitch = PitchSeq()
    pitch.set_events(_melody(), rate=RATE)
    pitch.get_state().loop = int(0.5 * RATE)

    osc = Sine()
    osc.hertz = pitch
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.005, 0.02, 0.6, 0.03
    voiced = RingMod()
    voiced.left = osc
    voiced.right = env

    compiled = compile_node(voiced, block_frames=F, rate=RATE, channels=1)
    audio, _ = compiled.render(n_blocks=90)
    oracle = pull_blocks(voiced, 90, block_frames=F, rate=RATE, channels=1)
    assert np.abs(audio - oracle).max() <= 1e-5
    # the loop actually loops: the gate pattern at t and t+0.2s match
    n = int(0.2 * RATE)
    g_audio = pull_blocks(GateSeqLike(), 45, block_frames=F, rate=RATE)[:, 0]
    assert np.array_equal(g_audio[:n], g_audio[n:2 * n])


def GateSeqLike():
    gate = GateSeq()
    gate.set_events([(0.0, 0.05), (0.1, 0.05)], rate=RATE)
    gate.get_state().loop = int(0.2 * RATE)
    return gate


def test_sequenced_patch_is_loop_free_and_seekable():
    gate = GateSeq()
    gate.set_events([(0.0, 0.1), (0.2, 0.1)], rate=RATE)
    pitch = PitchSeq()
    pitch.set_events(_melody(), rate=RATE)
    osc = Sine()
    osc.hertz = pitch
    env = ADSR()
    env.gate = gate
    voiced = RingMod()
    voiced.left = osc
    voiced.right = env
    compiled = compile_node(voiced, block_frames=F, rate=RATE, channels=1)
    assert not compiled.carry0                       # loop-free
    full, _ = compiled.render(n_blocks=40)
    seeked, _ = compiled.render(position=20 * F, n_blocks=10)
    np.testing.assert_array_equal(seeked, full[20 * F:30 * F])
