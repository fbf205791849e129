"""Pull-interpreter semantics: node math vs closed forms, block cache,
broadcast shape rules — the reference's evaluation model
(``src/signals/chain/__init__.py:256-457``)."""

import numpy as np
import pytest

from signals_tpu.core import BadShape, BlockLoc, Request, Shape
from signals_tpu.graph import BadChannels, CycleError
from signals_tpu.nodes.fixed import Fixed
from signals_tpu.nodes.fx import Amp, Gain, Mix, RingMod
from signals_tpu.nodes.noise import White
from signals_tpu.nodes.osc import Sawtooth, Sine, Square, Triangle
from signals_tpu.nodes.shape import Flatten, FlattenUnit, Merge, Select

from conftest import fixed, pull_blocks


def _loc(position=0, frames=64, channels=1, rate=44100):
    return BlockLoc(position=position, rate=rate,
                    shape=Shape(frames=frames, channels=channels))


def _req(loc):
    return Request(requestor=None, port='t', loc=loc)


def test_fixed_emits_value():
    f = fixed([[1.5, -2.0]])
    block = f.respond(_req(_loc()))
    np.testing.assert_array_equal(block, [[1.5, -2.0]])
    assert f.channels == 2


def test_unconnected_port_yields_empty():
    s = Sine()
    block = s.respond(_req(_loc(frames=8)))
    # hertz unplugged -> 0 Hz, phase 0 -> sin(0) = 0
    np.testing.assert_array_equal(block, np.zeros((8, 1)))


@pytest.mark.parametrize('cls,formula', [
    (Sine, lambda t: np.sin(2 * np.pi * np.mod(t, 1.0))),
    (Square, lambda t: np.sign(0.5 - np.mod(t, 1))),
    (Sawtooth, lambda t: 2 * np.mod(t - 0.5, 1) - 1),
    (Triangle, lambda t: (4 * np.mod(t - 0.25, 0.5) - 1)
        * np.sign(np.mod(t - 0.25, 1) - 0.5)),
])
def test_oscillator_formulas(cls, formula):
    osc = cls()
    osc.hertz = fixed(440.0)
    block = osc.respond(_req(_loc(frames=256)))
    t = (np.arange(256).reshape(-1, 1) / np.float32(44100)
         * np.float32(440)).astype(np.float32)
    np.testing.assert_allclose(block, formula(t).astype(np.float32),
                               atol=5e-6, rtol=0)


def test_oscillator_phase_offset():
    osc = Sine()
    osc.hertz = fixed(100.0)
    osc.phase = fixed(0.25)
    block = osc.respond(_req(_loc(frames=1)))
    np.testing.assert_allclose(block, [[1.0]], atol=1e-6)


def test_oscillator_is_position_addressed():
    """Stateless phase: seeking produces identical samples
    (reference ``osc.py:32``)."""
    osc = Sine()
    osc.hertz = fixed(440.0)
    a = osc.respond(_req(_loc(position=1000, frames=64)))
    osc2 = Sine()
    osc2.hertz = fixed(440.0)
    _ = osc2.respond(_req(_loc(position=0, frames=64)))
    b = osc2.respond(_req(_loc(position=1000, frames=64)))
    np.testing.assert_array_equal(a, b)


def test_mix():
    m = Mix()
    m.left = fixed(1.0)
    m.right = fixed(3.0)
    m.mix = fixed(0.25)
    np.testing.assert_allclose(m.respond(_req(_loc())), [[2.5]])


def test_ringmod_and_gain():
    r = RingMod()
    r.left = fixed(3.0)
    r.right = fixed(-2.0)
    np.testing.assert_allclose(r.respond(_req(_loc())), [[-6.0]])
    g = Gain()
    g.left = fixed(3.0)
    g.right = fixed(0.5)
    np.testing.assert_allclose(g.respond(_req(_loc())), [[1.5]])


def test_amp_signed_power():
    a = Amp()
    a.left = fixed(-4.0)
    a.right = fixed(0.5)
    np.testing.assert_allclose(a.respond(_req(_loc())), [[-2.0]])


def test_white_noise_is_deterministic_and_seek_stable():
    w = White()
    w.get_state().channels = 2
    a = w.respond(_req(_loc(position=128, frames=64, channels=2)))
    w2 = White()
    w2.get_state().channels = 2
    b = w2.respond(_req(_loc(position=128, frames=64, channels=2)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 2)
    assert np.all((a >= 0) & (a < 1))
    assert a.std() > 0.2  # roughly uniform

    w3 = White()
    w3.get_state().channels = 2
    w3.get_state().seed = 99
    c = w3.respond(_req(_loc(position=128, frames=64, channels=2)))
    assert not np.array_equal(a, c)


def test_flatten_and_select():
    stereo = fixed([[1.0, 3.0]])
    f = Flatten()
    f.input = stereo
    np.testing.assert_allclose(f.respond(_req(_loc())), [[4.0]])
    fu = FlattenUnit()
    fu.input = stereo
    np.testing.assert_allclose(fu.respond(_req(_loc())), [[2.0]])
    s = Select()
    s.input = stereo
    s.get_state().index = 1
    np.testing.assert_allclose(s.respond(_req(_loc())), [[3.0]])
    s2 = Select()
    s2.input = stereo
    s2.get_state().index = 5  # out of range -> empty result
    np.testing.assert_array_equal(s2.respond(_req(_loc())), [[0.0]])


def test_merge_broadcasts_constants():
    m = Merge()
    m.left = fixed(1.0)
    m.right = fixed([[2.0, 3.0]])
    block = m.respond(_req(_loc(frames=4, channels=3)))
    assert block.shape == (4, 3)
    np.testing.assert_allclose(block[0], [1.0, 2.0, 3.0])


def test_implicit_channels_inference():
    m = RingMod()
    m.left = fixed([[1.0, 2.0]])
    m.right = fixed(3.0)   # broadcast-1 discarded
    assert m.channels == 2
    m2 = RingMod()
    m2.left = fixed([[1.0, 2.0]])
    m2.right = fixed([[1.0, 2.0, 3.0]])
    with pytest.raises(BadChannels):
        _ = m2.channels


def test_enabled_false_yields_empty():
    osc = Sine()
    osc.hertz = fixed(440.0)
    osc.get_state().enabled = False
    np.testing.assert_array_equal(osc.respond(_req(_loc())), [[0.0]])


def test_block_cache_dedups_fanout():
    osc = Sine()
    osc.hertz = fixed(440.0)
    calls = {'n': 0}
    orig = osc.kernel

    def counting_kernel(ctx):
        calls['n'] += 1
        return orig(ctx)

    osc.kernel = counting_kernel
    g1 = Gain()
    g1.left = osc
    g1.right = fixed(1.0)
    g2 = Gain()
    g2.left = osc
    g2.right = fixed(2.0)
    loc = _loc(frames=64)
    g1.respond(_req(loc))
    g2.respond(_req(loc))
    # one full-block eval + one cached block-rate slice
    assert calls['n'] == 1


def test_block_cache_serves_subwindows():
    osc = Sine()
    osc.hertz = fixed(440.0)
    full = osc.respond(_req(_loc(position=0, frames=64)))
    sub = osc.respond(_req(_loc(position=16, frames=16)))
    np.testing.assert_array_equal(sub, full[16:32])


def test_bad_shape_raised():
    class Liar(Fixed):
        @property
        def channels(self):
            return 1

        def kernel(self, ctx):
            return np.ones((7, 3), dtype=np.float32)

    liar = Liar()
    g = Gain()
    g.left = liar
    g.right = fixed(1.0)
    with pytest.raises(BadShape):
        g.respond(_req(_loc(frames=16, channels=1)))


def test_cycle_detection_without_delay():
    a = Gain()
    b = Gain()
    a.left = b
    b.left = a
    with pytest.raises(CycleError):
        a.upstream()


def test_disconnect_via_delattr():
    osc = Sine()
    hz = fixed(440.0)
    osc.hertz = hz
    assert osc.inputs_by_port == {'hertz': hz}
    assert ('hertz', osc) in hz.outputs_with_ports
    del osc.hertz
    assert osc.inputs_by_port == {}
    assert not hz.outputs_with_ports


def test_destroy_unplugs_both_sides():
    osc = Sine()
    hz = fixed(440.0)
    osc.hertz = hz
    hz.destroy()
    assert osc.inputs_by_port == {}
