"""Phaser (swept allpass chain): engine parity, allpass physics, notch
depth, carry continuation, sweep movement."""

import numpy as np

import signals_tpu.compiler as C
from signals_tpu.compiler import compile_node
from signals_tpu.nodes.fx import Gain, Mix
from signals_tpu.nodes.noise import White
from signals_tpu.nodes.osc import Sawtooth, Sine
from signals_tpu.nodes.phaser import Phaser
from tests.conftest import fixed, pull_blocks

F, RATE = 512, 44100


def _saw_phaser(mix=0.5, f0=800.0):
    src = Sawtooth()
    src.hertz = fixed(110.0)
    ph = Phaser()
    ph.get_state().mix = mix
    ph.input = src
    ph.sweep = fixed(f0)
    return ph


def _noise_phaser(mix, f0=800.0, sweep_node=None):
    src = White()
    src.get_state().seed = 7
    ph = Phaser()
    ph.get_state().mix = mix
    ph.input = src
    ph.sweep = sweep_node if sweep_node is not None else fixed(f0)
    return ph


def test_parity_all_paths():
    root = _saw_phaser()
    c = compile_node(root, block_frames=F, rate=RATE, channels=1)
    assert c.mega_compatible and c._use_mega
    fast, _ = c.render(position=0, n_blocks=24, deliver_taps=False)
    fast = np.asarray(fast).ravel()
    C._compile_cache.clear()
    c2 = compile_node(_saw_phaser(), block_frames=F, rate=RATE, channels=1)
    c2.enable_mega = False
    slow, _ = c2.render(position=0, n_blocks=24, deliver_taps=False)
    C._compile_cache.clear()
    assert np.abs(fast - np.asarray(slow).ravel()).max() < 1e-6
    oracle = pull_blocks(_saw_phaser(), 24, block_frames=F,
                         rate=RATE).ravel()
    assert np.abs(fast - oracle).max() < 1e-6


def test_carry_continuation():
    c = compile_node(_saw_phaser(), block_frames=F, rate=RATE, channels=1)
    a, carry = c.render(position=0, n_blocks=12, deliver_taps=False)
    b, _ = c.render(position=12 * F, n_blocks=12, carry=carry,
                    deliver_taps=False)
    got = np.concatenate([np.asarray(a), np.asarray(b)]).ravel()
    C._compile_cache.clear()
    oracle = pull_blocks(_saw_phaser(), 24, block_frames=F,
                         rate=RATE).ravel()
    assert np.abs(got - oracle).max() < 1e-6


def _band_power(x, bands=8):
    sp = np.abs(np.fft.rfft(x[2 * F:])) ** 2
    n = len(sp) // bands
    return np.array([sp[i * n:(i + 1) * n].sum() for i in range(bands)])


def test_pure_allpass_is_unit_gain():
    # mix = 1: every band of white noise passes at unit power — the
    # defining allpass property (a peaking/shelving bug would show here)
    wet = pull_blocks(_noise_phaser(1.0), 64, block_frames=F,
                      rate=RATE).ravel()
    dry = pull_blocks(_noise_phaser(0.0), 64, block_frames=F,
                      rate=RATE).ravel()
    r = _band_power(wet) / _band_power(dry)
    assert np.all(np.abs(r - 1.0) < 0.05), r


def test_half_mix_carves_deep_notches():
    # mix = 0.5: phase rotations become notches; the smoothed transfer
    # must dip below -20 dB somewhere while never exceeding unity+eps
    half = pull_blocks(_noise_phaser(0.5), 64, block_frames=F,
                       rate=RATE).ravel()
    dry = pull_blocks(_noise_phaser(0.0), 64, block_frames=F,
                      rate=RATE).ravel()
    sp_h = np.abs(np.fft.rfft(half[2 * F:])) ** 2
    sp_d = np.abs(np.fft.rfft(dry[2 * F:])) ** 2
    k = 64
    ratio = (np.convolve(sp_h, np.ones(k) / k, 'same')
             / np.convolve(sp_d, np.ones(k) / k, 'same'))[k:-k]
    assert ratio.min() < 0.01, ratio.min()
    assert ratio.max() < 1.10, ratio.max()


def test_sweep_moves_the_notches():
    # an LFO-swept phaser's short-window spectra must differ over the
    # sweep cycle (a stuck/static coefficient would not)
    def swept():
        lfo = Sine()
        lfo.hertz = fixed(0.7)
        dep = Gain()
        dep.left = lfo
        dep.right = fixed(600.0)
        off = Mix()
        off.left = dep
        off.right = fixed(900.0)
        off.mix = fixed(0.5)
        return _noise_phaser(0.5, sweep_node=off)

    audio = pull_blocks(swept(), 128, block_frames=F, rate=RATE).ravel()
    w = 16 * F
    specs = [np.abs(np.fft.rfft(audio[i * w:(i + 1) * w])) for i in
             range(3)]
    k = 32
    sm = [np.convolve(s ** 2, np.ones(k) / k, 'same') for s in specs]
    drift = max(np.abs(np.log10(sm[i] + 1e-12)
                       - np.log10(sm[0] + 1e-12)).max()
                for i in (1, 2))
    assert drift > 0.5, drift        # notches moved by >5 dB somewhere
