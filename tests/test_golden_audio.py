"""Golden audio-content checks: the rendered signal has the physics it
should (fundamentals, harmonic rolloff, envelope gating, noise flatness).
These catch "runs but sounds wrong" regressions that parity tests (which
compare engines to each other) cannot."""

import numpy as np

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.fx import Gain, LowPass
from signals_tpu.nodes.noise import White
from signals_tpu.nodes.osc import Sawtooth, Sine

from conftest import fixed

RATE = 44100
F = 1024


def _render(root, seconds=0.5, channels=1):
    compiled = compile_node(root, block_frames=F, rate=RATE,
                            channels=channels)
    n_blocks = int(seconds * RATE / F)
    audio, _ = compiled.render(n_blocks=n_blocks)
    return audio[:, 0]


def _spectrum(x):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / RATE)
    return freqs, spec


def test_sine_is_spectrally_pure():
    osc = Sine()
    osc.hertz = fixed(440.0)
    x = _render(osc)
    freqs, spec = _spectrum(x)
    peak = freqs[spec.argmax()]
    assert abs(peak - 440.0) < 5
    # energy outside the fundamental bin neighborhood is tiny
    mask = np.abs(freqs - 440.0) > 50
    assert spec[mask].max() < spec.max() * 1e-3


def test_saw_harmonic_series():
    osc = Sawtooth()
    osc.hertz = fixed(440.0)
    x = _render(osc)
    freqs, spec = _spectrum(x)

    def level(f):
        return spec[np.argmin(np.abs(freqs - f))]

    h1, h2, h3 = level(440), level(880), level(1320)
    # saw harmonics fall off as 1/n
    assert 0.3 < h2 / h1 < 0.7
    assert 0.2 < h3 / h1 < 0.5


def test_lowpass_attenuates_highs():
    osc = Sawtooth()
    osc.hertz = fixed(220.0)
    lp = LowPass()
    lp.input = osc
    lp.cutoff = fixed(800.0)
    x = _render(lp)
    xr = _render_raw_saw()
    freqs, spec_f = _spectrum(x)
    _, spec_r = _spectrum(xr)

    def ratio(f):
        i = np.argmin(np.abs(freqs - f))
        return spec_f[i] / spec_r[i]

    assert ratio(220) > 0.7            # passband intact
    # order-2 butterworth: 12 dB/octave -> ~-24 dB two octaves up
    assert ratio(3300) < 0.1
    assert ratio(6600) < ratio(3300) * 0.5


def _render_raw_saw():
    osc = Sawtooth()
    osc.hertz = fixed(220.0)
    return _render(osc)


def test_white_noise_is_flat_and_uniform():
    w = White()
    w.get_state().channels = 1
    x = _render(w, seconds=1.0)
    assert 0.0 <= x.min() and x.max() < 1.0
    assert abs(x.mean() - 0.5) < 0.01
    assert abs(x.std() - np.sqrt(1 / 12)) < 0.01
    freqs, spec = _spectrum(x - x.mean())
    # octave-band energies roughly equal (white)
    bands = [(500, 1000), (1000, 2000), (2000, 4000), (4000, 8000)]
    density = [np.mean(spec[(freqs >= lo) & (freqs < hi)] ** 2)
               for lo, hi in bands]
    assert max(density) / min(density) < 2.0


def test_gain_scales_amplitude_linearly():
    osc = Sine()
    osc.hertz = fixed(440.0)
    g = Gain()
    g.left = osc
    g.right = fixed(0.25)
    x = _render(g)
    assert abs(np.abs(x).max() - 0.25) < 0.01
