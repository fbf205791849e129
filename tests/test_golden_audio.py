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


def test_reverb_tail_decays_at_t60_rate():
    """An input burst through the FDN reverb must leave a tail whose
    decay tracks the Schroeder t60 relation (-60 dB over t60 seconds),
    and a longer t60 must leave a hotter late tail."""
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fx import RingMod
    from signals_tpu.nodes.osc import Sine, Square
    from signals_tpu.nodes.reverb import Reverb

    def tail_rms(t60):
        osc = Sine()
        osc.hertz = fixed(440.0)
        gate = Square()
        gate.hertz = fixed(0.5)        # on for the first second only
        env = ADSR()
        env.gate = gate
        st = env.get_state()
        st.attack, st.decay, st.sustain, st.release = 0.01, 0.01, 1.0, 0.02
        burst = RingMod()
        burst.left = osc
        burst.right = env
        rv = Reverb()
        rv.input = burst
        rv.get_state().t60 = t60
        rv.get_state().mix = 1.0       # fully wet
        x = _render(rv, seconds=2.0)

        def rms(t0, t1):
            seg = x[int(t0 * RATE):int(t1 * RATE)]
            return float(np.sqrt(np.mean(seg ** 2)))

        return rms(1.15, 1.35), rms(1.65, 1.85)

    early, late = tail_rms(0.6)
    # Schroeder: amplitude falls 10^(-3*dt/t60) over dt = 0.5 s
    expect = 10 ** (-3 * 0.5 / 0.6)
    assert expect / 5 < late / early < expect * 5, (early, late, expect)
    early_l, late_l = tail_rms(2.0)
    assert late_l / early_l > 3 * late / early   # longer t60 = hotter tail


def test_compressor_static_ratio_curve():
    """Above threshold the RMS must follow thresh*(rms/thresh)^(1/R);
    below threshold the signal passes at unity."""
    from signals_tpu.nodes.dyn import Compressor
    from signals_tpu.nodes.osc import Sine

    def out_rms(amp, ratio=4.0, threshold=0.2):
        osc = Sine()
        osc.hertz = fixed(440.0)
        from signals_tpu.nodes.fx import Gain
        g = Gain()
        g.left = osc
        g.right = fixed(amp)
        comp = Compressor()
        comp.input = g
        st = comp.get_state()
        st.threshold, st.ratio = threshold, ratio
        x = _render(comp, seconds=0.5)
        tail = x[len(x) // 2:]           # past the RMS window warmup
        return float(np.sqrt(np.mean(tail ** 2)))

    rms_in = 0.8 / np.sqrt(2)
    got = out_rms(0.8)
    want = 0.2 * (rms_in / 0.2) ** (1 / 4.0)
    assert abs(got - want) / want < 0.15, (got, want)
    # below threshold: unity
    got_low = out_rms(0.1)
    assert abs(got_low - 0.1 / np.sqrt(2)) / (0.1 / np.sqrt(2)) < 0.05


def test_quantize_snaps_to_scale_tones():
    """Every output sample of a swept control signal must land on an
    equal-temperament tone of the configured scale."""
    from signals_tpu.nodes.fx import Gain, Mix, Quantize
    from signals_tpu.nodes.osc import Sine

    lfo = Sine()
    lfo.hertz = fixed(2.0)
    depth = Gain()
    depth.left = lfo
    depth.right = fixed(300.0)
    sweep = Mix()                       # 500 +- 150 Hz
    sweep.left = depth
    sweep.right = fixed(500.0)
    sweep.mix = fixed(0.5)
    q = Quantize()
    q.input = sweep
    major = np.array([[0, 2, 4, 5, 7, 9, 11]], dtype=np.float32)
    q.get_state().scale = major
    x = _render(q, seconds=0.25)
    root = 261.6256
    semis = 12.0 * np.log2(np.asarray(x, dtype=np.float64) / root)
    pc = np.mod(np.round(semis * 1e6) / 1e6, 12.0)
    dist = np.min(np.abs(pc[:, None] - np.array([0, 2, 4, 5, 7, 9, 11, 12.0])),
                  axis=1)
    assert dist.max() < 1e-2, dist.max()          # semitone units
    assert len(np.unique(np.round(semis))) > 2    # the sweep hits tones


def test_wavetable_interpolation_alias_floor():
    """The interpolated sine table at a non-integer step must stay
    spectrally clean: spurious components at least 55 dB under the
    fundamental (1024-entry table, linear interpolation)."""
    from signals_tpu.nodes.wavetable import Wavetable
    wt = Wavetable()
    wt.hertz = fixed(441.0)             # non-integer samples/cycle
    x = _render(wt, seconds=0.5)
    freqs, spec = _spectrum(x)
    peak_i = spec.argmax()
    assert abs(freqs[peak_i] - 441.0) < 5
    mask = np.abs(freqs - freqs[peak_i]) > 60
    floor_db = 20 * np.log10(spec[mask].max() / spec[peak_i])
    assert floor_db < -55.0, floor_db


def test_drive_odd_harmonic_signature():
    """tanh saturation is odd-symmetric: a driven sine must grow strong
    odd harmonics while even harmonics stay ~absent."""
    from signals_tpu.nodes.fx import Drive
    from signals_tpu.nodes.osc import Sine
    osc = Sine()
    osc.hertz = fixed(440.0)
    d = Drive()
    d.input = osc
    d.drive = fixed(4.0)
    x = _render(d)
    freqs, spec = _spectrum(x)

    def level(f):
        return spec[np.argmin(np.abs(freqs - f))]

    h1, h2, h3 = level(440), level(880), level(1320)
    assert h3 / h1 > 0.05, 'third harmonic missing'
    assert h2 / h1 < 1e-3, 'even harmonic present (should be odd-only)'


def test_pan_equal_power_law():
    """Pan keeps total power constant and follows the sin/cos law."""
    from signals_tpu.nodes.fx import Pan
    from signals_tpu.nodes.osc import Sine

    def lr_rms(pos):
        osc = Sine()
        osc.hertz = fixed(440.0)
        pan = Pan()
        pan.input = osc
        pan.position = fixed(pos)
        compiled = compile_node(pan, block_frames=F, rate=RATE, channels=2)
        audio, _ = compiled.render(n_blocks=10)
        return (float(np.sqrt(np.mean(audio[:, 0] ** 2))),
                float(np.sqrt(np.mean(audio[:, 1] ** 2))))

    l0, r0 = lr_rms(0.0)
    assert abs(l0 - r0) / l0 < 0.01               # centered: equal
    lm, rm = lr_rms(-1.0)
    assert rm < lm * 1e-3                          # hard left
    powers = [sum(v ** 2 for v in lr_rms(p)) for p in (-1.0, -0.5, 0.0,
                                                       0.5, 1.0)]
    assert max(powers) / min(powers) < 1.02        # equal power


def test_adsr_envelope_shape():
    """The rendered envelope must show the attack ramp, the sustain
    plateau at the configured level, and a decay to silence after the
    gate falls."""
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.osc import Square
    gate = Square()
    gate.hertz = fixed(1.0)             # on [0, 0.5), off [0.5, 1)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.05, 0.1, 0.5, 0.1
    x = _render(env, seconds=1.0)

    def at(t):
        return float(x[int(t * RATE)])

    assert at(0.01) < 0.5               # mid-attack: still rising
    assert abs(at(0.05) - 1.0) < 0.1    # attack peak
    assert abs(at(0.3) - 0.5) < 0.05    # sustain plateau
    assert abs(at(0.45) - 0.5) < 0.05
    assert at(0.7) < 0.02               # released
