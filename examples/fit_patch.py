"""Differentiable synthesis demo: recover a synth parameter by gradient
descent against target audio (no reference counterpart — TPU-native
capability)."""

import pathlib
import sys

# runnable as `python examples/<name>.py` from anywhere: the repo
# root (the signals_tpu package) is the parent of this directory
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

try:                                    # prefer the TPU; fall back to CPU
    jax.devices()                       # (the axon plugin can be flaky in
except RuntimeError:                    # fresh subprocesses)
    jax.config.update('jax_platforms', 'cpu')


from signals_tpu.learn import fit
from signals_tpu.nodes.fixed import Fixed
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine
from signals_tpu.compiler import compile_node


def fixed(v):
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(v, dtype=np.float32))
    return f


def main():
    # target: a 0.7-gain 440 Hz sine, rendered by the framework itself
    t_hz, t_vol = fixed(440.0), fixed(0.7)
    t_osc = Sine()
    t_osc.hertz = t_hz
    t_out = Gain()
    t_out.left = t_osc
    t_out.right = t_vol
    target, _ = compile_node(t_out, block_frames=512, rate=44100,
                             channels=1).render(n_blocks=8)

    # model: same topology, wrong gain — fit it
    hz, vol = fixed(440.0), fixed(0.05)
    o = Sine()
    o.hertz = hz
    out = Gain()
    out.left = o
    out.right = vol
    result = fit(out, target, [(vol, 'value')], block_frames=512,
                 steps=150, learning_rate=0.05)
    print(f'loss {result.losses[0]:.4f} -> {result.losses[-1]:.6f}; '
          f'fitted gain = {float(vol.get_state().value[0, 0]):.3f} '
          f'(target 0.7)')

    # pitch estimation: the waveform-L2 term's gradient oscillates with
    # the beat phase of a detuned oscillator, so pitch fits drop it
    # (spectral_loss(waveform=0.0)) — a sine starting 30 Hz off lands
    # within a fraction of a Hz
    import functools

    from signals_tpu.learn import spectral_loss
    hz2, vol2 = fixed(470.0), fixed(0.7)
    o2 = Sine()
    o2.hertz = hz2
    out2 = Gain()
    out2.left = o2
    out2.right = vol2
    result = fit(out2, target, [(hz2, 'value')], block_frames=512,
                 steps=300, learning_rate=0.5,
                 loss=functools.partial(spectral_loss, waveform=0.0))
    print(f'pitch fit: 470 Hz start -> '
          f'{float(hz2.get_state().value[0, 0]):.2f} Hz (target 440)')

    # polyphonic: 8 per-voice gains recovered SIMULTANEOUSLY from one
    # mixed target (each voice owns a distinct partial) — the same call
    # shards over a device mesh (PolyPatch(..., mesh=...).fit)
    from signals_tpu.parallel import PolyPatch
    freqs = np.linspace(200, 900, 8).astype(np.float32)
    tgt_gains = np.linspace(0.3, 0.9, 8).astype(np.float32)

    def poly_voice():
        hz, vol = fixed(220.0), fixed(0.5)
        o = Sine()
        o.hertz = hz
        g = Gain()
        g.left = o
        g.right = vol
        return g, hz, vol

    root_t, hz_t, vol_t = poly_voice()
    ptgt = PolyPatch(root_t, n_voices=8,
                     overrides={(hz_t, 'value'): freqs,
                                (vol_t, 'value'): tgt_gains},
                     block_frames=512, layout='channels')
    mix_target, _ = ptgt.render(n_blocks=24)

    root_m, hz_m, vol_m = poly_voice()
    poly = PolyPatch(root_m, n_voices=8,
                     overrides={(hz_m, 'value'): freqs,
                                (vol_m, 'value'): np.full(
                                    8, 0.2, np.float32)},
                     block_frames=512, layout='channels')
    result = poly.fit(mix_target, [(vol_m, 'value')], steps=200,
                      learning_rate=0.02)
    fitted = next(s for n, _p, _a, s in poly._channel_overrides
                  if n is vol_m).reshape(-1)
    err = float(np.abs(fitted - tgt_gains).max())
    print(f'poly fit: 8 per-voice gains from one mix, '
          f'max |error| = {err:.3f} '
          f'(loss {result.losses[0]:.3f} -> {result.losses[-1]:.5f})')


if __name__ == '__main__':
    main()
