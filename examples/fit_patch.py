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


if __name__ == '__main__':
    main()
