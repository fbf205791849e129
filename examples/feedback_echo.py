"""Feedback echo: the classic delay loop, rendered loop-free.

A plucked saw repeats through ``Delay -> Gain(0.45) -> Mix`` feeding back
into itself — the patch structure the reference declares (CYCLIC) but
never implements.  The compiler proves the loop frame-local affine and
solves the whole render with one associative scan over delay-length
segments (``signals_tpu/compiler/feedback.py``), so a minute of audio is
a single device dispatch instead of thousands of sequential block steps.

Run: python examples/feedback_echo.py [out.wav]
"""

import pathlib
import sys

# runnable as `python examples/<name>.py` from anywhere: the repo
# root (the signals_tpu package) is the parent of this directory
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')   # render anywhere; TPU optional

from signals_tpu.nodes.delay import Delay
from signals_tpu.nodes.dev import Rack, SinkDevice
from signals_tpu.nodes.env import ADSR
from signals_tpu.nodes.fixed import Fixed
from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
from signals_tpu.nodes.osc import Sawtooth, Square
from signals_tpu.runtime.wavio import write_wav

RATE = 44100


def fixed(v):
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(v, dtype=np.float32))
    return f


def main(out_path='echo.wav'):
    # plucked lead: saw -> lowpass -> ADSR gate at 1.25 Hz
    saw = Sawtooth()
    saw.hertz = fixed(220.0)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = fixed(1800.0)
    gate = Square()
    gate.hertz = fixed(1.25)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.005, 0.12, 0.25, 0.08
    pluck = RingMod()
    pluck.left = lp
    pluck.right = env

    # the feedback loop: mix <- 0.45 * delay(mix), 3/8 s repeats
    mix = Mix()
    echo = Delay()
    echo.get_state().frames = int(0.375 * RATE)
    fb = Gain()
    fb.left = echo
    fb.right = fixed(0.45)
    mix.left = pluck
    mix.right = fb
    mix.mix = fixed(0.55)
    echo.input = mix

    rack = Rack()
    rack.scan()
    sink = SinkDevice(rack.get_sink('default'), realtime=False)
    sink.get_state().channels = 2
    sink.input = mix
    audio = sink.render_offline(seconds=6.0)
    write_wav(out_path, audio, RATE)
    print(f'wrote {out_path}: {audio.shape[0]} frames, '
          f'peak {float(np.abs(audio).max()):.3f} '
          f'(repeats every 0.375 s, -13.9 dB per pass: the echo return '
          f'is (1-mix)*gain = 0.45*0.45)')


if __name__ == '__main__':
    main(*sys.argv[1:])
