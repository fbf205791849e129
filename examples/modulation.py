"""Modulation effects demo: a saw pad through a stereo chorus
(``FracDelay`` with per-channel LFO spread) into a swept ``Phaser``,
bounced to a WAV.

Run: python examples/modulation.py [out.wav]
"""

import pathlib
import sys

# runnable as `python examples/<name>.py` from anywhere: the repo
# root (the signals_tpu package) is the parent of this directory
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')   # render anywhere; TPU optional

from signals_tpu.nodes.dev import Rack, SinkDevice
from signals_tpu.nodes.files import FileWriter
from signals_tpu.nodes.fixed import Fixed
from signals_tpu.nodes.fx import Gain, Mix
from signals_tpu.nodes.moddelay import FracDelay
from signals_tpu.nodes.osc import Sawtooth, Sine
from signals_tpu.nodes.phaser import Phaser
from signals_tpu.nodes.shape import Merge


def fixed(v):
    f = Fixed()
    f.get_state().value = np.atleast_2d(np.asarray(v, dtype=np.float32))
    return f


def lfo_around(center, depth, hertz):
    # Mix(m=0.5) crossfades: 0.5*L + 0.5*R — double both legs so the
    # result swings center +/- depth, not half that
    osc = Sine()
    osc.hertz = fixed(hertz)
    d = Gain()
    d.left = osc
    d.right = fixed(2.0 * depth)
    m = Mix()
    m.left = d
    m.right = fixed(2.0 * center)
    m.mix = fixed(0.5)
    return m


def main(path='/tmp/modulation.wav'):
    pad = Sawtooth()
    pad.hertz = fixed(146.83)               # D3

    # stereo chorus: two detuned moving taps, one per channel
    spread = Merge()
    spread.left = lfo_around(0.012, 0.004, 0.6)
    spread.right = lfo_around(0.017, 0.004, 0.73)
    chorus_tap = FracDelay()
    chorus_tap.get_state().max_delay = 0.03
    chorus_tap.input = pad
    chorus_tap.delay = spread
    chorus = Mix()
    chorus.left = pad
    chorus.right = chorus_tap
    chorus.mix = fixed(0.5)

    swoosh = Phaser()
    swoosh.input = chorus
    swoosh.sweep = lfo_around(1000.0, 700.0, 0.4)

    out = Gain()
    out.left = swoosh
    out.right = fixed(0.7)

    writer = FileWriter()
    writer.get_state().path = path
    writer.input = out

    rack = Rack()
    rack.scan()
    sink = SinkDevice(rack.get_sink('default'), realtime=False)
    sink.get_state().channels = 2
    sink.input = writer
    audio = sink.render_offline(seconds=5.0)
    print(f'rendered {audio.shape[0]} frames x {audio.shape[1]} ch '
          f'(peak {np.abs(audio).max():.3f}) -> {path}')


if __name__ == '__main__':
    main(*sys.argv[1:])
