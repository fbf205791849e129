"""Minimal programmatic API demo (counterpart of the reference's
``scripts/edited_sine.py``): wire a sine to a sink and play it through the
realtime ring runtime.

Connection is attribute assignment on ports, exactly like the reference's
programmatic API; rendering goes through the compiled engine.
"""

import pathlib
import sys

# runnable as `python examples/<name>.py` from anywhere: the repo
# root (the signals_tpu package) is the parent of this directory
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np

import jax

# CPU by default: probing the accelerator from a demo script can steal
# (and wedge) a chip another process is using.  Opt in explicitly with
# SIGNALS_TPU_EXAMPLE_TPU=1.
import os

if os.environ.get('SIGNALS_TPU_EXAMPLE_TPU') != '1':
    jax.config.update('jax_platforms', 'cpu')


import signals_tpu.nodes.dev as dev
import signals_tpu.nodes.fixed as fixed
import signals_tpu.nodes.osc as osc


def main():
    rack = dev.Rack()
    rack.scan()
    for sink_info in rack.sinks():
        print(sink_info.describe())

    sink = dev.SinkDevice(rack.get_sink('default'))
    sink.get_state().channels = 2

    sine = osc.Sine()
    sink.input = sine

    sine_hertz = fixed.Fixed()
    sine_hertz.get_state().value = np.array([[440.0]], dtype=np.float32)
    sine.hertz = sine_hertz

    sink.capture(True)
    sink.start()
    try:
        time.sleep(2.0)
    except KeyboardInterrupt:
        pass
    sink.stop()
    sink.close()
    audio = sink.captured()
    print(f'rendered {audio.shape[0]} frames, '
          f'{sink.underruns} underruns, peak {np.abs(audio).max():.3f}')


if __name__ == '__main__':
    main()
