"""Realtime soak: a paced virtual-sink transport under live edits and
seeks.

Runs the mono subtractive voice through ``SinkDevice`` (realtime=True:
render thread -> native ring -> sample-rate-paced consumer) for
``--seconds`` of audio while sweeping the filter cutoff (traced edit,
every ~2 s, no recompile) and seeking twice, then reports underruns and
transport counters.  Pass/fail contract (also asserted by
``tests/test_soak.py``): zero underruns outside seek recovery windows,
monotonic post-seek progress, stable render latency, finite output.

Usage::

    python scripts/soak.py [--seconds 65]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

if __name__ == '__main__':      # runnable standalone from anywhere
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import jax
    # CPU: realtime pacing is the subject here, and the remote-TPU
    # tunnel's per-dispatch floor can't serve block-at-a-time realtime
    jax.config.update('jax_platforms', 'cpu')


def build_voice():
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.fixed import Fixed
    from signals_tpu.nodes.fx import Gain, LowPass, Mix, RingMod
    from signals_tpu.nodes.osc import Sawtooth, Sine, Square

    def fixed(v):
        f = Fixed()
        f.get_state().value = np.atleast_2d(
            np.asarray(v, dtype=np.float32))
        return f

    hz = fixed(110.0)
    saw = Sawtooth()
    saw.hertz = hz
    lfo = Sine()
    lfo.hertz = fixed(0.5)
    depth = Gain()
    depth.left = lfo
    depth.right = fixed(900.0)
    base = fixed(2000.0)
    cutoff = Mix()
    cutoff.left = depth
    cutoff.right = base
    cutoff.mix = fixed(0.5)
    lp = LowPass()
    lp.input = saw
    lp.cutoff = cutoff
    gate = Square()
    gate.hertz = fixed(2.0)
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.01, 0.08, 0.6, 0.1
    out = RingMod()
    out.left = lp
    out.right = env
    g = Gain()
    g.left = out
    g.right = fixed(0.5)
    return g, base


def build_echo(block: int = 1024):
    """The voice through a damped feedback echo (delay > the transport's
    8-block render-ahead, so each realtime call renders as one whole
    segment window); the live-edit target is the feedback gain."""
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fixed import Fixed
    from signals_tpu.nodes.fx import Gain, LowPass, Mix

    def fixed(v):
        f = Fixed()
        f.get_state().value = np.atleast_2d(
            np.asarray(v, dtype=np.float32))
        return f

    voice, _ = build_voice()
    mix = Mix()
    d = Delay()
    d.get_state().frames = 11 * block + 7
    damp = LowPass()
    damp.input = d
    damp.cutoff = fixed(2500.0)
    damp.get_state().streaming = True
    fb_gain = fixed(0.45)
    fb = Gain()
    fb.left = damp
    fb.right = fb_gain
    mix.left = voice
    mix.right = fb
    mix.mix = fixed(0.55)
    d.input = mix
    return mix, fb_gain


def soak(seconds: float = 65.0, *, block: int = 1024, patch: str = 'voice',
         progress=lambda msg: print(msg, file=sys.stderr, flush=True)
         ) -> dict:
    from signals_tpu.nodes.dev import Rack, SinkDevice

    rack = Rack()
    rack.scan()
    if patch == 'echo':
        root, fb_gain = build_echo(block)
        cutoff_base = None
    else:
        root, cutoff_base = build_voice()
    sink = SinkDevice(rack.get_sink('null'), block_frames=block,
                      realtime=True)
    sink.get_state().channels = 1
    sink.input = root
    rate = sink.rate

    seek_times = sorted({seconds * 0.33, seconds * 0.66})
    seeks_done = []
    edits = 0
    recovery_s = 1.0          # post-seek window whose underruns are the
    seek_window = None        # seek's own (ring refill), per the contract
    seek_underruns = 0

    sink.start()
    t0 = time.monotonic()
    warmup_s = 2.0
    warm_underruns = None
    next_edit = warmup_s
    try:
        while True:
            elapsed = time.monotonic() - t0
            if elapsed >= seconds:
                break
            if warm_underruns is None and elapsed >= warmup_s:
                warm_underruns = sink.underruns
            if seek_window is not None and elapsed >= seek_window[1]:
                seek_underruns += sink.underruns - seek_window[0]
                seek_window = None
            if elapsed >= next_edit:
                # live traced edit, re-read by the render loop without
                # recompiling: sweep the cutoff base (voice patch) or
                # the echo's feedback gain (echo patch)
                if cutoff_base is not None:
                    val = 1200.0 + 900.0 * np.sin(elapsed / 3.0)
                    cutoff_base.get_state().value = np.array(
                        [[val]], dtype=np.float32)
                else:
                    val = 0.45 + 0.35 * np.sin(elapsed / 3.0)
                    fb_gain.get_state().value = np.array(
                        [[val]], dtype=np.float32)
                edits += 1
                next_edit += 2.0
            if seek_times and elapsed >= seek_times[0]:
                if seek_window is not None:     # close an open window
                    seek_underruns += sink.underruns - seek_window[0]
                seek_window = (sink.underruns, elapsed + recovery_s)
                target_block = int((seek_times[0] + 5.0) * rate) // block
                sink.seek(target_block)
                seeks_done.append((round(elapsed, 1), target_block))
                seek_times.pop(0)
            if sink._transport is not None and sink._transport.error:
                raise RuntimeError(
                    f'transport died: {sink._transport.error!r}')
            time.sleep(0.1)
        final_underruns = sink.underruns
        if seek_window is not None:
            seek_underruns += final_underruns - seek_window[0]
        tell = sink.tell()
        stats = (sink._transport.stats.summary(block, rate)
                 if sink._transport is not None else {})
    finally:
        if sink.is_active:
            sink.stop()
        if sink.is_open:
            sink.close()

    report = {
        'patch': patch,
        'seconds': seconds,
        'edits': edits,
        'seeks': seeks_done,
        'warmup_underruns': warm_underruns or 0,
        'final_underruns': final_underruns,
        'seek_window_underruns': seek_underruns,
        # the contract counter: underruns after warmup and OUTSIDE the
        # post-seek recovery windows (a seek legitimately drains the ring)
        'underruns_after_warmup': (final_underruns - (warm_underruns or 0)
                                   - seek_underruns),
        'position_blocks': tell,
        'latency': stats,
    }
    progress(f'soak: {json.dumps(report)}')
    return report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--seconds', type=float, default=65.0)
    parser.add_argument('--block', type=int, default=1024)
    parser.add_argument('--patch', choices=('voice', 'echo'),
                        default='voice')
    args = parser.parse_args(argv)
    report = soak(args.seconds, block=args.block, patch=args.patch)
    ok = report['underruns_after_warmup'] == 0
    print(json.dumps({'ok': ok, **report}))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
