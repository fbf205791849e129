"""Differentiable synthesis: gradient-based patch parameter fitting."""

import numpy as np

from signals_tpu.compiler import compile_node
from signals_tpu.learn import fit, make_loss_fn
from signals_tpu.nodes.fx import Gain
from signals_tpu.nodes.osc import Sine

from conftest import fixed, pull_blocks

F = 512
RATE = 44100


def _target(freq, gain, n_blocks):
    hz = fixed(freq)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(gain)
    return pull_blocks(g, n_blocks, block_frames=F, rate=RATE, channels=1)


def test_gradients_flow_through_patch():
    import jax
    hz = fixed(300.0)
    osc = Sine()
    osc.hertz = hz
    g = Gain()
    g.left = osc
    g.right = fixed(0.5)
    compiled = compile_node(g, block_frames=F, rate=RATE, channels=1)
    target = _target(440.0, 0.8, 4)
    loss_fn = make_loss_fn(compiled, target)
    grads = jax.grad(loss_fn, allow_int=True)(compiled.params())
    uid = compiled.index.info(hz).uid
    assert np.isfinite(np.asarray(grads[uid]['value'])).all()
    assert np.abs(np.asarray(grads[uid]['value'])).max() > 0


def test_fit_recovers_gain():
    """Amplitude is smoothly identifiable: fitting the gain constant against
    a target rendered at a different gain must converge."""
    hz = fixed(440.0)
    osc = Sine()
    osc.hertz = hz
    vol = fixed(0.1)
    g = Gain()
    g.left = osc
    g.right = vol
    target = _target(440.0, 0.8, 4)
    result = fit(g, target, [(vol, 'value')], rate=RATE, block_frames=F,
                 steps=150, learning_rate=0.05)
    fitted = float(np.asarray(result.value_of(
        compile_node(g, block_frames=F, rate=RATE, channels=1),
        vol, 'value')).ravel()[0])
    assert abs(fitted - 0.8) < 0.05, fitted
    assert result.losses[-1] < result.losses[0] * 0.1
    # apply=True wrote back into the live node
    assert abs(float(vol.get_state().value[0, 0]) - 0.8) < 0.05


def test_fit_recovers_filter_cutoff():
    """Gradients flow through the f64 Butterworth design and the IIR scan:
    estimating a lowpass cutoff from audio converges to 0.1%."""
    from signals_tpu.nodes.fx import LowPass
    from signals_tpu.nodes.osc import Sawtooth

    def build(cut_v):
        osc = Sawtooth()
        osc.hertz = fixed(110.0)
        cut = fixed(cut_v)
        lp = LowPass()
        lp.input = osc
        lp.cutoff = cut
        return lp, cut

    tgt_root, _ = build(2000.0)
    target = pull_blocks(tgt_root, 8, block_frames=F, rate=RATE, channels=1)
    model, cut = build(600.0)
    res = fit(model, target, [(cut, 'value')], block_frames=F,
              steps=120, learning_rate=30.0)
    assert res.losses[-1] < res.losses[0] * 0.01
    fitted = float(cut.get_state().value[0, 0])
    assert abs(fitted - 2000.0) < 50, fitted
