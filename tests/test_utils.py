"""Aux subsystems: latency metrics, checkpoint/resume."""

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.delay import Delay
from signals_tpu.nodes.fx import Mix, Gain
from signals_tpu.nodes.osc import Sine
from signals_tpu.utils import LatencyStats, checkpoint

from conftest import fixed

F = 256
RATE = 44100


def test_latency_stats():
    stats = LatencyStats(window=10)
    for t in (0.001, 0.002, 0.003):
        stats.record(t)
    assert stats.p50 == pytest.approx(0.002)
    assert stats.worst == pytest.approx(0.003)
    s = stats.summary(1024, 44100)
    assert s['blocks'] == 3
    assert s['x_realtime_p50'] == pytest.approx((1024 / 44100) / 0.002)


def _feedback_patch():
    src = Sine()
    src.hertz = fixed(440.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = 2 * F
    fb = Gain()
    fb.left = d
    fb.right = fixed(0.5)
    mix.left = src
    mix.right = fb
    mix.mix = fixed(0.6)
    d.input = mix
    return mix


def test_checkpoint_roundtrip(tmp_path):
    compiled = compile_node(_feedback_patch(), block_frames=F, rate=RATE,
                            channels=1)
    full, _ = compiled.render(position=0, n_blocks=12)
    a, carry = compiled.render(position=0, n_blocks=6)

    path = tmp_path / 'state.npz'
    checkpoint.save(path, position=6 * F, carry=carry,
                    graph_hash=compiled.graph_hash,
                    patch_lines=['+ 1a example'])
    loaded = checkpoint.load(path, expect_graph_hash=compiled.graph_hash)
    assert loaded['position'] == 6 * F
    assert loaded['patch'] == ['+ 1a example']

    b, _ = compiled.render(position=loaded['position'], n_blocks=6,
                           carry=loaded['carry'])
    # the loop-free delay solver composes its affine segment scan per
    # batch, so different batch splits reassociate within ~1 ulp (same
    # contract as the streaming-filter mega path); identical splits are
    # bit-exact
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-6,
                               rtol=0)
    a2, carry2 = compiled.render(position=0, n_blocks=6)
    b2, _ = compiled.render(position=6 * F, n_blocks=6, carry=carry2)
    np.testing.assert_array_equal(np.concatenate([a2, b2]),
                                  np.concatenate([a, b]))


def test_checkpoint_rejects_wrong_graph(tmp_path):
    path = tmp_path / 'state.npz'
    checkpoint.save(path, position=0, carry={}, graph_hash='aaaa')
    with pytest.raises(checkpoint.CheckpointMismatch):
        checkpoint.load(path, expect_graph_hash='bbbb')
    # no expectation -> loads fine
    assert checkpoint.load(path)['position'] == 0
