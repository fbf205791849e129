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


def test_enable_persistent_compile_cache(tmp_path, monkeypatch):
    """The helper must set the jax config value itself — exporting
    JAX_COMPILATION_CACHE_DIR from Python is a silent no-op wherever a
    platform plugin pre-imports jax at interpreter startup (config env
    defaults are captured at first import).  Observed live on the TPU
    tunnel image: bench.py's env setdefault left the cache disabled and
    every run recompiled everything."""
    import jax

    from signals_tpu.utils import enable_persistent_compile_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # explicit path wins
        used = enable_persistent_compile_cache(str(tmp_path / 'cc'))
        assert used == str(tmp_path / 'cc')
        assert jax.config.jax_compilation_cache_dir == used

        # default: the env var (even when set AFTER jax import), else
        # the shared signals_tpu cache dir
        monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR',
                           str(tmp_path / 'env_cc'))
        assert enable_persistent_compile_cache() == str(tmp_path / 'env_cc')
        assert (jax.config.jax_compilation_cache_dir
                == str(tmp_path / 'env_cc'))
    finally:
        jax.config.update('jax_compilation_cache_dir', prev_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          prev_min)
