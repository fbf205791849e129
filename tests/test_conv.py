"""Convolve (impulse-response processor): parity, ground truth vs
``np.convolve``, file IRs, channel semantics, seek stability."""

import numpy as np
import pytest

from signals_tpu.compiler import compile_node
from signals_tpu.nodes.conv import Convolve
from signals_tpu.nodes.osc import Sawtooth, Sine
from signals_tpu.nodes.shape import Merge
from signals_tpu.runtime import sndfile

from conftest import fixed, pull_blocks

F = 512
RATE = 44100
TOL = 1e-5


def _convolve(input_node, **state):
    cv = Convolve()
    cv.input = input_node
    st = cv.get_state()
    for k, v in state.items():
        setattr(st, k, v)
    return cv


def _both_engines(node, *, n_blocks=12, channels=1, start_block=0):
    compiled = compile_node(node, block_frames=F, rate=RATE,
                            channels=channels)
    audio, _ = compiled.render(position=start_block * F, n_blocks=n_blocks)
    oracle = pull_blocks(node, n_blocks, block_frames=F, rate=RATE,
                         channels=channels, start_block=start_block)
    return audio, oracle


def _saw(hz=220.0):
    saw = Sawtooth()
    saw.hertz = fixed(hz)
    return saw


def test_parity_generated_ir():
    cv = _convolve(_saw(), ir_frames=2000, mix=0.7)
    audio, oracle = _both_engines(cv)
    assert np.abs(audio - oracle).max() <= TOL


def test_ground_truth_np_convolve():
    """Both engines match a direct ``np.convolve`` of the dry signal."""
    saw = _saw()
    cv = _convolve(saw, ir_frames=1500, mix=0.6, gain=1.25)
    audio, oracle = _both_engines(cv, n_blocks=10)
    dry = pull_blocks(saw, 10, block_frames=F, rate=RATE, channels=1)[:, 0]
    ir = cv._ir_for_channels(1)[:, 0]
    full = np.convolve(dry.astype(np.float64),
                       ir.astype(np.float64))[:10 * F]
    want = 0.6 * 1.25 * full + 0.4 * dry
    assert np.abs(want - audio[:, 0]).max() <= TOL
    assert np.abs(want - oracle[:, 0]).max() <= TOL


def test_echo_ir_is_exact_delay():
    """IR = unit tap + 0.5 tap at lag d ==> output x[t] + 0.5 x[t-d]."""
    d = 700
    ir = np.zeros((d + 1, 1), dtype=np.float32)
    ir[0, 0] = 1.0
    ir[d, 0] = 0.5
    saw = _saw(110.0)
    cv = _convolve(saw, normalize=False)
    cv._ir_cache = (cv._ir_key(), ir)       # inject a known IR
    audio, oracle = _both_engines(cv, n_blocks=8)
    dry = pull_blocks(saw, 8, block_frames=F, rate=RATE, channels=1)[:, 0]
    want = dry.copy()
    want[d:] += 0.5 * dry[:-d]
    assert np.abs(audio[:, 0] - want).max() <= TOL
    assert np.abs(oracle[:, 0] - want).max() <= TOL


def test_seek_matches_contiguous_render():
    """Rendering from a mid-stream position reproduces the slice of a
    contiguous render exactly — convolution is stateless context."""
    cv = _convolve(_saw(), ir_frames=1024)
    full, _ = _both_engines(cv, n_blocks=16)
    cv2 = _convolve(_saw(), ir_frames=1024)
    tail, _ = _both_engines(cv2, n_blocks=6, start_block=10)
    assert np.abs(full[10 * F:] - tail).max() <= TOL


def test_file_ir_wav(tmp_path):
    path = str(tmp_path / 'ir.wav')
    rng = np.random.default_rng(3)
    ir = (rng.standard_normal((900, 1)) *
          np.exp(-np.arange(900) / 200.0)[:, None]).astype(np.float32)
    w = sndfile.open_writer(path, rate=RATE, channels=1)
    w.write(ir)
    w.close()
    saw = _saw()
    cv = _convolve(saw, path=path, normalize=False)
    assert cv.context_frames() == 899
    audio, oracle = _both_engines(cv, n_blocks=8)
    assert np.abs(audio - oracle).max() <= TOL
    dry = pull_blocks(saw, 8, block_frames=F, rate=RATE, channels=1)[:, 0]
    want = np.convolve(dry.astype(np.float64),
                       ir[:, 0].astype(np.float64))[:8 * F]
    assert np.abs(audio[:, 0] - want).max() <= TOL


def test_stereo_bus_mono_ir_broadcasts():
    """A mono IR convolves each channel of a stereo bus independently."""
    left = _saw(220.0)
    right = Sine()
    right.hertz = fixed(330.0)
    m = Merge()
    m.left = left
    m.right = right
    cv = _convolve(m, ir_frames=800)
    audio, oracle = _both_engines(cv, n_blocks=8, channels=2)
    assert audio.shape[1] == 2
    assert np.abs(audio - oracle).max() <= TOL
    # channel independence: left channel equals the mono convolution
    cv_l = _convolve(_saw(220.0), ir_frames=800)
    mono, _ = _both_engines(cv_l, n_blocks=8)
    assert np.abs(audio[:, :1] - mono).max() <= TOL


def test_stereo_ir_downmixes_on_mono_bus(tmp_path):
    path = str(tmp_path / 'ir2.wav')
    rng = np.random.default_rng(5)
    ir = rng.standard_normal((400, 2)).astype(np.float32) * 0.1
    w = sndfile.open_writer(path, rate=RATE, channels=2)
    w.write(ir)
    w.close()
    saw = _saw()
    cv = _convolve(saw, path=path, normalize=False)
    audio, oracle = _both_engines(cv, n_blocks=6)
    assert np.abs(audio - oracle).max() <= TOL
    dry = pull_blocks(saw, 6, block_frames=F, rate=RATE, channels=1)[:, 0]
    mono_ir = ir.astype(np.float64).mean(axis=1)
    want = np.convolve(dry.astype(np.float64), mono_ir)[:6 * F]
    assert np.abs(audio[:, 0] - want).max() <= TOL


def test_single_tap_ir_scales():
    saw = _saw()
    cv = _convolve(saw, ir_frames=1, normalize=False, mix=1.0)
    ir = cv._ir_for_channels(1)
    assert cv.context_frames() == 0
    audio, oracle = _both_engines(cv, n_blocks=4)
    dry = pull_blocks(saw, 4, block_frames=F, rate=RATE, channels=1)
    assert np.abs(audio - dry * ir[0, 0]).max() <= TOL
    assert np.abs(oracle - dry * ir[0, 0]).max() <= TOL


def test_normalize_unit_energy():
    cv = _convolve(_saw(), ir_frames=3000, normalize=True)
    ir = cv._ir()
    assert abs(float(np.sum(ir.astype(np.float64) ** 2)) - 1.0) < 1e-5


def test_traced_mix_edit_no_recompile():
    """mix/gain are traced params: editing them changes output through the
    SAME compiled program (no new trace)."""
    cv = _convolve(_saw(), ir_frames=600, mix=1.0)
    compiled = compile_node(cv, block_frames=F, rate=RATE, channels=1)
    wet, _ = compiled.render(position=0, n_blocks=4)
    st = cv.get_state()
    st.mix = 0.0
    dry, _ = compiled.render(position=0, n_blocks=4)
    truth = pull_blocks(_saw(), 4, block_frames=F, rate=RATE, channels=1)
    assert np.abs(dry - truth).max() <= TOL
    assert np.abs(wet - truth).max() > 1e-2   # wet is audibly different


def test_long_ir_engages_mega_plan():
    """A long IR makes per-block context re-evaluation dominate: the plan
    heuristic must pick the single mega window (context pulled once) and
    decline stream packing (context re-pulled per stream)."""
    cv = _convolve(_saw(), ir_frames=8192)
    compiled = compile_node(cv, block_frames=F, rate=RATE, channels=1)
    assert compiled._context_extra == 8191
    assert compiled._use_mega
    assert compiled.packed_mega_streams(64) is None
    audio, _ = compiled.render(position=0, n_blocks=48)
    oracle = pull_blocks(cv, 48, block_frames=F, rate=RATE, channels=1)
    assert np.abs(audio - oracle).max() <= TOL


def test_short_ir_keeps_per_block_plan():
    """Small contexts must NOT flip narrow stateless patches onto mega —
    the per-block vmapped path tiles better there (the round-2 measured
    default)."""
    cv = _convolve(_saw(), ir_frames=1024)
    compiled = compile_node(cv, block_frames=F, rate=RATE, channels=1)
    assert not compiled._use_mega


def test_empty_ir_file_raises(tmp_path):
    path = str(tmp_path / 'empty.wav')
    w = sndfile.open_writer(path, rate=RATE, channels=1)
    w.close()
    cv = _convolve(_saw(), path=path)
    with pytest.raises(ValueError):
        cv.context_frames()


def test_ir_file_edit_recompiles(tmp_path):
    """Editing an IR file on disk changes the graph hash (the
    ``structural_extra`` hook folds the file's mtime + tap count in), so
    the compile cache cannot serve the stale baked-in spectrum — and a
    length change cannot leave the re-trace's context window disagreeing
    with the compile-time window pass."""
    import os
    import signals_tpu.compiler as C

    def write_ir(data):
        w = sndfile.open_writer(str(tmp_path / 'ir.wav'), rate=RATE,
                                channels=1)
        w.write(np.asarray(data, np.float32))
        w.close()

    path = tmp_path / 'ir.wav'
    write_ir([[1.0], [0.5]])
    cv = _convolve(_saw(), path=str(path))
    c1 = compile_node(cv, block_frames=F, rate=RATE, channels=1)
    h1 = c1.graph_hash
    # longer IR, later mtime
    write_ir([[1.0], [0.0], [0.0], [0.25]])
    os.utime(path, ns=(1, int(os.stat(path).st_mtime_ns) + 10**9))
    c2 = compile_node(cv, block_frames=F, rate=RATE, channels=1)
    assert c2.graph_hash != h1
    assert c2.index.order is not c1.index.order or c2 is not c1
    C._compile_cache.clear()


def test_mix_rejects_over_wet():
    """State.mix is documented as [0, 1]; mix > 1 used to silently
    phase-invert the dry bleed."""
    from signals_tpu.core.state import BadStateValue
    cv = _convolve(_saw())
    with pytest.raises(BadStateValue):
        cv.get_state().mix = 1.5


def test_plan_selection_context_heuristic():
    """The ``_context_extra`` plan gates weigh only true context-window
    nodes: a long-IR Convolve flips a narrow patch onto the single mega
    window (context pulled once, not per block) and declines stream
    packing once k streams would re-pull more than a batch of context;
    a FracDelay's bounded lookback — served by the window-collect pass,
    not ``context_frames`` — leaves plan selection unchanged."""
    import signals_tpu.compiler as C
    import signals_tpu.compiler.filters as FI
    from signals_tpu.nodes.moddelay import FracDelay

    old = FI.MEGA_FILTER_IMPL
    FI.MEGA_FILTER_IMPL = 'pallas'   # mono lane-packing needs k up to 32
    try:
        fd = FracDelay()
        fd.input = _saw()
        fd.delay = fixed(0.01)
        c = compile_node(fd, block_frames=F, rate=RATE, channels=1)
        assert c._context_extra == 0
        assert not c._use_mega             # narrow stateless: per-block
        assert c.packed_mega_streams(64) is not None

        cv = _convolve(_saw(), ir_frames=8192)  # ctx_extra = 8191 > 4*F
        c2 = compile_node(cv, block_frames=F, rate=RATE, channels=1)
        assert c2._context_extra == 8191
        assert c2._use_mega
        # k=32 streams would re-pull 32*8191 frames of context > 64*F
        assert c2.packed_mega_streams(64) is None
    finally:
        FI.MEGA_FILTER_IMPL = old
        C._compile_cache.clear()
