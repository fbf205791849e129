"""UI layer: themes, geometry, vis rack, ASCII patcher view."""

import io

import numpy as np

import matplotlib

matplotlib.use('Agg')

from signals_tpu.map.control import Controller
from signals_tpu.nodes.vis import Spec, Wave
from signals_tpu.ui import ascii as ascii_ui
from signals_tpu.ui import geometry, theme
from signals_tpu.ui.vis import VisRack

from conftest import fixed


def test_palette_expansion_covers_roles():
    for t in theme.THEMES.values():
        for role in theme.ROLES:
            c = t[role]
            assert isinstance(c, theme.Color)
    assert theme.GREEN.is_dark
    assert not theme.WHITE.is_dark


def test_color_math():
    c = theme.Color.parse('#8040c0')
    assert c == (128, 64, 192)
    assert c.hex() == '#8040c0'
    assert c.lighter().luminance > c.luminance
    assert c.darker().luminance < c.luminance
    assert c.mix(theme.Color(0, 0, 0), 1.0) == (0, 0, 0)
    assert c.ansi_fg().startswith('\x1b[38;2;')


def test_theme_controller_notifies():
    ctl = theme.ThemeController(theme.GREEN)
    seen = []
    ctl.register(seen.append)
    assert seen == [theme.GREEN]          # immediate call on register
    ctl.set_theme(theme.RED)
    assert seen[-1] is theme.RED
    ctl.unregister(seen.append)


def test_geometry_shapes():
    circ = geometry.circle((0, 0), 2.0, n=16)
    assert circ.shape == (17, 2)
    np.testing.assert_allclose(np.hypot(circ[:, 0], circ[:, 1]), 2.0,
                               atol=1e-9)
    poly = geometry.regular_polygon((1, 1), 1.0, 6)
    assert poly.shape == (6, 2)
    tri = geometry.tribar_polyline((0, 0), (10, 10))
    assert tri.shape == (4, 2)
    assert tuple(tri[0]) == (0, 0) and tuple(tri[-1]) == (10, 10)
    # right angles: each segment is axis-aligned
    for a, b in zip(tri, tri[1:]):
        assert a[0] == b[0] or a[1] == b[1]
    hull = geometry.tribar_polygon((0, 0), (10, 10), width=2)
    assert hull.shape == (8, 2)
    rect = geometry.rect_containing_points(tri)
    assert rect == (0, 0, 10, 10)
    assert geometry.clip_to_rect((20, -5), rect) == (10, 0)


def _patched_controller():
    ctl = Controller(interactive=False, stdout=io.StringIO())
    for line in ('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
                 '+ 2a signals_tpu.nodes.osc.Sine',
                 '+ 3a signals_tpu.nodes.vis.Wave',
                 '> 1a 2a.hertz',
                 '> 2a 3a.input'):
        ctl.default(line)
    return ctl


def test_ascii_view():
    ctl = _patched_controller()
    text = ascii_ui.render_map(ctl.map)
    assert '1a:Fixed' in text and '2a:Sine' in text and '3a:Wave' in text
    assert '2a --> 3a.input' in text
    text2 = ascii_ui.render_map(ctl.map, use_layout=True)
    assert '2a:Sine' in text2


def test_view_command():
    ctl = _patched_controller()
    ctl.default('view')
    assert '2a:Sine' in ctl.stdout.getvalue()


def test_vis_rack_renders(tmp_path):
    wave = Wave()
    wave.input = fixed(0.5)
    spec = Spec()
    spec.input = fixed(0.5)
    # simulate tap delivery
    t = np.arange(1024).reshape(-1, 1) / 44100
    block = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    wave.consume_tap(block, 0, 44100)
    spec.consume_tap(block, 0, 44100)
    rack = VisRack(frames=2048)
    rack.add('wave', wave)
    rack.add('spec', spec)
    artists = rack.update()
    assert artists
    out = tmp_path / 'rack.png'
    rack.save(out)
    assert out.stat().st_size > 1000


def test_spec_spectrum_peak():
    spec = Spec()
    t = np.arange(4096).reshape(-1, 1) / 44100
    block = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    centers, mags = spec.spectrum(block, 44100)
    assert abs(centers[mags.argmax()] - 1000) < 300


def test_vis_drain_drops_overflow():
    wave = Wave()
    for _ in range(10):
        wave.consume_tap(np.zeros((512, 1), np.float32), 0, 44100)
    blocks = wave.drain(1024)       # only 2 blocks fit
    assert len(blocks) == 2
    assert wave.drain(1024) == []   # queue fully drained (rest dropped)


def test_wave_summary_matches_oracle_minmax():
    """Device-side Wave decimation (``render_vis``): the fetched
    per-bucket envelope equals the numpy oracle's min/max of the SAME
    rendered audio — only ~1500 points cross the host link."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.osc import Sine
    from conftest import pull_blocks

    osc = Sine()
    osc.hertz = fixed(440.0)
    tap = Wave()
    tap.input = osc
    n_blocks, F = 8, 512
    compiled = compile_node(tap, block_frames=F, rate=44100, channels=1)
    summaries, _ = compiled.render_vis(n_blocks=n_blocks)
    uid = compiled.index.info(tap).uid
    got = summaries[uid]
    oracle = pull_blocks(tap, n_blocks, block_frames=F, rate=44100,
                         channels=1)
    T = n_blocks * F
    P = min(T, 750)
    k = -(-T // P)
    pad = P * k - T
    x = np.concatenate([oracle, np.repeat(oracle[-1:], pad, 0)]) \
        if pad else oracle
    xb = x.reshape(P, k, 1)
    want = np.stack([xb.min(axis=1), xb.max(axis=1)], axis=1)
    assert got.shape == want.shape == (P, 2, 1)
    assert np.abs(got - want).max() < 1e-5
    # the node received the summary and can draw it with no queued blocks
    # (drain the full-rate blocks the ORACLE pull just queued — the
    # device path itself queued none)
    tap.drain(10 ** 9)
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    assert tap.q.empty()
    artists = tap.render(ax, 1500)
    assert artists
    plt.close(fig)
    C._compile_cache.clear()


def test_spec_summary_matches_spectrum_oracle():
    """Device-side Spec decimation: the fetched band magnitudes equal
    ``Spec.spectrum`` (the host/numpy pooling) on the same window."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.osc import Sine
    from conftest import pull_blocks

    osc = Sine()
    osc.hertz = fixed(1000.0)
    tap = Spec()
    tap.input = osc
    n_blocks, F = 8, 512
    compiled = compile_node(tap, block_frames=F, rate=44100, channels=1)
    summaries, _ = compiled.render_vis(n_blocks=n_blocks)
    uid = compiled.index.info(tap).uid
    got = summaries[uid]
    oracle = pull_blocks(tap, n_blocks, block_frames=F, rate=44100,
                         channels=1)
    centers, want = tap.spectrum(oracle, 44100)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5
    assert abs(centers[np.asarray(got).argmax()] - 1000) < 300
    C._compile_cache.clear()


def test_plot_command_renders_on_device_when_queue_empty(tmp_path):
    """`plot` with nothing queued triggers a one-shot device render
    fetching only the decimated summary (no bounce required)."""
    ctl = Controller(interactive=False, stdout=io.StringIO())
    for line in ('sink 7a default',
                 '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
                 '+ 2a signals_tpu.nodes.osc.Sine',
                 '+ 3a signals_tpu.nodes.vis.Wave',
                 '> 1a 2a.hertz',
                 '> 2a 3a.input',
                 '> 3a 7a.input'):
        ctl.default(line)
    png = tmp_path / 'wave.png'
    ctl.default(f'plot 3a {png}')
    assert png.stat().st_size > 1000


def test_render_vis_through_delay_path():
    """render_vis works when the tap rides the delay-solver/segment
    lowering (the c5 FM+delay shape), not just the stateless mega path —
    summaries still match the oracle's pooling."""
    import signals_tpu.compiler as C
    from signals_tpu.compiler import compile_node
    from signals_tpu.nodes.delay import Delay
    from signals_tpu.nodes.fx import Gain, Mix
    from signals_tpu.nodes.osc import Sine
    from conftest import pull_blocks

    op = Sine()
    op.hertz = fixed(220.0)
    mix = Mix()
    d = Delay()
    d.get_state().frames = 4 * 512
    fb = Gain()
    fb.left = d
    fb.right = fixed(0.45)
    mix.left = op
    mix.right = fb
    mix.mix = fixed(0.6)
    d.input = mix
    tap = Spec()
    tap.input = mix
    n_blocks, F = 8, 512
    compiled = compile_node(tap, block_frames=F, rate=44100, channels=1)
    summaries, _ = compiled.render_vis(n_blocks=n_blocks)
    uid = compiled.index.info(tap).uid
    got = summaries[uid]
    oracle = pull_blocks(tap, n_blocks, block_frames=F, rate=44100,
                         channels=1)
    _, want = tap.spectrum(oracle, 44100)
    assert np.abs(got - want).max() < 1e-5
    C._compile_cache.clear()
