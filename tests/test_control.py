"""Control layer: command parsing, undo/redo, .sigs round-trip, hash
(reference ``src/signals/map/control.py``)."""

import io
import pathlib

import numpy as np
import pytest

from signals_tpu.map import Coordinates, MapLayerError
from signals_tpu.map.control import (
    BadCommand,
    BadCommandSyntax,
    BadRedo,
    BadUndo,
    Controller,
)

FIXTURES = pathlib.Path(__file__).parent / 'fixtures'


def make_controller(interactive=False):
    return Controller(interactive=interactive, stdout=io.StringIO())


def run(ctl, *lines):
    for line in lines:
        ctl.default(line)


def test_add_edit_show():
    ctl = make_controller()
    run(ctl,
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz')
    dump = list(ctl.dump())
    assert dump == [
        '+ 1a signals_tpu.nodes.fixed.Fixed enabled=true value=[[440.0]]',
        '+ 2a signals_tpu.nodes.osc.Sine enabled=true',
        '> 1a 2a.hertz',
    ]


def test_symbols_and_names_equivalent():
    a = make_controller()
    b = make_controller()
    run(a, '+ 1a signals_tpu.nodes.osc.Sine')
    run(b, 'add 1a signals_tpu.nodes.osc.Sine')
    assert list(a.dump()) == list(b.dump())


def test_bad_command_and_syntax():
    ctl = make_controller()
    with pytest.raises(BadCommand):
        ctl.parse_line('frobnicate 1a')
    with pytest.raises(BadCommandSyntax):
        ctl.parse_line('add')  # missing args


def test_interactive_swallows_map_errors():
    ctl = make_controller(interactive=True)
    ctl.default('- 9z')  # empty coordinates
    assert 'Empty' in ctl.stdout.getvalue()
    ctl2 = make_controller(interactive=False)
    with pytest.raises(MapLayerError):
        ctl2.default('- 9z')


def test_undo_redo_cycle():
    ctl = make_controller()
    run(ctl, '+ 1a signals_tpu.nodes.osc.Sine')
    run(ctl, '+ 1b signals_tpu.nodes.fixed.Fixed value=[[100]]')
    run(ctl, '> 1b 1a.hertz')
    h3 = ctl.hash()
    run(ctl, 'undo')
    run(ctl, 'undo')
    assert len(list(ctl.dump())) == 1
    run(ctl, 'redo 2')
    assert ctl.hash() == h3
    run(ctl, 'undo 3')
    assert list(ctl.dump()) == []
    with pytest.raises(BadUndo):
        ctl.undo()
    run(ctl, 'redo 3')
    assert ctl.hash() == h3
    with pytest.raises(BadRedo):
        ctl.redo()


def test_undo_remove_restores_links():
    ctl = make_controller()
    run(ctl,
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '+ 3a signals_tpu.nodes.fx.Gain',
        '> 1a 2a.hertz',
        '> 2a 3a.left')
    before = ctl.hash()
    run(ctl, '- 2a')       # removes node and both connections
    assert '> 1a 2a.hertz' not in list(ctl.dump())
    run(ctl, 'undo')
    assert ctl.hash() == before


def test_history_truncation_on_new_command():
    ctl = make_controller()
    run(ctl, '+ 1a signals_tpu.nodes.osc.Sine')
    run(ctl, '+ 1b signals_tpu.nodes.osc.Square')
    run(ctl, 'undo')
    run(ctl, '+ 1c signals_tpu.nodes.osc.Triangle')
    with pytest.raises(BadRedo):
        ctl.redo()          # redo branch was truncated
    names = {line.split()[2] for line in ctl.dump() if line.startswith('+')}
    assert names == {'signals_tpu.nodes.osc.Sine',
                     'signals_tpu.nodes.osc.Triangle'}


def test_edit_undo():
    ctl = make_controller()
    run(ctl, '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    run(ctl, '* 1a value=[[880]]')
    sig = ctl.map.find(Coordinates.parse('1a'))
    np.testing.assert_array_equal(sig.get_state().value, [[880.0]])
    run(ctl, 'undo')
    np.testing.assert_array_equal(sig.get_state().value, [[440.0]])


def test_save_load_hash_roundtrip(tmp_path):
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz',
        '> 2a 7a.input')
    h = ctl.hash()
    path = tmp_path / 'patch.sigs'
    run(ctl, f'save {path}')
    assert path.exists()

    ctl2 = make_controller()
    run(ctl2, f'load {path}')
    assert ctl2.hash() == h

    # load replaces current content atomically
    run(ctl2, f'load {path}')
    assert ctl2.hash() == h
    # and undo restores the pre-load patch
    run(ctl2, 'undo')
    assert ctl2.hash() == h


def test_load_rejects_non_dump_commands(tmp_path):
    bad = tmp_path / 'bad.sigs'
    bad.write_text('undo\n')
    ctl = make_controller()
    with pytest.raises(BadCommand):
        ctl.default(f'load {bad}')


def test_init_clears():
    ctl = make_controller()
    run(ctl,
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[1]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz')
    h = ctl.hash()
    run(ctl, 'init')
    assert list(ctl.dump()) == []
    run(ctl, 'undo')
    assert ctl.hash() == h


def test_grep():
    ctl = make_controller()
    names = ctl.grep('*osc*')
    assert 'signals_tpu.nodes.osc.Sine' in names
    assert all('osc' in n for n in names)
    assert ctl.grep('*nomatch*') == []


def test_mv_command():
    ctl = make_controller()
    run(ctl, '+ 1a signals_tpu.nodes.osc.Sine', '= 1a 5c')
    assert '+ 5c signals_tpu.nodes.osc.Sine enabled=true' in list(ctl.dump())
    run(ctl, 'undo')
    assert '+ 1a signals_tpu.nodes.osc.Sine enabled=true' in list(ctl.dump())


def test_sources_sinks_listing():
    ctl = make_controller()
    run(ctl, 'sinks')
    out = ctl.stdout.getvalue()
    assert 'default' in out


def test_reference_fixture_loads():
    """The reference's own saved patches load unchanged (class-name
    aliases; fixture mirrors ``src/signals/lowpass_test.sigs``)."""
    ctl = make_controller()
    ctl.default(f'load {FIXTURES / "lowpass_test.sigs"}')
    dump = list(ctl.dump())
    assert any('LowPass' in line for line in dump)
    assert any(line.startswith('sink 7a default') for line in dump)
    # round-trips through our dump format stably
    h1 = ctl.hash()
    run(ctl, 'undo', 'redo')
    assert ctl.hash() == h1


def test_reference_vis_fixture_loads():
    """Vis-tap patch in the reference format (mirrors
    ``src/signals/vis_test.sigs``)."""
    ctl = make_controller()
    ctl.default(f'load {FIXTURES / "vis_test.sigs"}')
    dump = list(ctl.dump())
    assert any('Spec' in line for line in dump)
    assert any(line.startswith('> 2a 6a.input') for line in dump)


def test_reference_fixture_verbatim_end_to_end(tmp_path):
    """The reference's BYTE-FOR-BYTE fixture patches — copied unmodified
    from ``/root/reference/src/signals/{lowpass_test,vis_test}.sigs``
    into ``tests/fixtures/reference/`` (sha256-identical) — load,
    render, and side-effect like the reference: the lowpass patch's
    FileWriter writes a valid WAV to the path baked into the artifact
    (``/tmp/lowpass_test.wav``, reference ``lowpass_test.sigs:9``),
    audio flows through the Merge of filtered+dry paths to the sink,
    and the dump/hash round-trips through our save format."""
    from signals_tpu.runtime import wavio
    ref = FIXTURES / 'reference'
    wav_path = pathlib.Path('/tmp/lowpass_test.wav')
    if wav_path.exists():
        wav_path.unlink()
    ctl = make_controller()
    ctl.default(f'load {ref / "lowpass_test.sigs"}')
    out = tmp_path / 'ref_bounce.wav'
    run(ctl, f'bounce 7a {out} 0.25')
    try:
        data, rate = wavio.read_wav(out)
        assert rate == 44100 and data.shape[0] >= 0.2 * 44100
        assert np.abs(data).max() > 1e-3
        # the recorder side effect: the reference artifact's FileWriter
        # wrote its hard-coded path during the render
        wdata, wrate = wavio.read_wav(wav_path)
        assert wrate == 44100 and wdata.shape[0] >= 0.2 * 44100
        assert np.abs(wdata).max() > 1e-3
    finally:
        if wav_path.exists():
            wav_path.unlink()
    h1 = ctl.hash()
    saved = tmp_path / 'resave.sigs'
    run(ctl, f'save {saved}')
    ctl2 = make_controller()
    ctl2.default(f'load {saved}')
    assert ctl2.hash() == h1

    ctl3 = make_controller()
    ctl3.default(f'load {ref / "vis_test.sigs"}')
    dump = list(ctl3.dump())
    assert any(line.startswith('sink 4c default') for line in dump)
    vis_wav = tmp_path / 'vis.wav'
    run(ctl3, f'bounce 4c {vis_wav} 0.1')
    data, rate = wavio.read_wav(vis_wav)
    assert np.abs(data).max() > 0.5      # 220 Hz sine at full scale


def test_batch_rollback_is_atomic(tmp_path):
    """A load that fails mid-batch must restore the prior patch."""
    ctl = make_controller()
    run(ctl, '+ 1a signals_tpu.nodes.osc.Sine')
    h = ctl.hash()
    bad = tmp_path / 'partial.sigs'
    bad.write_text('\n'.join([
        '+ 2a signals_tpu.nodes.osc.Square',
        '+ 2a signals_tpu.nodes.osc.Triangle',  # occupied -> fails
    ]) + '\n')
    with pytest.raises(MapLayerError):
        ctl.default(f'load {bad}')
    assert ctl.hash() == h


def test_playback_and_seek(monkeypatch):
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz',
        '> 2a 7a.input')
    sink = ctl.map.find(Coordinates.parse('7a'))
    sink.realtime = False
    run(ctl, 'seek 10 7a')
    assert sink.frame_position == 10 * sink.block_frames
    run(ctl, 'play 7a')
    assert sink.is_active
    run(ctl, 'pause 7a')
    assert not sink.is_active
    run(ctl, 'stop 7a')
    assert sink.frame_position == 0


def test_bounce_command(tmp_path):
    from signals_tpu.runtime import wavio
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz',
        '> 2a 7a.input')
    out = tmp_path / 'bounce.wav'
    run(ctl, f'bounce 7a {out} 0.25')
    data, rate = wavio.read_wav(out)
    assert rate == 44100
    assert data.shape[0] >= 0.2 * 44100
    spec = np.abs(np.fft.rfft(data[:, 0]))
    freq = np.fft.rfftfreq(len(data), 1 / 44100)[spec.argmax()]
    assert abs(freq - 440.0) < 10


def test_fit_command(tmp_path):
    """``fit`` — differentiable synthesis at the command surface: fits
    the named parameters to target audio through the compiled engine and
    applies them as ONE undoable batch of edits."""
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '+ 3a signals_tpu.nodes.fixed.Fixed value=[[0.8]]',
        '+ 4a signals_tpu.nodes.fx.Gain',
        '> 1a 2a.hertz', '> 2a 4a.left', '> 3a 4a.right',
        '> 4a 7a.input')
    target = tmp_path / 'target.wav'
    run(ctl, f'bounce 7a {target} 0.1')
    # detune the gain, then gradient-fit it back against the bounce
    run(ctl, '* 3a value=[[0.1]]')
    run(ctl, f'fit 7a {target} 3a.value --steps 200 --lr 0.1')
    node = ctl.map.find(Coordinates.parse('3a'))
    fitted = float(np.asarray(node.get_state().value).ravel()[0])
    assert abs(fitted - 0.8) < 0.05, fitted
    assert 'loss' in ctl.stdout.getvalue()
    # the whole fit is one history entry: a single undo restores the
    # pre-fit value
    run(ctl, 'undo')
    restored = float(np.asarray(node.get_state().value).ravel()[0])
    assert abs(restored - 0.1) < 1e-6
    run(ctl, 'redo')
    refit = float(np.asarray(node.get_state().value).ravel()[0])
    assert abs(refit - fitted) < 1e-6


def test_fit_command_errors(tmp_path):
    from signals_tpu.map.control import CommandError
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz', '> 2a 7a.input')
    target = tmp_path / 'target.wav'
    run(ctl, f'bounce 7a {target} 0.05')
    # a structural (non-traced) or unknown parameter name errors with
    # the fittable alternatives, before any descent runs
    with pytest.raises(CommandError, match='not a fittable'):
        run(ctl, f'fit 7a {target} 1a.nonsense')
    # a node outside the rendered patch errors too
    run(ctl, '+ 9a signals_tpu.nodes.fixed.Fixed value=[[1]]')
    with pytest.raises(CommandError, match='does not feed'):
        run(ctl, f'fit 7a {target} 9a.value')


def test_stats_command():
    ctl = make_controller()
    run(ctl, 'sink 7a default')
    run(ctl, 'stats')
    assert '(closed)' in ctl.stdout.getvalue()


def test_plot_and_export_commands(tmp_path):
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '+ 3a signals_tpu.nodes.vis.Wave',
        '> 1a 2a.hertz',
        '> 2a 3a.input',
        '> 3a 7a.input')
    wav = tmp_path / 'b.wav'
    run(ctl, f'bounce 7a {wav} 0.1')     # fills the vis tap
    png = tmp_path / 'wave.png'
    run(ctl, f'plot 3a {png}')
    assert png.stat().st_size > 1000
    svg = tmp_path / 'patch.svg'
    run(ctl, f'export {svg}')
    assert b'<svg' in svg.read_bytes()


def test_bad_state_values_rejected_at_add():
    """Structural params validate types at the command surface: a stray
    string into a bool or a float into an int must not slip through to
    compile time (where it would surface as an opaque trace error)."""
    ctl = make_controller()
    for bad in (
        '+ 1a signals_tpu.nodes.fx.LowPass streaming=banana',
        '+ 1b signals_tpu.nodes.fx.LowPass context=7.5',
        '+ 1c signals_tpu.nodes.delay.Delay frames=0.5',
        '+ 1d signals_tpu.nodes.env.ADSR attack=fast',
    ):
        with pytest.raises(MapLayerError):
            ctl.default(bad)
    # the valid forms still work
    run(ctl,
        '+ 2a signals_tpu.nodes.fx.LowPass streaming=true context=128',
        '+ 2b signals_tpu.nodes.delay.Delay frames=100')


def test_io_error_is_clean_in_interactive_mode():
    ctl = make_controller(interactive=True)
    run(ctl,
        'sink 7a null',
        '+ 1a signals_tpu.nodes.osc.Sine',
        '> 1a 7a.input',
        'bounce 7a /nonexistent_dir_xyz/out.wav 0.01')
    out = ctl.stdout.getvalue()
    assert 'IO error:' in out
    assert 'Traceback' not in out


def test_plot_engine_shape_follows_containing_sink():
    """The on-device plot render takes block_frames/rate from the sink
    whose patch CONTAINS the vis node — not whichever sink happens to
    iterate first (two-sink maps would otherwise render the plotted
    patch at the wrong engine shape)."""
    from signals_tpu.map.control import _engine_shape_for
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        'sink 8a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '+ 3a signals_tpu.nodes.vis.Wave',
        '> 1a 2a.hertz', '> 2a 3a.input',
        '> 3a 8a.input')     # the vis patch feeds sink 8a, NOT 7a
    sink_a = ctl.map.find(Coordinates.parse('7a'))
    sink_b = ctl.map.find(Coordinates.parse('8a'))
    sink_a.block_frames = 256
    sink_b.block_frames = 2048
    vis = ctl.map.find(Coordinates.parse('3a'))
    bf, rate = _engine_shape_for(ctl.map, vis)
    assert bf == 2048 and rate == sink_b.rate
    # a node in no sink's patch falls back to the FIRST sink's shape
    orphan = ctl.map.find(Coordinates.parse('1a'))
    run(ctl, '>/ 2a.hertz')
    bf2, _ = _engine_shape_for(ctl.map, orphan)
    assert bf2 == 256


def test_fit_command_validates_steps_and_target_length(tmp_path):
    from signals_tpu.map.control import BadCommandSyntax, CommandError
    ctl = make_controller()
    run(ctl,
        'sink 7a default',
        '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
        '+ 2a signals_tpu.nodes.osc.Sine',
        '> 1a 2a.hertz', '> 2a 7a.input')
    target = tmp_path / 'target.wav'
    run(ctl, f'bounce 7a {target} 0.1')
    with pytest.raises(BadCommandSyntax, match='steps'):
        run(ctl, f'fit 7a {target} 1a.value --steps 0')
    # a sub-block target errors cleanly, not with a jit shape trace
    with pytest.raises(CommandError, match='whole'):
        run(ctl, f'fit 7a {target} 1a.value --seconds 0.005')
