"""Terminal patcher: grid-mode gestures (headless, via handle_key)."""

import io

from signals_tpu.map import Coordinates
from signals_tpu.map.control import Controller
from signals_tpu.ui.ascii import cell_span, render_map
from signals_tpu.ui.tui import ESC, PatcherTUI


def make_tui():
    return PatcherTUI(Controller(interactive=True, stdout=io.StringIO()))


def type_line(tui, line):
    for ch in line:
        tui.handle_key(ch)
    tui.handle_key('\n')


def test_command_mode_typing():
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.osc.Sine')
    assert tui.controller.map.get(Coordinates.parse('1a')) is not None
    assert tui.mode == 'cmd'


def test_grid_cursor_moves_and_clamps():
    tui = make_tui()
    tui.handle_key(ESC)
    assert tui.mode == 'grid'
    tui.handle_key('l')
    tui.handle_key('j')
    assert str(tui.cursor) == '2b'
    for _ in range(5):
        tui.handle_key('h')
        tui.handle_key('k')
    assert str(tui.cursor) == '1a'         # clamped at the origin


def test_cable_gesture_with_port_menu():
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    type_line(tui, '+ 2a signals_tpu.nodes.osc.Sine')
    tui.handle_key(ESC)
    tui.handle_key('\n')                   # start cable at 1a
    assert tui.pending == ('cable', Coordinates.parse('1a'))
    tui.handle_key('j')                    # down to 2a
    tui.handle_key('\n')                   # complete -> port menu
    assert tui.port_menu is not None
    ports = tui.port_menu[2]
    tui.handle_key(str(ports.index('hertz') + 1))
    sine = tui.controller.map.get(Coordinates.parse('2a'))
    assert 'hertz' in sine.inputs_by_port
    # gesture went through the command stack: undo removes it
    tui.handle_key('u')
    assert 'hertz' not in sine.inputs_by_port


def test_single_port_connects_without_menu():
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.osc.Sine')
    type_line(tui, '+ 2a signals_tpu.nodes.vis.Wave')
    tui.handle_key(ESC)
    tui.handle_key('\n')
    tui.handle_key('j')
    tui.handle_key('\n')
    wave = tui.controller.map.get(Coordinates.parse('2a'))
    assert 'input' in wave.inputs_by_port
    # x on the target disconnects the only connected port
    tui.handle_key('x')
    assert 'input' not in wave.inputs_by_port


def test_delete_move_and_cancel():
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.osc.Sine')
    tui.handle_key(ESC)
    tui.handle_key('m')                    # move 1a ...
    tui.handle_key('l')
    tui.handle_key('\n')                   # ... to 1b
    assert tui.controller.map.get(Coordinates.parse('1b')) is not None
    assert tui.controller.map.get(Coordinates.parse('1a')) is None
    tui.handle_key('d')                    # delete at cursor (1b)
    assert tui.controller.map.get(Coordinates.parse('1b')) is None
    # Esc cancels a pending gesture before leaving grid mode
    type_line_in_grid = '+ 1a back'        # (not used; keep grid mode)
    tui.handle_key('u')                    # undo delete
    assert tui.controller.map.get(Coordinates.parse('1b')) is not None
    tui.handle_key('\n')                   # start a cable...
    tui.handle_key(ESC)                    # ...cancel it
    assert tui.pending is None
    assert tui.mode == 'grid'
    tui.handle_key(ESC)                    # now leave grid mode
    assert tui.mode == 'cmd'


def test_add_gesture_prefills_command():
    tui = make_tui()
    tui.handle_key(ESC)
    tui.handle_key('l')
    tui.handle_key('A')
    assert tui.mode == 'cmd'
    assert tui.line == '+ 1b '


def test_cell_span_matches_padded_render():
    tui = make_tui()
    type_line(tui, '+ 2b signals_tpu.nodes.osc.Sine')
    at = Coordinates.parse('2b')
    text = render_map(tui.controller.map, pad_to=Coordinates.parse('4d'))
    lines = text.splitlines()
    y, x0, x1 = cell_span(at)
    assert '2b:Sine' in lines[y][x0:x1]
    assert len(lines) >= 4                 # padded to the cursor row


def test_copy_paste_undo_round_trip():
    """Clipboard parity with the reference's signal copy/paste
    (``window.py:159-178``): payload carries class + state, paste re-adds
    through the undoable stack."""
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    tui.handle_key(ESC)                    # grid mode at 1a
    tui.handle_key('y')                    # copy
    assert tui.clipboard is not None
    assert 'Fixed' in tui.clipboard[0]
    assert 'value=' in tui.clipboard[1]
    tui.handle_key('l')                    # -> 1b
    tui.handle_key('p')                    # paste
    pasted = tui.controller.map.get(Coordinates.parse('1b'))
    assert pasted is not None
    assert float(pasted.get_state().value[0, 0]) == 440.0
    tui.handle_key('u')                    # undo the paste
    assert tui.controller.map.get(Coordinates.parse('1b')) is None
    tui.handle_key('r')                    # redo it
    assert tui.controller.map.get(Coordinates.parse('1b')) is not None


def test_cut_removes_and_paste_restores():
    tui = make_tui()
    type_line(tui, '+ 1a signals_tpu.nodes.osc.Sine')
    tui.handle_key(ESC)
    tui.handle_key('c')                    # cut
    assert tui.controller.map.get(Coordinates.parse('1a')) is None
    tui.handle_key('j')                    # -> 2a
    tui.handle_key('p')
    assert tui.controller.map.get(Coordinates.parse('2a')) is not None
    tui.handle_key('u')                    # undo paste
    tui.handle_key('u')                    # undo cut
    assert tui.controller.map.get(Coordinates.parse('1a')) is not None


def test_copy_empty_cell_is_noop():
    tui = make_tui()
    tui.handle_key(ESC)
    tui.handle_key('y')
    assert tui.clipboard is None
    tui.handle_key('p')
    assert 'clipboard empty' in tui.message


def test_fuzzy_picker_adds_selected_signal():
    tui = make_tui()
    tui.handle_key(ESC)
    tui.handle_key('a')                    # open the picker
    assert tui.picker is not None
    for ch in 'sine':
        tui.handle_key(ch)
    assert 'Sine' in tui.message
    tui.handle_key('\n')                   # accept top match
    sig = tui.controller.map.get(Coordinates.parse('1a'))
    assert sig is not None
    assert type(sig).__name__ == 'Sine'
    tui.handle_key('u')                    # picker adds are undoable
    assert tui.controller.map.get(Coordinates.parse('1a')) is None


def test_fuzzy_picker_subsequence_and_cancel():
    tui = make_tui()
    tui.handle_key(ESC)
    tui.handle_key('a')
    for ch in 'lwps':                      # subsequence of LowPass
        tui.handle_key(ch)
    matches = tui.picker_matches('lwps')
    assert any(m.endswith('LowPass') for m in matches)
    tui.handle_key(ESC)                    # cancel
    assert tui.picker is None
    assert tui.controller.map.get(Coordinates.parse('1a')) is None


def test_picker_selection_keys():
    tui = make_tui()
    tui.handle_key(ESC)
    tui.handle_key('a')
    for ch in 'pass':                      # LowPass/HighPass/BandPass/...
        tui.handle_key(ch)
    first = tui.picker_matches('pass')[0]
    tui.handle_key('\t')                   # move selection to second
    second = tui.picker_matches('pass')[1]
    tui.handle_key('\n')
    sig = tui.controller.map.get(Coordinates.parse('1a'))
    assert type(sig).__name__ == second.rsplit('.', 1)[-1]
    assert first != second
