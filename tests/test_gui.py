"""Graphical patcher presenter: scene building, gestures, clipboard,
picker, editor — all headless (the tkinter view is a thin shell)."""

import io

import numpy as np

from signals_tpu.map import Coordinates
from signals_tpu.map.control import Controller
from signals_tpu.ui.gui import PatcherPresenter


def make():
    return PatcherPresenter(Controller(interactive=True,
                                       stdout=io.StringIO()))


def setup_patch(p):
    p.run('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    p.run('+ 2a signals_tpu.nodes.osc.Sine')
    p.run('> 1a 2a.hertz')


def test_scene_contains_nodes_ports_cables():
    p = make()
    setup_patch(p)
    scene = p.scene()
    labels = {n['label'] for n in scene['nodes']}
    assert labels == {'Fixed', 'Sine'}
    kinds = {(pt['kind'], pt['name']) for pt in scene['ports']}
    assert ('out', 'out') in kinds
    assert ('in', 'hertz') in kinds and ('in', 'phase') in kinds
    assert len(scene['cables']) == 1
    cable = scene['cables'][0]
    assert cable['port'] == 'hertz'
    assert len(cable['points']) == 4          # tribar polyline


def test_click_selects_and_drag_moves():
    p = make()
    setup_patch(p)
    x0, y0, x1, y1 = p.node_box(Coordinates.parse('1a'))
    p.press((x0 + x1) / 2, (y0 + y1) / 2)
    assert str(p.selected) == '1a'
    # drag into the 3b cell
    bx, by = p.cell_origin(Coordinates.parse('3b'))
    p.motion(bx + 10, by + 10)
    p.release(bx + 10, by + 10)
    assert p.controller.map.get(Coordinates.parse('3b')) is not None
    assert p.controller.map.get(Coordinates.parse('1a')) is None
    p.run('undo')                              # moves are undoable
    assert p.controller.map.get(Coordinates.parse('1a')) is not None


def test_cable_gesture_connects_via_port_menu():
    p = make()
    p.run('+ 1a signals_tpu.nodes.fixed.Fixed value=[[300]]')
    p.run('+ 2a signals_tpu.nodes.osc.Sine')
    src = Coordinates.parse('1a')
    dst = Coordinates.parse('2a')
    ox, oy = p.out_dot(src)
    p.press(ox, oy)
    assert p.drag is not None and p.drag[0] == 'cable'
    assert p.scene()['pending'] is not None
    tx, ty = p.in_dot(dst, 0, 2)
    p.motion(tx, ty)
    p.release(tx, ty)
    assert p.port_menu is not None             # Sine has hertz + phase
    names = p.port_menu[2]
    p.choose_port(names.index('hertz'))
    conns = list(p.controller.map.iter_connections())
    assert len(conns) == 1
    assert conns[0].output.port == 'hertz'
    p.run('undo')
    assert not list(p.controller.map.iter_connections())


def test_cable_to_single_port_connects_directly():
    p = make()
    p.run('+ 1a signals_tpu.nodes.osc.Sine')
    p.run('+ 2a signals_tpu.nodes.shape.Flatten')
    ox, oy = p.out_dot(Coordinates.parse('1a'))
    p.press(ox, oy)
    tx, ty = p.cell_origin(Coordinates.parse('2a'))
    p.release(tx + 10, ty + 10)
    assert p.port_menu is None
    assert len(list(p.controller.map.iter_connections())) == 1


def test_clipboard_round_trip():
    p = make()
    setup_patch(p)
    p.selected = Coordinates.parse('1a')
    payload = p.copy()
    assert payload is not None and 'Fixed' in payload[0]
    p.paste(payload, Coordinates.parse('4c'))
    pasted = p.controller.map.get(Coordinates.parse('4c'))
    assert pasted is not None
    assert float(pasted.get_state().value[0, 0]) == 440.0
    p.run('undo')
    assert p.controller.map.get(Coordinates.parse('4c')) is None


def test_add_picker_and_free_cell():
    p = make()
    matches = p.search('sine')
    assert matches and matches[0].endswith('Sine')
    p.add(matches[0])
    assert str(p.selected) == '1a'             # first free cell
    assert type(p.controller.map.get(p.selected)).__name__ == 'Sine'
    p.add(matches[0])
    assert str(p.selected) != '1a'             # next free cell


def test_state_editor_fields_and_apply():
    p = make()
    p.run('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    p.selected = Coordinates.parse('1a')
    fields = dict(p.editor_fields())
    assert 'value' in fields and 'enabled' in fields
    p.apply_edit('value', '[[880]]')
    sig = p.controller.map.get(p.selected)
    assert float(sig.get_state().value[0, 0]) == 880.0
    p.run('undo')
    assert float(sig.get_state().value[0, 0]) == 440.0


def test_dirty_tracking():
    p = make()
    assert not p.dirty
    p.run('+ 1a signals_tpu.nodes.osc.Sine')
    assert p.dirty
    p.mark_saved()
    assert not p.dirty


def test_px_grid_round_trip():
    p = make()
    for s in ('1a', '3b', '7z', '12aa'):
        at = Coordinates.parse(s)
        x, y = p.cell_origin(at)
        assert p.px_to_grid(x + 5, y + 5) == at
