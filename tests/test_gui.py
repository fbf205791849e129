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


def test_power_toggle_gesture():
    """Clicking the node's power glyph flips `enabled` as an undoable
    edit (reference PowerToggle, ui/graph.py:149-164,210-265)."""
    p = make()
    p.run('+ 2b signals_tpu.nodes.osc.Sine')
    at = Coordinates.parse('2b')
    sig = p.controller.map.get(at)
    assert sig.get_state().enabled
    x, y = p.power_dot(at)
    p.press(x, y)
    assert not sig.get_state().enabled
    scene = p.scene()
    node = next(n for n in scene['nodes'] if n['at'] == at)
    assert not node['enabled'] and node['power'] == (x, y)
    p.run('undo')
    assert sig.get_state().enabled
    p.press(x, y)
    p.press(x, y)
    assert sig.get_state().enabled


def test_file_save_revert_cycle(tmp_path):
    """Save/Save-As/Revert track the current path
    (reference window.py:39-66)."""
    p = make()
    p.run('+ 1a signals_tpu.nodes.osc.Sine')
    assert not p.save()                       # no path yet -> Save As
    path = str(tmp_path / 'patch.sigs')
    assert p.save(path)
    assert p.path == path and not p.dirty
    p.run('+ 2a signals_tpu.nodes.osc.Square')
    assert p.dirty
    p.revert()
    assert not p.dirty
    labels = {n['label'] for n in p.scene()['nodes']}
    assert labels == {'Sine'}
    assert p.save()                           # reuses the current path


def test_bind_device_from_gui():
    """The AddDevice flow binds rack devices via the source/sink
    commands (reference dialog.py:172-266)."""
    p = make()
    sinks = p.device_names('sink')
    sources = p.device_names('source')
    assert sinks and sources
    p.bind_device('sink', sinks[0])
    bound = list(p.controller.map.iter_sinks())
    assert len(bound) == 1 and bound[0].device.name == sinks[0]
    # device nodes are first-class scene nodes (SinkNode glyphs)
    assert any(n['label'] == sinks[0] for n in p.scene()['nodes'])
    p.run('undo')
    assert not list(p.controller.map.iter_sinks())


def test_vis_entries_track_patch():
    p = make()
    assert p.vis_entries() == []
    p.run('+ 1a signals_tpu.nodes.osc.Sine')
    p.run('+ 3a signals_tpu.nodes.vis.Wave')
    p.run('> 1a 3a.input')
    entries = p.vis_entries()
    assert len(entries) == 1
    name, node = entries[0]
    assert 'Wave' in name and '3a' in name
    p.run('- 3a')
    assert p.vis_entries() == []


class _FakeWidget:
    """Records every method call; stands in for any Tk widget."""

    def __init__(self, view, *a, **k):
        self.view = view
        self.calls = []
        self.bindings = {}
        view.widgets.append(self)

    def bind(self, seq, fn):
        self.bindings[seq] = fn

    def __getattr__(self, name):
        def method(*a, **k):
            self.calls.append((name, a, k))
            if name in ('get', 'curselection'):
                return () if name == 'curselection' else ''
            return None
        return method


class _FakeTk:
    """Minimal tkinter stand-in: enough for TkPatcherView to build and
    redraw headlessly (the container has no display)."""

    def __init__(self):
        self.widgets = []
        view = self

        class Widget(_FakeWidget):
            def __init__(self, *a, **k):
                super().__init__(view, *a, **k)

        class Var:
            def __init__(self, value=''):
                self._v = value

            def get(self):
                return self._v

            def set(self, v):
                self._v = v

        self.Tk = Widget
        self.Canvas = Widget
        self.Menu = Widget
        self.Entry = Widget
        self.Toplevel = Widget
        self.Listbox = Widget
        self.Label = Widget
        self.Button = Widget
        self.Radiobutton = Widget
        self.StringVar = Var


def make_fake_view(monkeypatch):
    import sys
    import types
    from signals_tpu.ui.gui import TkPatcherView

    fake = _FakeTk()
    mod = types.ModuleType('tkinter')
    for name in ('Tk', 'Canvas', 'Menu', 'Entry', 'Toplevel', 'Listbox',
                 'Label', 'Button', 'Radiobutton', 'StringVar'):
        setattr(mod, name, getattr(fake, name))
    scrolled = types.ModuleType('tkinter.scrolledtext')
    scrolled.ScrolledText = fake.Tk
    mod.scrolledtext = scrolled
    monkeypatch.setitem(sys.modules, 'tkinter', mod)
    monkeypatch.setitem(sys.modules, 'tkinter.scrolledtext', scrolled)
    # vis dock embedding needs a real TkAgg backend; stub it
    monkeypatch.setattr(TkPatcherView, '_embed_figure',
                        lambda self, fig: (fake.Tk(), fake.Tk()))
    view = TkPatcherView(make())
    return view, fake


def test_tk_view_smoke(monkeypatch):
    """The Tk shell builds, redraws, and runs its menu/console/dialog
    code paths against a fake tkinter — catches attribute-level rot in
    the ~300 widget lines this container can never display."""
    view, fake = make_fake_view(monkeypatch)
    view._run('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]')
    view._run('+ 2a signals_tpu.nodes.osc.Sine')
    view._run('> 1a 2a.hertz')
    canvas = view.canvas
    drawn = [c for c in canvas.calls if c[0].startswith('create_')]
    kinds = {c[0] for c in drawn}
    assert {'create_rectangle', 'create_text',
            'create_oval', 'create_line'} <= kinds
    # gesture path through the Tk event shim
    class E:
        x, y = view.p.out_dot(Coordinates.parse('1a'))
    view._gesture('press', E)
    view._gesture('release', E)
    # dialogs build without touching a display
    view.add_dialog()
    view.edit_dialog()
    view.device_dialog()
    # console line entry path
    view.entry.bindings['<Return>'](None)
    # clipboard keybindings exist on the root
    for seq in ('<Control-z>', '<Control-s>', '<Delete>'):
        assert seq in view.root.bindings


def test_tk_view_vis_dock_sync(monkeypatch):
    """A Vis node added to the patch materializes a dock canvas; removing
    it tears the dock down (reference window.py:294-332)."""
    view, fake = make_fake_view(monkeypatch)
    assert view.vis_rack is None
    view._run('+ 1a signals_tpu.nodes.osc.Sine')
    view._run('+ 2a signals_tpu.nodes.vis.Wave')
    view._run('> 1a 2a.input')
    assert view.vis_rack is not None and len(view.vis_rack) == 1
    view._run('- 2a')
    assert view.vis_rack is None


def test_failed_save_keeps_dirty_and_path(tmp_path):
    """A save to an unwritable path must NOT adopt the path or clear the
    dirty flag — the user would quit believing the patch was saved."""
    p = make()
    setup_patch(p)
    good = str(tmp_path / 'ok.sigs')
    assert p.save(good) is True and p.path == good and not p.dirty
    p.run('+ 3a signals_tpu.nodes.osc.Sine')
    assert p.dirty
    bad = str(tmp_path / 'no-such-dir' / 'x.sigs')
    assert p.save(bad) is True            # handled (no prompt needed)...
    assert 'error' in p.message.lower()   # ...but reported
    assert p.path == good                 # bad path NOT adopted
    assert p.dirty                        # edits still unsaved
    # plain Ctrl-S retries the good path and succeeds
    assert p.save() is True and not p.dirty


def test_failed_load_keeps_state(tmp_path):
    p = make()
    setup_patch(p)
    good = str(tmp_path / 'ok.sigs')
    p.save(good)
    p.load(str(tmp_path / 'missing.sigs'))
    assert 'error' in p.message.lower()
    assert p.path == good                 # Revert still targets the real file
    scene = p.scene()
    assert len(scene['nodes']) == 2       # patch untouched


def test_tk_clipboard_and_alt_accelerators(monkeypatch):
    """OS-clipboard + accelerator parity (reference window.py:39-66,
    159-178): copy pushes the node's `.sigs` add line onto the system
    clipboard, paste prefers a parseable OS-clipboard line over the
    in-process payload, and Alt+S/D/O/I are bound."""
    view, fake = make_fake_view(monkeypatch)
    view._run('+ 1a signals_tpu.nodes.osc.Sine')
    view.p.selected = Coordinates.parse('1a')
    view._copy()
    names = [c[0] for c in view.root.calls]
    assert 'clipboard_clear' in names
    appended = [c for c in view.root.calls if c[0] == 'clipboard_append']
    assert appended
    text = appended[-1][1][0]
    assert text.startswith('+ 1a signals_tpu.nodes.osc.Sine')
    # a `.sigs` add line arriving from ANOTHER process via the OS
    # clipboard pastes (re-targeted to a free cell)
    view.root.clipboard_get = lambda: ('+ 9z signals_tpu.nodes.osc.Square'
                                       ' enabled=true')
    view.clipboard = None
    view._paste()
    assert any('Square' in ln for ln in view.p.controller.dump())
    for seq in ('<Alt-s>', '<Alt-d>', '<Alt-o>', '<Alt-i>'):
        assert seq in view.root.bindings
    view.device_dialog('source')        # Alt+I path: preselects sources


def test_clip_text_round_trip():
    """The OS-clipboard text form is the `.sigs` add grammar and
    round-trips through parse."""
    from signals_tpu.ui import actions
    payload = ('signals_tpu.nodes.osc.Sine', 'enabled=true')
    text = actions.clip_text(payload)
    assert text == '+ 1a signals_tpu.nodes.osc.Sine enabled=true'
    assert actions.parse_clip_text(text) == payload
    assert actions.parse_clip_text('not a sigs line') is None
    assert actions.parse_clip_text('+ zz bad.coord x=1') is None
