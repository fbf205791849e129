"""Sweeping inventory checks: every registered node class constructs,
serializes through the .sigs text format, and round-trips its default
state (the invariant the whole persistence layer rests on)."""

import io

import pytest

from signals_tpu import SignalFlags
from signals_tpu.map import Coordinates, MappedSigInfo, SigState, SigStateItem
from signals_tpu.map.control import CommandSet, Controller
from signals_tpu.registry import Library, load_signal


def _library_names():
    lib = Library()
    lib.scan()
    return lib.names


@pytest.mark.parametrize('name', _library_names())
def test_node_constructs_and_has_flags(name):
    cls = load_signal(name)
    sig = cls()
    flags = cls.flags()
    assert isinstance(flags, SignalFlags)
    assert sig.get_state() is not None
    # every schema key readable
    for key in cls.state_attrs():
        getattr(sig.get_state(), key)


@pytest.mark.parametrize('name', _library_names())
def test_node_state_text_roundtrip(name):
    info = MappedSigInfo(at=Coordinates.parse('1a'), cls_name=name,
                         state=SigState())
    line = CommandSet.Add(signal=info).serialize()
    ctl = Controller(interactive=False, stdout=io.StringIO())
    cmd = ctl.parse_line(line)
    assert cmd.signal.cls_name == name
    # the parsed state equals the schema defaults
    redump = CommandSet.Add(signal=cmd.signal).serialize()
    assert redump == line


@pytest.mark.parametrize('name', _library_names())
def test_node_add_rm_via_map(name):
    ctl = Controller(interactive=False, stdout=io.StringIO())
    ctl.default(f'+ 1a {name}')
    assert len(list(ctl.map.iter_signals())) == 1
    ctl.default('- 1a')
    assert list(ctl.map.iter_signals()) == []
    ctl.default('undo')
    assert len(list(ctl.map.iter_signals())) == 1
