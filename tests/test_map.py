"""Map layer: coordinates, state text format, document operations
(reference ``src/signals/map/__init__.py``)."""

import doctest

import numpy as np
import pytest

import signals_tpu.map as smap
from signals_tpu.map import (
    AlreadyConnected,
    ConnectionInfo,
    CoordinateColumn,
    Coordinates,
    Empty,
    BadName,
    BadPort,
    Map,
    MappedDevInfo,
    MappedSigInfo,
    NonEmpty,
    NotConnected,
    PortInfo,
    SigState,
    SigStateItem,
)
from signals_tpu.nodes.dev import Rack


def test_doctests():
    results = doctest.testmod(smap, verbose=False)
    assert results.failed == 0
    assert results.attempted > 0


def test_coordinate_column_round_trip():
    for i in (1, 25, 26, 27, 52, 701, 702, 703, 1234):
        assert int(CoordinateColumn(str(CoordinateColumn(i)))) == i
    with pytest.raises(ValueError):
        CoordinateColumn(0)


def test_coordinates_parse_errors():
    for bad in ('a1', '0a', 'a', '1', '1A', ''):
        with pytest.raises(ValueError):
            Coordinates.parse(bad)


def test_sig_state_item_values():
    assert SigStateItem.parse('x=1.5').v == 1.5
    assert SigStateItem.parse('x=true').v is True
    assert SigStateItem.parse('x=hello').v == 'hello'
    arr = SigStateItem.parse('x=[[1.0, 2.0]]').v
    np.testing.assert_array_equal(arr, [[1.0, 2.0]])
    assert str(SigStateItem(k='x', v=np.array([[1, 2]]))) == 'x=[[1,2]]'


def _at(s):
    return Coordinates.parse(s)


def _sine_info(at='1a', **state):
    return MappedSigInfo(at=_at(at), cls_name='signals_tpu.nodes.osc.Sine',
                         state=SigState(state))


def _fixed_info(at='2a', value=440.0):
    return MappedSigInfo(at=_at(at), cls_name='signals_tpu.nodes.fixed.Fixed',
                         state=SigState(value=np.array([[value]])))


def test_info_fills_defaults():
    info = _sine_info()
    assert info.state == {'enabled': True}
    assert set(info.port_names()) == {'hertz', 'phase'}


def test_info_accepts_reference_names():
    info = MappedSigInfo(at=_at('1a'), cls_name='signals.chain.osc.Sine',
                         state=SigState())
    from signals_tpu.nodes.osc import Sine
    assert isinstance(info.create(), Sine)


def test_info_rejects_unknown_property():
    with pytest.raises(BadName):
        _sine_info(bogus=1)


def test_map_add_rm_roundtrip():
    m = Map()
    m.add(_fixed_info('1a'))
    m.add(_sine_info('2a'))
    m.connect(ConnectionInfo(input_at=_at('1a'),
                             output=PortInfo.parse('2a.hertz')))
    removed = m.rm(_at('1a'))
    assert removed.cls_name == 'signals_tpu.nodes.fixed.Fixed'
    assert len(removed.links_out) == 1
    # node gone, connection gone
    with pytest.raises(Empty):
        m.rm(_at('1a'))
    assert list(m.iter_connections()) == []
    # restore
    m.add(removed)
    for link in removed.links:
        m.connect(link)
    assert len(list(m.iter_connections())) == 1


def test_map_add_occupied_raises():
    m = Map()
    m.add(_sine_info('1a'))
    with pytest.raises(NonEmpty):
        m.add(_fixed_info('1a'))


def test_map_connect_errors():
    m = Map()
    m.add(_fixed_info('1a'))
    m.add(_sine_info('2a'))
    with pytest.raises(BadPort):
        m.connect(ConnectionInfo(input_at=_at('1a'),
                                 output=PortInfo.parse('2a.nope')))
    m.connect(ConnectionInfo(input_at=_at('1a'),
                             output=PortInfo.parse('2a.hertz')))
    with pytest.raises(AlreadyConnected):
        m.connect(ConnectionInfo(input_at=_at('1a'),
                                 output=PortInfo.parse('2a.hertz')))
    with pytest.raises(NotConnected):
        m.disconnect(PortInfo.parse('2a.phase'))


def test_map_connect_displacement():
    m = Map()
    m.add(_fixed_info('1a', 440.0))
    m.add(_fixed_info('1b', 880.0))
    m.add(_sine_info('2a'))
    assert m.connect(ConnectionInfo(input_at=_at('1a'),
                                    output=PortInfo.parse('2a.hertz'))) is None
    displaced = m.connect(ConnectionInfo(input_at=_at('1b'),
                                         output=PortInfo.parse('2a.hertz')))
    assert displaced == _at('1a')


def test_map_edit_returns_old_state():
    m = Map()
    m.add(_fixed_info('1a', 440.0))
    old = m.edit(_at('1a'), SigState(value=np.array([[880.0]])))
    np.testing.assert_array_equal(old['value'], [[440.0]])
    sig = m.find(_at('1a'))
    np.testing.assert_array_equal(sig.get_state().value, [[880.0]])


def test_map_mv_swaps():
    m = Map()
    m.add(_fixed_info('1a'))
    m.add(_sine_info('1b'))
    fixed_sig = m.find(_at('1a'))
    sine_sig = m.find(_at('1b'))
    m.mv(_at('1a'), _at('1b'))
    assert m.find(_at('1b')) is fixed_sig
    assert m.find(_at('1a')) is sine_sig
    m.mv(_at('1b'), _at('3c'))
    assert m.find(_at('3c')) is fixed_sig


def test_map_devices():
    rack = Rack()
    rack.scan()
    m = Map()
    m.add(MappedDevInfo.for_sink(at=_at('9a'),
                                 device=rack.get_sink('default')))
    sinks = list(m.iter_sinks())
    assert len(sinks) == 1 and sinks[0].device.name == 'default'
    assert list(m.iter_signals()) == []  # devices excluded
