"""Registry / discovery (reference ``src/signals/chain/discovery.py``)."""

import pytest

from signals_tpu import registry
from signals_tpu.registry import (
    BadPath,
    BadSyntax,
    InvalidObject,
    Library,
    load_signal,
)


def test_load_by_canonical_name():
    from signals_tpu.nodes.osc import Sine
    assert load_signal('signals_tpu.nodes.osc.Sine') is Sine


def test_load_by_reference_alias():
    from signals_tpu.nodes.osc import Sine
    from signals_tpu.nodes.fx import LowPass
    assert load_signal('signals.chain.osc.Sine') is Sine
    assert load_signal('signals.chain.fx.LowPass') is LowPass


def test_load_by_real_import_path():
    # unregistered classes still resolve through a dotted import
    from signals_tpu.nodes import osc
    cls = load_signal('signals_tpu.nodes.osc.Triangle')
    assert cls is osc.Triangle


def test_load_errors():
    with pytest.raises(BadSyntax):
        load_signal('nodots')
    with pytest.raises(BadPath):
        load_signal('not.a.module.Thing')
    with pytest.raises(InvalidObject):
        load_signal('signals_tpu.registry.Library')   # not a Signal


def test_canonical_name_roundtrip():
    from signals_tpu.nodes.osc import Sine
    assert Sine.cls_name() == 'signals_tpu.nodes.osc.Sine'


def test_library_excludes_devices_and_aliases():
    lib = Library()
    lib.scan()
    assert 'signals_tpu.nodes.osc.Sine' in lib.names
    assert 'signals.chain.osc.Sine' not in lib.names        # alias hidden
    assert not any('SinkDevice' in n for n in lib.names)    # devices hidden
    assert 'signals_tpu.nodes.delay.Delay' in lib.names
    assert 'signals_tpu.nodes.env.ADSR' in lib.names


def test_library_grep():
    lib = Library()
    lib.scan()
    assert lib.grep('*.Sine') == ['signals_tpu.nodes.osc.Sine']
    assert lib.grep('zzz*') == []


def test_modulation_nodes_discoverable():
    """FracDelay/Phaser/Gate/Limiter must appear in the library scan —
    the GUI add picker and `grep` only see registered names."""
    import signals_tpu.registry as R

    lib = R.Library(())
    lib.scan()
    names = set(lib.names)
    for want in ('moddelay.FracDelay', 'phaser.Phaser', 'dyn.Gate',
                 'dyn.Limiter'):
        assert any(n.endswith(want) for n in names), want
