"""Core value types: Shape broadcast order, BlockLoc timeline, state schema."""

import doctest

import numpy as np
import pytest

import signals_tpu.core as core
from signals_tpu.core import BlockLoc, Shape
from signals_tpu.core.state import (
    BadStateValue,
    Param,
    State,
    array_2d,
    ge,
    instance_of,
)


def test_shape_doctests():
    results = doctest.testmod(core, verbose=False)
    assert results.failed == 0
    assert results.attempted > 0


def test_shape_partial_order():
    s = Shape(frames=8, channels=2)
    assert Shape(1, 1) <= s
    assert Shape(8, 1) <= s
    assert Shape(1, 2) <= s
    assert s <= s
    assert not (Shape(4, 2) <= s)
    assert not (Shape(8, 3) <= s)
    assert s >= Shape(1, 2)


def test_blockloc_frame_range():
    loc = BlockLoc(position=100, rate=44100, shape=Shape(4, 2))
    assert loc.end_position == 104
    assert loc.timestamp == 100 / 44100
    np.testing.assert_array_equal(loc.frame_range,
                                  [[100], [101], [102], [103]])


def test_blockloc_resize_reslice():
    loc = BlockLoc(position=0, rate=48000, shape=Shape(16, 2))
    assert loc.resize(16) is loc
    assert loc.resize(1).shape == Shape(1, 2)
    assert loc.reslice(4).shape == Shape(16, 4)


def test_blockloc_containment():
    outer = BlockLoc(position=100, rate=44100, shape=Shape(100, 2))
    inner = BlockLoc(position=150, rate=44100, shape=Shape(10, 1))
    assert inner <= outer
    assert not (outer <= inner)
    assert not (inner._replace(rate=48000) <= outer)


def test_blockloc_before_clamps_at_zero():
    loc = BlockLoc(position=50, rate=44100, shape=Shape(64, 1))
    before = loc.before(100)
    assert before.position == 0
    assert before.shape.frames == 50
    after = loc.after(10)
    assert after.position == 114
    assert after.shape.frames == 10


class _DemoState(State):
    count: int = Param(1, validate=ge(1))
    flag: bool = Param(True, validate=instance_of(bool))
    arr: np.ndarray = Param(lambda: np.zeros((1, 1)), validate=array_2d)


class _SubState(_DemoState):
    extra: float = Param(0.5)


def test_state_defaults_and_validation():
    s = _DemoState()
    assert s.count == 1 and s.flag is True
    s.count = 5
    with pytest.raises(BadStateValue):
        s.count = 0
    with pytest.raises(BadStateValue):
        s.flag = 'yes'
    with pytest.raises(BadStateValue):
        s.arr = np.zeros(3)


def test_state_inheritance_merges_params():
    assert set(_SubState.param_names()) == {'count', 'flag', 'arr', 'extra'}
    s = _SubState(extra=1.5, count=2)
    assert s.extra == 1.5 and s.count == 2


def test_state_copy_and_eq():
    s = _DemoState(count=3)
    t = s.copy()
    assert s == t
    t.count = 4
    assert s != t
    assert s.asdict()['count'] == 3
