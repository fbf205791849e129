"""Layered DAG layout (reference ``src/signals/layout/__init__.py`` —
shipped unwired there; wired to Map here via ``layout_patch``)."""

import io

import pytest

from signals_tpu.layout import LayoutCycle, Subgraph, Vertex, layout_patch
from signals_tpu.map.control import Controller


def _chain(n):
    vs = [Vertex(value=i) for i in range(n)]
    for a, b in zip(vs, vs[1:]):
        a.link(b)
    return vs


def test_strata_longest_path():
    a, b, c = _chain(3)
    d = Vertex(value='d')
    d.link(c)                       # shortcut edge into the last layer
    g = Subgraph([a, b, c, d])
    layers = g.strata()
    assert [sorted(str(x.value) for x in layer if x.value is not None)
            for layer in layers] == [['0', 'd'], ['1'], ['2']]


def test_cycle_raises():
    a, b = Vertex(value='a'), Vertex(value='b')
    a.link(b)
    b.link(a)
    with pytest.raises(LayoutCycle):
        Subgraph([a, b]).strata()


def test_components():
    a, b, c = _chain(3)
    d, e = _chain(2)
    comps = Subgraph([a, b, c, d, e]).components()
    assert sorted(len(c) for c in comps) == [2, 3]


def test_bridging_long_edges():
    a, b, c = _chain(3)
    a.link(c)                       # spans 2 layers
    g = Subgraph([a, b, c])
    strata = g.layout()
    # the long edge got a dummy in the middle layer
    assert any(v.is_bridge for v in strata[1])
    # every vertex placed; edges now only span adjacent layers
    for i, layer in enumerate(strata):
        for v in layer:
            assert v.y == i
            for inp in v.inputs:
                assert inp.y == i - 1


def test_deep_edge_unrolls_to_bridge_chain():
    vs = _chain(5)
    vs[0].link(vs[4])               # spans 4 layers
    g = Subgraph(vs)
    strata = g.layout()
    bridges = [v for v in g if v.is_bridge]
    assert len(bridges) == 3        # one per intermediate layer


def test_no_overlap_within_layer():
    roots = [Vertex(value=f'r{i}') for i in range(4)]
    sink = Vertex(value='sink')
    for r in roots:
        r.link(sink)
    g = Subgraph(roots + [sink])
    strata = g.layout()
    xs = [v.x for v in strata[0]]
    assert len(set(xs)) == len(xs)


def test_layout_patch_from_controller():
    ctl = Controller(interactive=False, stdout=io.StringIO())
    for line in ('+ 1a signals_tpu.nodes.fixed.Fixed value=[[440]]',
                 '+ 2a signals_tpu.nodes.osc.Sine',
                 '+ 3a signals_tpu.nodes.fx.Gain',
                 '+ 3b signals_tpu.nodes.fixed.Fixed value=[[0.5]]',
                 '> 1a 2a.hertz',
                 '> 2a 3a.left',
                 '> 3b 3a.right'):
        ctl.default(line)
    positions = layout_patch(ctl.map)
    assert len(positions) == 4
    ys = {str(at): y for at, (x, y) in positions.items()}
    assert ys['1a'] == 0 and ys['2a'] == 1 and ys['3a'] == 2
    assert ys['3b'] in (0, 1)
