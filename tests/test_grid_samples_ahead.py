"""Regression: a stateful node whose ``step()`` reads grid samples with
``ahead > 0`` must survive the compiler's window-collection pass (the
collection context used to lack the ``ahead`` kwarg entirely) and must
agree with the pull engine.
"""

import numpy as np

from signals_tpu.compiler import compile_node
from signals_tpu.core.state import Param, ge
from signals_tpu.graph import KernelCtx, Receiver, StatefulEmitter, port
from tests.conftest import fixed, pull_blocks

F32 = np.float32


class GridPeek(StatefulEmitter, Receiver):
    """Outputs the newest grid sample of its input (sampled on a sub-block
    grid, one step *ahead* of the window anchor), plus a running block
    counter from its carry — a minimal stateful consumer of
    ``in_grid_samples(..., ahead=1)``."""

    input: Receiver.BoundPort = port('input')

    class State(StatefulEmitter.State):
        stride: int = Param(256, validate=ge(1))

    @classmethod
    def flags(cls):
        from signals_tpu import SignalFlags
        return SignalFlags.EFFECT

    @property
    def channels(self) -> int:
        return 1

    def init_carry(self, *, channels, rate, block_frames):
        return {'count': np.zeros((1, 1), dtype=F32)}

    def step(self, ctx: KernelCtx, carry):
        stride = self._state.stride
        g = ctx.in_grid_samples('input', stride, 3, ahead=1)   # (3, ch)
        out = ctx.xp.broadcast_to(g[-1:], (ctx.nframes, 1)).astype(F32)
        return out + carry['count'], {'count': carry['count'] + F32(1.0)}


def build():
    from signals_tpu.nodes.osc import Sawtooth
    osc = Sawtooth()
    osc.hertz = fixed(3.0)
    node = GridPeek()
    node.input = osc
    return node


def test_collection_pass_accepts_ahead():
    node = build()
    compiled = compile_node(node, block_frames=512, rate=44100, channels=1)
    audio, carry = compiled.render(position=0, n_blocks=4)
    assert audio.shape == (2048, 1)
    assert np.isfinite(audio).all()


def test_ahead_matches_pull_engine():
    compiled_node = build()
    compiled = compile_node(compiled_node, block_frames=512, rate=44100,
                            channels=1)
    got, _ = compiled.render(position=0, n_blocks=6)
    oracle = pull_blocks(build(), 6, block_frames=512, channels=1)
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_nested_grid_nodes_with_host_source(tmp_path):
    """Regression: a host-fed grid node consumed by ANOTHER grid node used
    to crash at trace with a host-window KeyError (the collection pass
    assumed single-cell grid windows)."""
    from signals_tpu.nodes.env import ADSR
    from signals_tpu.nodes.files import FileReader
    from signals_tpu.runtime import wavio

    path = tmp_path / 'gate.wav'
    gate = np.sign(np.sin(np.linspace(0, 40, 44100))).astype(np.float32)
    wavio.write_wav(path, gate.reshape(-1, 1), 44100)
    rd = FileReader()
    rd.get_state().path = str(path)
    a1 = ADSR()
    a1.gate = rd
    a2 = ADSR()
    a2.gate = a1
    compiled = compile_node(a2, block_frames=1024, rate=44100, channels=1)
    audio, _ = compiled.render(n_blocks=4)
    assert np.isfinite(audio).all()
