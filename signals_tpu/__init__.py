"""signals_tpu — a TPU-native modular-synthesis ("patcher") framework.

A patch is a DAG of signal nodes producing blocks of audio frames
(``(frames, channels)`` arrays).  The public node/port/patch API mirrors the
reference framework (``noah-aviel-dove/signals``), but the execution model is
inverted for TPU hardware: instead of interpreting the graph per block with
per-node Python dispatch (reference ``src/signals/chain/dev.py:167-179``), a
graph compiler topologically sorts the patch and traces it into **one fused
JAX/XLA program** per (graph hash, block shape, sample rate), scanned over
blocks with ``jax.lax.scan``, vmapped over a leading voice axis for polyphony,
and shardable across a ``jax.sharding.Mesh`` for multi-chip rendering.

Two engines share one set of node kernel definitions:

* the **pull interpreter** (:mod:`signals_tpu.graph`) — numpy, reproducing the
  reference's pull-evaluation semantics exactly; used for debugging and as the
  parity oracle in tests;
* the **compiler** (:mod:`signals_tpu.compiler`) — the TPU path.

Flags and the root error type mirror the reference
(``src/signals/__init__.py:18-64``).
"""

from __future__ import annotations

import enum
import functools
import json
import pathlib
import typing

import numpy as np

__version__ = '0.1.0'

PortName = str


class SignalsError(Exception):
    """Root of the framework's error taxonomy.

    Mirrors reference ``src/signals/__init__.py:18-21`` (including the
    space-joined ``__str__`` format used by REPL error reporting).
    """

    def __str__(self) -> str:
        # genexpr, not map(): the `signals_tpu.map` submodule shadows the
        # builtin in this module's namespace once imported
        return ' '.join((type(self).__name__,
                         *(str(a) for a in self.args)))


#: Value types a node state property may hold (reference ``__init__.py:24``).
SigStateValue = typing.Union[float, int, bool, str, np.ndarray]


class SignalFlags(enum.Flag):
    """Node classification flags (reference ``src/signals/__init__.py:27-58``).

    Used by the library registry to filter non-device signals, and by UI /
    control layers to decide node behavior.
    """

    #: It is permissible for this signal to participate in cycles.  In this
    #: framework the flag is *implemented* (unlike the reference, which only
    #: declares it): a cycle is legal iff it passes through at least one
    #: CYCLIC node (e.g. :class:`signals_tpu.nodes.delay.Delay`), whose state
    #: edge is cut by the compiler's topological sort.
    CYCLIC = enum.auto()

    SINK_DEVICE = enum.auto()
    SOURCE_DEVICE = enum.auto()
    DEVICE = SINK_DEVICE | SOURCE_DEVICE

    #: Generates audio from non-audio input.
    GENERATOR = enum.auto()
    #: Generates audio from audio.
    EFFECT = enum.auto()
    AUDIO = GENERATOR | EFFECT | SOURCE_DEVICE

    #: Has a predetermined maximum duration.
    EPOCH = enum.auto()
    #: Facilitates recording.
    RECORDER = enum.auto()
    #: Facilitates visualization.
    VIS = enum.auto()
    #: When disabled, returns its input instead of an empty result.
    PASSTHRU = enum.auto()
    #: Never alters its input; produces a side effect when enabled.
    SIDE_EFFECT = VIS | RECORDER | PASSTHRU


class _Env:
    """Filesystem anchors (reference ``src/signals/__init__.py:68-83``)."""

    @property
    def package_root(self) -> pathlib.Path:
        return pathlib.Path(__file__).parent

    @property
    def project_root(self) -> pathlib.Path:
        return self.package_root.parent


env = _Env()


class Config:
    """Per-project JSON configuration (reference ``__init__.py:86-101``).

    Holds the theme name plus engine defaults that are new in this framework
    (block size and sample rate used when a patch is rendered).
    """

    def __init__(self,
                 *,
                 theme_: str = 'GREEN',
                 block_frames: int = 1024,
                 samplerate: int = 44100):
        self.theme_ = theme_
        self.block_frames = int(block_frames)
        self.samplerate = int(samplerate)

    @property
    def theme(self):
        import signals_tpu.ui.theme
        return getattr(signals_tpu.ui.theme, self.theme_)

    def asdict(self) -> dict:
        return {'theme_': self.theme_,
                'block_frames': self.block_frames,
                'samplerate': self.samplerate}

    @classmethod
    def load(cls, path: pathlib.Path) -> 'Config':
        with pathlib.Path(path).open('r') as f:
            return cls(**json.load(f))

    def save(self, path: pathlib.Path) -> None:
        with pathlib.Path(path).open('w') as f:
            json.dump(self.asdict(), f, indent=2)

    def __eq__(self, other) -> bool:
        return isinstance(other, Config) and self.asdict() == other.asdict()


class Project:
    """A project is a directory with a ``config.json``
    (reference ``__init__.py:104-118``)."""

    def __init__(self, *, path: pathlib.Path):
        self.path = pathlib.Path(path)

    @property
    def name(self) -> str:
        return self.path.stem

    @functools.cached_property
    def config(self) -> Config:
        return Config.load(self.path / 'config.json')

    @classmethod
    def default(cls) -> 'Project':
        return cls(path=env.project_root / 'templates' / 'default')
