"""Render-state checkpointing.

The reference's checkpoint system is the ``.sigs`` patch file plus seekable
sink positions (SURVEY §5).  The compiled engine adds one more piece of
state: the carry pytree (delay buffers, envelope edges).  A checkpoint here
is all three — patch text, timeline position, carry — so a render resumes
*sample-exactly*.

Stored as ``.npz`` (flat-keyed carry leaves) alongside the patch text, with
a graph hash recorded so a checkpoint is refused against an incompatibly
edited patch.
"""

from __future__ import annotations

import json
import pathlib
import typing

import numpy as np


def _flatten(carry: dict, prefix: str = '') -> dict[str, np.ndarray]:
    flat = {}
    for k, v in carry.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            flat.update(_flatten(v, key + '/'))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    carry: dict = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = carry
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return carry


class CheckpointMismatch(Exception):
    pass


def save(path,
         *,
         position: int,
         carry: typing.Optional[dict] = None,
         graph_hash: str = '',
         patch_lines: typing.Iterable[str] = ()) -> None:
    """Write a resume checkpoint.  ``patch_lines`` is typically
    ``Controller.dump()``."""
    path = pathlib.Path(path)
    flat = _flatten(carry or {})
    meta = {
        'position': int(position),
        'graph_hash': graph_hash,
        'patch': list(patch_lines),
        'carry_keys': sorted(flat.keys()),
    }
    np.savez(path, __meta__=json.dumps(meta),
             **{f'carry:{k}': v for k, v in flat.items()})


def load(path, *, expect_graph_hash: typing.Optional[str] = None) -> dict:
    """Read a checkpoint -> {'position', 'carry', 'graph_hash', 'patch'}."""
    path = pathlib.Path(path)
    with np.load(path if path.suffix else path.with_suffix('.npz'),
                 allow_pickle=False) as data:
        meta = json.loads(str(data['__meta__']))
        flat = {k[len('carry:'):]: data[k]
                for k in data.files if k.startswith('carry:')}
    if (expect_graph_hash is not None
            and meta['graph_hash']
            and meta['graph_hash'] != expect_graph_hash):
        raise CheckpointMismatch(
            f'checkpoint was taken against graph {meta["graph_hash"][:12]}…, '
            f'current graph is {expect_graph_hash[:12]}…')
    return {
        'position': meta['position'],
        'graph_hash': meta['graph_hash'],
        'patch': meta['patch'],
        'carry': _unflatten(flat),
    }
