"""Every example script runs end-to-end (CPU, headless).

The examples are the product's front door (reference counterpart:
``scripts/edited_sine.py`` etc.) and nothing else executes them — an API
drift would otherwise rot them silently.  Each runs in its own
subprocess: the scripts mutate ``sys.path``/jax config at import time
and several share node-module state, so in-process imports would
interfere with each other and with this test session.
"""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / 'examples'
EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob('*.py'))


def test_example_inventory():
    """New examples join the smoke run automatically; this guards the
    glob itself (an empty dir would silently pass parametrization)."""
    assert len(EXAMPLES) >= 8


@pytest.mark.parametrize('name', EXAMPLES)
def test_example_runs(name, tmp_path):
    env = {'HOME': str(tmp_path), 'PATH': '/usr/bin:/bin:/usr/local/bin',
           'TMPDIR': str(tmp_path)}
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES_DIR / name)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, (
        f'{name} failed:\nstdout: {proc.stdout[-2000:]}\n'
        f'stderr: {proc.stderr[-2000:]}')
