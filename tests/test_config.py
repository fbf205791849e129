"""App-level Config/Project (reference ``src/signals/__init__.py:86-118``)."""

import json

from signals_tpu import Config, Project, env


def test_config_roundtrip(tmp_path):
    cfg = Config(theme_='RED', block_frames=512, samplerate=48000)
    path = tmp_path / 'config.json'
    cfg.save(path)
    loaded = Config.load(path)
    assert loaded == cfg
    assert loaded.theme.name == 'Vampire'


def test_config_defaults():
    cfg = Config()
    assert cfg.theme_ == 'GREEN'
    assert cfg.block_frames == 1024
    assert cfg.samplerate == 44100


def test_default_project_template():
    project = Project.default()
    assert project.name == 'default'
    cfg = project.config
    assert cfg.samplerate == 44100
    assert cfg.theme.name in ('Cyborg', 'Vampire', 'Bones')


def test_project_from_directory(tmp_path):
    (tmp_path / 'config.json').write_text(
        json.dumps({'theme_': 'WHITE', 'block_frames': 2048,
                    'samplerate': 22050}))
    project = Project(path=tmp_path)
    assert project.config.block_frames == 2048
    assert not project.config.theme.is_dark
