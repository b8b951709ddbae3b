import pytest
import yaml

from lightly_ocr_tpu.config import Config, load_config, save_config


def test_defaults_match_reference_yaml():
    cfg = Config()
    assert cfg.batch_size == 64
    assert cfg.batch_max_len == 25
    assert cfg.height == 32 and cfg.width == 100
    assert cfg.num_fiducial == 20
    assert cfg.hidden_size == 256
    assert cfg.character == "0123456789abcdefghijklmnopqrstuvwxyz"
    assert cfg.transform == "TPS"
    assert cfg.prediction == "Attention"


def test_derived_num_classes():
    assert Config(prediction="CTC").derived_num_classes == 37
    assert Config(prediction="Attention").derived_num_classes == 38


def test_derived_input_channel():
    assert Config(rgb=False).derived_input_channel == 1
    assert Config(rgb=True).derived_input_channel == 3


def test_validation():
    with pytest.raises(ValueError):
        Config(transform="bogus")
    with pytest.raises(ValueError):
        Config(prediction="MORAN")
    with pytest.raises(ValueError):
        Config(height=0)


def test_load_reference_format_yaml(tmp_path):
    # A YAML with the reference's exact keys (plus unknown ones) must load.
    p = tmp_path / "config.yml"
    p.write_text(
        yaml.safe_dump(
            {
                "batch_size": 32,
                "prediction": "CTC",
                "character": "abc",
                "some_unknown_key": 7,
            }
        )
    )
    cfg = load_config(str(p))
    assert cfg.batch_size == 32
    assert cfg.prediction == "CTC"
    assert cfg.derived_num_classes == 4


def test_save_roundtrip(tmp_path):
    cfg = Config(batch_size=16, prediction="CTC")
    p = tmp_path / "out.yml"
    save_config(cfg, str(p))
    assert load_config(str(p)) == cfg


def test_num_steps():
    assert Config(batch_max_len=25).num_steps == 26


def test_repo_config_yml_loads_as_defaults():
    """The checked-in config.yml at the repo root is the reference
    config plus documented TPU knobs; every value matches the dataclass
    defaults so it is a faithful, always-in-sync config artifact."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "config.yml"
    assert root.exists(), "repo-root config.yml must ship"
    assert load_config(str(root)) == Config()


def test_repo_config_yml_covers_all_fields():
    """config.yml documents EVERY Config field (nothing undocumented)."""
    import dataclasses
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "config.yml"
    data = yaml.safe_load(root.read_text())
    missing = {f.name for f in dataclasses.fields(Config)} - set(data)
    assert not missing, f"config.yml is missing keys: {sorted(missing)}"
