import dataclasses

import pytest
import yaml

from espresso_tpu.config import (
    EspressoConfig,
    config_to_dict,
    load_config_dict,
    parse_config,
)


def test_defaults():
    cfg = EspressoConfig()
    assert cfg.task.name == "speech_recognition_espresso"
    assert cfg.optimization.lr == [0.001]


def test_dotted_overrides():
    cfg = parse_config(
        [
            "optimization.lr=0.002",
            "dataset.max_tokens=26000",
            "model.name=speech_conv_lstm_wsj",
            "common.dtype=float32",
            "generation.beam=60",
        ]
    )
    assert cfg.optimization.lr == [0.002]
    assert cfg.dataset.max_tokens == 26000
    assert cfg.model["name"] == "speech_conv_lstm_wsj"
    assert cfg.generation.beam == 60


def test_yaml_config(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        yaml.safe_dump(
            {
                "optimization": {"max_epoch": 30, "lr": [0.001]},
                "dataset": {"max_tokens": 22000},
                "model": {"name": "speech_transformer", "encoder_layers": 12},
            }
        )
    )
    cfg = parse_config(["--config", str(y), "optimization.max_epoch=5"])
    assert cfg.optimization.max_epoch == 5
    assert cfg.dataset.max_tokens == 22000
    assert cfg.model["encoder_layers"] == 12


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        parse_config(["optimization.not_a_key=1"])


def test_roundtrip_dict():
    cfg = EspressoConfig()
    d = config_to_dict(cfg)
    cfg2 = load_config_dict(d)
    assert config_to_dict(cfg2) == d
