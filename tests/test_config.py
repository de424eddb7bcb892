"""Config tree tests (union schema per SURVEY.md §5.6)."""

import os

import pytest
import yaml

from superdiff_tpu.config import Config, load_config, save_config, to_dict


def test_defaults_match_reference_hyperparams():
    cfg = Config()
    assert cfg.training.batch_size == 8          # backup.yml:7
    assert cfg.training.num_epochs == 100        # backup.yml:8
    assert cfg.training.num_timesteps == 1000    # backup.yml:9
    assert cfg.training.learning_rate == 2e-4    # training_logic.py:15
    assert cfg.training.ema_decay == 0.995       # training_logic.py:16
    assert cfg.training.seed == 42               # train.py:48
    assert cfg.logging.wandb_project == "super-diff-xray"  # train.py:53


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.task = "TB"
    cfg.training.batch_size = 16
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.task == "TB"
    assert loaded.training.batch_size == 16
    assert to_dict(loaded) == to_dict(cfg)


def test_nested_yaml_load(tmp_path):
    path = str(tmp_path / "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump({
            "task": "TB",
            "training": {"num_timesteps": 500, "augmentation": "medium"},
            "logging": {"use_wandb": "false", "use_tensorboard": "true"},
        }, f)
    cfg = load_config(path)
    assert cfg.training.num_timesteps == 500
    assert cfg.training.augmentation == "medium"
    assert cfg.logging.use_wandb is False       # string-bool coercion
    assert cfg.logging.use_tensorboard is True


def test_dotted_overrides():
    cfg = load_config(overrides=["training.batch_size=32",
                                 "model.preset=base128",
                                 "sampling.eta=0.5",
                                 "logging.use_wandb=true"])
    assert cfg.training.batch_size == 32
    assert cfg.model.preset == "base128"
    assert cfg.sampling.eta == 0.5
    assert cfg.logging.use_wandb is True


def test_unknown_key_rejected(tmp_path):
    path = str(tmp_path / "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump({"training": {"batchsize": 4}}, f)
    with pytest.raises(KeyError):
        load_config(path)
    with pytest.raises(KeyError):
        load_config(overrides=["nope.thing=1"])


def test_bad_override_format():
    with pytest.raises(ValueError):
        load_config(overrides=["training.batch_size"])


def test_tuple_coercion():
    cfg = load_config(overrides=["superdiff.kappa=[0.3, 0.7]"])
    assert cfg.superdiff.kappa == (0.3, 0.7)


def test_model_num_res_blocks_override():
    """model.num_res_blocks reaches the built model: per-level list as a
    tuple, single entry as a uniform int, default None keeps the preset."""
    from superdiff_tpu.models.presets import model_from_config

    cfg = load_config(overrides=["model.preset=attn256d",
                                 "model.num_res_blocks=1,1,2,2,2"])
    assert cfg.model.num_res_blocks == (1, 1, 2, 2, 2)
    assert model_from_config(cfg).num_res_blocks == (1, 1, 2, 2, 2)

    cfg = load_config(overrides=["model.preset=attn256d",
                                 "model.num_res_blocks=3"])
    assert model_from_config(cfg).num_res_blocks == 3

    cfg = load_config(overrides=["model.preset=attn256s"])
    assert cfg.model.num_res_blocks is None
    assert model_from_config(cfg).num_res_blocks == (1, 2, 2, 2, 2)


def test_model_attn_resolutions_override():
    """model.attn_resolutions reaches the built model's down+mid policy
    while the preset's up-path policy is kept (the round-5 stretch
    wideattn64 variant: S=4096 attention at the 64-per-side level)."""
    from superdiff_tpu.models.presets import model_from_config

    cfg = load_config(overrides=["model.preset=wide256",
                                 "model.attn_resolutions=64,32,16"])
    assert cfg.model.attn_resolutions == (64, 32, 16)
    m = model_from_config(cfg)
    assert m.attn_resolutions == (64, 32, 16)
    assert m.up_attn_resolutions == (16,)

    cfg = load_config(overrides=["model.preset=wide256"])
    assert cfg.model.attn_resolutions is None
    assert model_from_config(cfg).attn_resolutions == (32, 16)
