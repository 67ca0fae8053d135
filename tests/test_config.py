"""Config system tests (two-file + CLI layering, tag tolerance)."""

import pytest

from implicit_depth_tpu import config as cfg_lib


def test_layering(tmp_path):
    model_cfg = tmp_path / "model.yaml"
    model_cfg.write_text("!!python/object:options.Options\nname: exp\nlr: 0.001\nlr_steps: [10, 20]\n")
    data_cfg = tmp_path / "data.yaml"
    data_cfg.write_text("dataset: scannet\nsplit: train\nlr: 0.002\n")
    cfg = cfg_lib.parse_and_merge(argv=[
        "--config_file", str(model_cfg),
        "--data_config_file", str(data_cfg),
        "--batch_size", "3",
    ])
    assert cfg.name == "exp"
    assert cfg.lr == 0.002          # data config overrides model config
    assert cfg.batch_size == 3      # CLI overrides file
    assert cfg.lr_steps == [10, 20]
    assert cfg.matching_height == 96 and cfg.matching_width == 128


def test_unknown_key_raises(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("not_a_real_flag: 1\n")
    with pytest.raises(KeyError):
        cfg_lib.parse_and_merge(argv=["--config_file", str(bad)])


def test_bool_flags():
    cfg = cfg_lib.parse_and_merge(argv=["--use_prior"])
    assert cfg.use_prior is True
    cfg = cfg_lib.parse_and_merge(argv=[])
    assert cfg.use_prior is False


def test_save_roundtrip(tmp_path):
    cfg = cfg_lib.Config(name="x", lr=5e-4)
    path = str(tmp_path / "cfg.yaml")
    cfg_lib.save_config(cfg, path)
    loaded = cfg_lib.merge_dict(cfg_lib.Config(), cfg_lib.load_yaml_options(path))
    assert loaded.name == "x" and loaded.lr == 5e-4
