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


def test_all_shipped_configs_load():
    """Every YAML under configs/ parses through parse_and_merge — the
    documented entry points of the reference README (reference
    configs/models/*, configs/data/*)."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    models = sorted(glob.glob(os.path.join(root, "configs/models/*.yaml")))
    datas = sorted(glob.glob(os.path.join(root, "configs/data/*.yaml")))
    assert len(models) >= 7 and len(datas) >= 17
    for m in models:
        for d in datas:
            cfg = cfg_lib.parse_and_merge(argv=[], config_filepaths=[m, d])
            assert cfg.num_images_in_tuple in (None, 8)
    # hypersim test config switches the min/max depth masking on
    cfg = cfg_lib.parse_and_merge(
        argv=[], config_filepaths=[
            os.path.join(root, "configs/models/implicit_depth_hypersim.yaml"),
            os.path.join(root, "configs/data/hypersim_default_test.yaml")])
    assert cfg.use_min_max_depth and cfg.dataset == "hypersim"
    assert cfg.val_interval == 400 and cfg.bd_edge_regularision is False
