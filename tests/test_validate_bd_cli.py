"""`scripts/validate_bd.py` end-to-end (VERDICT r3 item 7): the threshold
sweep CLI runs against the synthetic dataset with a tiny BDNet checkpoint
and must (a) exit cleanly, (b) print per-plane best thresholds, and
(c) write a sweep JSON where ALL 17 swept thresholds keep distinct keys —
the reference's own validate_bd collides its `:.1f`-formatted keys
(utils/binary_metrics_utils.py:109-121 with validate_bd.py:58-59), which
this framework deliberately fixes with 2-decimal sweep keys."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


MODEL_YAML = """
name: tiny_bd_sweep
feature_volume_type: mlp_feature_volume
image_encoder_name: tiny
matching_encoder_type: resnet
precision: 32
"""

DATA_YAML = """
dataset: synthetic
split: val
image_width: 96
image_height: 64
model_num_views: 3
matching_num_depth_bins: 8
batch_size: 2
val_batch_size: 2
"""


def test_validate_bd_cli_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from implicit_depth_tpu.config import parse_and_merge
    from implicit_depth_tpu.data.mvs_dataset import collate
    from implicit_depth_tpu.train import checkpoint as ckpt_lib
    from implicit_depth_tpu.train.loop import build_dataset, build_net

    model_cfg = tmp_path / "model.yaml"
    data_cfg = tmp_path / "data.yaml"
    model_cfg.write_text(MODEL_YAML)
    data_cfg.write_text(DATA_YAML)
    ckpt_path = tmp_path / "tiny_bd.msgpack"
    out_base = tmp_path / "outputs"

    # build the identical net the CLI will build and save a weights-only
    # checkpoint for it
    cfg = parse_and_merge(argv=[], config_filepaths=[str(model_cfg), str(data_cfg)])
    net = build_net(cfg, "bd", train_bn=False)
    ds = build_dataset(cfg, "val", "bd")
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=type(net).forward_val)
    ckpt_lib.save_params(str(ckpt_path), variables)

    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "validate_bd.py"),
        "--config_file", str(model_cfg),
        "--data_config_file", str(data_cfg),
        "--load_weights_from_checkpoint", str(ckpt_path),
        "--output_base_path", str(out_base),
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=1500)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "best per-plane thresholds:" in out.stdout, out.stdout

    sweep_json = out_base / "tiny_bd_sweep" / "val_sweep" / "all_scenes_metrics.json"
    assert sweep_json.exists(), f"missing sweep JSON; stdout:\n{out.stdout}"
    metrics = json.load(open(sweep_json))["scores"]
    # all 17 swept thresholds keep distinct keys at every plane
    thresholds = [0.1 + 0.05 * i for i in range(17)]
    for d in (1.5, 5.0):
        keys = [f"iou_{t:.2f}_d_{d:.1f}" for t in thresholds]
        missing = [k for k in keys if k not in metrics]
        assert not missing, f"missing sweep keys: {missing[:5]}"
    # printed best thresholds parse back into the swept range
    line = [ln for ln in out.stdout.splitlines()
            if "best per-plane thresholds:" in ln][0]
    vals = [float(v.strip("'[], ")) for v in line.split(":", 1)[1].split(",")]
    assert len(vals) == 8
    assert all(0.1 <= v <= 0.9 for v in vals)
