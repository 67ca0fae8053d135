"""Weights-arrival drill e2e: a synthetic Lightning-format `.ckpt`
(structure-identical to the released ones — state_dict with the full
reference BDModel key set incl. the timm EfficientNetV2-S layout, plus
pickled `options.Options` hyper_parameters) runs through the exact
`scripts/weights_drill.py` CLI: convert -> opts-from-ckpt config ->
scripts/test_bd.py -> IoU tables (reference: test_bd.py:74-79,
README.md:72-79)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

IMG_H, IMG_W = 96, 128
K_SRC = 7
D_BINS = 16


def _make_reference_ckpt(path: str) -> None:
    """Builds the actual reference BDModel (timm swapped for the faithful
    EffNetV2-S twin) and saves it in the released checkpoints' Lightning
    format."""
    from tests import reference_stubs

    reference_stubs.install()
    import timm
    from tests.test_timm_conversion import EffNetV2STwin, _randomise_bn

    class _FI:
        def channels(self):
            return [24, 48, 64, 160, 256]

    def create_model(name, pretrained=False, features_only=False, **kw):
        m = EffNetV2STwin()
        m.feature_info = _FI()
        return m

    timm.create_model = create_model

    from options import Options
    from experiment_modules.bd_model import BDModel

    opts = Options()
    opts.image_width = IMG_W
    opts.image_height = IMG_H
    opts.model_num_views = K_SRC + 1
    opts.matching_num_depth_bins = D_BINS
    opts.binary_loss_positive_weight = 1.0
    opts.bd_edge_regularision = False

    torch.manual_seed(3)
    model = BDModel(opts).eval()
    _randomise_bn(model)

    payload = {
        "epoch": 3,
        "global_step": 50000,
        "pytorch-lightning_version": "1.5.4",
        "state_dict": model.state_dict(),
        "hyper_parameters": {"opts": opts},
    }
    torch.save(payload, path)


@pytest.mark.filterwarnings("ignore")
def test_weights_drill_cli_end_to_end(tmp_path):
    ckpt = str(tmp_path / "implicit_depth_synth.ckpt")
    _make_reference_ckpt(ckpt)

    workdir = str(tmp_path / "drill")
    # the subprocess runs WITHOUT the reference package importable — the
    # drill's options shim must handle the pickled Options instance
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "weights_drill.py"),
        "--ckpt", ckpt, "--workdir", workdir,
        "--data_config", "configs/data/synthetic_smoke.yaml",
        "--max_frames", "1", "--split", "val",
        "--image_width", str(IMG_W), "--image_height", str(IMG_H),
        "--model_num_views", str(K_SRC + 1),
        "--matching_num_depth_bins", str(D_BINS),
        "--val_batch_size", "1",
    ]
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                         timeout=1800)
    sys.stdout.write(out.stdout[-4000:])
    sys.stderr.write(out.stderr[-4000:])
    assert out.returncode == 0
    assert "checkpoint kind: bd" in out.stdout
    assert os.path.exists(os.path.join(workdir, "converted.msgpack"))
    # the eval CLI printed its per-plane IoU table and timing line
    assert "iou" in out.stdout and "model_time" in out.stdout
    # opts-from-ckpt took effect (16 bins came from hyper_parameters)
    import json

    with open(os.path.join(workdir, "converted.msgpack.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "bd"
    assert meta["hyper_parameters"]["matching_num_depth_bins"] == D_BINS
