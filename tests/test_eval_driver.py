"""End-to-end occlusion eval driver on the synthetic dataset (tiny net)."""

import json

import numpy as np
import jax

from implicit_depth_tpu.data.synthetic import SyntheticDataset
from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.eval.occlusion_eval import evaluate_scenes
from implicit_depth_tpu.models.bd_net import BDNet


def _tiny_net_and_vars(ds):
    from implicit_depth_tpu.data.mvs_dataset import collate
    import jax.numpy as jnp

    net = BDNet(image_encoder_name="tiny", num_src_views=2, num_depth_bins=8)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items()}
    src = {k: jnp.asarray(v) for k, v in src.items()}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src, method=BDNet.forward_val)
    return net, variables


def test_eval_driver_sweep_and_json(tmp_path):
    ds = SyntheticDataset(num_frames=6, num_views=3, split="val", get_bd_info=True)
    net, variables = _tiny_net_and_vars(ds)
    results = evaluate_scenes(
        net, variables, {"scene0": ds},
        output_dir=str(tmp_path), batch_size=2,
        thresholds=(0.4, 0.5),
        max_batches_per_scene=2,
    )
    avg = results["all_scene"]
    keys = avg.final_metrics.keys()
    assert "iou_0.5_d_1.5" in keys and "iou_pos_0.4_d_5.0" in keys
    assert "model_time" in keys
    with open(tmp_path / "scene0_metrics.json") as f:
        d = json.load(f)
    assert "scores" in d and "iou_0.5_d_1.5" in d["scores"]


def test_eval_driver_thresholder_mode(tmp_path):
    ds = SyntheticDataset(num_frames=6, num_views=3, split="val", get_bd_info=True)
    net, variables = _tiny_net_and_vars(ds)
    import jax.numpy as jnp

    thr = bm.Thresholder(jnp.asarray(np.linspace(1.5, 5.0, 8, np.float32)),
                         jnp.asarray([0.5, 0.4] + [0.3] * 6, dtype=np.float32))
    results = evaluate_scenes(
        net, variables, {"scene0": ds},
        output_dir=str(tmp_path), batch_size=2, thresholder=thr,
        max_batches_per_scene=1,
    )
    keys = results["all_scene"].final_metrics.keys()
    assert "iou_d_1.5" in keys
    assert "surface_iou_d_3.0" in keys
    assert "boundary_iou_neg_d_5.0" in keys


def test_eval_driver_depth_from_binary():
    ds = SyntheticDataset(num_frames=6, num_views=3, split="val", get_bd_info=True)
    net, variables = _tiny_net_and_vars(ds)
    results = evaluate_scenes(
        net, variables, {"scene0": ds}, batch_size=2,
        binary_eval_depth=True, max_batches_per_scene=1,
    )
    m = results["all_scene"].final_metrics
    assert "abs_rel" in m and np.isfinite(m["abs_rel"])
    assert "a25" in m


def test_eval_no_recompiles_across_scenes():
    """Static-shape eval (VERDICT r1 item 8): three scenes with different
    tuple counts and remainder batch sizes share ONE executable per jitted
    fn — remainders are padded, never recompiled."""
    scenes = {
        f"scene{i}": SyntheticDataset(num_frames=4 + i, num_views=3,
                                      split="val", get_bd_info=True)
        for i in range(3)
    }  # 2, 3, 4 tuples per scene -> remainders 2, 0, 1 at batch 3
    net, variables = _tiny_net_and_vars(next(iter(scenes.values())))
    results = evaluate_scenes(net, variables, scenes, batch_size=3)
    assert results["n_compiles"] in (2, -1)  # fwd + stacked scorer
    assert np.isfinite(results["all_scene"].final_metrics["iou_0.5_d_1.5"])
