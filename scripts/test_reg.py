"""Depth-regression evaluation (reference: test_reg.py): standard depth
metrics, optional plane-IoU scoring of regressed depth
(--regression_plane_eval)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.eval.metrics import ResultsAverager, compute_depth_metrics_batched
from implicit_depth_tpu.models.depth_net import DepthNet
from implicit_depth_tpu.train import checkpoint as ckpt_lib
from implicit_depth_tpu.train.loop import build_dataset, build_net


def main():
    cfg = parse_and_merge()
    net = build_net(cfg, "regression", train_bn=False)
    _, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                           cfg.single_debug_scan_id)

    def step_fn(variables, cur, src):
        out = net.apply(variables, cur, src)
        pred = out["depth_pred_0"]
        if cfg.high_res_validation and "full_res_depth" in cur:
            # score upsampled predictions against the native-res GT
            # (depth_model.py:631-652 high-res validation)
            from implicit_depth_tpu.models.blocks import resize_bilinear

            gt = cur["full_res_depth"]
            pred = resize_bilinear(pred, gt.shape[1], gt.shape[2])
        else:
            gt = cur["depth"]
        b = gt.shape[0]
        valid = jnp.nan_to_num(gt, nan=0.0) > 0.5
        metrics = compute_depth_metrics_batched(
            jnp.nan_to_num(gt, nan=1.0).reshape(b, -1),
            pred.reshape(b, -1), valid.reshape(b, -1))
        if cfg.regression_plane_eval:
            s = bm.regression_plane_scores(cur["rendered_depth"], gt, pred)
            metrics.update(bm.scores_to_dict(s))
        return metrics

    if cfg.temporal_eval:
        from implicit_depth_tpu.data.scannet import ScanNetDataset
        from implicit_depth_tpu.eval.temporal_driver import evaluate_temporal

        datasets = {scan: build_dataset(cfg, cfg.split, "bd", limit_to_scan_id=scan)
                    for scan in (scans or ["scene0"])}
        ds0 = next(iter(datasets.values()))
        from implicit_depth_tpu.data.mvs_dataset import collate
        cur, src = collate([ds0[0]])
        cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
        src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
        variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src)
        assert cfg.load_weights_from_checkpoint
        variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)
        meshes = {scan: ScanNetDataset.get_gt_mesh_path(cfg.dataset_path, cfg.split, scan)
                  for scan in datasets}
        result = evaluate_temporal(
            net, variables, datasets, meshes, regression=True,
            eval_length=cfg.eval_length, warmup=cfg.warmup,
            frame_multiplier=cfg.eval_frame_multiplier,
            height=cfg.depth_height, width=cfg.depth_width,
            max_frames_per_scene=cfg.max_frames,
            use_scan=cfg.temporal_scan)
        print(f"temporal_score: {result['temporal_score']:.4f}")
        return

    step = jax.jit(step_fn)

    avg = ResultsAverager(cfg.name, "depth metrics")
    variables = None
    for scan in (scans or ["scene0"]):
        ds = build_dataset(cfg, cfg.split, "bd" if cfg.regression_plane_eval else "regression",
                           limit_to_scan_id=scan)
        for start in range(0, len(ds), cfg.val_batch_size):
            cur, src = collate([ds[i] for i in range(start, min(start + cfg.val_batch_size, len(ds)))])
            cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
            src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
            if variables is None:
                variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src)
                assert cfg.load_weights_from_checkpoint, "--load_weights_from_checkpoint required"
                variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)
                # commit once; host-resident params re-upload every dispatch
                variables = jax.device_put(variables, jax.local_devices()[0])
            metrics = step(variables, cur, src)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            for i in range(len(next(iter(metrics.values())))):
                avg.update_results({k: v[i] for k, v in metrics.items()})
    avg.compute_final_average(ignore_nans=True)
    avg.pretty_print_results(print_running_metrics=False)
    out_dir = os.path.join(cfg.output_base_path, cfg.name, "scores")
    os.makedirs(out_dir, exist_ok=True)
    avg.output_json(os.path.join(out_dir, "depth_metrics.json"))


if __name__ == "__main__":
    main()
