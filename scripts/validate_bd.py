"""Validation threshold sweep (reference: validate_bd.py): scores the 8
fixed planes at 17 thresholds 0.1-0.9 to pick per-plane test thresholds."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.eval.occlusion_eval import evaluate_scenes
from implicit_depth_tpu.train import checkpoint as ckpt_lib
from implicit_depth_tpu.train.loop import build_dataset, build_net


def main():
    cfg = parse_and_merge()
    net = build_net(cfg, "bd", train_bn=False)
    _, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                           cfg.single_debug_scan_id)
    datasets = {
        scan: build_dataset(cfg, cfg.split, "bd", limit_to_scan_id=scan)
        for scan in (scans or ["scene0"])
    }
    ds0 = next(iter(datasets.values()))
    cur, src = collate([ds0[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=type(net).forward_val)
    assert cfg.load_weights_from_checkpoint, "--load_weights_from_checkpoint required"
    variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)

    # 17 thresholds 0.1..0.9 (validate_bd.py:58-59). The reference keys
    # these with :.1f, which collides adjacent sweep values (0.10/0.15 both
    # -> "iou_0.1_*", the later overwriting the earlier) — here every swept
    # threshold keeps distinct 2-decimal keys so the argmax is real.
    thresholds = np.linspace(0.1, 0.9, 17)
    out_dir = os.path.join(cfg.output_base_path, cfg.name, "val_sweep")
    results = evaluate_scenes(net, variables, datasets, output_dir=out_dir,
                              batch_size=cfg.val_batch_size, name=cfg.name,
                              thresholds=tuple(thresholds),
                              threshold_decimals=2)
    avg = results["all_scene"]
    avg.compute_final_average(ignore_nans=True)
    planes = [1.5 + 0.5 * i for i in range(8)]
    best = []
    for d in planes:
        scores = [(avg.final_metrics[f"iou_{t:.2f}_d_{d:.1f}"], t) for t in thresholds]
        best.append(max(scores)[1])
    print("best per-plane thresholds:", [f"{b:.2f}" for b in best])


if __name__ == "__main__":
    main()
