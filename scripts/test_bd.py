"""Occlusion IoU evaluation (reference: test_bd.py).

Per-scene dense 8-plane queries, tuned per-plane thresholds, surface and
boundary variants, optional depth-from-binary (--binary_eval_depth).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.eval.occlusion_eval import evaluate_scenes
from implicit_depth_tpu.train import checkpoint as ckpt_lib
from implicit_depth_tpu.train.loop import build_dataset, build_net


def main():
    cfg = parse_and_merge()
    if cfg.jax_distributed:
        from implicit_depth_tpu.parallel import distributed as dist

        dist.initialize(cfg.coordinator_address, cfg.distributed_num_processes,
                        cfg.distributed_process_id)
    net = build_net(cfg, "bd", train_bn=False)

    ds_cls, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                                cfg.single_debug_scan_id)
    import jax as _jax

    pid, pcount = _jax.process_index(), _jax.process_count()
    all_scans = list(scans or [])  # full split, pre-sharding (rank-0 merge)
    if pcount > 1 and scans:
        # shard eval by scene across processes; per-scene JSONs land in
        # the shared output dir and rank 0 merges them at the end
        scans = list(scans)[pid::pcount]
    # pass_frame_id=True: prediction caches are keyed by the dataset's real
    # frame_id_string (reference test_bd.py:139)
    datasets = {
        scan: build_dataset(cfg, cfg.split, "bd", limit_to_scan_id=scan,
                            pass_frame_id=True)
        for scan in (scans or ["scene0"])
    }

    # init template then load weights
    ds0 = next(iter(datasets.values()))
    from implicit_depth_tpu.data.mvs_dataset import collate
    import jax
    cur, src = collate([ds0[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=type(net).forward_val)
    assert cfg.load_weights_from_checkpoint, "--load_weights_from_checkpoint required"
    variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)

    if cfg.temporal_eval:
        from implicit_depth_tpu.eval.temporal_driver import evaluate_temporal

        # GT-mesh path comes from the dataset class (ScanNet: the
        # _vh_clean_2.ply file; synthetic: a generated procedural mesh)
        meshes = {scan: ds_cls.get_gt_mesh_path(cfg.dataset_path, cfg.split, scan)
                  for scan in datasets}
        result = evaluate_temporal(
            net, variables, datasets, meshes,
            eval_length=cfg.eval_length, warmup=cfg.warmup,
            frame_multiplier=cfg.eval_frame_multiplier,
            sigmoid_multiplier=cfg.bd_sigmoid_multiplier,
            height=cfg.depth_height, width=cfg.depth_width,
            max_frames_per_scene=cfg.max_frames,
            use_scan=cfg.temporal_scan,
        )
        ft = ", ".join(f"{t:.2f}" for t in result["frame_times"])
        print(f"temporal_score: {result['temporal_score']:.4f} "
              f"({result['total_diffs']:.0f} flips / {result['total_verts']} verts), "
              f"{result['frames_per_sec']:.2f} frames/s (median) over "
              f"{result['n_frames']} frames [{ft}]")
        if pcount > 1:
            # scenes were sharded across processes: merge flip counts and
            # scene counts through rank files + a coordination-service
            # barrier (NOT an XLA collective: ranks finish their scenes at
            # very different times, and a first-collective gloo/ICI
            # bootstrap would time out; see parallel.distributed.barrier).
            # Rank 0 prints the global score (reference normalisation:
            # (eval_length-warmup)*mult*n_scans, test_bd.py:451-459).
            import json as _json

            from implicit_depth_tpu.parallel import distributed as dist

            tdir = os.path.join(cfg.output_base_path, cfg.name, "temporal")
            os.makedirs(tdir, exist_ok=True)
            with open(os.path.join(tdir, f"rank{pid}.json"), "w") as f:
                _json.dump({"total_diffs": result["total_diffs"],
                            "n_scenes": len(datasets)}, f)
            dist.barrier("temporal_scenes_done")
            if pid == 0:
                diffs = scenes = 0.0
                for r in range(pcount):
                    with open(os.path.join(tdir, f"rank{r}.json")) as f:
                        d = _json.load(f)
                    diffs += d["total_diffs"]
                    scenes += d["n_scenes"]
                denom = ((cfg.eval_length - cfg.warmup)
                         * cfg.eval_frame_multiplier * scenes)
                print(f"global temporal_score: {diffs / max(denom, 1):.4f} "
                      f"over {int(scenes)} scenes / {pcount} processes")
        return

    thresholder = None
    if cfg.use_validation_thresholds:
        planes = jnp.asarray(np.linspace(1.5, 5.0, 8, dtype=np.float32))
        thresholder = bm.Thresholder(planes, jnp.asarray([0.5, 0.4] + [0.3] * 6,
                                                          dtype=np.float32))
    out_dir = os.path.join(cfg.output_base_path, cfg.name, "scores")
    results = evaluate_scenes(
        net, variables, datasets, output_dir=out_dir,
        batch_size=cfg.val_batch_size, name=cfg.name,
        thresholder=thresholder or bm.Thresholder(
            jnp.asarray(np.linspace(1.5, 5.0, 8, dtype=np.float32)),
            jnp.asarray([0.5] * 8, dtype=np.float32)),
        binary_eval_depth=cfg.binary_eval_depth,
        max_batches_per_scene=(None if cfg.max_frames is None else
                               -(-cfg.max_frames // max(cfg.val_batch_size, 1))),
        cache_dir=(os.path.join(cfg.output_base_path, cfg.name, "depth_cache")
                   if cfg.cache_depths else None),
        sigmoid_multiplier=cfg.bd_sigmoid_multiplier,
    )
    avg = results["all_scene"]
    if pcount > 1:
        # wait for every process's scene JSONs, then merge on rank 0.
        # Coordination-service barrier, not an XLA collective: ranks
        # finish their scene shards minutes apart, and if this were the
        # program's first collective the gloo/ICI bootstrap (~30 s
        # key-value timeout) would kill the run.
        from implicit_depth_tpu.parallel import distributed as dist

        dist.barrier("test_bd_scenes_done")
        if pid != 0:
            return
        from implicit_depth_tpu.eval.metrics import ResultsAverager

        avg = ResultsAverager(cfg.name, "scene-averaged metrics (multi-host merge)")
        # merge exactly THIS run's scene set — a bare glob would also
        # average stale *_metrics.json left in the shared dir by earlier
        # runs with a different split / scene subset
        for scan in sorted(all_scans):
            path = os.path.join(out_dir, f"{scan}_metrics.json")
            scene = ResultsAverager(cfg.name, "scene")
            scene.from_json(path)
            avg.update_results(scene.final_metrics)
        avg.compute_final_average(ignore_nans=True)
        avg.output_json(os.path.join(out_dir, "all_scenes_metrics.json"))
    avg.pretty_print_results(print_running_metrics=False)
    if not cfg.binary_eval_depth:
        for metric in ("iou", "surface_iou", "boundary_iou"):
            avg.pretty_print_metric_table(metric_name=metric, single_iou=True,
                                          depths=[1.5 + 0.5 * i for i in range(8)],
                                          print_running_metrics=False)
    print(f"model_time: {results['model_time_ms']:.2f} ms/frame")


if __name__ == "__main__":
    main()
