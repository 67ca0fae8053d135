"""Weights-arrival drill: released `.ckpt` -> converted weights -> eval
IoU table, in one command.

    python scripts/weights_drill.py --ckpt weights/implicit_depth.ckpt \
        [--data_config configs/data/scannet_default_test.yaml] \
        [--workdir /tmp/drill] [--max_frames N] [--single_debug_scan_id S]

What it does (the reference's test flow, test_bd.py:74-79 + README):
1. loads the Lightning checkpoint (an `options.Options` shim makes the
   pickled hyper_parameters readable without the reference package),
2. converts the state_dict with the table-driven converter
   (implicit_depth_tpu/train/checkpoint.py) — bd vs regression is
   auto-detected,
3. writes a model config derived from the checkpoint's own
   hyper_parameters ("opts-in-checkpoint" behaviour),
4. runs the real eval CLI (scripts/test_bd.py or scripts/test_reg.py)
   on the given data config and prints its IoU / depth-metric tables.

Offline default: the synthetic data config, proving the full CLI path
end-to-end; when real ScanNet data is mounted, pass the scannet tiny
split data config instead.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# config keys that transfer from checkpoint hyper_parameters to eval
# (model architecture + BD eval behaviour; data/infra keys stay local)
_TRANSFER_KEYS = (
    "image_encoder_name", "depth_decoder_name", "matching_encoder_type",
    "matching_feature_dims", "matching_scale", "matching_num_depth_bins",
    "min_matching_depth", "max_matching_depth", "cv_encoder_type",
    "feature_volume_type", "use_prior", "bd_sigmoid_multiplier",
    "model_num_views", "loss_type", "name",
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="released .ckpt path")
    ap.add_argument("--data_config", default="configs/data/synthetic_smoke.yaml")
    ap.add_argument("--workdir", default="/tmp/weights_drill")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--single_debug_scan_id", default=None)
    args, extra = ap.parse_known_args()
    args.extra = extra  # unknown flags forward to the eval CLI verbatim

    os.makedirs(args.workdir, exist_ok=True)

    # ---- 1+2: load + convert (exact convert_checkpoint.py code path)
    from convert_checkpoint import install_options_shim, opts_to_dict

    import torch

    from implicit_depth_tpu.train import checkpoint as ckpt_lib

    install_options_shim()
    payload = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    kind = "bd" if any(k.startswith("binary_mlp.") for k in sd) else "regression"
    print(f"[drill] checkpoint kind: {kind} ({len(sd)} tensors)")
    if kind == "bd":
        params, stats = ckpt_lib.convert_reference_bd_checkpoint(sd)
    else:
        params, stats = ckpt_lib.convert_reference_depth_checkpoint(sd)
    converted = os.path.join(args.workdir, "converted.msgpack")
    hp = opts_to_dict(payload.get("hyper_parameters", {}))
    ckpt_lib.save_params(converted, {"params": params, "batch_stats": stats},
                         config={"kind": kind, "hyper_parameters": hp})
    print(f"[drill] converted -> {converted}")

    # ---- 3: model config from the checkpoint's own hyper_parameters
    import yaml

    opts = {k: hp[k] for k in _TRANSFER_KEYS if k in hp}
    opts["load_weights_from_checkpoint"] = converted
    cfg_path = os.path.join(args.workdir, "ckpt_opts.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(opts, f)
    print(f"[drill] eval config from ckpt hparams: {sorted(opts)}")

    # ---- 4: the real eval CLI
    script = "test_bd.py" if kind == "bd" else "test_reg.py"
    cmd = [sys.executable, os.path.join(REPO, "scripts", script),
           "--config_file", cfg_path,
           "--data_config_file", os.path.join(REPO, args.data_config)
           if not os.path.isabs(args.data_config) else args.data_config,
           "--output_base_path", os.path.join(args.workdir, "results")]
    if args.max_frames is not None:
        cmd += ["--max_frames", str(args.max_frames)]
    if args.single_debug_scan_id:
        cmd += ["--single_debug_scan_id", args.single_debug_scan_id]
    cmd += args.extra
    print(f"[drill] running: {' '.join(cmd)}")
    rc = subprocess.call(cmd, cwd=REPO)
    if rc != 0:
        raise SystemExit(rc)
    print("[drill] OK")


if __name__ == "__main__":
    main()
