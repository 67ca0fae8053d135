"""Occlusion-matte inference CLI (reference: inference/inference.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from implicit_depth_tpu.apps.inference import run_inference
from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.train import checkpoint as ckpt_lib
from implicit_depth_tpu.train.loop import build_dataset, build_net


def main():
    cfg = parse_and_merge()
    net = build_net(cfg, "bd", train_bn=False)
    _, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                           cfg.single_debug_scan_id)
    scan = (scans or ["scene0"])[0]
    # pass_frame_id: mattes are saved under the tuple's REAL frame number
    # (reference inference.py:162), which composite_capture looks up by
    # padded capture frame name — dataset indices would misalign
    ds = build_dataset(cfg, cfg.split, "bd", limit_to_scan_id=scan,
                       pass_frame_id=True)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=type(net).forward_val)
    assert cfg.load_weights_from_checkpoint, "--load_weights_from_checkpoint required"
    variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)

    out_dir = os.path.join(cfg.output_base_path, cfg.name, "mattes", scan)
    saved = run_inference(
        net, variables, ds, out_dir,
        rendered_depth_load_dir=cfg.rendered_depth_map_load_dir,
        sigmoid_multiplier=cfg.bd_sigmoid_multiplier,
        use_prior=cfg.use_prior,
        max_frames=cfg.max_frames,
    )
    print(f"saved {len(saved)} mattes to {out_dir}")


if __name__ == "__main__":
    main()
