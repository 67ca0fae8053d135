"""Strip optimizer state from a checkpoint, keeping weights + config
(reference: weights/strip_checkpoint.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir", help="directory saved by CheckpointManager")
    p.add_argument("out_path", help="output .msgpack weights file")
    args = p.parse_args()

    from flax import serialization
    from implicit_depth_tpu.train import checkpoint as ckpt_lib

    with open(os.path.join(args.ckpt_dir, "state.msgpack"), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = ckpt_lib.load_meta(args.ckpt_dir)
    variables = {"params": payload["params"]}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    ckpt_lib.save_params(args.out_path, variables, config=meta.get("config"))
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
