"""Writes a freshly-initialised weights checkpoint for a model config.

Used to drive the eval/temporal CLIs end-to-end where no trained or
converted checkpoint is available (e.g. throughput runs on the synthetic
dataset). The file is load_params-compatible with scripts/test_bd.py /
test_reg.py.

Usage:
  python scripts/make_random_checkpoint.py --config_file configs/models/X.yaml \
      --data_config_file configs/data/Y.yaml --output /tmp/rand.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"),
)


def main():
    # parse --output ourselves, pass the rest to the config system
    argv = sys.argv[1:]
    out = "/tmp/random_init.msgpack"
    if "--output" in argv:
        i = argv.index("--output")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    from implicit_depth_tpu.config import parse_and_merge
    from implicit_depth_tpu.data.mvs_dataset import collate
    from implicit_depth_tpu.train import checkpoint as ckpt_lib
    from implicit_depth_tpu.train.loop import build_dataset, build_net

    cfg = parse_and_merge(argv)
    net = build_net(cfg, "bd", train_bn=False)
    ds = build_dataset(cfg, cfg.split, "bd")
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    # init with the XLA warp path on the host CPU (the Pallas kernel cannot
    # lower there); the parameter tree is identical
    init_net = net.clone(use_pallas_warp=False)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                                  method=type(net).forward_val)
    ckpt_lib.save_params(out, variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"wrote {out}: {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
