"""Converts a released reference `.ckpt` (PyTorch Lightning) into this
framework's weights-only msgpack checkpoint.

Usage:
    python scripts/convert_checkpoint.py \
        --input weights/implicit_depth.ckpt \
        --output weights/implicit_depth.msgpack

The Lightning checkpoint stores the BDModel state_dict under "state_dict"
with keys like `encoder.conv_stem.weight` (timm tf_efficientnetv2_s or
resnet18d), `matching_model.net.*`, `cost_volume.mlp.net.*`,
`cost_volume_net.convs.*`, `depth_decoder.convs.*`, `binary_mlp.mlps.*`
(reference: experiment_modules/bd_model.py:39-141, weights/
strip_checkpoint.py). The converted file loads with
`train.checkpoint.load_params` into a BDNet variables template.

Offline workflow (zero-egress environments): download the .ckpt on a
networked machine, copy it here, run this script once; every tool in this
repo then consumes the msgpack.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def install_options_shim() -> None:
    """Makes `options.Options` unpicklable checkpoints loadable: the
    released .ckpts embed a pickled reference `options.Options` instance
    in hyper_parameters (bd_model.py:41 save_hyperparameters), and
    unpickling needs that class importable. The shim restores the
    instance's attribute dict without the reference package."""
    import types

    if "options" in sys.modules:
        return

    class Options:
        pass

    mod = types.ModuleType("options")
    mod.Options = Options
    sys.modules["options"] = mod


def opts_to_dict(hparams) -> dict:
    """hyper_parameters -> plain JSON-serialisable dict of option fields."""
    if hasattr(hparams, "get") and "opts" in hparams:
        hparams = hparams["opts"]
    src = getattr(hparams, "__dict__", None) or (
        hparams if isinstance(hparams, dict) else {})
    out = {}
    for k, v in src.items():
        if isinstance(v, (bool, int, float, str, type(None))):
            out[k] = v
        elif isinstance(v, (list, tuple)) and all(
                isinstance(x, (bool, int, float, str)) for x in v):
            out[k] = list(v)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="reference .ckpt path")
    ap.add_argument("--output", required=True, help="output .msgpack path")
    ap.add_argument("--kind", choices=("bd", "regression", "auto"), default="auto",
                    help="checkpoint family: implicit_depth*.ckpt (bd) or "
                         "regression.ckpt; auto-detected from the state_dict")
    args = ap.parse_args()

    import torch

    from implicit_depth_tpu.train import checkpoint as ckpt_lib

    install_options_shim()
    payload = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    hparams = payload.get("hyper_parameters", {})

    kind = args.kind
    if kind == "auto":
        kind = "bd" if any(k.startswith("binary_mlp.") for k in sd) else "regression"
        print(f"detected checkpoint kind: {kind}")
    if kind == "bd":
        params, stats = ckpt_lib.convert_reference_bd_checkpoint(sd)
    else:
        params, stats = ckpt_lib.convert_reference_depth_checkpoint(sd)
    variables = {"params": params, "batch_stats": stats}
    n = sum(x.size for x in __import__("jax").tree.leaves(variables))
    # "opts-in-checkpoint": the reference restores eval options from the
    # ckpt's hyper_parameters (test_bd.py:74-79); the sidecar .json keeps
    # them consumable (scripts/weights_drill.py)
    ckpt_lib.save_params(args.output, variables,
                         config={"kind": kind,
                                 "hyper_parameters": opts_to_dict(hparams)})
    print(f"wrote {args.output}: {n / 1e6:.1f}M params "
          f"(source {len(sd)} tensors)")


if __name__ == "__main__":
    main()
