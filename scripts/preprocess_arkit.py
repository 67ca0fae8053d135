"""ARKit capture preprocessing (reference: datasets/arkit_dataset.py:425-649
process_data, NeuralRecon-style).

Takes a raw capture directory with
    Frames.m4v     (video)
    Frames.txt     (per-frame timestamps)
    ARposes.txt    ("ts, tx, ty, tz, qw, qx, qy, qz" lines)
    Frames.txt-style intrinsics in "K.txt" or embedded defaults
and writes the layout ARKitDataset expects:
    images/<id>.jpg  poses/<id>.txt  intrinsics/<id>.txt

ARKit poses are gravity-aligned with y-up and camera looking down -z
(OpenGL); converted to OpenCV convention here.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.core.geometry import qvec2rotmat  # noqa: E402

GL_TO_CV = np.diag([1.0, -1.0, -1.0])


def load_poses(path):
    poses = []
    for line in open(path):
        line = line.strip().replace(",", " ")
        if not line or line.startswith("#"):
            continue
        vals = [float(v) for v in line.split()]
        ts, t, q = vals[0], vals[1:4], vals[4:8]
        R = qvec2rotmat(q) @ GL_TO_CV  # camera-to-world, flip to CV axes
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append((ts, T))
    return poses


def main():
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--capture_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--size", type=int, nargs=2, default=(640, 480),
                   help="output frame width height")
    p.add_argument("--frame_skip", type=int, default=1)
    args = p.parse_args()

    for sub in ("images", "poses", "intrinsics"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)

    poses = load_poses(os.path.join(args.capture_dir, "ARposes.txt"))
    ts_path = os.path.join(args.capture_dir, "Frames.txt")
    frame_ts = [float(l.strip().replace(",", " ").split()[0])
                for l in open(ts_path) if l.strip() and not l.startswith("#")]

    k_path = os.path.join(args.capture_dir, "K.txt")
    if os.path.exists(k_path):
        K = np.genfromtxt(k_path)[:3, :3]
    else:  # iPhone default at 1920x1440
        K = np.array([[1600.0, 0, 960.0], [0, 1600.0, 720.0], [0, 0, 1.0]])

    cap = cv2.VideoCapture(os.path.join(args.capture_dir, "Frames.m4v"))
    ow, oh = args.size
    src_w = cap.get(cv2.CAP_PROP_FRAME_WIDTH)
    src_h = cap.get(cv2.CAP_PROP_FRAME_HEIGHT)
    Ks = K.copy()
    Ks[0] *= ow / src_w
    Ks[1] *= oh / src_h

    pose_ts = np.array([p[0] for p in poses])
    written = 0
    for i, ts in enumerate(frame_ts):
        ok, frame = cap.read()
        if not ok:
            break
        if i % args.frame_skip:
            continue
        j = int(np.argmin(np.abs(pose_ts - ts)))
        if abs(pose_ts[j] - ts) > 0.05:  # no pose close enough
            continue
        fid = f"{written:06d}"
        cv2.imwrite(os.path.join(args.output_dir, "images", f"{fid}.jpg"),
                    cv2.resize(frame, (ow, oh)))
        np.savetxt(os.path.join(args.output_dir, "poses", f"{fid}.txt"), poses[j][1])
        np.savetxt(os.path.join(args.output_dir, "intrinsics", f"{fid}.txt"), Ks)
        written += 1
    cap.release()
    print(f"extracted {written} frames to {args.output_dir}")


if __name__ == "__main__":
    main()
