"""AR compositing CLI (reference: inference/composite.py).

Blends a rendered virtual layer (RGBA .png per frame) into the captured
frames using predicted occlusion mattes (or depth-band matting), exports
an mp4.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from implicit_depth_tpu.apps.composite import composite_sequence
from implicit_depth_tpu.utils.io import read_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True, help="captured RGB frames (*.png/jpg)")
    p.add_argument("--virtual_dir", required=True, help="rendered RGBA layers (*.png)")
    p.add_argument("--mattes_dir", default=None, help="predicted occlusion mattes (*.npy)")
    p.add_argument("--real_depth_dir", default=None, help="real depth .npy (depth/lidar modes)")
    p.add_argument("--virtual_depth_dir", default=None, help="virtual depth .npy")
    p.add_argument("--mode", default="mask", choices=["mask", "depth", "lidar"])
    p.add_argument("--output", default="composite.mp4")
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args()

    names = sorted(os.path.splitext(f)[0] for f in os.listdir(args.images_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    images, virtuals, mattes, rdepths, vdepths = [], [], None, None, None
    if args.mode == "mask":
        mattes = []
    else:
        rdepths, vdepths = [], []
    for name in names:
        for ext in (".png", ".jpg", ".jpeg"):
            path = os.path.join(args.images_dir, name + ext)
            if os.path.exists(path):
                images.append(read_image(path))
                break
        virt = read_image(os.path.join(args.virtual_dir, name + ".png"))
        if virt.shape[-1] == 3:  # add full alpha if RGB
            virt = np.concatenate([virt, np.ones_like(virt[..., :1])], -1)
        virtuals.append(virt)
        if args.mode == "mask":
            mattes.append(np.load(os.path.join(args.mattes_dir, name + ".npy")))
        else:
            rdepths.append(np.load(os.path.join(args.real_depth_dir, name + ".npy")))
            vdepths.append(np.load(os.path.join(args.virtual_depth_dir, name + ".npy")))

    composite_sequence(images, virtuals, args.output, mode=args.mode,
                       mattes=mattes, real_depths=rdepths, virtual_depths=vdepths,
                       fps=args.fps)
    print(f"wrote {args.output} ({len(images)} frames)")


if __name__ == "__main__":
    main()
