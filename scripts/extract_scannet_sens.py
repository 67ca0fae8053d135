"""Extract ScanNet .sens archives into the on-disk layout this framework
expects (reference: data_scripts/scannet_wrangling_scripts/, which wraps
ScanNet's SensorData reader).

The .sens container format (documented by the ScanNet release):
  header: 8-byte version, 8-byte strlen + sensor name,
          4x (4x4 f32) calibration matrices (color/depth intrinsics +
          extrinsics), 4-byte color compression type, 4-byte depth
          compression type, 4-byte color w/h, 4-byte depth w/h,
          8-byte depth shift, 8-byte num frames
  per frame: 4x4 f32 cam-to-world pose, 8-byte color/depth timestamps,
          8-byte color/depth payload sizes, jpeg color bytes,
          zlib-compressed uint16 depth bytes.

Writes sensor_data/frame-XXXXXX.{color.jpg,depth.png,pose.txt}, the scan
metadata txt, and intrinsic/intrinsic_depth.txt.
"""

import argparse
import os
import struct
import sys
import zlib

import numpy as np


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def extract_sens(sens_path: str, out_dir: str, frame_skip: int = 1,
                 export_color: bool = True, export_depth: bool = True,
                 export_pose: bool = True) -> int:
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "sensor_data"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "intrinsic"), exist_ok=True)

    with open(sens_path, "rb") as f:
        version, = _read(f, "<I")
        assert version == 4, f"unsupported .sens version {version}"
        strlen, = _read(f, "<Q")
        sensor_name = f.read(strlen).decode("ascii", "ignore")
        K_color = np.array(_read(f, "<16f")).reshape(4, 4)
        E_color = np.array(_read(f, "<16f")).reshape(4, 4)
        K_depth = np.array(_read(f, "<16f")).reshape(4, 4)
        E_depth = np.array(_read(f, "<16f")).reshape(4, 4)
        color_comp, depth_comp = _read(f, "<ii")
        color_w, color_h = _read(f, "<II")
        depth_w, depth_h = _read(f, "<II")
        depth_shift, = _read(f, "<f")
        _pad, = _read(f, "<I")  # alignment of the double? (shift stored as f32+pad)
        num_frames, = _read(f, "<Q")

        np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_depth.txt"), K_depth)
        np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_color.txt"), K_color)
        scan = os.path.basename(out_dir.rstrip("/"))
        with open(os.path.join(out_dir, f"{scan}.txt"), "w") as meta:
            meta.write(f"colorWidth = {color_w}\ncolorHeight = {color_h}\n")
            meta.write(f"depthWidth = {depth_w}\ndepthHeight = {depth_h}\n")
            meta.write(f"fx_depth = {K_depth[0, 0]}\nfy_depth = {K_depth[1, 1]}\n")
            meta.write(f"mx_depth = {K_depth[0, 2]}\nmy_depth = {K_depth[1, 2]}\n")
            meta.write(f"numColorFrames = {num_frames}\n")
            meta.write(f"numDepthFrames = {num_frames}\n")
            meta.write(f"sensorName = {sensor_name.strip()}\n")

        written = 0
        for i in range(num_frames):
            pose = np.array(_read(f, "<16f")).reshape(4, 4)
            _ts_color, _ts_depth = _read(f, "<QQ")
            color_size, depth_size = _read(f, "<QQ")
            color_bytes = f.read(color_size)
            depth_bytes = f.read(depth_size)
            if i % frame_skip:
                continue
            base = os.path.join(out_dir, "sensor_data", f"frame-{i:06d}")
            if export_pose:
                np.savetxt(base + ".pose.txt", pose)
            if export_color:
                with open(base + ".color.jpg", "wb") as cf:
                    cf.write(color_bytes)  # jpeg passthrough
            if export_depth:
                depth = np.frombuffer(zlib.decompress(depth_bytes), np.uint16)
                depth = depth.reshape(depth_h, depth_w)
                Image.fromarray(depth, mode="I;16").save(base + ".depth.png")
            written += 1
        return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scans_dir", required=True, help="dir of <scan>/<scan>.sens")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--frame_skip", type=int, default=1)
    args = p.parse_args()

    scans = [d for d in sorted(os.listdir(args.scans_dir))
             if os.path.exists(os.path.join(args.scans_dir, d, f"{d}.sens"))]
    for scan in scans:
        out = os.path.join(args.output_dir, scan)
        n = extract_sens(os.path.join(args.scans_dir, scan, f"{scan}.sens"), out,
                         frame_skip=args.frame_skip)
        print(f"{scan}: extracted {n} frames")


if __name__ == "__main__":
    main()
