"""Precompute Hypersim planar depths from ray distances (reference:
data_scripts/generate_hypersim_planar_depths.py). Writes
frame.XXXX.planar_depth_meters.hdf5 beside each distance file."""

import os
import sys
from multiprocessing.pool import ThreadPool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.hypersim import HypersimDataset
from implicit_depth_tpu.data.registry import get_dataset


def main():
    cfg = parse_and_merge()
    _, scans = get_dataset("hypersim", cfg.dataset_scan_split_file,
                           cfg.single_debug_scan_id)
    ds = HypersimDataset(dataset_path=cfg.dataset_path, split=cfg.split)

    def run(scan):
        n = 0
        for line in ds.get_valid_frame_ids(scan):
            fid = line.split(" ")[1]
            scene, cam = os.path.split(scan)
            geo = os.path.join(ds.dataset_path, scene, "images",
                               f"scene_{cam}_geometry_hdf5")
            out = os.path.join(geo, f"frame.{int(fid):04d}.planar_depth_meters.hdf5")
            if os.path.exists(out):
                continue
            depth = ds._depth_h5(scan, fid, planar=False)
            with h5py.File(out, "w") as f:
                f.create_dataset("dataset", data=depth.astype(np.float16),
                                 compression="gzip", compression_opts=4)
            n += 1
        print(f"{scan}: wrote {n} planar depth files")

    with ThreadPool(cfg.num_workers) as pool:
        pool.map(run, scans)


if __name__ == "__main__":
    main()
