"""Precompute valid_frames.txt per scan (reference:
data_scripts/precompute_valid_frames.py)."""

import os
import sys
from multiprocessing.pool import ThreadPool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.registry import get_dataset


def main():
    cfg = parse_and_merge()
    cls, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                             cfg.single_debug_scan_id)
    ds = cls(dataset_path=cfg.dataset_path, split=cfg.split,
             mv_tuple_file_suffix=None,
             image_height=cfg.image_height, image_width=cfg.image_width)

    def run(scan):
        valid = ds.get_valid_frame_ids(scan, store_computed=True)
        print(f"{scan}: {len(valid)} valid frames")

    with ThreadPool(cfg.num_workers) as pool:
        pool.map(run, scans)


if __name__ == "__main__":
    main()
