"""Generate test-frame tuples (reference: data_scripts/generate_test_tuples.py).

Writes {tuple_info_file_location}/{split}{mv_tuple_file_suffix}.
"""

import os
import sys
from multiprocessing.pool import ThreadPool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.data.tuples import generate_test_tuples_for_scan
from implicit_depth_tpu.data.keyframes import DVMVSConfig, DVMVSHypersimConfig


def main():
    cfg = parse_and_merge()
    cls, scans = get_dataset(cfg.dataset, cfg.dataset_scan_split_file,
                             cfg.single_debug_scan_id)
    ds = cls(dataset_path=cfg.dataset_path, split=cfg.split,
             mv_tuple_file_suffix=None,
             image_height=cfg.image_height, image_width=cfg.image_width)
    kf_cfg = DVMVSHypersimConfig if cfg.dataset == "hypersim" else DVMVSConfig

    def run(scan):
        lines = generate_test_tuples_for_scan(
            ds, scan, cfg.frame_tuple_type,
            num_views=cfg.num_images_in_tuple or cfg.model_num_views,
            config=kf_cfg,
        )
        print(f"{scan}: {len(lines)} tuples")
        return lines

    with ThreadPool(cfg.num_workers) as pool:
        all_lines = [l for lines in pool.map(run, scans) for l in lines]

    suffix = cfg.mv_tuple_file_suffix
    out = os.path.join(cfg.tuple_info_file_location, f"{cfg.split}{suffix}")
    os.makedirs(cfg.tuple_info_file_location, exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(all_lines) + "\n")
    print(f"wrote {len(all_lines)} tuples to {out}")


if __name__ == "__main__":
    main()
