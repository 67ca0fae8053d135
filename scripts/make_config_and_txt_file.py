"""Writes a per-sequence data config + scan list for inference
(reference: inference/make_config_and_txt_file.py)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="vdr")
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--scan_id", required=True)
    p.add_argument("--output_dir", default="configs/data/generated")
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    txt = os.path.join(args.output_dir, f"{args.scan_id}.txt")
    with open(txt, "w") as f:
        f.write(args.scan_id + "\n")
    cfg = os.path.join(args.output_dir, f"{args.scan_id}.yaml")
    with open(cfg, "w") as f:
        f.write(f"dataset: {args.dataset}\n")
        f.write(f"dataset_path: {args.dataset_path}\n")
        f.write(f"dataset_scan_split_file: {txt}\n")
        f.write(f"tuple_info_file_location: {args.output_dir}\n")
        f.write(f"mv_tuple_file_suffix: _{args.scan_id}_dense.txt\n")
        f.write("frame_tuple_type: dense\nsplit: test\nnum_images_in_tuple: 8\n")
    print(f"wrote {cfg} and {txt}")


if __name__ == "__main__":
    main()
