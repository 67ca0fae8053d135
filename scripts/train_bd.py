"""Train the implicit binary-depth model (reference: train_bd.py).

Usage:
    python scripts/train_bd.py --config_file configs/models/implicit_depth.yaml \
        --data_config_file configs/data/scannet_default_train.yaml [--name exp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.train.loop import fit


def main():
    cfg = parse_and_merge()
    fit(cfg, kind="bd")


if __name__ == "__main__":
    main()
