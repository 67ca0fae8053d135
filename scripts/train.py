"""Train the depth-regression model (reference: train.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.config import parse_and_merge
from implicit_depth_tpu.train.loop import fit


def main():
    cfg = parse_and_merge()
    fit(cfg, kind="regression")


if __name__ == "__main__":
    main()
