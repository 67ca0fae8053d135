"""Reload score JSONs and print IoU tables (reference: utils/print_scores.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_depth_tpu.eval.metrics import ResultsAverager


def main():
    p = argparse.ArgumentParser()
    p.add_argument("json_path")
    p.add_argument("--metric", default="iou")
    p.add_argument("--single_iou", action="store_true", default=True)
    args = p.parse_args()
    ra = ResultsAverager("scores", "reloaded")
    ra.from_json(args.json_path)
    ra.pretty_print_results(print_running_metrics=False)
    try:
        ra.pretty_print_metric_table(
            metric_name=args.metric, single_iou=args.single_iou,
            depths=[1.5 + 0.5 * i for i in range(8)], print_running_metrics=False)
    except KeyError:
        pass


if __name__ == "__main__":
    main()
