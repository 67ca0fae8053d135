"""Depth metrics + results averaging (parity: utils/metrics_utils.py).

Metric math runs on-device in jnp with the same NaN-masked reductions as
the reference (jnp.nanmean mirrors torch.nanmean, including the
nan-of-empty behaviour). Aggregation (ResultsAverager) is host-side
numpy and emits reference-compatible JSON (metrics_utils.py:202-235).
"""

from __future__ import annotations

import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def compute_depth_metrics_batched(gt_bN: Array, pred_bN: Array, valid_bN: Array, mult_a: bool = False) -> dict:
    """Per-element depth metrics (utils/metrics_utils.py:52-120).

    Returns a dict of (b,) arrays: abs_diff, abs_rel, sq_rel, rmse,
    rmse_log, a5/a10/a25/a0-a3.
    """
    nan = jnp.nan
    gt = jnp.where(valid_bN, gt_bN, nan)
    pred = jnp.where(valid_bN, pred_bN, nan)

    thresh = jnp.maximum(gt / pred, pred / gt)

    def a_metric(limit):
        val = jnp.where(valid_bN, (thresh < limit).astype(jnp.float32), nan)
        m = jnp.nanmean(val, axis=1)
        return m * 100.0 if mult_a else m

    out = {
        "abs_diff": jnp.nanmean(jnp.abs(gt - pred), axis=1),
        "abs_rel": jnp.nanmean(jnp.abs(gt - pred) / gt, axis=1),
        "sq_rel": jnp.nanmean((gt - pred) ** 2 / gt, axis=1),
        "rmse": jnp.sqrt(jnp.nanmean((gt - pred) ** 2, axis=1)),
        "rmse_log": jnp.sqrt(jnp.nanmean((jnp.log(gt) - jnp.log(pred)) ** 2, axis=1)),
        "a5": a_metric(1.05),
        "a10": a_metric(1.10),
        "a25": a_metric(1.25),
        "a0": a_metric(1.10),
        "a1": a_metric(1.25),
        "a2": a_metric(1.25**2),
        "a3": a_metric(1.25**3),
    }
    return out


class ResultsAverager:
    """Running + final averaging with reference-compatible JSON output
    (utils/metrics_utils.py:123-371)."""

    def __init__(self, exp_name: str, metrics_name: str):
        self.exp_name = exp_name
        self.metrics_name = metrics_name
        self.elem_metrics_list: list[dict] = []
        self.running_metrics: Optional[dict] = None
        self.running_count = 0
        self.final_metrics: Optional[dict] = None

    def update_results(self, elem_metrics: dict) -> None:
        elem = {k: float(np.asarray(v)) for k, v in elem_metrics.items()}
        self.elem_metrics_list.append(dict(elem))
        if self.running_metrics is None:
            self.running_metrics = dict(elem)
        else:
            for k, v in elem.items():
                self.running_metrics[k] = (
                    self.running_metrics[k] * self.running_count + v
                ) / (self.running_count + 1)
        self.running_count += 1

    def compute_final_average(self, ignore_nans: bool = False) -> None:
        self.final_metrics = {}
        if not self.elem_metrics_list:
            return
        for key in self.running_metrics:
            values = np.array([e[key] for e in self.elem_metrics_list])
            self.final_metrics[key] = float(
                np.nanmean(values) if ignore_nans else values.mean()
            )

    def _metrics(self, running: bool) -> dict:
        return self.running_metrics if running else self.final_metrics

    def output_json(self, filepath: str, print_running_metrics: bool = False) -> None:
        metrics = self._metrics(print_running_metrics) or {}
        names_row, values_row = "", ""
        scores = {}
        for k, v in metrics.items():
            names_row += f"{k:8} "
            values_row += f"{v:.4f},".ljust(8) + " "
            scores[k] = float(v)
        out = {
            "exp_name": self.exp_name,
            "metrics_type": self.metrics_name,
            "scores": scores,
            "metrics_string": names_row,
            "scores_string": values_row,
        }
        with open(filepath, "w") as f:
            json.dump(out, f, indent=4)

    def from_json(self, filepath: str) -> None:
        with open(filepath) as f:
            d = json.load(f)
        self.exp_name = d["exp_name"]
        self.metrics_name = d["metrics_type"]
        self.final_metrics = {k: float(v) for k, v in d["scores"].items()}
        self.elem_metrics_list = [dict(self.final_metrics)]

    def pretty_print_results(self, print_exp_name: bool = True, print_running_metrics: bool = True) -> None:
        metrics = self._metrics(print_running_metrics)
        if not metrics:
            print("WARNING: No valid metrics to print.")
            return
        if print_exp_name:
            print(f"{self.exp_name}, {self.metrics_name}")
        for k, v in metrics.items():
            print(f"{k:8}: {v:.4f}")

    def print_sheets_friendly(self, print_exp_name: bool = True, include_metrics_names: bool = False,
                              print_running_metrics: bool = True) -> None:
        metrics = self._metrics(print_running_metrics)
        if not metrics:
            print("WARNING: No valid metrics to print.")
            return
        if print_exp_name:
            print(f"{self.exp_name}, {self.metrics_name}")
        names = "".join(f"{k:8} " for k in metrics)
        vals = "".join(f"{v:.4f},".ljust(8) + " " for v in metrics.values())
        if include_metrics_names:
            print(names)
        print(vals)

    def pretty_print_metric_table(
        self,
        metric_name: str = "iou",
        thresholds=np.linspace(0.3, 0.7, 5),
        depths=(1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5),
        single_iou: bool = False,
        print_running_metrics: bool = True,
    ) -> None:
        metrics = self._metrics(print_running_metrics)
        if not metrics:
            print("WARNING: No valid metrics to print.")
            return
        print(f"{self.exp_name}, {self.metrics_name}")
        if single_iou:
            rows = [[metrics[f"{metric_name}_d_{d:.1f}"] for d in depths]]
            index = [metric_name]
        else:
            rows = [
                [metrics[f"{metric_name}_{t:.1f}_d_{d:.1f}"] for d in depths]
                for t in thresholds
            ]
            arr = np.array(rows)
            rows.append(list(arr.max(0)))
            rows.append(list(np.asarray(thresholds)[arr.argmax(0)]))
            index = [f"{metric_name} {t}" for t in thresholds] + ["best_iou", "best_thresh"]
        header = " ".join(f"{d}m".rjust(9) for d in depths)
        print(" " * 16 + header)
        for name, row in zip(index, rows):
            print(f"{name:16}" + " ".join(f"{v:9.4f}" for v in row))
