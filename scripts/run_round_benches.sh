#!/usr/bin/env bash
# One-shot benchmark sweep on the real chip; logs land in .bench_logs/.
# Run after any perf-relevant change (ROADMAP "benchmarks to re-run").
# Serialise: only one process can hold the TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p .bench_logs
ts=$(date +%m%d_%H%M)
failures=0

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  if timeout 1800 "$@" > ".bench_logs/${ts}_${name}.log" 2>&1; then
    tail -15 ".bench_logs/${ts}_${name}.log"
  else
    rc=$?
    failures=$((failures + 1))
    echo "!!! $name FAILED (rc=$rc, 124=timeout) — .bench_logs/${ts}_${name}.log:"
    tail -15 ".bench_logs/${ts}_${name}.log"
  fi
}

run bench            python bench.py
run profile_eval     python scripts/profile_eval.py
run roofline         python scripts/roofline.py
run profile_train    python scripts/profile_train.py --batch 12
run probe_volume_bwd python scripts/probe_volume_bwd.py --batch 12

if [ ! -f /tmp/rand_temporal.msgpack ]; then
  run make_ckpt python scripts/make_random_checkpoint.py \
      --config_file configs/models/implicit_depth_temporal.yaml \
      --data_config_file configs/data/synthetic_temporal.yaml \
      --output /tmp/rand_temporal.msgpack
fi
IDT_TEMPORAL_TRACE=1 run temporal_frame python scripts/test_bd.py \
    --config_file configs/models/implicit_depth_temporal.yaml \
    --data_config_file configs/data/synthetic_temporal.yaml \
    --load_weights_from_checkpoint /tmp/rand_temporal.msgpack \
    --temporal_eval --max_frames 30
IDT_TEMPORAL_TRACE=1 run temporal_scan python scripts/test_bd.py \
    --config_file configs/models/implicit_depth_temporal.yaml \
    --data_config_file configs/data/synthetic_temporal.yaml \
    --load_weights_from_checkpoint /tmp/rand_temporal.msgpack \
    --temporal_eval --temporal_scan --max_frames 30

echo "logs in .bench_logs/${ts}_*.log ($failures failed)"
exit $((failures > 0))
