#!/usr/bin/env bash
# TPU perf-session runbook (docs/performance.md) in one command:
#   bash benchmarks/runbook.sh [quick]
# Runs the headline bench (with kernel-config A/B), refreshes the
# per-component budget, the int8 decision micro-bench, and the
# training-step + MD-serving numbers. "quick" stops after the headline.
set -u
cd "$(dirname "$0")/.."

echo "== TPU reachability =="
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable (tunnel down?) — aborting runbook"; exit 1; }

echo; echo "== 1. headline bench (kernel-config A/B + full measurement) =="
timeout 1800 python bench.py

if [ "${1:-}" = "quick" ]; then exit 0; fi

echo; echo "== 2. per-component budget =="
timeout 1800 python benchmarks/profile_force_call.py

echo; echo "== 3. int8 score-matmul decision (docs/performance.md item 4) =="
timeout 900 python benchmarks/micro_int8.py

echo; echo "== 4. training step =="
timeout 1800 python benchmarks/bench_train_step.py

echo; echo "== 5. MD serving =="
timeout 1800 python benchmarks/bench_md.py
