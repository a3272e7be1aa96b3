#!/bin/bash
# Full-size bench ablation matrix; appends one JSON line per config.
# Usage: bash tools/bench_ablate.sh [outfile]
set -u
OUT=${1:-/tmp/bench_ablation.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo "### $*" >> "$OUT"
  timeout 1500 python bench.py --iters 3 "$@" 2>/dev/null | tail -1 >> "$OUT"
}
run --warp_impl banded
run --warp_impl pallas2
run --warp_impl pallas2bf16
run --warp_impl pallas2bf16 --dtype bf16
run --warp_impl pallas2bf16 --batch 2
echo DONE >> "$OUT"
