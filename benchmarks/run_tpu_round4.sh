#!/bin/bash
# Round-4 TPU evidence capture. Run during a healthy relay window; each
# step is independently timeout-guarded and the script continues on
# failure so one bad relay episode doesn't lose the rest of the captures.
# Usage:  bash benchmarks/run_tpu_round4.sh [steps...]
#   (default steps: warm box decomp ik corpus bench scaling)
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/out/round4_tpu.log
mkdir -p benchmarks/out
steps="${*:-warm box decomp ik corpus bench scaling}"

run() {  # run <name> <timeout-seconds> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ===" | tee -a "$LOG"
}

for s in $steps; do
  case "$s" in
    warm)    run warm   2400 python benchmarks/capture_warm.py ;;
    box)     run box     600 python benchmarks/run_benchmarks.py --suite box ;;
    decomp)  run decomp  700 python benchmarks/run_benchmarks.py --suite decomp ;;
    ik)      run ik     1800 python benchmarks/capture_ik.py ;;
    corpus)  run corpus  900 python benchmarks/run_benchmarks.py --suite corpus ;;
    bench)   run bench  1200 python bench.py ;;
    bench24) run bench24 1200 env BENCH_PACK=24 python bench.py ;;
    bench32) run bench32 1200 env BENCH_PACK=32 python bench.py ;;
    bench8)  run bench8  1200 env BENCH_PACK=8 python bench.py ;;
    benchir0) run benchir0 1200 env BENCH_IR_STEPS=0 python bench.py ;;
    benchit60) run benchit60 1200 env BENCH_MAX_ITER=60 python bench.py ;;
    scaling) run scaling 700 python benchmarks/run_benchmarks.py --suite scaling --solver pallas ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "=== all done ===" | tee -a "$LOG"
