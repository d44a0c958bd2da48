#!/bin/bash
# Throughput experiments for the headline bench (round-2 verdict item 4:
# target >= ~20k solves/s at pass rate 1.000). One experiment per process
# (the relayed backend degrades in long sessions); each prints one JSON
# line which we tee into a log for comparison.
cd /root/repo
LOG=benchmarks/out/throughput_experiments.log
: > $LOG
exp() {
  echo "=== $* ===" | tee -a $LOG
  env "$@" python bench.py 2>/dev/null | tee -a $LOG
}
exp BENCH_BATCH=16384 BENCH_IR_STEPS=2                      # baseline
exp BENCH_BATCH=16384 BENCH_IR_STEPS=1                      # fewer IR steps
exp BENCH_BATCH=16384 BENCH_IR_STEPS=2 BENCH_PACK=24        # bigger packs
exp BENCH_BATCH=16384 BENCH_IR_STEPS=2 BENCH_PACK=32
exp BENCH_BATCH=16384 BENCH_IR_STEPS=2 BENCH_SOLVER=pallas_compacted BENCH_PHASE1_FRAC=0.45
exp BENCH_BATCH=16384 BENCH_IR_STEPS=2 BENCH_SOLVER=pallas_compacted BENCH_PHASE1_FRAC=0.3
echo "EXPERIMENTS DONE"
