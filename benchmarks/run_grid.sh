#!/bin/bash
# Full TPU benchmark grid (round-2 verdict item 1).
#
# The relayed TPU backend degrades terminally after ~10 minutes / many
# loaded executables in one process (compile-and-load starts returning
# InvalidArgument), so every fixture runs in its OWN process; the
# persistent compile cache (.jax_cache) makes per-process compiles cheap
# after the first run. NEVER run another python process concurrently --
# the tunnel is single-client and a second client invalidates this one.
cd /root/repo
rc=0
run() {
  echo "=== $* ==="
  "$@" || { echo "SUITE FAILED: $*"; rc=1; }
}
for n in 10 25 50 75 100; do
  run python benchmarks/run_benchmarks.py --suite size --solver pallas --batch 1024 --sizes $n
done
for fr in 0.0 0.1 0.3 0.5 0.8 0.95; do
  run python benchmarks/run_benchmarks.py --suite active --solver pallas --batch 1024 --fracs $fr
done
for fr in 0.8 0.95; do
  run python benchmarks/run_benchmarks.py --suite active --solver pallas_rescued --batch 1024 --fracs $fr
done
run python benchmarks/run_benchmarks.py --suite warm --solver pallas
run python benchmarks/run_benchmarks.py --suite box --batch 4096
run python benchmarks/run_benchmarks.py --suite decomp
run python benchmarks/run_benchmarks.py --suite ik
run env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/run_benchmarks.py --suite scaling --solver pallas
echo "GRID DONE rc=$rc"
exit $rc
