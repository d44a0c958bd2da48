#!/bin/bash
# Full TPU benchmark grid (VERDICT round-2 item 1). Sequential: the TPU
# tunnel is single-client.
set -x
cd /root/repo
python benchmarks/run_benchmarks.py --suite size --solver pallas --batch 1024 || exit 1
python benchmarks/run_benchmarks.py --suite active --solver pallas --batch 1024 || exit 1
python benchmarks/run_benchmarks.py --suite active --solver pallas_rescued --batch 1024 || exit 1
python benchmarks/run_benchmarks.py --suite warm --solver pallas || exit 1
python benchmarks/run_benchmarks.py --suite box --batch 4096 || exit 1
python benchmarks/run_benchmarks.py --suite decomp || exit 1
python benchmarks/run_benchmarks.py --suite ik || exit 1
XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/run_benchmarks.py --suite scaling --solver pallas || exit 1
echo "GRID DONE"
