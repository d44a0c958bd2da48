"""Headline benchmark: batched dense GI QP throughput (n=50, m=100).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North star (BASELINE.md): >= 1e5 strictly-convex dense QP solves/sec
(n=50, m=100) on a v5p-16 (8 chips) at per-problem KKT residual <= 1e-8,
i.e. 12,500 solves/sec/chip. This script measures solves/sec on however many
chips are visible (normally 1) and reports vs_baseline against the
per-chip target.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jrlqp_tpu import SolverOptions, solve_batch
from jrlqp_tpu.testing.batch_gen import random_qp_batch
from jrlqp_tpu.testing.kkt import kkt_residual

PER_CHIP_TARGET = 1e5 / 8  # v5p-16 north star, per chip

N, M = 50, 100
BATCH = int(os.environ.get("BENCH_BATCH", "256"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main():
    n_dev = len(jax.devices())
    opt = SolverOptions(max_iter=150)

    key = jax.random.key(0)
    pbs = random_qp_batch(key, BATCH, N, M, act_frac=0.3)
    pbs = jax.block_until_ready(pbs)

    run = jax.jit(lambda p: solve_batch(p, opt))
    res = jax.block_until_ready(run(pbs))  # compile + warm up

    # correctness gate: per-problem KKT residual
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    ok = jnp.mean((resid <= 1e-8) & (res.status == 0))

    times = []
    for r in range(REPS):
        pbs_r = jax.block_until_ready(
            random_qp_batch(jax.random.key(r + 1), BATCH, N, M, act_frac=0.3)
        )
        t0 = time.perf_counter()
        jax.block_until_ready(run(pbs_r))
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": f"dense GI QP solves/sec (n={N}, m={M}, batch={BATCH}, "
                f"{n_dev} device(s), fp64, KKT<=1e-8 pass rate "
                f"{float(ok):.3f})",
                "value": round(solves_per_sec, 2),
                "unit": "solves/sec",
                "vs_baseline": round(solves_per_sec / PER_CHIP_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
