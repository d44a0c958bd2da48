"""Warm-start trajectory capture structured EXACTLY like bench.py.

bench.py's shape of work (on-device generation, outer-jit-wrapped library
calls, host-transfer barriers) executes reliably through the relayed TPU
backend; every other capture structure tried this round was rejected with
detail-free INVALID_ARGUMENT errors. This script is bench.py with the
timing phase replaced by the drifting-bounds control-loop trajectory
(ref: benchmarks/SolversWarmStart.cpp:31-59,162-169): cold solves every
step vs WarmCarry operator reuse. Writes benchmarks/out/warm_start.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.solver.fast import (
    solve_refined_pallas,
    solve_refined_pallas_carry,
)
from jrlqp_tpu.testing.batch_gen import random_qp_batch

N = int(os.environ.get("WARM_N", "50"))
M = int(os.environ.get("WARM_M", "100"))
BATCH = int(os.environ.get("WARM_BATCH", "4096"))
STEPS = int(os.environ.get("WARM_STEPS", "12"))


def main():
    opt = SolverOptions(max_iter=150, warm_start=True)

    run_cold = jax.jit(lambda p: solve_refined_pallas(p, opt, ir_steps=1))
    run_warm = jax.jit(
        lambda p, c: solve_refined_pallas_carry(p, c, opt, ir_steps=1))
    shift = jax.jit(lambda p, d: dataclasses.replace(p, l=p.l + d,
                                                     u=p.u + d))

    t_start = time.perf_counter()
    pbs = random_qp_batch(jax.random.key(0), BATCH, N, M, act_frac=0.4,
                          dtype=jnp.float32).with_dtype(jnp.float64)
    np.asarray(pbs.a)  # force generation
    drifts = 0.02 * jax.random.normal(jax.random.key(1), (STEPS, BATCH, M),
                                      pbs.l.dtype)
    np.asarray(drifts[0])
    print(f"# gen done t={time.perf_counter() - t_start:.1f}s",
          file=sys.stderr)

    # compile + warm up WITHOUT executing the single-shot cold-carry
    # program (the relay rejects its re-execution): AOT-compile both carry
    # specializations; warm run_cold by execution
    pb0 = shift(pbs, drifts[0])
    res0 = run_cold(pb0)
    np.asarray(res0.iterations)
    run_warm.lower(pb0, None).compile()
    carry_shape = jax.eval_shape(
        lambda p: solve_refined_pallas_carry(p, None, opt, ir_steps=1),
        pb0)[1]
    run_warm.lower(pb0, carry_shape).compile()
    print(f"# compile+warmup done t={time.perf_counter() - t_start:.1f}s",
          file=sys.stderr)

    def traj(warm: bool, carry0):
        """Steps 1..S-1 (steady state), per-step completion barrier (the
        relay dies on deep async execution queues; the ~23ms round trip
        per step is identical for warm and cold, so it only ADDS a
        constant to both -- the warm win is understated, not inflated)."""
        for attempt in range(6):
            try:
                carry = carry0
                its, sts = [], []
                t0 = time.perf_counter()
                for s in range(1, STEPS):
                    pb_s = shift(pbs, drifts[s])
                    if warm:
                        res, carry = run_warm(pb_s, carry)
                    else:
                        res = run_cold(pb_s)
                    its.append(np.asarray(res.iterations))  # per-step barrier
                    sts.append(np.asarray(res.status))
                dt = time.perf_counter() - t0
                return (np.stack(its), np.stack(sts),
                        dt / ((STEPS - 1) * BATCH) * 1e6)
            except jax.errors.JaxRuntimeError as e:
                print(f"# traj(warm={warm}) attempt {attempt} failed: "
                      f"{str(e)[:90]}", file=sys.stderr)
                if attempt == 5:
                    raise
                time.sleep(20.0 * (attempt + 1))
        raise RuntimeError("unreachable")

    # the cold-start carry program (carry=None) is executed exactly ONCE:
    # the relay rejects re-executions of it (while the steady-state carry
    # program and the cold program re-execute fine)
    _, carry0 = run_warm(shift(pbs, drifts[0]), None)
    jax.block_until_ready(carry0.H)
    its_w, sts_w, us_w = traj(True, carry0)
    its_c, sts_c, us_c = traj(False, carry0)
    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        mode=("bench-style (on-device generation, outer-jit entries, "
              "per-step barriers, steady-state steps 1..S-1)"),
        warm_mean_it=float(its_w.mean()),
        cold_mean_it=float(its_c.mean()),
        warm_us_per_solve=us_w,
        cold_us_per_solve=us_c,
        warm_speedup=us_c / us_w,
        warm_success=float((sts_w == 0).mean()),
        cold_success=float((sts_c == 0).mean()),
    )
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", "warm_start.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
