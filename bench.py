"""Headline benchmark: batched GI QP throughput (n=50, m=100).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North star (BASELINE.md): >= 1e5 strictly-convex dense QP solves/sec
(n=50, m=100) on a v5p-16 (8 chips) at per-problem KKT residual <= 1e-8,
i.e. 12,500 solves/sec/chip. This script measures solves/sec on however many
chips are visible (normally 1) and reports vs_baseline against the per-chip
target.

Solver selection (BENCH_SOLVER): "pallas" (default) = the whole-solve
Pallas kernel (f32 explicit-form GI loop, 24 problems packed per grid
program, lane-major K = [H | N*^T] operator with hole-based active-set
slots, all state in VMEM) + batched mixed-precision iterative refinement with
float64 residuals -- the TPU-native design (f64 is software-emulated on
TPU, so the hot loop is f32 on the MXU and f64 appears only in one stacked
residual gemv); "refined" = the same math as XLA-composed ops; "mixed" =
f32 J/R loop + f64 warm-start refactorization; "f64" = full float64 J/R
loop (reference-faithful); "f32" = f32 J/R loop only.

Timing note: every timed repetition ends with a host transfer of a small
output array -- through the remote-TPU relay used in some environments,
``block_until_ready`` alone does not reliably wait for execution.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.solver.dense import _solve_impl
from jrlqp_tpu.solver.fast import solve_refined, solve_refined_pallas
from jrlqp_tpu.solver.mixed import solve_mixed
from jrlqp_tpu.testing.batch_gen import random_qp_batch
from jrlqp_tpu.testing.kkt import kkt_residual

PER_CHIP_TARGET = 1e5 / 8  # v5p-16 north star, per chip

N, M = 50, 100
BATCH = int(os.environ.get("BENCH_BATCH", "16384"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
SOLVER = os.environ.get("BENCH_SOLVER", "pallas")
IR_STEPS = int(os.environ.get("BENCH_IR_STEPS", "1"))
PACK = os.environ.get("BENCH_PACK")  # None = auto (self-healing)
PACK = int(PACK) if PACK else None


def main():
    n_dev = len(jax.devices())
    # BENCH_MAX_ITER: diagnostic knob -- running at a reduced cap measures
    # the kernel's per-iteration cost slope (lanes hitting the cap fail the
    # KKT gate, which the metric string reports)
    opt = SolverOptions(max_iter=int(os.environ.get("BENCH_MAX_ITER", "150")))

    if SOLVER == "pallas":
        fused = os.environ.get("BENCH_FUSED_INIT", "1") == "1"
        run = jax.jit(lambda p: solve_refined_pallas(p, opt, ir_steps=IR_STEPS,
                                                     pack=PACK,
                                                     fused_init=fused))
    elif SOLVER == "pallas_compacted":
        from jrlqp_tpu.solver.fast import solve_refined_pallas_compacted

        ph1 = float(os.environ.get("BENCH_PHASE1_FRAC", "0.45"))
        # host-orchestrated two-phase; phases are jitted internally
        run = lambda p: solve_refined_pallas_compacted(  # noqa: E731
            p, opt, ir_steps=IR_STEPS, phase1_frac=ph1, pack=PACK)
    elif SOLVER == "refined":
        run = jax.jit(jax.vmap(lambda p: solve_refined(p, opt)))
    elif SOLVER == "mixed":
        run = jax.jit(jax.vmap(lambda p: solve_mixed(p, opt)))
    elif SOLVER == "f32":
        # pure f32 loop (active-set identification only; KKT gate will
        # reflect f32 accuracy -- used to locate the time budget)
        opt32 = opt.with_(dtype=jnp.float32, zero_z_threshold=1e-6)
        run = jax.jit(
            jax.vmap(lambda p: _solve_impl(p.with_dtype(jnp.float32), opt32))
        )
    else:
        run = jax.jit(jax.vmap(lambda p: _solve_impl(p, opt)))

    t_start = time.perf_counter()
    key = jax.random.key(0)
    pbs = random_qp_batch(key, BATCH, N, M, act_frac=0.3,
                          dtype=jnp.float32).with_dtype(jnp.float64)
    np.asarray(pbs.G)  # force generation
    print(f"# gen done t={time.perf_counter() - t_start:.1f}s", file=sys.stderr)

    res = run(pbs)
    np.asarray(res.iterations)  # compile + warm up, true device sync
    print(f"# compile+warmup done t={time.perf_counter() - t_start:.1f}s",
          file=sys.stderr)

    # correctness gate: per-problem KKT residual
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    ok = float(jnp.mean((resid <= 1e-8) & (res.status == 0)))
    mean_it = float(jnp.mean(res.iterations))
    max_it = int(jnp.max(res.iterations))

    times = []
    for r in range(REPS):
        pbs_r = random_qp_batch(jax.random.key(r + 1), BATCH, N, M,
                                act_frac=0.3,
                                dtype=jnp.float32).with_dtype(jnp.float64)
        np.asarray(pbs_r.G)  # materialize inputs before the clock starts
        t0 = time.perf_counter()
        out = run(pbs_r)
        np.asarray(out.iterations)  # host transfer = true completion barrier
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": f"GI QP solves/sec ({SOLVER}; n={N}, m={M}, "
                f"batch={BATCH}, {n_dev} device(s), KKT<=1e-8 pass rate "
                f"{ok:.3f}, mean_it {mean_it:.1f}, max_it {max_it})",
                "value": round(solves_per_sec, 2),
                "unit": "solves/sec",
                "vs_baseline": round(solves_per_sec / PER_CHIP_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
