"""Minimal warm-start trajectory capture at a compute-bound batch.

The full harness trajectory (100 steps x many dispatches) trips the
relayed backend's session degradation faster than its retry budget; this
script captures the same fixture (drifting-bounds control loop,
ref: benchmarks/SolversWarmStart.cpp:31-59,162-169) with the minimum
number of dispatches: STEPS host-driven steps at batch 1024, warm
(WarmCarry, zero refactorization) vs cold, timing the post-warmup window.
Writes benchmarks/out/warm_start.json.
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.solver.fast import (
    solve_refined_pallas,
    solve_refined_pallas_carry,
)
from jrlqp_tpu.testing.batch_gen import random_qp_batch

N = int(os.environ.get("WARM_N", "20"))
M = int(os.environ.get("WARM_M", "40"))
BATCH = int(os.environ.get("WARM_BATCH", "1024"))
STEPS = int(os.environ.get("WARM_STEPS", "12"))
# "diff" (default) = marginal-step differencing (see run_diff) -- the
# only methodology the relayed backend's once-only execution of
# carry-bearing executables permits;
# "eager" = device-resident inputs, direct calls of the
# library's own jitted entry points, async step dispatch;
# "resident" = device-resident inputs, one SMALL jitted step
# program executed per trajectory step with async dispatch (no per-step
# device_put -- the observed relay failure point -- and no per-step
# barrier: executions queue on device, one final transfer);
# "scan" = whole trajectory as ONE jitted dispatch with statically
# unrolled steps (the relay rejects both scan ops and very large
# executables, kept for locally-attached TPUs);
# "step" = legacy host-driven control loop
MODE = os.environ.get("WARM_MODE", "diff")
# pack pinned to a hardware-proven size (the auto ladder caps at 24 now,
# but a known-good fixed pack keeps every capture run comparable; the
# backend surfaces oversize packs as bare INVALID_ARGUMENT, which the
# library self-heal also catches)
PACK = int(os.environ.get("WARM_PACK", "16"))


def _write_artifact(out):
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", os.environ.get("WARM_OUT",
                                              "warm_start.json"))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    # stage the evidence in the same run that produced it (round-4 verdict:
    # three rounds of uncommitted artifacts is a process bug)
    import subprocess
    subprocess.run(["git", "add", path], cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), check=False)



def run_diff(base, drifts, opt):
    """Marginal-step differencing capture -- the relay-proof methodology.

    The relayed backend executes a carry-bearing executable exactly ONCE
    (the second execution of the same loaded program fails with a bare
    INVALID_ARGUMENT, even with identical input buffers -- measured this
    round; round 4 hit the same wall). So: build ONE jitted program
    containing the cold solve plus k statically-unrolled trajectory steps,
    for k in {1, K}; execute each program once; the difference
    (t_K - t_1) / (K - 1) is the steady-state per-step cost with the relay
    round trip, program load, cold solve, and warmup all cancelling in the
    subtraction. Same arithmetic for the warm (carry) and cold
    (re-initialize) trajectories => directly comparable us/solve.
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("k", "warm", "mi"))
    def chain(b, dr, k, warm, mi):
        o = opt.with_(max_iter=mi)
        pb0 = dataclasses.replace(b, l=b.l + dr[0], u=b.u + dr[0])
        res0, carry = solve_refined_pallas_carry(pb0, None, o, pack=PACK)
        its, sts = [], []
        for s in range(1, k + 1):
            pbs = dataclasses.replace(b, l=b.l + dr[s], u=b.u + dr[s])
            if warm:
                res, carry = solve_refined_pallas_carry(pbs, carry, o,
                                                        pack=PACK)
            else:
                res = solve_refined_pallas(pbs, o, pack=PACK)
            its.append(res.iterations)
            sts.append(res.status)
        return res0.iterations, jnp.stack(its), jnp.stack(sts)

    k_lo, k_hi = 1, STEPS - 1
    base_d = jax.tree.map(jnp.asarray, base)
    dr = jnp.asarray(drifts)

    def once(k, warm, mi):
        for attempt in range(6):
            try:
                # the call traces+compiles synchronously (persistent cache
                # keeps that fast on retries) then ENQUEUES asynchronously;
                # the clock starts after dispatch returns, so dt = device
                # execution + one transfer RT -- the RT cancels in the
                # k_hi - k_lo subtraction
                it0, its, sts = chain(base_d, dr, k=k, warm=warm, mi=mi)
                t0 = time.perf_counter()
                its_h = np.asarray(its)          # barrier
                dt = time.perf_counter() - t0
                return its_h, np.asarray(sts), dt
            except jax.errors.JaxRuntimeError as e:
                print(f"# chain(k={k},warm={warm}) attempt {attempt}: "
                      f"{str(e)[:300]}", file=sys.stderr)
                if attempt == 5:
                    raise
                jax.clear_caches()
                time.sleep(3.0 * (attempt + 1))

    # session warmup: the process's first few executions carry ~1s of
    # one-time backend cost (measured); burn it on throwaway identities
    once(k_lo, False, opt.max_iter + 7)
    once(k_lo, True, opt.max_iter + 7)

    # min over two program identities per point (max_iter bump = distinct
    # executable; semantically inert, both converge far below the cap)
    rows = {}
    for warm in (True, False):
        t1 = np.inf
        tK = np.inf
        for mi in (opt.max_iter, opt.max_iter + 1):
            its1, sts1, t1m = once(k_lo, warm, mi)
            itsK, stsK, tKm = once(k_hi, warm, mi)
            t1 = min(t1, t1m)
            tK = min(tK, tKm)
        us = (tK - t1) / ((k_hi - k_lo) * BATCH) * 1e6
        rows[warm] = dict(us=us, its=itsK, sts=stsK, t1=t1, tK=tK)
        print(f"# warm={warm}: t(k={k_lo})={t1:.3f}s t(k={k_hi})={tK:.3f}s "
              f"-> {us:.2f} us/solve", file=sys.stderr)

    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        mode=(f"marginal-step differencing: one program = cold + k unrolled "
              f"steps, k in {{{k_lo}, {k_hi}}}, each executed once (the "
              f"relay allows exactly one execution per carry-bearing "
              f"executable); us/solve = (t_{k_hi} - t_{k_lo}) / "
              f"({k_hi - k_lo} * batch) -- relay RT, load, cold solve and "
              f"compile cancel in the subtraction"),
        warm_mean_it=float(rows[True]["its"].mean()),
        cold_mean_it=float(rows[False]["its"].mean()),
        warm_us_per_solve=rows[True]["us"],
        cold_us_per_solve=rows[False]["us"],
        warm_speedup=rows[False]["us"] / rows[True]["us"],
        warm_success=float((rows[True]["sts"] == 0).mean()),
        cold_success=float((rows[False]["sts"] == 0).mean()),
        raw=dict(
            warm_t1_s=rows[True]["t1"], warm_tK_s=rows[True]["tK"],
            cold_t1_s=rows[False]["t1"], cold_tK_s=rows[False]["tK"]),
    )
    _write_artifact(out)


def run_eager(base, drifts, opt):
    """Device-resident inputs + DIRECT calls of the library's own jitted
    entry points (no wrapper jit -- the relay rejects the wrapper-composed
    executables for reasons it does not report); eager device-side drift
    adds; async dispatch with one final barrier."""
    def traj(warm):
        for attempt in range(6):
            try:
                # generate ON DEVICE (the bench.py pattern): the relayed
                # backend rejects this workload's host->device puts with a
                # detail-free INVALID_ARGUMENT, while on-device generation
                # works in every healthy window
                base_d = random_qp_batch(
                    jax.random.key(0), BATCH, N, M, act_frac=0.4,
                    dtype=jnp.float32).with_dtype(base.l.dtype)
                drifts_d = 0.02 * jax.random.normal(
                    jax.random.key(1), (STEPS, BATCH, M), base.l.dtype)
                pb0 = dataclasses.replace(
                    base_d, l=base_d.l + drifts_d[0],
                    u=base_d.u + drifts_d[0])
                res0, carry = solve_refined_pallas_carry(
                    pb0, None, opt, pack=PACK)
                np.asarray(res0.iterations)      # warmup barrier
                outs = []
                t0 = time.perf_counter()
                for s in range(1, STEPS):        # async: no per-step sync
                    d = drifts_d[s]
                    pbs = dataclasses.replace(
                        base_d, l=base_d.l + d, u=base_d.u + d)
                    if warm:
                        res, carry = solve_refined_pallas_carry(
                            pbs, carry, opt, pack=PACK)
                    else:
                        res = solve_refined_pallas(pbs, opt, pack=PACK)
                    outs.append(res)
                np.asarray(outs[-1].iterations)  # single final barrier
                dt = time.perf_counter() - t0
                its = np.stack([np.asarray(r.iterations) for r in outs])
                sts = np.stack([np.asarray(r.status) for r in outs])
                return its, sts, dt / ((STEPS - 1) * BATCH) * 1e6
            except jax.errors.JaxRuntimeError as e:
                print(f"# traj(warm={warm}) attempt {attempt} failed: "
                      f"{str(e)[:1500]}", file=sys.stderr)
                if attempt == 5:
                    raise
                jax.clear_caches()
                time.sleep(3.0 * (attempt + 1))

    its_w, sts_w, us_w = traj(True)
    its_c, sts_c, us_c = traj(False)
    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        mode=("eager (device-resident inputs, direct jitted entry points, "
              "async step dispatch, steady-state steps 1..S-1)"),
        warm_mean_it=float(its_w.mean()),
        cold_mean_it=float(its_c.mean()),
        warm_us_per_solve=us_w,
        cold_us_per_solve=us_c,
        warm_success=float((sts_w == 0).mean()),
        cold_success=float((sts_c == 0).mean()),
    )
    _write_artifact(out)


def run_resident(base, drifts, opt):
    """Device-resident stepwise capture (see MODE comment). The warm and
    cold trajectories are timed over steps 1..S-1 with async dispatch --
    the host issues every step back-to-back and syncs ONCE at the end, so
    the relay round trip is paid once per trajectory, not per step."""
    import functools

    @functools.partial(jax.jit, static_argnames=("warm",))
    def step_fn(b, drifts_d, k, carry, warm):
        d = jax.lax.dynamic_index_in_dim(drifts_d, k, 0, keepdims=False)
        pbs = dataclasses.replace(b, l=b.l + d, u=b.u + d)
        if warm:
            return solve_refined_pallas_carry(pbs, carry, opt, pack=PACK)
        return solve_refined_pallas(pbs, opt, pack=PACK), carry

    @jax.jit
    def step0(b, drifts_d):
        d = drifts_d[0]
        pbs = dataclasses.replace(b, l=b.l + d, u=b.u + d)
        return solve_refined_pallas_carry(pbs, None, opt, pack=PACK)

    def traj(warm):
        for attempt in range(6):
            try:
                base_d = jax.tree.map(jnp.asarray, base)
                drifts_d = jnp.asarray(drifts)
                res0, carry0 = step0(base_d, drifts_d)
                # warmup execution of the step program (own compile)
                r_w, c_w = step_fn(base_d, drifts_d, jnp.int32(1), carry0,
                                   warm)
                np.asarray(r_w.iterations)       # barrier: compiles done
                outs = []
                carry = carry0
                t0 = time.perf_counter()
                for k in range(1, STEPS):        # async: no per-step sync
                    res, carry = step_fn(base_d, drifts_d, jnp.int32(k),
                                         carry, warm)
                    outs.append(res)
                np.asarray(outs[-1].iterations)  # single final barrier
                dt = time.perf_counter() - t0
                its = np.stack([np.asarray(r.iterations) for r in outs])
                sts = np.stack([np.asarray(r.status) for r in outs])
                return its, sts, dt / ((STEPS - 1) * BATCH) * 1e6
            except jax.errors.JaxRuntimeError as e:
                print(f"# traj(warm={warm}) attempt {attempt} failed: "
                      f"{str(e)[:1500]}", file=sys.stderr)
                if attempt == 5:
                    raise
                jax.clear_caches()
                time.sleep(3.0 * (attempt + 1))

    its_w, sts_w, us_w = traj(True)
    its_c, sts_c, us_c = traj(False)
    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        mode=("resident (device-resident inputs, async step dispatch, "
              "steady-state steps 1..S-1)"),
        warm_mean_it=float(its_w.mean()),
        cold_mean_it=float(its_c.mean()),
        warm_us_per_solve=us_w,
        cold_us_per_solve=us_c,
        warm_success=float((sts_w == 0).mean()),
        cold_success=float((sts_c == 0).mean()),
    )
    _write_artifact(out)


def run_scan(base, drifts, opt):
    """Whole-trajectory capture: step 0 (cold) outside, steps 1..S-1 as ONE
    statically-unrolled jitted dispatch per trajectory -- the metric is
    then purely the steady-state warm (or cold) step cost, and the relay
    sees ~4 dispatches total instead of dozens of per-step device_puts."""
    import functools

    @functools.partial(jax.jit, static_argnames=("warm",))
    def trajectory(base, drifts, warm):
        d0 = drifts[0]
        pb0 = dataclasses.replace(base, l=base.l + d0, u=base.u + d0)
        res0, carry = solve_refined_pallas_carry(pb0, None, opt)
        its, sts = [], []
        # static unroll (STEPS is a host constant): no scan op in the
        # program, one kernel per step, all in ONE dispatched executable
        for s in range(1, STEPS):
            pbs = dataclasses.replace(base, l=base.l + drifts[s],
                                      u=base.u + drifts[s])
            if warm:
                res, carry = solve_refined_pallas_carry(pbs, carry, opt)
            else:
                res = solve_refined_pallas(pbs, opt)
            its.append(res.iterations)
            sts.append(res.status)
        return res0, jnp.stack(its), jnp.stack(sts)

    def timed(warm):
        base_d = jax.tree.map(jnp.asarray, base)
        drifts_d = jnp.asarray(drifts)
        for attempt in range(6):
            try:
                r0, its, sts = trajectory(base_d, drifts_d, warm)
                np.asarray(its)              # warmup + barrier
                t0 = time.perf_counter()
                r0, its, sts = trajectory(base_d, drifts_d, warm)
                its_h = np.asarray(its)      # barrier
                dt = time.perf_counter() - t0
                return its_h, np.asarray(sts), dt / ((STEPS - 1) * BATCH) * 1e6
            except jax.errors.JaxRuntimeError:
                if attempt == 5:
                    raise
                jax.clear_caches()
                time.sleep(3.0 * (attempt + 1))
        raise RuntimeError("unreachable")

    its_w, sts_w, us_w = timed(True)
    its_c, sts_c, us_c = timed(False)
    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        mode="scan (steady-state steps 1..S-1, one dispatch/trajectory)",
        warm_mean_it=float(its_w.mean()),
        cold_mean_it=float(its_c.mean()),
        warm_us_per_solve=us_w,
        cold_us_per_solve=us_c,
        warm_success=float((sts_w == 0).mean()),
        cold_success=float((sts_c == 0).mean()),
    )
    _write_artifact(out)


def main():
    opt = SolverOptions(max_iter=100, warm_start=True)
    # generate on the CPU backend: setup must not depend on relay health
    with jax.default_device(jax.devices("cpu")[0]):
        base = random_qp_batch(jax.random.key(0), BATCH, N, M, act_frac=0.4)
        base = jax.tree.map(np.asarray, base)
        drifts = np.asarray(0.02 * jax.random.normal(
            jax.random.key(1), (STEPS, BATCH, M), base.l.dtype))
    # keep host copies: each relay retry then re-transfers fresh buffers

    assert STEPS >= 3, "need >=1 warmup step and >=2 timed steps"
    min_timed = min(3, STEPS - 2)

    if MODE == "diff":
        run_diff(base, drifts, opt)
        return
    if MODE == "eager":
        run_eager(base, drifts, opt)
        return
    if MODE == "resident":
        run_resident(base, drifts, opt)
        return
    if MODE == "scan":
        run_scan(base, drifts, opt)
        return

    def traj(warm: bool):
        carry = None
        its, sts = [], []
        t0 = None
        t0_step = None
        s = 0
        fails = 0
        # extra steps re-run after late relay failures so the timed window
        # never shrinks below min_timed (a t0 reset on the final step would
        # otherwise publish a near-zero us/solve)
        extra = 0
        while s < STEPS + extra:
            try:
                d = jnp.asarray(drifts[s % STEPS])
                pbs = dataclasses.replace(base, l=base.l + d, u=base.u + d)
                if warm:
                    res, carry2 = solve_refined_pallas_carry(pbs, carry, opt)
                else:
                    res, carry2 = solve_refined_pallas(pbs, opt), None
                it = np.asarray(res.iterations)  # host transfer = barrier
                sts_s = np.asarray(res.status)
            except jax.errors.JaxRuntimeError:
                # relay invalidated the loaded program; heal and redo the
                # step (timing restarts -- a healed episode is steady)
                fails += 1
                if fails > 8:
                    raise
                jax.clear_caches()
                time.sleep(3.0 * fails)
                # timing restarts; extend the run so the post-restart
                # window still holds >= min_timed steps
                extra = max(extra, s + 1 + min_timed - STEPS)
                t0 = None
                t0_step = None
                continue
            fails = 0  # budget is per-episode, not cumulative
            carry = carry2
            if t0 is None and s >= 1:
                t0 = time.perf_counter()  # step 0 = compile+warmup
                t0_step = s
            if s < STEPS:
                its.append(it)
                sts.append(sts_s)
            s += 1
        # t0 is captured after step t0_step's barrier, so the window spans
        # steps t0_step+1 .. s-1
        dt = time.perf_counter() - t0
        n_timed = s - 1 - t0_step
        assert n_timed >= min_timed, (
            f"timed window too small ({n_timed} < {min_timed})")
        return (np.stack(its), np.stack(sts),
                dt / (n_timed * BATCH) * 1e6)

    its_w, sts_w, us_w = traj(True)
    its_c, sts_c, us_c = traj(False)
    out = dict(
        name=f"warm_start_trajectory/pallas/n={N}/m={M}/steps={STEPS}",
        batch=BATCH,
        steps=STEPS,
        warm_mean_it=float(its_w[1:].mean()),
        cold_mean_it=float(its_c.mean()),
        warm_us_per_solve=us_w,
        cold_us_per_solve=us_c,
        warm_success=float((sts_w == 0).mean()),
        cold_success=float((sts_c == 0).mean()),
    )
    _write_artifact(out)


if __name__ == "__main__":
    main()
