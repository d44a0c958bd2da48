"""Benchmark harness: timing fixtures mirroring the reference's
google-benchmark suite (ref: benchmarks/Solvers.cpp:613-639,
benchmarks/SolversWarmStart.cpp:218-276, benchmarks/Decomposition.cpp).

The reference measures us/solve for one solver call at a time; on TPU the
unit of work is a *batch*, so every fixture here reports us/solve =
wall_time / batch and solves/sec, plus mean GI iterations (the reference's
``it`` counter, SolversWarmStart.cpp:250).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..problems import QPProblem
from ..solver.dense import solve, solve_batch
from ..solver.mixed import solve_mixed
from ..solver.warm_start import solve_warm
from ..testing.batch_gen import random_qp_batch
from ..testing.kkt import kkt_residual
from ..types import SolverOptions

__all__ = [
    "BenchResult",
    "time_batch",
    "bench_size_sweep",
    "bench_active_sweep",
    "bench_warm_start_trajectory",
    "bench_decompositions",
    "bench_structured_ik",
    "bench_scaling",
]


@dataclasses.dataclass
class BenchResult:
    name: str
    batch: int
    wall_s: float
    us_per_solve: float
    solves_per_sec: float
    mean_iterations: float
    max_kkt_residual: float
    success_rate: float
    kkt_pass_rate: float  # fraction with SUCCESS *and* KKT <= 1e-8

    def row(self) -> dict:
        return dataclasses.asdict(self)


def _sync(out):
    """True completion barrier: through a remote-TPU relay,
    ``block_until_ready`` can return before execution finishes; a small
    host transfer does not."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    if leaves:
        # prefer a scalar leaf: always transferable, even when other
        # leaves are sharded over a mesh (slicing those would gather)
        scalars = [x for x in leaves if x.ndim == 0]
        if scalars:
            np.asarray(scalars[0])
        else:
            np.asarray(leaves[0].ravel()[:1])
    return out


def _retry_relay(fn, attempts: int = 5):
    """Retry after an executable reload: the relayed TPU backend
    intermittently invalidates loaded programs (InvalidArgument). With the
    persistent compile cache a reload costs seconds, so a few attempts are
    cheap."""
    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError:
            if k == attempts - 1:
                raise
            jax.clear_caches()
            # a degraded relay episode usually heals within seconds;
            # retrying immediately just burns the remaining attempts
            time.sleep(2.0 * (k + 1))


def _timeit(fn: Callable, n_rep: int = 3) -> float:
    _retry_relay(lambda: _sync(fn()))  # absorb a relay reload outside timing
    best = np.inf
    done = 0
    for _ in range(n_rep * 3):
        if done >= n_rep:
            break
        try:
            t0 = time.perf_counter()
            _sync(fn())
            best = min(best, time.perf_counter() - t0)
            done += 1
        except jax.errors.JaxRuntimeError:
            # relay invalidated the loaded program: reload + re-warm
            # OUTSIDE the clock, then keep timing; a failed re-warm ends
            # the attempt (propagating would lose the whole suite run)
            jax.clear_caches()
            try:
                _retry_relay(lambda: _sync(fn()))
            except jax.errors.JaxRuntimeError:
                break
    if not np.isfinite(best):
        raise RuntimeError("all timing repetitions failed (relay)")
    return best


def time_batch(
    name: str,
    pbs: QPProblem,
    opt: SolverOptions = SolverOptions(max_iter=500),
    solver: str = "f64",
    n_rep: int = 3,
) -> BenchResult:
    """Time one jitted batched solve (compile excluded)."""
    if solver == "mixed":
        run = jax.jit(jax.vmap(lambda p: solve_mixed(p, opt)))
    elif solver == "pallas":
        from ..solver.fast import solve_refined_pallas

        # direct call of the internally-jitted entry: an outer wrapper jit
        # produces an executable the relayed backend rejects with a bare
        # INVALID_ARGUMENT (same quirk as benchmarks/capture_warm.py), and
        # it would also bypass the pack self-heal
        run = lambda p: solve_refined_pallas(p, opt)  # noqa: E731
    elif solver == "pallas_rescued":
        from ..solver.fast import solve_refined_pallas_rescued

        # host-orchestrated two-phase (not jittable end-to-end)
        run = lambda p: solve_refined_pallas_rescued(p, opt)  # noqa: E731
    elif solver == "refined":
        from ..solver.fast import solve_refined

        run = jax.jit(jax.vmap(lambda p: solve_refined(p, opt)))
    else:
        run = jax.jit(lambda p: solve_batch(p, opt))
    res = _retry_relay(lambda: _sync(run(pbs)))  # compile + warmup
    wall = _timeit(lambda: run(pbs), n_rep)
    batch = pbs.G.shape[0]
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    ok = res.status == 0
    return BenchResult(
        name=name,
        batch=batch,
        wall_s=wall,
        us_per_solve=wall / batch * 1e6,
        solves_per_sec=batch / wall,
        mean_iterations=float(jnp.mean(res.iterations)),
        max_kkt_residual=float(jnp.max(jnp.where(ok, resid, 0.0))),
        success_rate=float(jnp.mean(ok.astype(jnp.float64))),
        kkt_pass_rate=float(jnp.mean(
            (ok & (resid <= 1e-8)).astype(jnp.float64))),
    )


def bench_size_sweep(
    sizes=(10, 25, 50, 75, 100),
    batch: int = 64,
    solver: str = "f64",
    seed: int = 0,
) -> list[BenchResult]:
    """Variables sweep at m = 2n (ref: Solvers.cpp size sweep 10-100 vars)."""
    out = []
    for n in sizes:
        pbs = random_qp_batch(jax.random.key(seed), batch, n, 2 * n, act_frac=0.3)
        out.append(time_batch(f"size/n={n}/m={2 * n}", pbs, solver=solver))
    return out


def bench_active_sweep(
    n: int = 50,
    m: int = 100,
    fracs=(0.0, 0.1, 0.3, 0.5, 0.8, 0.95),
    batch: int = 64,
    solver: str = "f64",
    seed: int = 0,
) -> list[BenchResult]:
    """Active-fraction sweep (ref: Solvers.cpp %active fixtures)."""
    out = []
    for fr in fracs:
        pbs = random_qp_batch(jax.random.key(seed), batch, n, m, act_frac=fr)
        out.append(time_batch(f"active/{int(fr * 100)}%", pbs, solver=solver))
    return out


def bench_warm_start_trajectory(
    n: int = 20,
    m: int = 40,
    steps: int = 100,
    batch: int = 32,
    shift_scale: float = 0.02,
    seed: int = 0,
    solver: str = "f64",
    time_window: int = 20,
) -> dict:
    """Control-loop trajectory benchmark
    (ref: benchmarks/SolversWarmStart.cpp:31-59,162-169): a batch of QPs
    whose bounds drift a little each step; the warm solver carries the
    previous step's state. Reports mean iterations/step and us/solve, warm
    vs cold (the reference's ``it`` counter). ``solver``: "f64" = J/R warm
    path (scan-based), "pallas" = whole-solve kernel with operator-reuse
    warm carry, driven step-by-step from the host exactly like a real
    control loop (also avoids re-executing scan-over-kernel executables,
    which the axon-relayed backend intermittently rejects). Timing for the
    pallas path is the wall clock of ``time_window`` consecutive steps
    after warmup -- identical structure for warm and cold, so the per-step
    dispatch overhead cancels in the ratio.
    """
    opt = SolverOptions(max_iter=100, warm_start=True)
    base = random_qp_batch(jax.random.key(seed), batch, n, m, act_frac=0.4)
    key = jax.random.key(seed + 1)
    # per-step bound drifts, precomputed: (steps, batch, m). Kept on the
    # HOST: eager device slicing per step adds a dispatch that the relayed
    # backend can reject once its session degrades.
    drifts = np.asarray(
        shift_scale * jax.random.normal(key, (steps, batch, m), base.l.dtype))

    def shifted(pb: QPProblem, d):
        return dataclasses.replace(pb, l=pb.l + d, u=pb.u + d)

    if solver == "pallas":
        from ..solver.fast import (
            solve_refined_pallas,
            solve_refined_pallas_carry,
        )

        shift_j = jax.jit(jax.vmap(shifted))

        def run_traj(warm: bool):
            carry = None
            its, sts, t_win = [], [], None
            t0 = None
            n_skipped = 0
            for s_i in range(steps):
                def step(carry=carry, s_i=s_i):
                    # whole step under one retry: a relay reload mid-step
                    # invalidates the result buffers too, so the step (and
                    # its syncs) must be redone together
                    pbs = shift_j(base, jnp.asarray(drifts[s_i]))
                    if warm:
                        res, carry2 = solve_refined_pallas_carry(
                            pbs, carry, opt)
                    else:
                        res, carry2 = solve_refined_pallas(pbs, opt), None
                    _sync(res.iterations)
                    return res, carry2

                try:
                    res, carry = _retry_relay(step, attempts=5)
                except jax.errors.JaxRuntimeError:
                    # terminal relay episode: skip the step, keep the
                    # trajectory going so the artifact still lands
                    n_skipped += 1
                    jax.clear_caches()
                    continue
                if s_i == 1:  # step 0 = compile+warmup; start clock at 1
                    t0 = time.perf_counter()
                its.append(np.asarray(res.iterations))
                sts.append(np.asarray(res.status))
                if t0 is not None and s_i == min(steps - 1, time_window):
                    t_win = (time.perf_counter() - t0) / (s_i - 1 + 1e-12)
            if n_skipped:
                print(f"# warm bench: {n_skipped} steps skipped (relay)")
            if n_skipped > steps // 4:
                raise RuntimeError(
                    f"warm bench unusable: {n_skipped}/{steps} steps lost "
                    "to a relay outage -- rerun in a healthy window")
            return (jnp.stack(its), jnp.stack(sts),
                    t_win * steps if t_win is not None else 0.0)

        its_w, sts_w, t_w = run_traj(True)
        its_c, sts_c, t_c = run_traj(False)
    else:
        @jax.jit
        def run_warm(base, drifts):
            def step(carry, d):
                hints = carry
                pbs = jax.vmap(shifted)(base, d)
                res = jax.vmap(lambda p, h: solve_warm(p, h, opt))(pbs, hints)
                return res.active_set, (res.iterations, res.status)

            init = jnp.zeros((batch, m + n), jnp.int32)
            _, (its, sts) = jax.lax.scan(step, init, drifts)
            return its, sts

        @jax.jit
        def run_cold(base, drifts):
            def step(_, d):
                pbs = jax.vmap(shifted)(base, d)
                res = jax.vmap(lambda p: solve(p, opt))(pbs)
                return 0, (res.iterations, res.status)

            _, (its, sts) = jax.lax.scan(step, 0, drifts)
            return its, sts

        its_w, sts_w = _sync(run_warm(base, drifts))
        its_c, sts_c = _sync(run_cold(base, drifts))
        t_w = _timeit(lambda: run_warm(base, drifts))
        t_c = _timeit(lambda: run_cold(base, drifts))

    n_solves = steps * batch
    return dict(
        name=f"warm_start_trajectory/{solver}/n={n}/m={m}/steps={steps}",
        batch=batch,
        steps=steps,
        warm_mean_it=float(jnp.mean(its_w[1:])),  # step 0 is effectively cold
        cold_mean_it=float(jnp.mean(its_c)),
        warm_us_per_solve=t_w / n_solves * 1e6,
        cold_us_per_solve=t_c / n_solves * 1e6,
        warm_success=float(jnp.mean((sts_w == 0).astype(jnp.float64))),
        cold_success=float(jnp.mean((sts_c == 0).astype(jnp.float64))),
    )


def bench_scaling(
    mesh_sizes=(1, 2, 4, 8),
    n: int = 50,
    m: int = 100,
    per_device_batch: int = 256,
    engine: str = "f64",
    seed: int = 0,
    platform: str | None = None,
) -> list[dict]:
    """Weak-scaling capture over a device mesh (BASELINE.md scaling row):
    solves/s at each mesh size with a fixed per-device batch. On the CI
    box the mesh is the virtual 8-device CPU mesh (``platform="cpu"``);
    on a real slice the same code measures chips (``platform="tpu"``).
    Efficiency is relative to mesh size 1 (perfect weak scaling = 1.0)."""
    import jax.sharding

    from ..parallel.mesh import solve_sharded

    all_devs = jax.devices(platform) if platform else jax.devices()
    rows = []
    base_rate = None
    for nd in mesh_sizes:
        if len(all_devs) < nd:
            continue
        mesh = jax.make_mesh((nd,), ("batch",), devices=all_devs[:nd])
        platform = mesh.devices.ravel()[0].platform
        batch = per_device_batch * nd
        pbs = random_qp_batch(jax.random.key(seed), batch, n, m,
                              act_frac=0.3)
        run = lambda: solve_sharded(pbs, SolverOptions(max_iter=150),  # noqa: E731
                                    mesh=mesh, engine=engine,
                                    fused_init=(engine == "pallas"
                                                and platform == "tpu"))
        res, stats = run()
        _sync(stats)
        wall = _timeit(lambda: run())
        rate = batch / wall
        if base_rate is None:
            base_rate = rate / nd  # per-device rate at the smallest mesh
        rows.append(dict(
            name=f"scaling/{engine}/mesh={nd}/{platform}",
            mesh_size=nd,
            platform=platform,
            batch=batch,
            solves_per_sec=rate,
            us_per_solve=wall / batch * 1e6,
            efficiency=rate / (base_rate * nd),
            success_rate=float(jnp.mean(
                (res.status == 0).astype(jnp.float64))),
        ))
    return rows


def bench_box_single(
    n: int = 16,
    batch: int = 1024,
    seed: int = 0,
    n_rep: int = 3,
) -> dict:
    """Box-and-single-constraint batch (BASELINE config 2 / ref
    benchmarks/BoxAndSingleConstraintSolver.cpp): 1k+ small
    min |x - x0|^2 s.t. c'x >= bl, box problems, vmapped."""
    from ..solver.box_single import solve_box

    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((batch, n)))
    c = jnp.asarray(rng.standard_normal((batch, n)))
    xl = jnp.asarray(-np.abs(rng.standard_normal((batch, n))) - 0.1)
    xu = jnp.asarray(np.abs(rng.standard_normal((batch, n))) + 0.1)
    mid = np.clip(np.asarray(x0), np.asarray(xl), np.asarray(xu))
    bl = jnp.asarray(np.sum(np.asarray(c) * mid, axis=1)
                     + rng.uniform(-0.5, 0.5, batch))
    opt = SolverOptions(max_iter=3 * n)
    run = jax.jit(jax.vmap(lambda *a: solve_box(*a, opt)))
    res = _sync(run(x0, c, bl, xl, xu))
    wall = _timeit(lambda: run(x0, c, bl, xl, xu), n_rep)
    ok = res.status == 0
    return dict(
        name=f"box_single/n={n}",
        batch=batch,
        wall_s=wall,
        us_per_solve=wall / batch * 1e6,
        solves_per_sec=batch / wall,
        mean_iterations=float(jnp.mean(res.iterations)),
        success_rate=float(jnp.mean(ok.astype(jnp.float64))),
    )


def bench_decompositions(
    nb: int = 9, s: int = 48, batch: int = 16, seed: int = 0,
    interpret: bool = False, include_f64: bool = True,
) -> list[dict]:
    """Structured vs dense Cholesky timings (ref: benchmarks/Decomposition.cpp
    and the IK timing harness in tests/BlockGISolverTest.in.cpp:251-268).

    Measures the XLA-composed blocked LLT chains, the fused Pallas kernels
    (factor + per-block inverses in one launch; fused forward+backward
    multi-rhs solve in another -- the loops the reference marks [OPTIM]
    parallelizable, src/decomposition/blockArrowLLT.cpp:118-120,217), and
    dense Cholesky in both f64 and f32 for reference. Rows carry
    ``speedup_vs_dense`` relative to the same-precision dense factor."""
    from ..ops.pallas.block_llt import (
        block_arrow_llt_pallas,
        tri_block_llt_pallas,
        tri_block_solve_pallas,
    )
    from ..structured.blocks import (
        block_arrow_llt,
        tri_block_diag_llt,
        tri_block_to_dense,
    )

    rng = np.random.default_rng(seed)
    diag = np.zeros((batch, nb, s, s))
    off = rng.standard_normal((batch, nb - 1, s, s))
    for b in range(batch):
        for i in range(nb):
            A = rng.standard_normal((s, s))
            diag[b, i] = A @ A.T + nb * s * np.eye(s)
    diag = jnp.asarray(diag)
    off = jnp.asarray(off)
    diag32 = diag.astype(jnp.float32)
    off32 = off.astype(jnp.float32)

    tri = jax.jit(jax.vmap(tri_block_diag_llt))
    arrow = jax.jit(jax.vmap(lambda d, o: block_arrow_llt(d, o)))
    if include_f64:
        dense_in = jax.vmap(tri_block_to_dense)(diag, off)
        dense_in32 = dense_in.astype(jnp.float32)
    else:  # skip the f64 dense assembly (memory: B n^2 doubles)
        dense_in32 = jax.vmap(tri_block_to_dense)(diag32, off32)
    dense = jax.jit(jax.vmap(jnp.linalg.cholesky))

    tri_p = lambda d, o: tri_block_llt_pallas(d, o, interpret=interpret)  # noqa: E731
    arrow_p = lambda d, o: block_arrow_llt_pallas(  # noqa: E731
        d, o, interpret=interpret)
    # fused factor + identity solve = everything a solver init needs
    n = nb * s
    eye_b = jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float32).reshape(1, nb, s, n),
        (batch, nb, s, n))

    def tri_p_full(d, o):
        Ld, Lo, Li = tri_block_llt_pallas(d, o, interpret=interpret)
        return tri_block_solve_pallas(Lo, Li, eye_b, interpret=interpret)

    def _try_time(fn):
        # one failing variant (e.g. the fused identity solve's VMEM
        # footprint at long horizons) must not lose the whole config
        try:
            jax.block_until_ready(fn())
            return _timeit(fn)
        except Exception as e:  # noqa: BLE001
            import sys
            print(f"# decomposition variant lost: {str(e)[:120]}",
                  file=sys.stderr)
            return None

    t_dense32 = _try_time(lambda: dense(dense_in32))
    t_tri_p = _try_time(lambda: tri_p(diag32, off32))
    t_arrow_p = _try_time(lambda: arrow_p(diag32, off32))
    t_tri_pf = _try_time(lambda: tri_p_full(diag32, off32))
    if include_f64:
        t_tri = _try_time(lambda: tri(diag, off))
        t_arrow = _try_time(lambda: arrow(diag, off))
        t_dense = _try_time(lambda: dense(dense_in))

    def row(name, t, t_ref=None):
        if t is None:
            return None
        r = dict(name=f"{name}/batch={batch}", ms=t / batch * 1e3)
        if t_ref is not None:
            r["speedup_vs_dense"] = t_ref / t
        return r

    rows = []
    if include_f64:
        rows += [
            row(f"llt/tri_block/nb={nb}/s={s}", t_tri, t_dense),
            row(f"llt/block_arrow/nb={nb}/s={s}", t_arrow, t_dense),
            row(f"llt/dense/n={n}", t_dense),
        ]
    rows += [
        row(f"llt/dense_f32/n={n}", t_dense32),
        row(f"llt/tri_block_pallas/nb={nb}/s={s}", t_tri_p, t_dense32),
        row(f"llt/block_arrow_pallas/nb={nb}/s={s}", t_arrow_p, t_dense32),
        row(f"llt+inv/tri_block_pallas_fused/nb={nb}/s={s}", t_tri_pf,
            t_dense32),
    ]
    return [r for r in rows if r is not None]


def bench_structured_ik(
    nb: int = 9, s: int = 43, mc: int = 4, batch: int = 16, seed: int = 0,
    interpret: bool = False,
) -> list[dict]:
    """Batched IK-shaped workload end-to-end through the structured fast
    path (ref workload: tests/BlockGISolverTest.in.cpp:172-271 'Sequential
    IK', 9 robots x 43 dof, inline timing at :251-268). Solves a batch of
    tri-block-diagonal QPs with block-diagonal constraints via
    solve_structured_fast (Pallas init vs XLA init) and the dense fast
    engine, reporting ms/solve and cross-engine agreement."""
    import dataclasses as _dc

    from ..structured.containers import GType, StructuredC, StructuredG
    from ..structured.solver import (
        solve_structured_fast,
        structured_qp_problem,
    )
    from ..solver.fast import solve_refined

    rng = np.random.default_rng(seed)
    n, m = nb * s, nb * mc
    diag = np.zeros((batch, nb, s, s))
    off = rng.standard_normal((batch, nb - 1, s, s))
    blocks = rng.standard_normal((batch, nb, mc, s))
    a = rng.standard_normal((batch, n))
    l_ = np.zeros((batch, m))
    u_ = np.zeros((batch, m))
    for b in range(batch):
        for i in range(nb):
            A = rng.standard_normal((s, s))
            diag[b, i] = A @ A.T + nb * s * np.eye(s)
        x0 = rng.uniform(-1, 1, n)
        Cd = np.zeros((m, n))
        for i in range(nb):
            Cd[i * mc:(i + 1) * mc, i * s:(i + 1) * s] = blocks[b, i]
        cx = Cd @ x0
        l_[b] = cx - rng.uniform(0.0, 0.5, m)
        u_[b] = cx + rng.uniform(0.0, 2.0, m)

    sgs = StructuredG(diag=jnp.asarray(diag), off=jnp.asarray(off),
                      gtype=int(GType.TRI_BLOCK_DIAGONAL))
    scs = StructuredC(blocks=jnp.asarray(blocks))
    a_b, l_b, u_b = jnp.asarray(a), jnp.asarray(l_), jnp.asarray(u_)
    opt = SolverOptions(max_iter=200)

    from ..structured.solver import solve_structured_fast_batch

    def batched(backend):
        # batch-native entry: ONE packed fused init kernel launch for the
        # whole batch, then the vmapped explicit-operator loop
        return jax.jit(lambda sg, av, sc, lv, uv: solve_structured_fast_batch(
            sg, av, sc, lv, uv, opt=opt, backend=backend,
            interpret=interpret))

    f_pallas = batched("pallas")
    f_xla = batched("xla")
    pbs = jax.vmap(
        lambda sg, av, sc, lv, uv: structured_qp_problem(sg, av, sc, lv, uv)
    )(sgs, a_b, scs, l_b, u_b)
    f_dense = jax.jit(jax.vmap(lambda p: solve_refined(p, opt)))

    rows = []
    ref_x = None
    for name, fn, args in [
        ("structured_fast_pallas", f_pallas, (sgs, a_b, scs, l_b, u_b)),
        ("structured_fast_xla", f_xla, (sgs, a_b, scs, l_b, u_b)),
        ("dense_fast", f_dense, (pbs,)),
    ]:
        res = _retry_relay(lambda: _sync(fn(*args)))
        t = _timeit(lambda: fn(*args))
        ok = float(jnp.mean((res.status == 0).astype(jnp.float64)))
        row = dict(name=f"ik/{name}/nb={nb}/s={s}/batch={batch}",
                   batch=batch,
                   ms_per_solve=t / batch * 1e3,
                   solves_per_sec=batch / t,
                   success_rate=ok)
        if ref_x is None:
            ref_x = res.x
        else:
            row["max_diff_vs_pallas"] = float(jnp.max(jnp.abs(res.x - ref_x)))
        rows.append(row)
    return rows
