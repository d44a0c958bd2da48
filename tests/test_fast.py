"""Explicit-form GI engine tests: differential vs the J/R solver, and the
mixed-precision iterative-refinement path."""
import numpy as np
import jax
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve
from jrlqp_tpu.solver.fast import solve_fast, solve_refined
from jrlqp_tpu.testing import (
    ProblemCharacteristics,
    check_kkt,
    kkt_residual,
    random_problem,
)
from jrlqp_tpu.testing.batch_gen import random_qp_batch


def _qp(rpb):
    d = rpb.to_qp_arrays()
    return QPProblem(
        G=jnp.asarray(d["G"]), a=jnp.asarray(d["a"]), C=jnp.asarray(d["C"]),
        l=jnp.asarray(d["l"]), u=jnp.asarray(d["u"]),
        xl=jnp.asarray(d["xl"]), xu=jnp.asarray(d["xu"]),
    )


def test_fast_matches_dense_f64():
    """In float64 the explicit-operator iteration and the J/R iteration are
    the same algorithm (H = J2 J2^T, N* = R^-1 J1^T); results must agree."""
    rng = np.random.default_rng(3)
    for trial in range(6):
        characs = [
            ProblemCharacteristics(6, 6).nIneq(10).nStrongActIneq(3),
            ProblemCharacteristics(6, 6, 2, 8).nStrongActIneq(2),
            ProblemCharacteristics(5, 5, 1, 6)
            .nStrongActIneq(2)
            .set_bounds(True)
            .nStrongActBounds(1),
        ][trial % 3]
        rpb = random_problem(characs, rng)
        pb = _qp(rpb)
        rd = solve(pb, SolverOptions())
        rf = solve_fast(pb, SolverOptions())
        assert int(rd.status) == int(rf.status) == int(TerminationStatus.SUCCESS)
        np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rd.x),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(rf.multipliers), np.asarray(rd.multipliers),
            rtol=1e-6, atol=1e-7,
        )
        assert bool(check_kkt(rf.x, rf.multipliers, pb))


def test_fast_infeasible_and_nonposdef():
    pb = QPProblem(
        G=jnp.eye(2), a=jnp.zeros(2),
        C=jnp.asarray([[1.0, 0.0], [1.0, 0.0]]),
        l=jnp.asarray([1.0, -np.inf]), u=jnp.asarray([np.inf, -1.0]),
        xl=jnp.full(2, -np.inf), xu=jnp.full(2, np.inf),
    )
    assert int(solve_fast(pb).status) == int(TerminationStatus.INFEASIBLE)
    pb2 = QPProblem(
        G=jnp.asarray([[1.0, 0.0], [0.0, -1.0]]), a=jnp.zeros(2),
        C=jnp.zeros((1, 2)), l=jnp.asarray([-np.inf]), u=jnp.asarray([np.inf]),
        xl=jnp.full(2, -np.inf), xu=jnp.full(2, np.inf),
    )
    assert int(solve_fast(pb2).status) == int(TerminationStatus.NON_POS_HESSIAN)


def test_refined_batch_full_accuracy():
    """f32 identification + IR must reach f64-level KKT residuals."""
    pbs = random_qp_batch(jax.random.key(5), batch=24, n=30, m=60, act_frac=0.3)
    res = jax.jit(jax.vmap(lambda p: solve_refined(p, SolverOptions(max_iter=150))))(
        pbs
    )
    ok = np.asarray(res.status) == int(TerminationStatus.SUCCESS)
    assert ok.mean() == 1.0
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    assert float(jnp.max(resid)) < 1e-10
    assert res.x.dtype == jnp.float64


def test_refined_with_equalities():
    rng = np.random.default_rng(11)
    rpb = random_problem(ProblemCharacteristics(6, 6).nEq(2), rng)
    pb = _qp(rpb)
    res = solve_refined(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.x), rpb.x, rtol=1e-6, atol=1e-6)
    assert float(kkt_residual(res.x, res.multipliers, pb)) < 1e-10


def test_fast_scale_invariant_dependence_threshold():
    """Scaling G and a by 1e6 leaves the minimizer unchanged; the
    dependence test must be scale-aware so the f32 engines still solve it
    (a fixed absolute threshold misclassifies every candidate as dependent
    when H = G^-1 is tiny; ref [NUMERIC] notes,
    src/GoldfarbIdnaniSolver.cpp:87,174,236)."""
    import dataclasses

    from jrlqp_tpu.solver.fast import solve_refined, solve_refined_pallas
    from jrlqp_tpu.testing.batch_gen import random_qp_batch
    from jrlqp_tpu.testing.kkt import kkt_residual

    pbs = random_qp_batch(jax.random.key(8), 6, 10, 16, act_frac=0.4)
    s = 1e6
    pbs_s = dataclasses.replace(pbs, G=pbs.G * s, a=pbs.a * s)
    base = jax.vmap(lambda p: solve_refined(p, SolverOptions(max_iter=100)))(
        pbs)
    res = jax.vmap(lambda p: solve_refined(p, SolverOptions(max_iter=100)))(
        pbs_s)
    assert np.asarray(res.status == 0).all(), np.asarray(res.status)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(base.x),
                               atol=1e-6)
    resk = solve_refined_pallas(pbs_s, SolverOptions(max_iter=100),
                                interpret=True)
    assert np.asarray(resk.status == 0).all(), np.asarray(resk.status)
    np.testing.assert_allclose(np.asarray(resk.x), np.asarray(base.x),
                               atol=1e-6)
    # and the tiny-G direction
    pbs_t = dataclasses.replace(pbs, G=pbs.G / s, a=pbs.a / s)
    rest = jax.vmap(lambda p: solve_refined(p, SolverOptions(max_iter=100)))(
        pbs_t)
    assert np.asarray(rest.status == 0).all()
    np.testing.assert_allclose(np.asarray(rest.x), np.asarray(base.x),
                               atol=1e-5)
