"""External differential: cross-check against a third-party optimizer.

The reference benchmarks against independent QP solvers (LSSOL,
eiquadprog, QLD) via adaptors (ref: benchmarks/problemAdaptors.h:10-65).
No QP package is available in this image, so the independent oracle is
scipy's trust-region constrained optimizer (`scipy.optimize.minimize`,
method="trust-constr") solving the same strictly-convex QPs -- a
completely separate codebase and algorithm family. Agreement is checked
at trust-constr's own accuracy: trust-constr delivers ~1e-4 on x and ~1e-6 relative on the
objective, so x is compared loosely and the objective two-sided: ours must
be no worse than scipy's (we claim exact optimality) and no better than
scipy's by more than its own tolerance (else we'd be "optimal" at an
infeasible point).
"""
import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

import jax  # noqa: E402

from jrlqp_tpu import QPProblem, SolverOptions  # noqa: E402
from jrlqp_tpu.solver.dense import solve  # noqa: E402
from jrlqp_tpu.solver.fast import solve_refined  # noqa: E402
from jrlqp_tpu.testing.batch_gen import random_qp_batch  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _scipy_solve(pb: QPProblem):
    G = np.asarray(pb.G)
    a = np.asarray(pb.a)
    C = np.asarray(pb.C)
    l = np.asarray(pb.l)
    u = np.asarray(pb.u)
    xl = np.asarray(pb.xl)
    xu = np.asarray(pb.xu)
    n = G.shape[0]

    fun = lambda x: 0.5 * x @ G @ x + a @ x  # noqa: E731
    jac = lambda x: G @ x + a  # noqa: E731
    hess = lambda x: G  # noqa: E731
    cons = [scipy_opt.LinearConstraint(C, l, u)]
    bounds = scipy_opt.Bounds(xl, xu)
    res = scipy_opt.minimize(
        fun, np.zeros(n), jac=jac, hess=hess, method="trust-constr",
        constraints=cons, bounds=bounds,
        options=dict(gtol=1e-10, xtol=1e-12, maxiter=2000))
    return res.x, res.fun


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_solver_matches_scipy(seed):
    pbs = random_qp_batch(jax.random.key(seed), 4, 8, 12, act_frac=0.4)
    for i in range(4):
        pb = jax.tree.map(lambda x: x[i], pbs)
        ours = solve(pb, SolverOptions(max_iter=200))
        assert int(ours.status) == 0
        x_sp, f_sp = _scipy_solve(pb)
        _check_against_scipy(ours, x_sp, f_sp)


def _check_against_scipy(ours, x_sp, f_sp, x_tol=2e-3):
    f_ours = float(ours.f)
    scale = max(1.0, abs(f_sp))
    # optimality: never worse than the external solver (beyond its noise)
    assert f_ours <= f_sp + 1e-6 * scale, (f_ours, f_sp)
    # agreement: not "better" by more than trust-constr's own accuracy
    # (that would mean we are optimal for a different/infeasible problem);
    # trust-constr sometimes stalls ~1e-5 above the optimum, hence 1e-4
    assert f_sp - f_ours <= 1e-4 * scale, (f_ours, f_sp)
    np.testing.assert_allclose(np.asarray(ours.x), x_sp, rtol=x_tol,
                               atol=x_tol)


def test_fast_engine_matches_scipy_with_bounds():
    pbs = random_qp_batch(jax.random.key(7), 3, 10, 14, act_frac=0.5,
                          bounds=True)
    for i in range(3):
        pb = jax.tree.map(lambda x: x[i], pbs)
        ours = solve_refined(pb, SolverOptions(max_iter=200))
        assert int(ours.status) == 0
        x_sp, f_sp = _scipy_solve(pb)
        _check_against_scipy(ours, x_sp, f_sp)


def test_equality_constrained_matches_scipy():
    rng = np.random.default_rng(5)
    n, m = 6, 3
    A = rng.standard_normal((n, n))
    G = A @ A.T + n * np.eye(n)
    C = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    pb = QPProblem(
        G=jnp.asarray(G), a=jnp.asarray(rng.standard_normal(n)),
        C=jnp.asarray(C), l=jnp.asarray(b), u=jnp.asarray(b),
        xl=jnp.full(n, -np.inf), xu=jnp.full(n, np.inf))
    ours = solve(pb, SolverOptions(max_iter=100))
    assert int(ours.status) == 0
    x_sp, f_sp = _scipy_solve(pb)
    _check_against_scipy(ours, x_sp, f_sp)
