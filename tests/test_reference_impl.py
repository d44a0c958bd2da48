"""Differential tests: numpy executable spec vs the JAX solver
(two independent implementations of the GI iteration cross-check each
other, like the reference's structured-vs-dense tests)."""
import numpy as np
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve
from jrlqp_tpu.reference_impl import solve_np
from jrlqp_tpu.testing import ProblemCharacteristics, random_problem, check_kkt


def _qp(rpb):
    d = rpb.to_qp_arrays()
    return d, QPProblem(
        G=jnp.asarray(d["G"]), a=jnp.asarray(d["a"]), C=jnp.asarray(d["C"]),
        l=jnp.asarray(d["l"]), u=jnp.asarray(d["u"]),
        xl=jnp.asarray(d["xl"]), xu=jnp.asarray(d["xu"]),
    )


def test_np_solver_standalone():
    """The spec itself must pass KKT / ground-truth recovery."""
    rng = np.random.default_rng(0)
    for characs in [
        ProblemCharacteristics(5, 5),
        ProblemCharacteristics(5, 5).nEq(2),
        ProblemCharacteristics(5, 5).nIneq(8).nStrongActIneq(4),
        ProblemCharacteristics(5, 5, 2, 6)
        .nStrongActIneq(1)
        .set_bounds(True)
        .nStrongActBounds(2),
    ]:
        rpb = random_problem(characs, rng)
        d, pb = _qp(rpb)
        res = solve_np(d["G"], d["a"], d["C"], d["l"], d["u"], d["xl"], d["xu"])
        assert res.status == int(TerminationStatus.SUCCESS), characs
        np.testing.assert_allclose(res.x, rpb.x, rtol=1e-6, atol=1e-6)
        assert bool(
            check_kkt(jnp.asarray(res.x), jnp.asarray(res.multipliers), pb)
        ), characs


def test_np_vs_jax_differential():
    """Same problems through both implementations: identical x and
    multipliers to 1e-8 (strictly-convex QP has a unique optimum; the two
    solvers may visit different pivot orders but must land on the same
    point)."""
    rng = np.random.default_rng(7)
    for seed in range(6):
        characs = [
            ProblemCharacteristics(6, 6).nIneq(10).nStrongActIneq(3),
            ProblemCharacteristics(6, 6, 2, 8).nStrongActIneq(2),
            ProblemCharacteristics(4, 4).nIneq(6).nStrongActIneq(2).set_bounds(
                True
            ).nStrongActBounds(1),
        ][seed % 3]
        rpb = random_problem(characs, rng)
        d, pb = _qp(rpb)
        res_np = solve_np(d["G"], d["a"], d["C"], d["l"], d["u"], d["xl"], d["xu"])
        res_jx = solve(pb, SolverOptions())
        assert res_np.status == int(res_jx.status) == int(TerminationStatus.SUCCESS)
        np.testing.assert_allclose(res_np.x, np.asarray(res_jx.x), rtol=1e-8,
                                   atol=1e-8)
        np.testing.assert_allclose(
            res_np.multipliers, np.asarray(res_jx.multipliers), rtol=1e-7,
            atol=1e-8,
        )
        np.testing.assert_allclose(res_np.f, float(res_jx.f), rtol=1e-9, atol=1e-9)
