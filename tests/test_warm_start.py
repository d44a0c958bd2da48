"""Warm-start tests (ref: GoldfarbIdnaniSolverTest.cpp:127-219)."""
import numpy as np
import jax
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve
from jrlqp_tpu.solver.warm_start import solve_warm
from jrlqp_tpu.testing import ProblemCharacteristics, random_problem, check_kkt

jit_solve = jax.jit(solve, static_argnames=("opt",))
jit_warm = jax.jit(solve_warm, static_argnames=("opt",))


def _qp(rpb):
    d = rpb.to_qp_arrays()
    return QPProblem(
        G=jnp.asarray(d["G"]), a=jnp.asarray(d["a"]), C=jnp.asarray(d["C"]),
        l=jnp.asarray(d["l"]), u=jnp.asarray(d["u"]),
        xl=jnp.asarray(d["xl"]), xu=jnp.asarray(d["xu"]),
    )


def _characteristic_sets():
    return [
        ProblemCharacteristics(5, 5),
        ProblemCharacteristics(5, 5).nEq(2),
        ProblemCharacteristics(5, 5).nIneq(8).nStrongActIneq(4),
        ProblemCharacteristics(5, 5, 2, 6).nStrongActIneq(3),
        ProblemCharacteristics(5, 5, 2, 6)
        .nStrongActIneq(1)
        .set_bounds(True)
        .nStrongActBounds(2),
    ]


def test_warm_start_exact_active_set():
    """Warm-starting with the cold solve's exact active set must converge in
    0 iterations and reproduce the solution (ref :127-181). A small failure
    rate is tolerated, as in the reference (< 0.1% there; we run fewer
    problems and allow a couple)."""
    n_problems = 40  # x5 characteristic sets = 200 solves
    n_failed = 0
    n_total = 0
    rng = np.random.default_rng(123)
    for _ in range(n_problems):
        for characs in _characteristic_sets():
            rpb = random_problem(characs, rng)
            pb = _qp(rpb)
            cold = jit_solve(pb, SolverOptions())
            assert int(cold.status) == int(TerminationStatus.SUCCESS)
            warm = jit_warm(pb, cold.active_set, SolverOptions(warm_start=True))
            n_total += 1
            assert int(warm.status) == int(TerminationStatus.SUCCESS)
            assert bool(check_kkt(warm.x, warm.multipliers, pb))
            ok = (
                np.allclose(np.asarray(warm.x), rpb.x, rtol=1e-6, atol=1e-6)
                and int(warm.iterations) == 0
            )
            if not ok:
                n_failed += 1
    assert n_failed <= max(2, n_total // 100), (n_failed, n_total)


def test_warm_start_perturbed_active_set():
    """Warm start from a wrong (perturbed) active set must still converge to
    the right solution (extra deactivations/iterations allowed)."""
    rng = np.random.default_rng(5)
    n_bad = 0
    for trial in range(20):
        characs = _characteristic_sets()[trial % 5]
        rpb = random_problem(characs, rng)
        pb = _qp(rpb)
        cold = jit_solve(pb, SolverOptions())
        as_np = np.asarray(cold.active_set).copy()
        # flip some statuses: deactivate one active, activate one inactive
        act = np.nonzero(as_np != 0)[0]
        inact = np.nonzero(as_np == 0)[0]
        if len(act):
            as_np[act[0]] = 0
        m = pb.m
        if len(inact):
            i = inact[-1]
            as_np[i] = 1 if i < m else 4  # LOWER or LOWER_BOUND
        warm = jit_warm(pb, jnp.asarray(as_np), SolverOptions(warm_start=True))
        if int(warm.status) != int(TerminationStatus.SUCCESS) or not np.allclose(
            np.asarray(warm.x), rpb.x, rtol=1e-5, atol=1e-5
        ):
            n_bad += 1
    assert n_bad <= 1, n_bad


def test_warm_start_empty_hint_equals_cold():
    """An all-INACTIVE hint reduces to the cold solve (equalities still
    auto-activate)."""
    rng = np.random.default_rng(11)
    rpb = random_problem(ProblemCharacteristics(5, 5).nEq(2), rng)
    pb = _qp(rpb)
    cold = jit_solve(pb, SolverOptions())
    hint = jnp.zeros(pb.m + pb.n, jnp.int32)
    warm = jit_warm(pb, hint, SolverOptions(warm_start=True))
    assert int(warm.status) == int(TerminationStatus.SUCCESS)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-9)


def test_warm_start_overconstrained():
    """More equalities than variables -> OVERCONSTRAINED_PROBLEM
    (ref :369-371)."""
    n = 3
    rng = np.random.default_rng(2)
    C = jnp.asarray(rng.standard_normal((5, n)))
    b = jnp.asarray(rng.standard_normal(5))
    pb = QPProblem(
        G=jnp.eye(n), a=jnp.zeros(n), C=C, l=b, u=b,  # 5 equalities, 3 vars
        xl=jnp.full(n, -np.inf), xu=jnp.full(n, np.inf),
    )
    warm = jit_warm(pb, jnp.zeros(5 + n, jnp.int32), SolverOptions(warm_start=True))
    assert int(warm.status) == int(TerminationStatus.OVERCONSTRAINED_PROBLEM)
