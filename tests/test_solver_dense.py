"""Dense GI solver tests, mirroring the reference suite
(ref: tests/GoldfarbIdnaniSolverTest.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve, solve_batch
from jrlqp_tpu.problems import pad_problem, stack_problems
from jrlqp_tpu.testing import (
    ProblemCharacteristics,
    random_problem,
    check_kkt,
    kkt_residual,
)

jit_solve = jax.jit(solve, static_argnames=("opt",))


def _qp_from_random(pb):
    d = pb.to_qp_arrays()
    return QPProblem(
        G=jnp.asarray(d["G"]),
        a=jnp.asarray(d["a"]),
        C=jnp.asarray(d["C"]),
        l=jnp.asarray(d["l"]),
        u=jnp.asarray(d["u"]),
        xl=jnp.asarray(d["xl"]),
        xu=jnp.asarray(d["xu"]),
        objcst=jnp.asarray(d["objcst"]),
    )


def test_unconstrained_and_one_active():
    """ref: 'Simple problem' (GoldfarbIdnaniSolverTest.cpp:23-49)."""
    rng = np.random.default_rng(0)
    G = jnp.eye(3)
    a = jnp.zeros(3)
    C = jnp.asarray(rng.uniform(-1, 1, (5, 3)))
    bl = -jnp.ones(5)
    bu = jnp.ones(5)
    xl = jnp.full(3, -np.inf)
    xu = jnp.full(3, np.inf)
    pb = QPProblem(G=G, a=a, C=C, l=bl, u=bu, xl=xl, xu=xu)

    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    assert bool(check_kkt(res.x, res.multipliers, pb))
    # unconstrained minimum of 0.5 x'x is x = 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-12)

    # force at least one active constraint
    pb2 = QPProblem(G=G, a=a, C=C, l=bl.at[1].set(-2.0), u=bu.at[1].set(-1.0),
                    xl=xl, xu=xu)
    res2 = jit_solve(pb2, SolverOptions())
    assert int(res2.status) == int(TerminationStatus.SUCCESS)
    assert bool(check_kkt(res2.x, res2.multipliers, pb2))
    assert int(res2.iterations) >= 1


def test_simple_problem_paper():
    """The Goldfarb-Idnani paper example
    (ref: GoldfarbIdnaniSolverTest.cpp:51-73)."""
    pb = QPProblem(
        G=jnp.asarray([[4.0, -2.0], [-2.0, 4.0]]),
        a=jnp.asarray([6.0, 0.0]),
        C=jnp.asarray([[1.0, 1.0]]),
        l=jnp.asarray([2.0]),
        u=jnp.asarray([10.0]),
        xl=jnp.zeros(2),
        xu=jnp.full(2, 10.0),
    )
    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    assert bool(check_kkt(res.x, res.multipliers, pb))
    # known optimum of the GI paper example
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 1.5], atol=1e-10)
    assert float(kkt_residual(res.x, res.multipliers, pb)) < 1e-10


def _characteristic_sets():
    """ref: GoldfarbIdnaniSolverTest.cpp:77-81."""
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


@pytest.mark.parametrize("seed", range(4))
def test_random_problems_ground_truth(seed):
    """ref: 'Random problems' (GoldfarbIdnaniSolverTest.cpp:75-99): SUCCESS,
    KKT, and exact recovery of the generator's solution and multipliers."""
    rng = np.random.default_rng(seed)
    for characs in _characteristic_sets():
        rpb = random_problem(characs, rng)
        pb = _qp_from_random(rpb)
        res = jit_solve(pb, SolverOptions())
        assert int(res.status) == int(TerminationStatus.SUCCESS), characs
        assert bool(check_kkt(res.x, res.multipliers, pb)), characs
        np.testing.assert_allclose(np.asarray(res.x), rpb.x, rtol=1e-6, atol=1e-6)
        neq = rpb.E.shape[0]
        nineq = rpb.C.shape[0]
        mult = np.asarray(res.multipliers)
        np.testing.assert_allclose(mult[:neq], rpb.lambda_eq, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            mult[neq : neq + nineq], rpb.lambda_ineq, rtol=1e-6, atol=1e-6
        )
        if rpb.bounds:
            np.testing.assert_allclose(
                mult[neq + nineq :], rpb.lambda_bnd, rtol=1e-6, atol=1e-6
            )


def test_multiple_uses_no_retrace():
    """ref: 'Multiple uses' (GoldfarbIdnaniSolverTest.cpp:101-125). The
    malloc-free requirement maps to: one compilation serves many problems of
    the same padded shape (no retrace), asserted with the allocation-
    sanitizer analog `utils.no_retrace`."""
    from jrlqp_tpu.utils import no_retrace

    rng = np.random.default_rng(42)
    f = jax.jit(solve, static_argnames=("opt",))
    opt = SolverOptions()
    n_pad, m_pad = 5, 10
    sets = _characteristic_sets()

    def run_one(characs):
        rpb = random_problem(characs, rng)
        pb = pad_problem(_qp_from_random(rpb), n_pad, m_pad)
        res = f(pb, opt)
        assert int(res.status) == int(TerminationStatus.SUCCESS)
        assert bool(check_kkt(res.x, res.multipliers, pb))
        # solution of the padded problem restricted to real vars matches
        np.testing.assert_allclose(np.asarray(res.x[:5]), rpb.x, rtol=1e-6, atol=1e-6)

    run_one(sets[0])  # warm up: the single compilation
    with no_retrace(f):
        for characs in sets[1:]:
            run_one(characs)


def test_batched_solve_vmap():
    """Batch of heterogeneous problems padded to a common shape, solved in
    one vmapped call; per-lane statuses and KKT all good."""
    rng = np.random.default_rng(7)
    pbs = []
    truths = []
    for characs in _characteristic_sets() * 2:
        rpb = random_problem(characs, rng)
        pbs.append(_qp_from_random(rpb))
        truths.append(rpb.x)
    batch = stack_problems(pbs)
    res = jax.jit(solve_batch, static_argnames=("opt",))(batch, SolverOptions())
    assert np.all(np.asarray(res.status) == int(TerminationStatus.SUCCESS))
    for i, xt in enumerate(truths):
        np.testing.assert_allclose(
            np.asarray(res.x[i, : len(xt)]), xt, rtol=1e-6, atol=1e-6
        )
    # batched KKT residuals
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, batch)
    assert float(jnp.max(resid)) < 1e-8


def test_infeasible_detection():
    """Contradictory constraints -> INFEASIBLE (ref: DualSolver.cpp:131)."""
    pb = QPProblem(
        G=jnp.eye(2),
        a=jnp.zeros(2),
        C=jnp.asarray([[1.0, 0.0], [1.0, 0.0]]),
        l=jnp.asarray([1.0, -np.inf]),
        u=jnp.asarray([np.inf, -1.0]),  # x0 >= 1 and x0 <= -1
        xl=jnp.full(2, -np.inf),
        xu=jnp.full(2, np.inf),
    )
    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.INFEASIBLE)


def test_non_pos_hessian():
    pb = QPProblem(
        G=jnp.asarray([[1.0, 0.0], [0.0, -1.0]]),
        a=jnp.zeros(2),
        C=jnp.zeros((1, 2)),
        l=jnp.asarray([-np.inf]),
        u=jnp.asarray([np.inf]),
        xl=jnp.full(2, -np.inf),
        xu=jnp.full(2, np.inf),
    )
    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.NON_POS_HESSIAN)


def test_equality_constraints_auto_activation():
    """Problems with l == u rows must auto-activate (ref: initActiveSet)."""
    rng = np.random.default_rng(3)
    rpb = random_problem(ProblemCharacteristics(6, 6).nEq(3), rng)
    pb = _qp_from_random(rpb)
    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    # equality rows satisfied exactly-ish
    viol = np.asarray(pb.C @ res.x)[:3] - np.asarray(pb.l[:3])
    np.testing.assert_allclose(viol, 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), rpb.x, rtol=1e-6, atol=1e-6)


def test_fixed_variables():
    """xl == xu fixes variables (FIXED status auto-activation)."""
    G = jnp.eye(3) * 2.0
    a = jnp.asarray([1.0, 1.0, 1.0])
    pb = QPProblem(
        G=G, a=a, C=jnp.zeros((1, 3)),
        l=jnp.asarray([-np.inf]), u=jnp.asarray([np.inf]),
        xl=jnp.asarray([0.7, -np.inf, -np.inf]),
        xu=jnp.asarray([0.7, np.inf, np.inf]),
    )
    res = jit_solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.x), [0.7, -0.5, -0.5], atol=1e-10)
    assert bool(check_kkt(res.x, res.multipliers, pb))
