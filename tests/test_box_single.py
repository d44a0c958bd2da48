"""Box-and-single-constraint solver tests
(ref: tests/BoxAndSingleConstraintSolverTest.cpp:16-47)."""
import numpy as np
import jax
import jax.numpy as jnp

from jrlqp_tpu import SolverOptions, TerminationStatus, solve
from jrlqp_tpu.solver.box_single import box_qp_problem, solve_box
from jrlqp_tpu.testing import check_kkt

jit_box = jax.jit(solve_box, static_argnames=("opt",))
jit_solve = jax.jit(solve, static_argnames=("opt",))


def _generate(rng, n, act, act_level=0.5):
    """ref: generateBoxAndSingleConstraintProblem (:99-175)."""
    x0 = rng.uniform(-1, 1, n)
    r1 = rng.uniform(-1, 1, n)
    r2 = rng.uniform(-1, 1, n)
    xl = np.minimum(r1, r2)
    xu = np.maximum(r1, r2)
    xb = np.clip(x0, xl, xu)
    c = rng.uniform(-1, 1, n)
    sl = np.where(c > 0, xl, xu)  # box corner minimizing c'x
    su = np.where(c > 0, xu, xl)  # box corner maximizing c'x
    if act:
        d1 = c @ xb
        d2 = c @ su
        b = act_level * d1 + (1 - act_level) * d2
    else:
        b = c @ sl
    return x0, c, b, xl, xu


def test_box_inactive_case():
    """Constraint not cutting the box: solution is the plain clamp."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        x0, c, b, xl, xu = _generate(rng, 6, act=False)
        res = jit_box(
            jnp.asarray(x0), jnp.asarray(c), jnp.asarray(b),
            jnp.asarray(xl), jnp.asarray(xu), SolverOptions()
        )
        assert int(res.status) == int(TerminationStatus.SUCCESS)
        np.testing.assert_allclose(
            np.asarray(res.x), np.clip(x0, xl, xu), atol=1e-12
        )
        pb = box_qp_problem(jnp.asarray(x0), jnp.asarray(c), jnp.asarray(b),
                            jnp.asarray(xl), jnp.asarray(xu))
        assert bool(check_kkt(res.x, res.multipliers, pb))


def test_box_active_vs_dense_gi():
    """Differential test against the dense GI solver (ref :16-47), active
    and inactive constraint cases, including the objective-offset identity
    f_box = f_dense + 0.5|x0|^2."""
    rng = np.random.default_rng(1)
    for act in (False, True):
        for trial in range(8):
            x0, c, b, xl, xu = _generate(rng, 7, act=act, act_level=0.3 + 0.05 * trial)
            x0j, cj, bj = jnp.asarray(x0), jnp.asarray(c), jnp.asarray(b)
            xlj, xuj = jnp.asarray(xl), jnp.asarray(xu)
            res = jit_box(x0j, cj, bj, xlj, xuj, SolverOptions())
            assert int(res.status) == int(TerminationStatus.SUCCESS)
            pb = box_qp_problem(x0j, cj, bj, xlj, xuj)
            dense = jit_solve(pb, SolverOptions())
            assert int(dense.status) == int(TerminationStatus.SUCCESS)
            np.testing.assert_allclose(
                np.asarray(res.x), np.asarray(dense.x), atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(res.multipliers), np.asarray(dense.multipliers), atol=1e-9
            )
            # box solver reports f = 0.5|x-x0|^2; dense reports 0.5x'x - x0'x
            np.testing.assert_allclose(
                float(res.f), float(dense.f) + 0.5 * float(x0 @ x0), atol=1e-9
            )
            assert bool(check_kkt(res.x, res.multipliers, pb))


def test_box_batched():
    """BASELINE.json config 2 shape: a vmapped batch of small problems."""
    rng = np.random.default_rng(3)
    B, n = 64, 8
    data = [_generate(rng, n, act=bool(i % 2)) for i in range(B)]
    x0 = jnp.asarray(np.stack([d[0] for d in data]))
    c = jnp.asarray(np.stack([d[1] for d in data]))
    b = jnp.asarray(np.stack([d[2] for d in data]))
    xl = jnp.asarray(np.stack([d[3] for d in data]))
    xu = jnp.asarray(np.stack([d[4] for d in data]))
    batch = jax.jit(
        jax.vmap(lambda *args: solve_box(*args, SolverOptions()))
    )(x0, c, b, xl, xu)
    assert np.all(np.asarray(batch.status) == int(TerminationStatus.SUCCESS))
    pbs = jax.vmap(box_qp_problem)(x0, c, b, xl, xu)
    ok = jax.vmap(check_kkt)(batch.x, batch.multipliers, pbs)
    assert bool(jnp.all(ok))


def test_box_closed_form_vs_gi_machinery():
    """The closed-form solver must match the GI-machinery variant (the
    literal reference code path, ref BoxAndSingleConstraintSolver.cpp:46-94)
    bitwise-tolerance on non-degenerate problems."""
    from jrlqp_tpu.solver.box_single import solve_box_gi

    rng = np.random.default_rng(11)
    for act in (False, True):
        for _ in range(6):
            x0, c, b, xl, xu = _generate(rng, 9, act=act, act_level=0.4)
            args = [jnp.asarray(v) for v in (x0, c, b, xl, xu)]
            res = jit_box(*args, SolverOptions())
            gi = solve_box_gi(*args)
            assert int(res.status) == int(gi.status) == 0
            np.testing.assert_allclose(np.asarray(res.x), np.asarray(gi.x),
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(res.multipliers),
                                       np.asarray(gi.multipliers), atol=1e-9)


def test_box_infeasible_detected():
    """bl beyond the box's best corner => INFEASIBLE (ref: the generic
    loop's t >= bigBnd check, src/DualSolver.cpp:131)."""
    rng = np.random.default_rng(12)
    for _ in range(5):
        x0, c, _, xl, xu = _generate(rng, 6, act=True)
        b = float(np.where(c > 0, xu, xl) @ c) + 0.5   # unreachable
        res = jit_box(jnp.asarray(x0), jnp.asarray(c), jnp.asarray(b),
                      jnp.asarray(xl), jnp.asarray(xu), SolverOptions())
        assert int(res.status) == int(TerminationStatus.INFEASIBLE)


def test_box_degenerate_corner():
    """bl exactly at the best corner: the feasible set is one point; the
    closed form must find it exactly (the dense GI solver's active-set
    pivoting declares such measure-zero sets infeasible)."""
    from jrlqp_tpu.testing.kkt import kkt_residual

    rng = np.random.default_rng(13)
    hits = 0
    for _ in range(10):
        x0, c, _, xl, xu = _generate(rng, 6, act=True)
        corner = np.where(c > 0, xu, xl)
        b = float(corner @ c)
        args = [jnp.asarray(v) for v in (x0, c, b, xl, xu)]
        res = jit_box(*args, SolverOptions())
        if int(res.status) == 0:          # (a tie-rounding INFEASIBLE is ok)
            hits += 1
            np.testing.assert_allclose(np.asarray(res.x), corner, atol=1e-9)
            pb = box_qp_problem(*args)
            assert float(kkt_residual(res.x, res.multipliers, pb)) <= 1e-9
    assert hits >= 7
