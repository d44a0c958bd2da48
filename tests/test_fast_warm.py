"""Warm start for the explicit-operator engine.

Mirrors the reference's warm-start tests (exact active set converges in 0
iterations and reproduces the solution; perturbed hints still converge,
ref: tests/GoldfarbIdnaniSolverTest.cpp:127-219), differential against both
the cold fast solve and the f64 J/R warm solver.
"""
import jax
import jax.numpy as jnp
import numpy as np

from jrlqp_tpu import SolverOptions, solve_warm
from jrlqp_tpu.solver.fast import (
    solve_fast,
    solve_fast_warm,
    solve_refined_warm_pallas,
)
from jrlqp_tpu.testing.batch_gen import random_qp_batch
from jrlqp_tpu.testing.kkt import kkt_residual


def _one(pbs, i):
    return jax.tree.map(lambda a: a[i], pbs)


def test_fast_warm_exact_hint_zero_iterations():
    pbs = random_qp_batch(jax.random.key(0), 6, 10, 16, act_frac=0.4)
    opt = SolverOptions(max_iter=80, warm_start=True)
    cold = jax.vmap(lambda p: solve_fast(p, opt))(pbs)
    warm = jax.vmap(lambda p, h: solve_fast_warm(p, h, opt))(
        pbs, cold.active_set)
    assert np.asarray(warm.status == 0).all()
    # exact hint: only the final success-check iteration may run
    assert int(np.max(np.asarray(warm.iterations))) == 0
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(warm.multipliers),
                               np.asarray(cold.multipliers), atol=1e-7)


def test_fast_warm_matches_jr_warm_solver():
    pbs = random_qp_batch(jax.random.key(2), 4, 9, 14, act_frac=0.3)
    opt = SolverOptions(max_iter=80, warm_start=True)
    cold = jax.vmap(lambda p: solve_fast(p, opt))(pbs)
    for i in range(4):
        pb = _one(pbs, i)
        hint = cold.active_set[i]
        a = solve_fast_warm(pb, hint, opt)
        b = solve_warm(pb, hint, opt)
        np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                                   atol=1e-7)


def test_fast_warm_rubbish_hint_still_converges():
    pbs = random_qp_batch(jax.random.key(5), 6, 10, 16, act_frac=0.4)
    opt = SolverOptions(max_iter=120, warm_start=True)
    cold = jax.vmap(lambda p: solve_fast(p, opt))(pbs)
    # perturb: clear half the hints, flip one bound hint on
    hint = cold.active_set.at[:, ::2].set(0)
    warm = jax.vmap(lambda p, h: solve_fast_warm(p, h, opt))(pbs, hint)
    assert np.asarray(warm.status == 0).all()
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               atol=1e-7)


def test_refined_warm_pallas_interpret():
    pbs = random_qp_batch(jax.random.key(7), 5, 8, 12, act_frac=0.4)
    opt = SolverOptions(max_iter=60, warm_start=True)
    cold = jax.vmap(lambda p: solve_fast(p, opt))(pbs)
    res = solve_refined_warm_pallas(pbs, cold.active_set, opt,
                                    interpret=True)
    assert np.asarray(res.status == 0).all()
    assert int(np.max(np.asarray(res.iterations))) == 0
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    assert np.asarray(resid <= 1e-8).all(), np.asarray(resid)
