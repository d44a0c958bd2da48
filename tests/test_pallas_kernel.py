"""Differential tests: Pallas whole-solve GI kernel vs the XLA fast path.

Runs the kernel in interpret mode (CPU) on batches that exercise adds,
removals, equalities, fixed variables, and bounds, and checks the final
state matches ``vmap(solve_refined)`` (same math, different engine).
Mirrors the reference's structured-vs-dense differential strategy
(ref: tests/BlockGISolverTest.in.cpp:70-170).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.solver.fast import solve_refined, solve_refined_pallas
from jrlqp_tpu.testing.batch_gen import random_qp_batch
from jrlqp_tpu.testing.kkt import kkt_residual


@pytest.mark.parametrize("pack", [1, None])
@pytest.mark.parametrize("n,m,batch", [(8, 12, 6), (13, 7, 4)])
def test_pallas_matches_xla(n, m, batch, pack):
    # pack=1 covers the branchy single-problem kernel (K-stacking,
    # lax.cond add/remove, skip-step-1); pack=None the vectorized masked one
    opt = SolverOptions(max_iter=60)
    pbs = random_qp_batch(jax.random.key(0), batch, n, m, act_frac=0.4)
    res_p = solve_refined_pallas(pbs, opt, interpret=True, pack=pack)
    res_x = jax.vmap(lambda p: solve_refined(p, opt))(pbs)
    np.testing.assert_array_equal(np.asarray(res_p.status),
                                  np.asarray(res_x.status))
    np.testing.assert_array_equal(np.asarray(res_p.iterations),
                                  np.asarray(res_x.iterations))
    # both engines refine to <=1e-8 KKT; accumulation order differs
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_x.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_p.multipliers),
                               np.asarray(res_x.multipliers), atol=1e-6)


def test_pallas_with_equalities_and_fixed():
    # equalities (l == u) and fixed variables (xl == xu) exercise the
    # pre-activated initial state handed to the kernel
    opt = SolverOptions(max_iter=60)
    pbs = random_qp_batch(jax.random.key(3), 4, 9, 6, act_frac=0.3)
    l = pbs.l.at[:, 0].set(pbs.u[:, 0])          # constraint 0 equality
    xl = pbs.xl.at[:, 2].set(0.37)
    xu = pbs.xu.at[:, 2].set(0.37)               # variable 2 fixed
    import dataclasses
    pbs = dataclasses.replace(pbs, l=l, xl=xl, xu=xu)
    res_p = solve_refined_pallas(pbs, opt, interpret=True)
    res_x = jax.vmap(lambda p: solve_refined(p, opt))(pbs)
    np.testing.assert_array_equal(np.asarray(res_p.status),
                                  np.asarray(res_x.status))
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_x.x),
                               atol=1e-7)
    # fixed variable honored
    np.testing.assert_allclose(np.asarray(res_p.x[:, 2]), 0.37, atol=1e-6)


def test_pallas_kkt_quality():
    opt = SolverOptions(max_iter=80)
    pbs = random_qp_batch(jax.random.key(7), 8, 10, 16, act_frac=0.4)
    res = solve_refined_pallas(pbs, opt, interpret=True)
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    ok = np.asarray((resid <= 1e-8) & (res.status == 0))
    assert ok.all(), np.asarray(resid)


def test_fused_init_matches_xla_init():
    """fused_init=True (in-kernel Cholesky prologue) must reproduce the
    XLA-init path: same iterations, same solutions, same KKT quality."""
    from jrlqp_tpu.solver.fast import solve_refined_pallas
    from jrlqp_tpu.testing.batch_gen import random_qp_batch
    from jrlqp_tpu.testing.kkt import kkt_residual

    pbs = random_qp_batch(jax.random.key(17), 10, 12, 20, act_frac=0.5)
    opt = SolverOptions(max_iter=100)
    r0 = solve_refined_pallas(pbs, opt, interpret=True, pack=4)
    r1 = solve_refined_pallas(pbs, opt, interpret=True, pack=4,
                              fused_init=True)
    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(r1.status))
    np.testing.assert_array_equal(np.asarray(r0.iterations),
                                  np.asarray(r1.iterations))
    # the two inits round H0 differently and the hole-based slot layout
    # makes the refinement's contraction order depend on slot arrangement;
    # both paths independently refine to <=1e-8 KKT (checked below)
    np.testing.assert_allclose(np.asarray(r0.x), np.asarray(r1.x),
                               atol=1e-7)
    resid = jax.vmap(kkt_residual)(r1.x, r1.multipliers, pbs)
    assert float(jnp.max(np.asarray(resid))) <= 1e-8


def test_fused_init_with_equalities_and_fixed():
    """The in-kernel equality/fixed auto-activation prologue (fused_init)
    must match the XLA init's replay loop on equality-bearing batches --
    the round-4 advisory's silent-wrong-answer trap is now impossible."""
    import dataclasses

    opt = SolverOptions(max_iter=80)
    pbs = random_qp_batch(jax.random.key(21), 6, 9, 6, act_frac=0.3)
    l = pbs.l.at[:, 0].set(pbs.u[:, 0])          # constraint 0 equality
    l = l.at[:, 3].set(pbs.u[:, 3])              # constraint 3 equality
    xl = pbs.xl.at[:, 2].set(0.41)
    xu = pbs.xu.at[:, 2].set(0.41)               # variable 2 fixed
    pbs = dataclasses.replace(pbs, l=l, xl=xl, xu=xu)
    r0 = solve_refined_pallas(pbs, opt, interpret=True, pack=2)
    r1 = solve_refined_pallas(pbs, opt, interpret=True, pack=2,
                              fused_init=True)
    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(r1.status))
    np.testing.assert_array_equal(np.asarray(r0.iterations),
                                  np.asarray(r1.iterations))
    np.testing.assert_allclose(np.asarray(r0.x), np.asarray(r1.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r1.x[:, 2]), 0.41, atol=1e-6)
    resid = jax.vmap(kkt_residual)(r1.x, r1.multipliers, pbs)
    assert float(jnp.max(np.asarray(resid))) <= 1e-8


def test_fused_init_equality_only_lane_mix():
    """Mixed pack: some lanes carry equalities, others none -- the masked
    prologue must only advance the equality-bearing lanes."""
    import dataclasses

    opt = SolverOptions(max_iter=80)
    pbs = random_qp_batch(jax.random.key(22), 4, 8, 10, act_frac=0.4)
    l = pbs.l.at[1, 2].set(pbs.u[1, 2])          # lane 1 only: equality
    xl = pbs.xl.at[3, 0].set(-0.2)
    xu = pbs.xu.at[3, 0].set(-0.2)               # lane 3 only: fixed var
    pbs = dataclasses.replace(pbs, l=l, xl=xl, xu=xu)
    r0 = solve_refined_pallas(pbs, opt, interpret=True, pack=4)
    r1 = solve_refined_pallas(pbs, opt, interpret=True, pack=4,
                              fused_init=True)
    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(r1.status))
    np.testing.assert_allclose(np.asarray(r0.x), np.asarray(r1.x),
                               atol=1e-7)


def test_vertex_touch_candidate_relocation():
    """Regression for the hole-based slot layout: when a solve touches a
    full-rank vertex (q == n), the pending candidate provisionally pins a
    PADDED slot and must be relocated into the slot freed by the
    forced dual-step removal -- without that, one multiplier lands in
    padding and is silently truncated from the outputs (KKT blows up while
    x stays near-correct)."""
    opt = SolverOptions(max_iter=120)
    # small n + many tight constraints => vertex touches are common
    pbs = random_qp_batch(jax.random.key(41), 12, 4, 16, act_frac=0.9)
    res = solve_refined_pallas(pbs, opt, interpret=True, pack=4)
    rx = jax.vmap(lambda p: solve_refined(p, opt))(pbs)
    ok = np.asarray(res.status) == 0
    assert ok.all()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(rx.x),
                               atol=1e-7)
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    assert float(jnp.max(np.asarray(resid))) <= 1e-8, np.asarray(resid)


def test_warm_carry_kernel_large_drift():
    """The in-kernel warm-carry prologue (closed-form point + u<0
    deactivation downdates + GI loop, one launch) must reach the same
    optimum as a cold solve even on large drifts that force several
    deactivations in the prologue."""
    import dataclasses

    from jrlqp_tpu.solver.fast import solve_refined_pallas_carry

    opt = SolverOptions(max_iter=100)
    B, n, m = 5, 8, 12
    base = random_qp_batch(jax.random.key(29), B, n, m, act_frac=0.5)
    res0, carry = solve_refined_pallas_carry(base, None, opt, interpret=True)
    assert np.all(np.asarray(res0.status) == 0)
    d = 0.5 * jax.random.normal(jax.random.key(30), (B, m), base.l.dtype)
    pbs = dataclasses.replace(base, l=base.l + d, u=base.u + d)
    res_w, _ = solve_refined_pallas_carry(pbs, carry, opt, interpret=True)
    res_c = solve_refined_pallas(pbs, opt, interpret=True)
    assert np.all(np.asarray(res_w.status) == 0)
    np.testing.assert_allclose(np.asarray(res_w.x), np.asarray(res_c.x),
                               atol=1e-7)
    resid = jax.vmap(kkt_residual)(res_w.x, res_w.multipliers, pbs)
    assert float(jnp.max(np.asarray(resid))) <= 1e-8


def test_fused_init_detects_non_spd():
    """A non-SPD lane must terminate NON_POS_HESSIAN through the in-kernel
    Cholesky prologue (collapsed-pivot detection, like ops/pallas/block_llt)
    without poisoning the rest of the pack."""
    import dataclasses

    from jrlqp_tpu.solver.fast import solve_refined_pallas
    from jrlqp_tpu.testing.batch_gen import random_qp_batch
    from jrlqp_tpu.types import TerminationStatus

    pbs = random_qp_batch(jax.random.key(18), 4, 8, 12, act_frac=0.3)
    G = pbs.G.at[2].set(jnp.diag(jnp.asarray(
        [1.0] * 7 + [-1.0], pbs.G.dtype)))
    bad = dataclasses.replace(pbs, G=G)
    res = solve_refined_pallas(bad, SolverOptions(max_iter=60),
                               interpret=True, pack=4, fused_init=True)
    sts = np.asarray(res.status)
    assert sts[2] == int(TerminationStatus.NON_POS_HESSIAN)
    assert all(sts[k] == int(TerminationStatus.SUCCESS) for k in (0, 1, 3))
