"""Mixed-precision (f32 identify + f64 refine) solver tests."""
import numpy as np
import jax
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus
from jrlqp_tpu.solver.mixed import solve_mixed
from jrlqp_tpu.testing import ProblemCharacteristics, random_problem, check_kkt, kkt_residual
from jrlqp_tpu.testing.batch_gen import random_qp_batch

jit_mixed = jax.jit(solve_mixed, static_argnames=("opt",))


def _qp(rpb):
    d = rpb.to_qp_arrays()
    return QPProblem(
        G=jnp.asarray(d["G"]), a=jnp.asarray(d["a"]), C=jnp.asarray(d["C"]),
        l=jnp.asarray(d["l"]), u=jnp.asarray(d["u"]),
        xl=jnp.asarray(d["xl"]), xu=jnp.asarray(d["xu"]),
    )


def test_mixed_reaches_f64_accuracy():
    rng = np.random.default_rng(0)
    n_ok = 0
    trials = 10
    for _ in range(trials):
        rpb = random_problem(
            ProblemCharacteristics(5, 5, 2, 6).nStrongActIneq(3), rng
        )
        pb = _qp(rpb)
        res = jit_mixed(pb, SolverOptions())
        if int(res.status) != int(TerminationStatus.SUCCESS):
            continue
        assert res.x.dtype == jnp.float64
        if float(kkt_residual(res.x, res.multipliers, pb)) < 1e-8 and np.allclose(
            np.asarray(res.x), rpb.x, rtol=1e-6, atol=1e-6
        ):
            n_ok += 1
    # f32 identification may occasionally mislabel a weakly-active constraint;
    # the f64 correction loop still converges, so near-all should pass.
    assert n_ok >= trials - 1, n_ok


def test_mixed_batch_kkt_residuals():
    pbs = random_qp_batch(jax.random.key(3), batch=16, n=12, m=20, act_frac=0.3)
    res = jax.jit(jax.vmap(lambda p: solve_mixed(p, SolverOptions(max_iter=100))))(pbs)
    ok = np.asarray(res.status) == int(TerminationStatus.SUCCESS)
    assert ok.mean() >= 0.9
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    assert float(jnp.max(jnp.where(jnp.asarray(ok), resid, 0.0))) < 1e-8
