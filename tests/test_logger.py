"""Iteration-trace logger tests (ref: utils/Logger.h behavior analog)."""
import numpy as np
import jax
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve
from jrlqp_tpu.utils import LogFlags, dump_matlab, solve_traced


def _paper_problem():
    return QPProblem(
        G=jnp.asarray([[4.0, -2.0], [-2.0, 4.0]]),
        a=jnp.asarray([6.0, 0.0]),
        C=jnp.asarray([[1.0, 1.0]]),
        l=jnp.asarray([2.0]),
        u=jnp.asarray([10.0]),
        xl=jnp.zeros(2),
        xu=jnp.full(2, 10.0),
    )


def test_trace_matches_plain_solve():
    pb = _paper_problem()
    opt = SolverOptions(max_iter=20)
    res_plain = solve(pb, opt)
    res, trace = jax.jit(solve_traced, static_argnames=("opt", "flags"))(
        pb, opt, LogFlags.ITERATION_BASIC_DETAILS | LogFlags.ACTIVE_SET
    )
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_plain.x), atol=1e-12)
    it = int(res.iterations)
    valid = np.asarray(trace.valid)
    assert valid[:it].all() and not valid[it:].any()
    # the last recorded x equals the solution
    np.testing.assert_allclose(np.asarray(trace.x[it - 1]), np.asarray(res.x),
                               atol=1e-12)
    assert trace.status is not None and trace.u is None


def test_dump_matlab_format():
    pb = _paper_problem()
    res, trace = solve_traced(pb, SolverOptions(max_iter=20),
                              LogFlags.ITERATION_BASIC_DETAILS)
    script = dump_matlab("log", trace, res)
    assert "log(1).x = [" in script
    assert f"log_final.iterations = {int(res.iterations)};" in script
