"""Input validation tests: well_formed host checker + traced
INCONSISTENT_INPUT (ref: problems.h wellFormed :16-146 and the solver
entry asserts, src/GoldfarbIdnaniSolver.cpp:30-39; the reference defines
INCONSISTENT_INPUT but never produces it -- here it is reachable via
SolverOptions(validate=True))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrlqp_tpu import (
    QPProblem,
    SolverOptions,
    TerminationStatus,
    inconsistent_mask,
    solve,
    well_formed,
)
from jrlqp_tpu.testing.batch_gen import random_qp_batch


def _good(n=4, m=6, seed=0):
    pbs = random_qp_batch(jax.random.key(seed), 1, n, m, act_frac=0.3)
    return jax.tree.map(lambda x: x[0], pbs)


def test_well_formed_accepts_good_problem():
    ok, findings = well_formed(_good())
    assert ok and findings == []


def test_well_formed_shape_mismatches():
    pb = _good()
    bad = QPProblem(G=pb.G, a=pb.a[:-1], C=pb.C, l=pb.l, u=pb.u,
                    xl=pb.xl, xu=pb.xu)
    ok, findings = well_formed(bad)
    assert not ok and any("a must have shape" in f for f in findings)
    bad = QPProblem(G=pb.G[:, :-1], a=pb.a, C=pb.C, l=pb.l, u=pb.u,
                    xl=pb.xl, xu=pb.xu)
    ok, findings = well_formed(bad)
    assert not ok and any("square" in f for f in findings)


def test_well_formed_inverted_bounds_and_nonfinite():
    pb = _good()
    import dataclasses
    bad = dataclasses.replace(pb, l=pb.u + 1.0, u=pb.l)
    ok, findings = well_formed(bad)
    assert not ok and any("l/u inverted" in f for f in findings)
    bad = dataclasses.replace(pb, xl=pb.xl.at[1].set(3.0),
                              xu=pb.xu.at[1].set(-3.0))
    ok, findings = well_formed(bad)
    assert not ok and any("xl/xu" in f for f in findings)
    bad = dataclasses.replace(pb, G=pb.G.at[0, 0].set(jnp.nan))
    ok, findings = well_formed(bad)
    assert not ok and any("G has non-finite" in f for f in findings)
    bad = dataclasses.replace(pb, G=pb.G.at[0, 1].add(1.0))
    ok, findings = well_formed(bad)
    assert not ok and any("not symmetric" in f for f in findings)


@pytest.mark.parametrize("engine", ["dense", "fast", "refined"])
def test_inconsistent_input_status_reachable(engine):
    import dataclasses

    from jrlqp_tpu.solver.fast import solve_fast, solve_refined

    pb = _good(seed=3)
    bad = dataclasses.replace(pb, l=pb.l.at[0].set(2.0), u=pb.u.at[0].set(1.0))
    opt = SolverOptions(validate=True)
    fn = {"dense": solve, "fast": solve_fast, "refined": solve_refined}[engine]
    res_bad = fn(bad, opt)
    assert int(res_bad.status) == int(TerminationStatus.INCONSISTENT_INPUT)
    # the same options must not disturb a good problem
    res_ok = fn(pb, opt)
    assert int(res_ok.status) == int(TerminationStatus.SUCCESS)
    # validation off (default): no status change on the good path
    res_off = fn(pb, SolverOptions())
    assert int(res_off.status) == int(TerminationStatus.SUCCESS)


def test_inconsistent_mask_batched():
    import dataclasses

    pbs = random_qp_batch(jax.random.key(1), 4, 5, 8, act_frac=0.2)
    l = pbs.l.at[2, 0].set(jnp.nan)
    bad = dataclasses.replace(pbs, l=l)
    mask = jax.vmap(inconsistent_mask)(bad)
    assert np.array_equal(np.asarray(mask), [False, False, True, False])


def test_inconsistent_lane_does_not_poison_batch():
    """One bad lane in a Pallas batch must freeze with INCONSISTENT_INPUT
    while the other lanes solve normally."""
    import dataclasses

    from jrlqp_tpu.solver.fast import solve_refined_pallas

    pbs = random_qp_batch(jax.random.key(2), 4, 5, 8, act_frac=0.2)
    bad = dataclasses.replace(pbs, xl=pbs.xl.at[1, 0].set(5.0),
                              xu=pbs.xu.at[1, 0].set(-5.0))
    res = solve_refined_pallas(bad, SolverOptions(validate=True),
                               interpret=True)
    sts = np.asarray(res.status)
    assert sts[1] == int(TerminationStatus.INCONSISTENT_INPUT)
    assert all(sts[k] == int(TerminationStatus.SUCCESS) for k in (0, 2, 3))
