"""Direct active-set bookkeeping unit tests (ref: tests/ActiveSetTest.cpp).

The reference tests its ActiveSet class by replaying activate/deactivate
sequences and checking the full status vector, the activation-order list,
and all derived counters after each step. Here the same sequence drives the
dense engine's masked state updates (`_apply_add` / `_apply_remove`) and
the explicit-operator engine's equivalents -- end-to-end solves can mask
compensating bookkeeping bugs; these tests cannot.

Index layout (state.py): general constraints 0..m-1 then bounds m..m+n-1.
The reference sequence uses (5 constraints, 3 bounds) with up to 4
simultaneously active; our activation order array is (n,) (at most n
active in GI), so the sequence is replayed on m=4, n=4 with the same
shape: indices remapped, semantics identical.
"""
import jax
import jax.numpy as jnp
import numpy as np

from jrlqp_tpu.problems import QPProblem
from jrlqp_tpu.solver import dense as d_eng
from jrlqp_tpu.solver import fast as f_eng
from jrlqp_tpu.solver.state import initial_state
from jrlqp_tpu.types import (
    EQUALITY,
    FIXED,
    INACTIVE,
    LOWER,
    LOWER_BOUND,
    UPPER,
    UPPER_BOUND,
)

M, N = 4, 4
I, L, U, E = INACTIVE, LOWER, UPPER, EQUALITY
LB, UB, FX = LOWER_BOUND, UPPER_BOUND, FIXED


def _pb():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((N, N))
    return QPProblem(
        G=jnp.asarray(A.T @ A + N * np.eye(N)),
        a=jnp.asarray(rng.standard_normal(N)),
        C=jnp.asarray(rng.standard_normal((M, N))),
        l=jnp.full(M, -2.0), u=jnp.full(M, 2.0),
        xl=jnp.full(N, -3.0), xu=jnp.full(N, 3.0),
    )


def counters(status, m):
    """The reference's 8 ActiveSet counters, derived by reduction
    (ref: internal/ActiveSet.h:159-168)."""
    gen, bnd = np.asarray(status[:m]), np.asarray(status[m:])
    return dict(
        nbActiveCstr=int(np.sum(gen != I) + np.sum(bnd != I)),
        nbEq=int(np.sum(gen == E)),
        nbIneq=int(np.sum((gen == L) | (gen == U))),
        nbLIneq=int(np.sum(gen == L)),
        nbUIneq=int(np.sum(gen == U)),
        nbBnd=int(np.sum(bnd != I)),
        nbLBnd=int(np.sum(bnd == LB)),
        nbUBnd=int(np.sum(bnd == UB)),
    )


def check(state, exp_status, exp_aorder, exp_q, exp_nb):
    np.testing.assert_array_equal(np.asarray(state.status), exp_status)
    q = int(state.q)
    assert q == exp_q
    np.testing.assert_array_equal(np.asarray(state.aorder)[:q], exp_aorder)
    # beyond q the order array is cleared
    assert np.all(np.asarray(state.aorder)[q:] == -1)
    got = counters(state.status, M)
    want = dict(zip(got.keys(), exp_nb))
    assert got == want, (got, want)


# The reference's "Activation" sequence (ActiveSetTest.cpp:70-133), indices
# remapped from (5 cstr, 3 bnd) to (4 cstr, 4 bnd): general 3->3, 2->2,
# 4->1; bound 6 (bnd#1) -> 5, bound 7 (bnd#2) -> 6.
#   counters = (nbActiveCstr, nbEq, nbIneq, nbLIneq, nbUIneq,
#               nbBnd, nbLBnd, nbUBnd)
SEQUENCE = [
    ("add", 3, E, [I, I, I, E, I, I, I, I], [3], (1, 1, 0, 0, 0, 0, 0, 0)),
    ("add", 5, UB, [I, I, I, E, I, UB, I, I], [3, 5],
     (2, 1, 0, 0, 0, 1, 0, 1)),
    ("add", 2, L, [I, I, L, E, I, UB, I, I], [3, 5, 2],
     (3, 1, 1, 1, 0, 1, 0, 1)),
    ("add", 1, U, [I, U, L, E, I, UB, I, I], [3, 5, 2, 1],
     (4, 1, 2, 1, 1, 1, 0, 1)),
    ("rm", 1, None, [I, U, L, E, I, I, I, I], [3, 2, 1],
     (3, 1, 2, 1, 1, 0, 0, 0)),
    ("add", 6, LB, [I, U, L, E, I, I, LB, I], [3, 2, 1, 6],
     (4, 1, 2, 1, 1, 1, 1, 0)),
    ("rm", 2, None, [I, I, L, E, I, I, LB, I], [3, 2, 6],
     (3, 1, 1, 1, 0, 1, 1, 0)),
    ("rm", 2, None, [I, I, L, E, I, I, I, I], [3, 2],
     (2, 1, 1, 1, 0, 0, 0, 0)),
    ("rm", 0, None, [I, I, L, I, I, I, I, I], [2],
     (1, 0, 1, 1, 0, 0, 0, 0)),
    ("rm", 0, None, [I, I, I, I, I, I, I, I], [],
     (0, 0, 0, 0, 0, 0, 0, 0)),
]


def test_dense_state_replays_reference_sequence():
    pb = _pb()
    rng = np.random.default_rng(1)
    st = initial_state(N, M, jnp.float64)
    # empty-state invariants (ref "Test ActiveSet Ctor")
    check(st, [I] * (M + N), [], 0, (0, 0, 0, 0, 0, 0, 0, 0))
    for op, arg, stat, exp_status, exp_aorder, exp_nb in SEQUENCE:
        if op == "add":
            # d: any vector with a nonzero tail (bookkeeping is
            # independent of the J/R numerics)
            dvec = jnp.asarray(rng.standard_normal(N))
            st = d_eng._apply_add(pb, st, dvec, jnp.asarray(arg), stat)
        else:
            st = d_eng._apply_remove(pb, st, jnp.asarray(arg), st.u)
        check(st, exp_status, exp_aorder, len(exp_aorder), exp_nb)


def test_fast_state_replays_reference_sequence():
    pb = _pb().with_dtype(jnp.float32)
    rng = np.random.default_rng(2)
    st = f_eng._init_fast(
        pb, __import__("jrlqp_tpu").SolverOptions(dtype=jnp.float32))
    assert int(st.q) == 0
    for op, arg, stat, exp_status, exp_aorder, exp_nb in SEQUENCE:
        if op == "add":
            z = jnp.asarray(rng.standard_normal(N), jnp.float32)
            r = jnp.zeros(N, jnp.float32)
            nplus = jnp.asarray(rng.standard_normal(N), jnp.float32)
            st = f_eng._apply_add(st, nplus, z, r, jnp.asarray(arg), stat,
                                  jnp.float32)
        else:
            st = f_eng._apply_remove(pb, st, jnp.asarray(arg), st.u)
        check(st, exp_status, exp_aorder, len(exp_aorder), exp_nb)


def test_remove_shifts_condensed_multipliers():
    """Removal by active-position shifts u left past the removed slot and
    zero-fills (ref: DualSolver.cpp:237-244)."""
    pb = _pb()
    rng = np.random.default_rng(3)
    st = initial_state(N, M, jnp.float64)
    for i, (idx, stat) in enumerate([(3, E), (5, UB), (2, L), (1, U)]):
        st = d_eng._apply_add(pb, st, jnp.asarray(rng.standard_normal(N)),
                              jnp.asarray(idx), stat)
    u = jnp.asarray([10.0, 20.0, 30.0, 40.0, 0.0])
    st = dense_replace(st, u=u)
    st = d_eng._apply_remove(pb, st, jnp.asarray(1), st.u)
    np.testing.assert_array_equal(np.asarray(st.u), [10.0, 30.0, 40.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(st.aorder), [3, 2, 1, -1])


def dense_replace(st, **kw):
    import dataclasses

    return dataclasses.replace(st, **kw)


def test_warm_start_reconstruction_from_status_vector():
    """An ActiveSet must be reconstructible from a status vector alone
    (ref: ActiveSet.cpp:17-29): solve, take active_set, re-process it, and
    check the rebuilt (status, q) match the packed replay."""
    from jrlqp_tpu import SolverOptions, solve
    from jrlqp_tpu.solver.warm_start import _process_initial_active_set

    pb = _pb()
    res = solve(pb, SolverOptions())
    status, aorder, q, over = _process_initial_active_set(
        pb, res.active_set, SolverOptions(warm_start=True))
    assert not bool(over)
    np.testing.assert_array_equal(np.asarray(status),
                                  np.asarray(res.active_set))
    # every rebuilt active index appears exactly once in the order list
    act = np.nonzero(np.asarray(res.active_set))[0]
    got = np.sort(np.asarray(aorder)[:int(q)])
    np.testing.assert_array_equal(got, np.sort(act))
