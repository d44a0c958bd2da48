"""Specialized solver: min 0.5 |x - x0|^2  s.t.  c^T x >= bl, xl <= x <= xu.

TPU-native re-design of the reference BoxAndSingleConstraintSolver
(ref: src/experimental/BoxAndSingleConstraintSolver.cpp:7-95): the init is
the closed-form clamp x = clip(x0, xl, xu); J becomes a permutation matrix,
R a +/-1 diagonal, and the condensed multipliers the clamp distances -- all
built with vectorized cumulative sums (no factorization). The generic GI
loop then handles at most the single general constraint plus bound swaps.
This is trivially vmappable, which is what BASELINE.json config 2 measures
(1k-problem batches per chip).

Note (matching the reference quirk at :34,59): the reported objective value
is f = 0.5 |x - x0|^2, i.e. the least-squares distance, which differs from
the canonical QP objective 0.5 x'Gx + a'x by the constant 0.5 |x0|^2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..problems import QPProblem
from ..types import LOWER_BOUND, RUNNING, UPPER_BOUND, SolverOptions
from .dense import finalize, run_loop
from .state import GIResult, GIState, initial_state

__all__ = ["solve_box", "box_qp_problem"]


def box_qp_problem(x0, c, bl, xl, xu) -> QPProblem:
    """The equivalent dense QPProblem (G = I, a = -x0) for oracle checks."""
    n = x0.shape[0]
    inf = jnp.asarray(jnp.inf, x0.dtype)
    return QPProblem(
        G=jnp.eye(n, dtype=x0.dtype),
        a=-x0,
        C=c[None, :],
        l=jnp.asarray(bl, x0.dtype)[None] if jnp.ndim(bl) == 0 else bl,
        u=inf[None],
        xl=xl,
        xu=xu,
        objcst=0.5 * jnp.dot(x0, x0),
    )


def box_init_state(x0, c, bl, xl, xu) -> GIState:
    """Closed-form init (ref :46-94): clamp x0 into [xl, xu]; each clamped
    coordinate becomes an active bound with multiplier |x0_i - x_i|; J is a
    permutation (active coordinates in activation order first, free
    coordinates in reverse order last), R a +/-1 diagonal."""
    n = x0.shape[0]
    dt = x0.dtype
    m = 1
    low = x0 < xl
    high = x0 > xu
    clamped = low | high
    x = jnp.clip(x0, xl, xu)

    # activation order = increasing coordinate index among clamped
    csum = jnp.cumsum(clamped.astype(jnp.int32))
    q = csum[-1]
    rank = csum - 1  # rank[i] = active slot of coordinate i (if clamped)
    i_idx = jnp.arange(n)
    # J columns: clamped i -> column rank[i]; free i -> column n - i + q_i - 1
    # with q_i = number of clamped coordinates before i (ref :88).
    q_before = csum - clamped.astype(jnp.int32)
    col = jnp.where(clamped, rank, n - i_idx + q_before - 1)
    J = jnp.zeros((n, n), dt).at[i_idx, col].set(1.0)

    # R diagonal: +1 for lower-bound activations, -1 for upper (ref :68,79)
    rdiag = jnp.ones((n,), dt)
    rdiag = rdiag.at[jnp.where(clamped, rank, n - 1)].set(
        jnp.where(clamped, jnp.where(low, 1.0, -1.0), rdiag[n - 1])
    )
    # slots >= q keep 1 (identity padding); clamped ranks < q by construction
    k = jnp.arange(n)
    rdiag = jnp.where(k < q, rdiag, 1.0)
    R = jnp.diag(rdiag)

    # condensed multipliers in activation order: |x_i - x0_i|
    dist = jnp.abs(x - x0)
    u_head = jnp.zeros((n,), dt).at[jnp.where(clamped, rank, n - 1)].add(
        jnp.where(clamped, dist, 0.0)
    )
    u = jnp.concatenate([u_head, jnp.zeros((1,), dt)])
    f = 0.5 * jnp.dot(x - x0, x - x0)

    # status vector: slot 0 = the general constraint, slots 1.. = bounds
    st_b = jnp.where(
        low, LOWER_BOUND, jnp.where(high, UPPER_BOUND, 0)
    ).astype(jnp.int32)
    status = jnp.concatenate([jnp.zeros((m,), jnp.int32), st_b])
    aorder = jnp.where(
        k < q,
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(clamped, rank, n - 1)]
        .set(jnp.where(clamped, m + i_idx, 0).astype(jnp.int32)),
        -1,
    ).astype(jnp.int32)

    base = initial_state(n, m, dt)
    return GIState(
        x=x, f=f, J=J, R=R, status=status, aorder=aorder, u=u,
        q=q.astype(jnp.int32), it=base.it,
        term=jnp.asarray(RUNNING, jnp.int32), skip1=base.skip1,
        sc_idx=base.sc_idx, sc_status=base.sc_status,
    )


@functools.partial(jax.jit, static_argnames=("opt",))
def solve_box(x0, c, bl, xl, xu, opt: SolverOptions = SolverOptions()) -> GIResult:
    """Solve min 0.5|x-x0|^2 s.t. c'x >= bl, xl <= x <= xu
    (ref: BoxAndSingleConstraintSolver::solve :11-44). Jitted by default."""
    pb = box_qp_problem(x0, c, bl, xl, xu)
    state = box_init_state(x0, c, jnp.asarray(bl, x0.dtype), xl, xu)
    state = run_loop(pb, state, opt)
    return finalize(pb, state)
