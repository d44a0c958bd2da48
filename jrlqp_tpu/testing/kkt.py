"""KKT optimality checkers -- the acceptance oracle of the whole project.

JAX re-implementation of the reference checkers
(ref: include/jrl-qp/test/kkt.h:73-145, src/test/kkt.cpp:14-196), written
batched-first: every function accepts a single problem or, through vmap,
a stacked batch. Also provides a *continuous* residual (`kkt_residual`)
used by the benchmarks (per-problem KKT residual <= 1e-8 target).

Multiplier convention (matching the reference and the solver's external
output): u[:m] are the general-constraint multipliers, u[m:] the bound
multipliers; negative at active lower bounds, positive at active upper
bounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problems import QPProblem

__all__ = [
    "check_kkt",
    "check_kkt_stationarity",
    "check_kkt_feasibility",
    "kkt_residual",
]

DEFAULT_TAU = 1e-6  # ref: kkt.h defaults tau_p = tau_d = 1e-6


def _check_constraint(cx, bl, bu, u, tau_x, tau_u):
    """Per-constraint trichotomy (ref: kkt.cpp:14-22):
    (1) active lower: |cx-bl| <= tau_x and u <= -tau_u
    (2) inactive:     bl-tau_x <= cx <= bu+tau_x and |u| <= tau_u
    (3) active upper: |cx-bu| <= tau_x and u >= tau_u
    Infinite bounds make their side's activity case impossible and the
    inactive case trivially satisfied, as in the reference arithmetic.
    """
    li = cx - bl
    ui = cx - bu
    b1 = (jnp.abs(li) <= tau_x) & (u <= -tau_u)
    b2 = (li >= -tau_x) & (ui <= tau_x) & (jnp.abs(u) <= tau_u)
    b3 = (jnp.abs(ui) <= tau_x) & (u >= tau_u)
    return b1 | b2 | b3


def check_kkt_stationarity(x, u, pb: QPProblem, tau_d: float = DEFAULT_TAU):
    """|G x + a + C^T u_c + u_b|_inf <= tau_d (1 + |u|_inf)
    (ref: kkt.cpp:111-142)."""
    m = pb.m
    tau_u = tau_d * (1 + jnp.max(jnp.abs(u)))
    dL = pb.G @ x + pb.a + pb.C.T @ u[:m] + u[m:]
    return jnp.max(jnp.abs(dL)) <= tau_u


def check_kkt_feasibility(x, u, pb: QPProblem, tau_p: float = DEFAULT_TAU,
                         tau_d: float = DEFAULT_TAU):
    """Per-constraint trichotomy with scaled tolerances
    (ref: kkt.cpp:152-186)."""
    m = pb.m
    tau_x = tau_p * (1 + jnp.max(jnp.abs(x)))
    tau_u = tau_d * (1 + jnp.max(jnp.abs(u)))
    cx = pb.C @ x
    ok_c = _check_constraint(cx, pb.l, pb.u, u[:m], tau_x, tau_u)
    ok_b = _check_constraint(x, pb.xl, pb.xu, u[m:], tau_x, tau_u)
    return jnp.all(ok_c) & jnp.all(ok_b)


def check_kkt(x, u, pb: QPProblem, tau_p: float = DEFAULT_TAU,
             tau_d: float = DEFAULT_TAU):
    """Stationarity + feasibility (ref: kkt.cpp:87-103)."""
    return check_kkt_stationarity(x, u, pb, tau_d) & check_kkt_feasibility(
        x, u, pb, tau_p, tau_d
    )


def kkt_residual(x, u, pb: QPProblem):
    """Continuous scaled KKT residual: max of
    - stationarity residual   |Gx + a + C^T u_c + u_b|_inf / (1 + |u|_inf)
    - primal infeasibility    max violation of l <= Cx <= u, xl <= x <= xu,
                              scaled by 1 + |x|_inf
    - complementarity         |u_i| * dist_to_nearest_active_bound, scaled.
    This is the benchmark metric (BASELINE.md: per-problem KKT residual).
    """
    m = pb.m
    xs = 1 + jnp.max(jnp.abs(x))
    us = 1 + jnp.max(jnp.abs(u))
    dL = pb.G @ x + pb.a + pb.C.T @ u[:m] + u[m:]
    r_stat = jnp.max(jnp.abs(dL)) / us

    cx = pb.C @ x
    viol_c = jnp.maximum(pb.l - cx, cx - pb.u)
    viol_b = jnp.maximum(pb.xl - x, x - pb.xu)
    r_feas = jnp.maximum(jnp.max(viol_c), jnp.max(viol_b))
    r_feas = jnp.maximum(r_feas, 0.0) / xs

    # complementarity: multiplier must vanish away from its active side
    def comp(cv, bl, bu, ui):
        # distance to lower when u < 0, to upper when u > 0
        dl = jnp.abs(cv - bl)
        du = jnp.abs(cv - bu)
        d = jnp.where(ui < 0, dl, du)
        d = jnp.where(jnp.isfinite(d), d, jnp.inf)  # inf bound can't be active
        return jnp.abs(ui) * jnp.minimum(d, 1.0)

    r_comp = jnp.maximum(
        jnp.max(comp(cx, pb.l, pb.u, u[:m])),
        jnp.max(comp(x, pb.xl, pb.xu, u[m:])),
    ) / (us * xs)
    return jnp.maximum(jnp.maximum(r_stat, r_feas), r_comp)
