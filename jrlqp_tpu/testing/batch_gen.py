"""Device-side batched random QP generation.

The reference generator (src/test/randomProblems.cpp) is host-side and
sequential; benchmarks that need tens of thousands of problems would bottleneck
on it. This module generates *batches* of strictly-convex QPs with a known
feasible interior point directly on device with ``jax.random``, fully
vmapped/jittable. The distribution follows the reference benchmark fixtures
(benchmarks/problemAdaptors.cpp randomized dense QPs: SPD G, random C, bounds
placed around a feasible x0 so that a controlled fraction of constraints is
active at the solution).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..problems import QPProblem

__all__ = ["random_qp_batch"]


@functools.partial(
    jax.jit,
    static_argnames=("batch", "n", "m", "act_frac", "bounds", "double_sided", "dtype"),
)
def random_qp_batch(
    key: jax.Array,
    batch: int,
    n: int,
    m: int,
    act_frac: float = 0.3,
    bounds: bool = False,
    double_sided: bool = True,
    dtype=jnp.float64,
):
    """Batch of strictly-convex dense QPs.

    G = A A^T / n + I (SPD, condition ~O(n)); a random; C random rows; the
    bounds are offsets of C x0 for a random interior x0, with ``act_frac`` of
    the constraints given a tight (likely-active) lower offset. Mirrors the
    spirit of the reference's benchmark fixtures (benchmarks/Solvers.cpp
    randomized size/activity sweeps) without its sequential host generator.
    """

    def one(k):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        A = jax.random.normal(k1, (n, n), dtype)
        G = A @ A.T / n + jnp.eye(n, dtype=dtype)
        a = jax.random.normal(k2, (n,), dtype)
        C = jax.random.normal(k3, (m, n), dtype)
        x0 = jax.random.uniform(k4, (n,), dtype, -1.0, 1.0)
        cx = C @ x0
        off_l = jax.random.uniform(k5, (m,), dtype, 0.01, 1.0)
        off_u = jax.random.uniform(k6, (m,), dtype, 0.01, 1.0)
        # act_frac is a fraction of min(n, m), matching the reference's
        # benchmark fixtures (benchmarks/Solvers.cpp:353 applies the active
        # fraction to min(nVar, nIneq)): more than n constraints active at
        # the solution would be degenerate by construction.
        tight = jnp.arange(m) < int(act_frac * min(n, m))
        # tight rows: l barely below C x0 (often active at the GI solution,
        # which pulls toward the unconstrained optimum)
        l = cx - jnp.where(tight, 0.0, off_l * 3.0)
        u = cx + off_u * 3.0
        inf = jnp.asarray(jnp.inf, dtype)
        if not double_sided:
            u = jnp.full((m,), inf, dtype)
        if bounds:
            xl = x0 - 2.0
            xu = x0 + 2.0
        else:
            xl = jnp.full((n,), -inf, dtype)
            xu = jnp.full((n,), inf, dtype)
        return QPProblem(G=G, a=a, C=C, l=l, u=u, xl=xl, xu=xu,
                         objcst=jnp.zeros((), dtype))

    return jax.vmap(one)(jax.random.split(key, batch))
