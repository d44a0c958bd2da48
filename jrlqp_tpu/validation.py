"""Problem input validation.

Analog of the reference's ``wellFormed()`` problem validators
(ref: include/jrl-qp/test/problems.h:16-146) and the solver entry
dimension asserts (ref: src/GoldfarbIdnaniSolver.cpp:30-39). Two layers:

- :func:`well_formed` -- a HOST-side checker (numpy, not traced) for use
  at problem-construction time: shape coherence, symmetry, finiteness,
  bound ordering. Returns (ok, list of human-readable findings).
- :func:`inconsistent_mask` -- a TRACED per-problem predicate used by the
  solvers when ``SolverOptions.validate`` is set: lanes with l > u,
  xl > xu, or non-finite G/a/C terminate immediately with
  ``INCONSISTENT_INPUT`` (``types.py`` status 1, which the reference
  defines but the solvers there never produce -- here it is reachable).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .problems import QPProblem

__all__ = ["well_formed", "inconsistent_mask"]


def well_formed(pb: QPProblem, check_symmetry: bool = True,
                sym_tol: float = 1e-12):
    """Host-side structural validation of a (single, unbatched) problem.

    Returns ``(ok, findings)``; ``findings`` is a list of strings, empty
    when ok. Does not check positive definiteness (that is the solver's
    runtime NON_POS_HESSIAN detection, as in the reference's LLT failure
    path, ref src/GoldfarbIdnaniSolver.cpp:58-61).
    """
    findings: list[str] = []
    G = np.asarray(pb.G)
    a = np.asarray(pb.a)
    C = np.asarray(pb.C)
    l = np.asarray(pb.l)
    u = np.asarray(pb.u)
    xl = np.asarray(pb.xl)
    xu = np.asarray(pb.xu)

    if G.ndim != 2 or G.shape[0] != G.shape[1]:
        findings.append(f"G must be square 2-D, got {G.shape}")
        return False, findings
    n = G.shape[0]
    if a.shape != (n,):
        findings.append(f"a must have shape ({n},), got {a.shape}")
    if C.ndim != 2 or C.shape[1] != n:
        findings.append(f"C must have shape (m, {n}), got {C.shape}")
    m = C.shape[0] if C.ndim == 2 else 0
    for name, v, dim in (("l", l, m), ("u", u, m), ("xl", xl, n),
                         ("xu", xu, n)):
        if v.shape != (dim,):
            findings.append(f"{name} must have shape ({dim},), got {v.shape}")
    if findings:
        return False, findings

    if not np.all(np.isfinite(G)):
        findings.append("G has non-finite entries")
    elif check_symmetry:
        asym = float(np.max(np.abs(G - G.T)))
        scale = max(1.0, float(np.max(np.abs(G))))
        if asym > sym_tol * scale:
            findings.append(f"G is not symmetric (max |G-G'| = {asym:g})")
    if not np.all(np.isfinite(a)):
        findings.append("a has non-finite entries")
    if not np.all(np.isfinite(C)):
        findings.append("C has non-finite entries")
    for name, lo, hi in (("l/u", l, u), ("xl/xu", xl, xu)):
        if np.any(np.isnan(lo)) or np.any(np.isnan(hi)):
            findings.append(f"{name} contains NaN")
        elif np.any(lo > hi):
            k = int(np.argmax(lo > hi))
            findings.append(
                f"{name} inverted at index {k}: {lo[k]!r} > {hi[k]!r}")
    return not findings, findings


def inconsistent_mask(pb: QPProblem):
    """Traced scalar bool: True when this problem's data is inconsistent
    (inverted or NaN bounds, non-finite G/a/C). vmap over a batch for a
    per-lane mask. Cheap: one pass of elementwise reductions."""
    bad_bounds = (
        jnp.any(pb.l > pb.u) | jnp.any(pb.xl > pb.xu)
        | jnp.any(jnp.isnan(pb.l)) | jnp.any(jnp.isnan(pb.u))
        | jnp.any(jnp.isnan(pb.xl)) | jnp.any(jnp.isnan(pb.xu))
    )
    bad_data = (
        ~jnp.all(jnp.isfinite(pb.G)) | ~jnp.all(jnp.isfinite(pb.a))
        | ~jnp.all(jnp.isfinite(pb.C))
    )
    return bad_bounds | bad_data
