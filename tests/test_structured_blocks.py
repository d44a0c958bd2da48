"""Decomposition kernels vs dense oracles
(ref: tests/triBlockDiagLLTTest.cpp, tests/blockArrowLLTTest.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrlqp_tpu.structured.blocks import (
    block_arrow_l_solve,
    block_arrow_llt,
    block_arrow_lt_solve,
    block_arrow_to_dense,
    tri_block_diag_llt,
    tri_block_l_solve,
    tri_block_lt_solve,
    tri_block_to_dense,
)


def _rand_spd_blocks(rng, nb, s, arrow=False):
    """Random SPD matrix with the requested block sparsity: build dense SPD
    then zero outside the pattern while keeping SPD via diagonal dominance."""
    diag = np.zeros((nb, s, s))
    off = np.zeros((nb - 1, s, s))
    for i in range(nb):
        A = rng.standard_normal((s, s))
        diag[i] = A @ A.T + (s * nb) * np.eye(s)
    for i in range(nb - 1):
        off[i] = rng.standard_normal((s, s))
    return jnp.asarray(diag), jnp.asarray(off)


@pytest.mark.parametrize("nb,s", [(3, 2), (4, 3), (2, 5)])
def test_tri_block_diag_llt_vs_dense(nb, s):
    rng = np.random.default_rng(nb * 10 + s)
    diag, sub = _rand_spd_blocks(rng, nb, s)
    M = tri_block_to_dense(diag, sub)
    L_ref = np.linalg.cholesky(np.asarray(M))

    Ld, Ls = jax.jit(tri_block_diag_llt)(diag, sub)
    n = nb * s
    L = np.zeros((n, n))
    for i in range(nb):
        L[i * s:(i + 1) * s, i * s:(i + 1) * s] = Ld[i]
    for i in range(nb - 1):
        L[(i + 1) * s:(i + 2) * s, i * s:(i + 1) * s] = Ls[i]
    np.testing.assert_allclose(L, L_ref, atol=1e-10)

    # solves vs dense triangular solves, incl. zero-padded rhs patterns
    # (the reference sweeps all (start, end) windows; masking makes the
    # fixed-shape solve exact for any zero pattern, spot-check a few)
    for start, end in [(0, nb), (1, nb), (0, nb - 1), (1, nb - 1)]:
        r = rng.standard_normal((nb, s))
        r[:start] = 0.0
        r[end:] = 0.0
        rj = jnp.asarray(r)
        y = tri_block_l_solve(Ld, Ls, rj)
        y_ref = np.linalg.solve(L_ref, r.reshape(n))
        np.testing.assert_allclose(np.asarray(y).reshape(n), y_ref, atol=1e-10)
        z = tri_block_lt_solve(Ld, Ls, rj)
        z_ref = np.linalg.solve(L_ref.T, r.reshape(n))
        np.testing.assert_allclose(np.asarray(z).reshape(n), z_ref, atol=1e-10)


@pytest.mark.parametrize("nb,s", [(3, 2), (4, 3)])
@pytest.mark.parametrize("up", [False, True])
def test_block_arrow_llt_vs_dense(nb, s, up):
    rng = np.random.default_rng(nb * 100 + s + int(up))
    diag, side = _rand_spd_blocks(rng, nb, s)
    M = block_arrow_to_dense(diag, side, up=up)
    M_np = np.asarray(M)
    # oracle: solve with dense cholesky
    Ld, Lside = jax.jit(lambda d, o: block_arrow_llt(d, o, up=up))(diag, side)

    n = nb * s
    r = rng.standard_normal((nb, s))
    rj = jnp.asarray(r)
    # full solve M^{-1} r == Lt_solve(L_solve(r))
    y = block_arrow_l_solve(Ld, Lside, rj, up=up)
    x = block_arrow_lt_solve(Ld, Lside, y, up=up)
    x_ref = np.linalg.solve(M_np, r.reshape(n))
    np.testing.assert_allclose(np.asarray(x).reshape(n), x_ref, atol=1e-9)


def test_tri_block_batched():
    """Factorizations vmap across a batch of problems."""
    rng = np.random.default_rng(0)
    batch = 4
    nb, s = 3, 2
    diags, subs = [], []
    for _ in range(batch):
        d, o = _rand_spd_blocks(rng, nb, s)
        diags.append(d)
        subs.append(o)
    diag_b = jnp.stack(diags)
    sub_b = jnp.stack(subs)
    Ld_b, Ls_b = jax.jit(jax.vmap(tri_block_diag_llt))(diag_b, sub_b)
    for k in range(batch):
        Ld, Ls = tri_block_diag_llt(diag_b[k], sub_b[k])
        np.testing.assert_allclose(np.asarray(Ld_b[k]), np.asarray(Ld), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Ls_b[k]), np.asarray(Ls), atol=1e-12)
