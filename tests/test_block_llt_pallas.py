"""Differential tests: Pallas fused block-LLT kernels vs the XLA blocked
versions (which are themselves tested against dense oracles, mirroring the
reference's decomposition test strategy, ref: tests/triBlockDiagLLTTest.cpp
and tests/blockArrowLLTTest.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrlqp_tpu.ops.pallas.block_llt import (
    block_arrow_llt_pallas,
    block_arrow_solve_pallas,
    tri_block_llt_pallas,
    tri_block_solve_pallas,
)
from jrlqp_tpu.structured.blocks import (
    block_arrow_l_solve,
    block_arrow_llt,
    block_arrow_lt_solve,
    tri_block_diag_llt,
    tri_block_l_solve,
    tri_block_lt_solve,
)


def _spd_blocks(rng, B, nb, s):
    diag = np.zeros((B, nb, s, s))
    off = rng.standard_normal((B, nb - 1, s, s))
    for b in range(B):
        for i in range(nb):
            A = rng.standard_normal((s, s))
            diag[b, i] = A @ A.T + nb * s * np.eye(s)
    return jnp.asarray(diag, jnp.float32), jnp.asarray(off, jnp.float32)


@pytest.mark.parametrize("nb,s", [(3, 8), (5, 16)])
def test_tri_llt_matches_xla(nb, s):
    rng = np.random.default_rng(0)
    diag, off = _spd_blocks(rng, 2, nb, s)
    Ld_p, Lo_p, Li_p = tri_block_llt_pallas(diag, off, interpret=True)
    Ld_x, Lo_x = jax.vmap(tri_block_diag_llt)(diag, off)
    np.testing.assert_allclose(np.asarray(Ld_p), np.asarray(Ld_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Lo_p), np.asarray(Lo_x),
                               atol=1e-4, rtol=1e-4)
    # Linv blocks really invert the diagonal factors
    eye = np.eye(s, dtype=np.float32)
    prod = np.asarray(Li_p) @ np.asarray(Ld_p)
    np.testing.assert_allclose(prod, np.broadcast_to(eye, prod.shape),
                               atol=1e-4)


def test_tri_solve_matches_xla():
    nb, s, k = 4, 8, 5
    rng = np.random.default_rng(1)
    diag, off = _spd_blocks(rng, 2, nb, s)
    r = jnp.asarray(rng.standard_normal((2, nb, s, k)), jnp.float32)
    _, Lo_p, Li_p = tri_block_llt_pallas(diag, off, interpret=True)
    y_p = tri_block_solve_pallas(Lo_p, Li_p, r, interpret=True)
    Ld_x, Lo_x = jax.vmap(tri_block_diag_llt)(diag, off)
    y_x = jax.vmap(tri_block_lt_solve)(
        Ld_x, Lo_x, jax.vmap(tri_block_l_solve)(Ld_x, Lo_x, r))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-4, rtol=1e-3)
    # lower_only variant = L^{-1} r
    yl_p = tri_block_solve_pallas(Lo_p, Li_p, r, interpret=True,
                                  lower_only=True)
    yl_x = jax.vmap(tri_block_l_solve)(Ld_x, Lo_x, r)
    np.testing.assert_allclose(np.asarray(yl_p), np.asarray(yl_x),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("up", [False, True])
def test_arrow_llt_and_solve_match_xla(up):
    nb, s, k = 4, 8, 3
    rng = np.random.default_rng(2)
    diag, off = _spd_blocks(rng, 2, nb, s)
    # make the coupled diagonal block dominant enough after the Schur step
    diag = diag.at[:, -1].add(nb * s * jnp.eye(s, dtype=jnp.float32))
    diag = diag.at[:, 0].add(nb * s * jnp.eye(s, dtype=jnp.float32))
    r = jnp.asarray(rng.standard_normal((2, nb, s, k)), jnp.float32)

    Ld_p, Lo_p, Li_p = block_arrow_llt_pallas(diag, off, up=up,
                                              interpret=True)
    Ld_x, Lo_x = jax.vmap(lambda d, o: block_arrow_llt(d, o, up=up))(
        diag, off)
    np.testing.assert_allclose(np.asarray(Ld_p), np.asarray(Ld_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Lo_p), np.asarray(Lo_x),
                               atol=1e-4, rtol=1e-4)

    y_p = block_arrow_solve_pallas(Lo_p, Li_p, r, up=up, interpret=True)
    y_x = jax.vmap(lambda Ld, Lo, ri: block_arrow_lt_solve(
        Ld, Lo, block_arrow_l_solve(Ld, Lo, ri, up=up), up=up))(
        Ld_x, Lo_x, r)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("pack,B", [(2, 3), (4, 1), (2, 4)])
def test_tri_llt_packed_matches_xla(pack, B):
    """Pack > 1 (including batch padding when B % pack != 0) must match."""
    nb, s = 3, 8
    rng = np.random.default_rng(7)
    diag, off = _spd_blocks(rng, B, nb, s)
    Ld_p, Lo_p, Li_p = tri_block_llt_pallas(diag, off, interpret=True,
                                            pack=pack)
    Ld_x, Lo_x = jax.vmap(tri_block_diag_llt)(diag, off)
    np.testing.assert_allclose(np.asarray(Ld_p), np.asarray(Ld_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Lo_p), np.asarray(Lo_x),
                               atol=1e-4, rtol=1e-4)
    r = jnp.asarray(rng.standard_normal((B, nb, s, 4)), jnp.float32)
    y_p = tri_block_solve_pallas(Lo_p, Li_p, r, interpret=True, pack=pack)
    y_x = jax.vmap(tri_block_lt_solve)(
        Ld_x, Lo_x, jax.vmap(tri_block_l_solve)(Ld_x, Lo_x, r))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("up", [False, True])
def test_arrow_packed_matches_xla(up):
    nb, s, k, B, pack = 4, 8, 3, 5, 2
    rng = np.random.default_rng(8)
    diag, off = _spd_blocks(rng, B, nb, s)
    diag = diag.at[:, -1].add(nb * s * jnp.eye(s, dtype=jnp.float32))
    diag = diag.at[:, 0].add(nb * s * jnp.eye(s, dtype=jnp.float32))
    r = jnp.asarray(rng.standard_normal((B, nb, s, k)), jnp.float32)
    Ld_p, Lo_p, Li_p = block_arrow_llt_pallas(diag, off, up=up,
                                              interpret=True, pack=pack)
    Ld_x, Lo_x = jax.vmap(lambda d, o: block_arrow_llt(d, o, up=up))(
        diag, off)
    np.testing.assert_allclose(np.asarray(Ld_p), np.asarray(Ld_x),
                               atol=1e-4, rtol=1e-4)
    y_p = block_arrow_solve_pallas(Lo_p, Li_p, r, up=up, interpret=True,
                                   pack=pack)
    y_x = jax.vmap(lambda Ld, Lo, ri: block_arrow_lt_solve(
        Ld, Lo, block_arrow_l_solve(Ld, Lo, ri, up=up), up=up))(
        Ld_x, Lo_x, r)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-4, rtol=1e-3)
