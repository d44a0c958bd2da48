"""MultiIK robotics fixtures (ref: tests/BlockGISolverTest.in.cpp:172-351).

The reader implements the reference's fixture format
(tests/IKmatReader.cpp); the real archive ships with the reference test
suite and is located at runtime — tests skip when it is absent, the same
opt-in pattern the reference uses for the QPS corpus.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.io.ikmat import (
    IKProblem,
    open_multi_ik,
    read_ik_pb,
    write_ik_pb,
)
from jrlqp_tpu.problems import QPProblem
from jrlqp_tpu.solver.fast import solve_refined
from jrlqp_tpu.testing.kkt import kkt_residual

MULTI_IK = os.environ.get(
    "MULTI_IK_ZIP", "/root/reference/tests/MultiIK.zip")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(MULTI_IK), reason="MultiIK.zip not available")


def test_ik_pb_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    n, me, mi = 7, 2, 4
    A0 = rng.standard_normal((n, n))
    pb = IKProblem(
        Q=A0 @ A0.T + n * np.eye(n),
        c=rng.standard_normal(n),
        A=rng.standard_normal((me, n)), b=rng.standard_normal(me),
        C=rng.standard_normal((mi, n)), d=rng.standard_normal(mi),
        x_min=np.full(n, -2.0), x_max=np.full(n, 2.0),
    )
    path = tmp_path / "ik.txt"
    write_ik_pb(path, pb)
    back = read_ik_pb(str(path))
    for f in ("Q", "c", "A", "b", "C", "d", "x_min", "x_max"):
        np.testing.assert_array_equal(getattr(back, f), getattr(pb, f))


def _qp_from_arrays(arrs, big=1e100):
    clean = lambda v, s: np.nan_to_num(  # noqa: E731
        np.asarray(v, float), posinf=s * big, neginf=-s * big)
    return QPProblem(
        G=jnp.asarray(arrs["G"]), a=jnp.asarray(arrs["a"]),
        C=jnp.asarray(arrs["C"]),
        l=jnp.asarray(np.where(np.isneginf(arrs["l"]), -big, arrs["l"])),
        u=jnp.asarray(np.where(np.isposinf(arrs["u"]), big, arrs["u"])),
        xl=jnp.asarray(np.where(np.isneginf(arrs["xl"]), -big, arrs["xl"])),
        xu=jnp.asarray(np.where(np.isposinf(arrs["xu"]), big, arrs["xu"])),
    )


@needs_fixture
def test_sequential_ik_tri_block():
    """9-robot 43-dof sequential IK (ref 'Sequential IK' test): solve the
    387-var/1621-cstr QP and match the stored solution to 1e-4 (the files'
    own precision), plus the tri-block LLT against the dense factor."""
    d = open_multi_ik(MULTI_IK)
    G = d["triBlockDiag_G"]
    C = d["triBlockDiag_C"]            # file stores (m, n) = our convention
    a = d["triBlockDiag_a"].ravel()
    ub = d["triBlockDiag_u"].ravel()
    x_ref = d["triBlockDiag_sol"].ravel()
    n, m = G.shape[0], C.shape[0]
    assert (n, m) == (387, 1621)
    big = 1e100
    pb = QPProblem(
        G=jnp.asarray(G), a=jnp.asarray(a), C=jnp.asarray(C),
        l=jnp.full((m,), -big), u=jnp.asarray(ub),
        xl=jnp.full((n,), -big), xu=jnp.full((n,), big),
    )
    res = solve_refined(pb, SolverOptions(max_iter=500))
    assert int(res.status) == 0
    assert float(jnp.max(jnp.abs(res.x - x_ref))) <= 1e-4
    resid = float(kkt_residual(res.x, res.multipliers, pb))
    assert resid <= 1e-8, resid

    # structured LLT vs dense factor on the same 9 x 43-dof tri-block G
    from jrlqp_tpu.structured.blocks import tri_block_diag_llt
    s = 43
    diag = jnp.stack([G[i * s:(i + 1) * s, i * s:(i + 1) * s]
                      for i in range(9)])
    off = jnp.stack([G[(i + 1) * s:(i + 2) * s, i * s:(i + 1) * s]
                     for i in range(8)])
    Ld, Lo = tri_block_diag_llt(diag, off)
    Lfull = np.linalg.cholesky(G)
    for i in range(9):
        np.testing.assert_allclose(
            np.asarray(Ld[i]),
            Lfull[i * s:(i + 1) * s, i * s:(i + 1) * s], atol=1e-8)


@needs_fixture
def test_simultaneous_ik_arrow():
    """5-robot 42-dof simultaneous IK (ref 'Simultaneous IK' test): parse the
    composite problem file and solve to <=1e-8 KKT residual."""
    d = open_multi_ik(MULTI_IK)
    ik = d["arrowAllData"]
    assert ik.n == 210 and ik.C.shape == (25, 210)
    pb = _qp_from_arrays(ik.qp_arrays())
    res = solve_refined(pb, SolverOptions(max_iter=400))
    assert int(res.status) == 0
    resid = float(kkt_residual(res.x, res.multipliers, pb))
    assert resid <= 1e-8, resid
