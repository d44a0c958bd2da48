"""QPS reader tests (ref: tests/QPSReader.cpp semantics), using synthesized
QPS text, including the reference's qptest example problem (the Maros-
Meszaros 'qptest' instance is the standard QPS-format example)."""
import numpy as np
import jax.numpy as jnp

from jrlqp_tpu import QPProblem, SolverOptions, TerminationStatus, solve
from jrlqp_tpu.io import default_subset, parse_qps
from jrlqp_tpu.io.maros_meszaros import MAROS_MESZAROS
from jrlqp_tpu.testing import check_kkt

# The standard QPS example (documented in the QPS format references the
# reference cites in QPSReader.h): min 1.5 x1 - 2 x2 + 0.5 (8 x1^2 +
# 2 x1 x2 + 2 x2 x1 + 10 x2^2) s.t. 2 x1 + x2 >= 2, -x1 + 2 x2 <= 6,
# 0 <= x1 <= 20, 0 <= x2; optimum f* = 4.3718750 (the Maros-Meszaros
# 'qptest' instance).
QPTEST = """\
NAME          QPexample
ROWS
 N  obj
 G  r1
 L  r2
COLUMNS
    c1        r1        2.0   r2        -1.0
    c1        obj       1.5
    c2        r1        1.0   r2        2.0
    c2        obj       -2.0
RHS
    rhs1      r1        2.0   r2        6.0
RANGES
BOUNDS
 UP BND       c1        20.0
QUADOBJ
    c1        c1        8.0
    c1        c2        2.0
    c2        c2        10.0
ENDATA
"""


def test_parse_qptest():
    d = parse_qps(QPTEST)
    assert d.name == "QPexample"
    assert d.n == 2 and d.m == 2
    np.testing.assert_allclose(d.G, [[8.0, 2.0], [2.0, 10.0]])
    np.testing.assert_allclose(d.a, [1.5, -2.0])
    np.testing.assert_allclose(d.C, [[2.0, 1.0], [-1.0, 2.0]])
    np.testing.assert_allclose(d.l, [2.0, -np.inf])
    np.testing.assert_allclose(d.u, [np.inf, 6.0])
    np.testing.assert_allclose(d.xl, [0.0, 0.0])
    np.testing.assert_allclose(d.xu, [20.0, np.inf])
    assert d.objcst == 0.0


def test_objective_constant_from_rhs():
    """An RHS entry on the objective row is the negated constant term
    (ref: QPSReader.cpp:414)."""
    text = QPTEST.replace(
        "    rhs1      r1        2.0   r2        6.0",
        "    rhs1      r1        2.0   r2        6.0\n"
        "    rhs1      obj       -4.0",
    )
    d = parse_qps(text)
    assert d.objcst == 4.0


def test_solve_qptest_matches_fstar():
    """Solving the parsed problem must hit the published f* = 4.3718750
    (ref: QPSProblems.h 'qptest' row)."""
    d = parse_qps(QPTEST)
    pb = QPProblem(
        G=jnp.asarray(d.G), a=jnp.asarray(d.a), C=jnp.asarray(d.C),
        l=jnp.asarray(d.l), u=jnp.asarray(d.u),
        xl=jnp.asarray(d.xl), xu=jnp.asarray(d.xu),
    )
    res = solve(pb, SolverOptions())
    assert int(res.status) == int(TerminationStatus.SUCCESS)
    assert bool(check_kkt(res.x, res.multipliers, pb))
    fstar = next(e.fstar for e in MAROS_MESZAROS if e.name == "qptest")
    np.testing.assert_allclose(float(res.f) + d.objcst, fstar, rtol=1e-6)


def test_ranges_and_bounds():
    text = """\
NAME          rngtest
ROWS
 N  obj
 E  e1
 L  l1
 G  g1
COLUMNS
    x         e1        1.0   l1        1.0
    x         g1        1.0   obj       1.0
    y         e1        1.0
RHS
    rhs       e1        3.0   l1        5.0
    rhs       g1        1.0
RANGES
    rng       e1        2.0   l1        4.0
    rng       g1        4.0
BOUNDS
 MI BND       x
 FX BND       y         1.5
QUADOBJ
    x         x         1.0
    y         y         1.0
ENDATA
"""
    d = parse_qps(text)
    # E with positive range -> [rhs, rhs+2]; L -> [u-4, u]; G -> [l, l+4]
    np.testing.assert_allclose(d.l, [3.0, 1.0, 1.0])
    np.testing.assert_allclose(d.u, [5.0, 5.0, 5.0])
    np.testing.assert_allclose(d.xl, [-np.inf, 1.5])
    np.testing.assert_allclose(d.xu, [np.inf, 1.5])
    assert d.has_fixed_variables


def test_default_subset_matches_reference_filters():
    """cond <= 1e8, nbVar <= 500, nbCstr <= 1000, 3 exclusions
    (ref: GoldfarbIdnaniSolverTest.cpp:233-274)."""
    sub = default_subset()
    names = {e.name for e in sub}
    assert "qptest" in names
    assert "hs21" in names
    assert "cvxqp1_s" not in names  # cond 1.34e17 > 1e8
    assert "qpcboei1" not in names  # excluded
    assert "boyd1" not in names  # nbVar too large
    for e in sub:
        assert e.cond <= 1e8 and e.nb_var <= 500 and e.nb_cstr <= 1000
