"""Native C++ QPS parser vs the Python parser: identical output on the same
inputs (differential test), same error contract on malformed input."""
import numpy as np
import pytest

from jrlqp_tpu.io import parse_qps
from jrlqp_tpu.io import native
from tests.test_qps import QPTEST

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser not built"
)


def _assert_same(d_py, d_nat):
    assert d_py.n == d_nat.n and d_py.m == d_nat.m
    for field in ("G", "a", "C", "l", "u", "xl", "xu"):
        np.testing.assert_array_equal(
            getattr(d_py, field), getattr(d_nat, field), err_msg=field
        )
    assert d_py.objcst == d_nat.objcst
    assert d_py.n_eq == d_nat.n_eq
    assert d_py.use_bounds == d_nat.use_bounds
    assert d_py.has_fixed_variables == d_nat.has_fixed_variables
    assert d_py.name == d_nat.name


def test_native_matches_python_qptest():
    _assert_same(parse_qps(QPTEST), native.parse_qps_native(QPTEST))


def test_native_matches_python_ranges_bounds():
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
    rhs       obj       -2.5
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
    _assert_same(parse_qps(text), native.parse_qps_native(text))


def test_native_error_on_garbage():
    with pytest.raises(ValueError, match="unknown section"):
        native.parse_qps_native("GARBAGE\n foo\n")


def test_native_error_on_unknown_row():
    bad = QPTEST.replace("    c1        r1        2.0", "    c1        rX        2.0")
    with pytest.raises(ValueError):
        native.parse_qps_native(bad)
    with pytest.raises(ValueError):
        parse_qps(bad)
