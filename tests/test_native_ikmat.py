"""Native C++ IKmat reader vs the Python reader (differential).

The reference reads these fixtures with C++ (tests/IKmatReader.cpp); the
native reader (native/ikmat_reader.cpp) is this framework's runtime
equivalent, with the Python reader as the semantic oracle.
"""
import os

import numpy as np
import pytest

from jrlqp_tpu.io import native
from jrlqp_tpu.io.ikmat import IKProblem, read_ik_pb, read_mat, write_ik_pb

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

MULTI_IK = os.environ.get("MULTI_IK_ZIP", "/root/reference/tests/MultiIK.zip")


def _random_pb(rng, n, me, mi):
    return IKProblem(
        Q=rng.standard_normal((n, n)), c=rng.standard_normal(n),
        A=rng.standard_normal((me, n)) if me else np.zeros((0, n)),
        b=rng.standard_normal(me) if me else np.zeros((0,)),
        C=rng.standard_normal((mi, n)) if mi else np.zeros((0, n)),
        d=rng.standard_normal(mi) if mi else np.zeros((0,)),
        x_min=-np.abs(rng.standard_normal(n)),
        x_max=np.abs(rng.standard_normal(n)),
    )


@pytest.mark.parametrize("dims", [(5, 2, 3), (4, 0, 2), (3, 2, 0), (2, 0, 0)])
def test_ikpb_native_matches_python(tmp_path, dims):
    """Round-trip through write_ik_pb, parse with both readers, compare --
    including the 0-row sections that still consume a payload line."""
    rng = np.random.default_rng(sum(dims))
    pb = _random_pb(rng, *dims)
    p = tmp_path / "pb.txt"
    write_ik_pb(p, pb)
    text = p.read_text()
    py = read_ik_pb(str(p))
    nat = native.parse_ikpb_native(text)
    for f in ("Q", "c", "A", "b", "C", "d", "x_min", "x_max"):
        np.testing.assert_array_equal(getattr(py, f), getattr(nat, f),
                                      err_msg=f)


def test_mat_native_matches_python(tmp_path):
    rng = np.random.default_rng(3)
    M = rng.standard_normal((7, 4))
    p = tmp_path / "m.txt"
    p.write_text("\n".join(" ".join(f"{v:.17g}" for v in row) for row in M)
                 + "\n")
    np.testing.assert_array_equal(read_mat(str(p)),
                                  native.parse_mat_native(p.read_text()))
    # single column
    np.testing.assert_array_equal(
        native.parse_mat_native("1.5\n2.5\n"), [[1.5], [2.5]])


def test_ikpb_native_error_on_malformed():
    with pytest.raises(ValueError):
        native.parse_ikpb_native("garbage\n")
    with pytest.raises(ValueError):
        native.parse_mat_native("1 2\n3\n")  # ragged


@pytest.mark.skipif(not os.path.exists(MULTI_IK),
                    reason="MultiIK.zip not available")
def test_native_reads_real_fixture():
    """Both readers agree on the real 210-var Simultaneous-IK fixture."""
    import io as _io
    import zipfile

    zf = zipfile.ZipFile(MULTI_IK)
    member = next(m for m in zf.namelist()
                  if os.path.basename(m) == "arrowAllData.txt")
    text = zf.read(member).decode()
    py = read_ik_pb(_io.StringIO(text))
    nat = native.parse_ikpb_native(text)
    assert nat.n == py.n == 210
    for f in ("Q", "c", "A", "b", "C", "d", "x_min", "x_max"):
        np.testing.assert_array_equal(getattr(py, f), getattr(nat, f))
