"""ctypes binding to the native C++ QPS parser (native/qps_parser.cpp).

The reference's runtime is C++ end to end; in this framework the compute
path is JAX/XLA and the IO/data-loading runtime is native C++. The shared
library is built with ``make -C native`` (auto-built on first use if a
toolchain is present); :func:`available` reports whether the fast path is
usable, and :mod:`jrlqp_tpu.io.qps` falls back to the pure-Python parser
otherwise, with identical semantics (differential-tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["available", "parse_qps_native", "parse_ikpb_native",
           "parse_mat_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libjrlqp_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class _IKPbResultC(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int32),
        ("me", ctypes.c_int32),
        ("mi", ctypes.c_int32),
        ("Q", ctypes.POINTER(ctypes.c_double)),
        ("c", ctypes.POINTER(ctypes.c_double)),
        ("A", ctypes.POINTER(ctypes.c_double)),
        ("b", ctypes.POINTER(ctypes.c_double)),
        ("C", ctypes.POINTER(ctypes.c_double)),
        ("d", ctypes.POINTER(ctypes.c_double)),
        ("xmin", ctypes.POINTER(ctypes.c_double)),
        ("xmax", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char_p),
    ]


class _MatResultC(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int32),
        ("cols", ctypes.c_int32),
        ("data", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char_p),
    ]


class _QPSResultC(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int32),
        ("m", ctypes.c_int32),
        ("n_eq", ctypes.c_int32),
        ("objcst", ctypes.c_double),
        ("G", ctypes.POINTER(ctypes.c_double)),
        ("a", ctypes.POINTER(ctypes.c_double)),
        ("C", ctypes.POINTER(ctypes.c_double)),
        ("l", ctypes.POINTER(ctypes.c_double)),
        ("u", ctypes.POINTER(ctypes.c_double)),
        ("xl", ctypes.POINTER(ctypes.c_double)),
        ("xu", ctypes.POINTER(ctypes.c_double)),
        ("name", ctypes.c_char_p),
        ("error", ctypes.c_char_p),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.qps_parse.restype = ctypes.POINTER(_QPSResultC)
    lib.qps_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.qps_free.restype = None
    lib.qps_free.argtypes = [ctypes.POINTER(_QPSResultC)]
    lib.jrlqp_parse_ikpb.restype = ctypes.POINTER(_IKPbResultC)
    lib.jrlqp_parse_ikpb.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.jrlqp_free_ikpb.restype = None
    lib.jrlqp_free_ikpb.argtypes = [ctypes.POINTER(_IKPbResultC)]
    lib.jrlqp_parse_mat.restype = ctypes.POINTER(_MatResultC)
    lib.jrlqp_parse_mat.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.jrlqp_free_mat.restype = None
    lib.jrlqp_free_mat.argtypes = [ctypes.POINTER(_MatResultC)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_qps_native(text: str, name: str = ""):
    """Parse QPS text with the native parser; returns a
    :class:`jrlqp_tpu.io.qps.QPSData`. Raises ValueError on malformed input
    (same contract as the Python parser)."""
    from .qps import QPSData

    lib = _load()
    if lib is None:
        raise RuntimeError("native QPS parser not available")
    raw = text.encode()
    resp = lib.qps_parse(raw, len(raw))
    try:
        res = resp.contents
        if res.error:
            raise ValueError(res.error.decode())
        n, m = res.n, res.m

        def arr(ptr, *shape):
            count = int(np.prod(shape)) if shape else 0
            if count == 0:
                return np.zeros(shape)
            return np.ctypeslib.as_array(ptr, shape=(count,)).reshape(shape).copy()

        G = arr(res.G, n, n)
        a = arr(res.a, n)
        C = arr(res.C, m, n)
        l = arr(res.l, m)
        u = arr(res.u, m)
        xl = arr(res.xl, n)
        xu = arr(res.xu, n)
        return QPSData(
            name=(res.name.decode() if res.name else "") or name,
            G=G, a=a, C=C, l=l, u=u, xl=xl, xu=xu,
            objcst=float(res.objcst),
            n_eq=int(res.n_eq),
            use_bounds=bool(np.any(xl > -np.inf) or np.any(xu < np.inf)),
            has_fixed_variables=bool(np.any(xl == xu)),
        )
    finally:
        lib.qps_free(resp)


def _as_array(ptr, *shape):
    count = int(np.prod(shape)) if shape else 0
    if count == 0:
        return np.zeros(shape)
    return np.ctypeslib.as_array(ptr, shape=(count,)).reshape(shape).copy()


def parse_ikpb_native(text: str):
    """Parse a composite MultiIK problem file with the native reader
    (native/ikmat_reader.cpp); returns a
    :class:`jrlqp_tpu.io.ikmat.IKProblem`. Same contract as the Python
    reader (differential-tested)."""
    from .ikmat import IKProblem

    lib = _load()
    if lib is None:
        raise RuntimeError("native IKmat reader not available")
    raw = text.encode()
    resp = lib.jrlqp_parse_ikpb(raw, len(raw))
    try:
        res = resp.contents
        if res.error:
            raise ValueError(res.error.decode())
        n, me, mi = res.n, res.me, res.mi
        return IKProblem(
            Q=_as_array(res.Q, n, n),
            c=_as_array(res.c, n),
            A=_as_array(res.A, me, n) if me else np.zeros((0, n)),
            b=_as_array(res.b, me) if me else np.zeros((0,)),
            C=_as_array(res.C, mi, n) if mi else np.zeros((0, n)),
            d=_as_array(res.d, mi) if mi else np.zeros((0,)),
            x_min=_as_array(res.xmin, n),
            x_max=_as_array(res.xmax, n),
        )
    finally:
        lib.jrlqp_free_ikpb(resp)


def parse_mat_native(text: str) -> np.ndarray:
    """Parse a plain whitespace matrix file with the native reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native matrix reader not available")
    raw = text.encode()
    resp = lib.jrlqp_parse_mat(raw, len(raw))
    try:
        res = resp.contents
        if res.error:
            raise ValueError(res.error.decode())
        return _as_array(res.data, res.rows, res.cols)
    finally:
        lib.jrlqp_free_mat(resp)
