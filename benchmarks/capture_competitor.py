"""Independent-solver timing comparison (round-4 verdict Missing #3).

The reference benchmarks against LSSOL / QLD / eigen-quadprog / eiquadprog
(ref: benchmarks/problemAdaptors.h:10-65); none of those (nor OSQP /
quadprog / qpsolvers / cvxpy) is installable in this image. The only
independent optimizer available is scipy.optimize (SLSQP) -- a general
sequential-least-squares NLP method, NOT a tuned dense QP code -- so this
capture times it on the same random strictly-convex QPs as the headline
bench, on the host CPU, purely as an order-of-magnitude anchor. Solutions
are cross-checked against the library's f64 engine. Writes
benchmarks/out/competitor.json and stages it in git.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
from scipy import optimize

from jrlqp_tpu import SolverOptions, solve
from jrlqp_tpu.testing.batch_gen import random_qp_batch

N, M = 50, 100
COUNT = int(os.environ.get("COMP_COUNT", "16"))


def main():
    pbs = random_qp_batch(jax.random.key(0), COUNT, N, M, act_frac=0.3)
    G = np.asarray(pbs.G)
    a = np.asarray(pbs.a)
    C = np.asarray(pbs.C)
    l = np.asarray(pbs.l)
    u = np.asarray(pbs.u)

    times = []
    max_obj_diff = 0.0
    n_ok = 0
    opt = SolverOptions(max_iter=500)
    for i in range(COUNT):
        Gi, ai, Ci, li, ui = G[i], a[i], C[i], l[i], u[i]

        def f(x, Gi=Gi, ai=ai):
            return 0.5 * x @ Gi @ x + ai @ x

        def fgrad(x, Gi=Gi, ai=ai):
            return Gi @ x + ai

        cons = [
            dict(type="ineq", fun=lambda x, Ci=Ci, li=li: Ci @ x - li,
                 jac=lambda x, Ci=Ci: Ci),
            dict(type="ineq", fun=lambda x, Ci=Ci, ui=ui: ui - Ci @ x,
                 jac=lambda x, Ci=Ci: -Ci),
        ]
        t0 = time.perf_counter()
        r = optimize.minimize(f, np.zeros(N), jac=fgrad, method="SLSQP",
                              constraints=cons,
                              options=dict(maxiter=500, ftol=1e-10))
        times.append(time.perf_counter() - t0)
        pb_i = jax.tree.map(lambda x: x[i], pbs)
        ours = solve(pb_i, opt)
        f_ours = float(ours.f)
        if r.success:
            n_ok += 1
            max_obj_diff = max(max_obj_diff,
                               abs(r.fun - f_ours) / max(1.0, abs(f_ours)))

    out = dict(
        name=f"competitor/scipy_slsqp/n={N}/m={M}",
        count=COUNT,
        scipy_slsqp_us_per_solve=float(np.mean(times) * 1e6),
        scipy_success=n_ok / COUNT,
        max_rel_obj_diff_vs_f64_engine=max_obj_diff,
        note=("scipy SLSQP is a general NLP method on the 2-core host CPU, "
              "not a tuned QP code; the reference's competitor set "
              "(LSSOL/QLD/eigen-quadprog/eiquadprog) and common QP packages "
              "(OSQP/quadprog/qpsolvers/cvxpy) are NOT installable in this "
              "image, so this row is an order-of-magnitude anchor only. "
              "Compare: the Pallas engine's TPU headline is ~23 us/solve "
              "at batch 16384 (bench.py / BENCH_r05)."),
    )
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", "competitor.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    subprocess.run(["git", "add", path],
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), check=False)


if __name__ == "__main__":
    main()
