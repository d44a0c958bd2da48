"""Standalone structured-IK capture with relay-rejection workarounds.

The relayed TPU backend intermittently rejects RE-execution of certain
loaded executables (INVALID_ARGUMENT on the second run of a program whose
first run succeeded); clearing local caches reloads the identical program
blob and is rejected again. Workaround: on failure, retry with a bumped
``max_iter`` (200 + attempt) -- semantically inert for these fixtures
(they converge far below the cap) but a DIFFERENT program hash, which the
relay loads fresh. Writes benchmarks/out/structured_ik.json.

Fixture: ref tests/BlockGISolverTest.in.cpp:172-271 'Sequential IK'
(9 robots x 43 dof) at the historical batch 16 plus a throughput batch.
"""
import json
import os
import sys
import time

sys.setrecursionlimit(100_000)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jrlqp_tpu.solver.fast import solve_refined  # noqa: E402
from jrlqp_tpu.structured.containers import (  # noqa: E402
    GType,
    StructuredC,
    StructuredG,
)
from jrlqp_tpu.structured.solver import (  # noqa: E402
    solve_structured_fast_batch,
    structured_qp_problem,
)
from jrlqp_tpu.types import SolverOptions  # noqa: E402

NB, S, MC = 9, 43, 4
BATCHES = tuple(int(b) for b in
                os.environ.get("IK_BATCHES", "128,16").split(","))
REPS = int(os.environ.get("IK_REPS", "3"))


def make_fixture(batch, seed=0):
    rng = np.random.default_rng(seed)
    n, m = NB * S, NB * MC
    diag = np.zeros((batch, NB, S, S))
    off = rng.standard_normal((batch, NB - 1, S, S))
    blocks = rng.standard_normal((batch, NB, MC, S))
    a = rng.standard_normal((batch, n))
    l_ = np.zeros((batch, m))
    u_ = np.zeros((batch, m))
    for b in range(batch):
        for i in range(NB):
            A = rng.standard_normal((S, S))
            diag[b, i] = A @ A.T + NB * S * np.eye(S)
        x0 = rng.uniform(-1, 1, n)
        Cd = np.zeros((m, n))
        for i in range(NB):
            Cd[i * MC:(i + 1) * MC, i * S:(i + 1) * S] = blocks[b, i]
        cx = Cd @ x0
        l_[b] = cx - rng.uniform(0.0, 0.5, m)
        u_[b] = cx + rng.uniform(0.0, 2.0, m)
    sgs = StructuredG(diag=jnp.asarray(diag), off=jnp.asarray(off),
                      gtype=int(GType.TRI_BLOCK_DIAGONAL))
    scs = StructuredC(blocks=jnp.asarray(blocks))
    return sgs, jnp.asarray(a), scs, jnp.asarray(l_), jnp.asarray(u_)


def measure(make_fn, batch):
    """Warmup + REPS timed runs; on a relay rejection, rebuild the program
    with a bumped max_iter (different hash) and start over."""
    for attempt in range(6):
        fn = make_fn(200 + attempt)
        try:
            res = fn()
            np.asarray(res.iterations)          # warmup barrier
            ok = float(jnp.mean((res.status == 0).astype(jnp.float64)))
            x = res.x
            best = np.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(out.iterations)      # completion barrier
                best = min(best, time.perf_counter() - t0)
            return x, ok, best
        except jax.errors.JaxRuntimeError as e:
            print(f"# attempt {attempt} rejected: {str(e)[:80]}",
                  file=sys.stderr)
            jax.clear_caches()
            time.sleep(3.0 * (attempt + 1))
    raise RuntimeError("all program-identity retries rejected (relay)")


def main():
    rows = []
    for batch in BATCHES:
        sgs, a_b, scs, l_b, u_b = make_fixture(batch)
        pbs = jax.vmap(
            lambda sg, av, sc, lv, uv: structured_qp_problem(
                sg, av, sc, lv, uv))(sgs, a_b, scs, l_b, u_b)

        def m_structured(max_iter, backend):
            opt = SolverOptions(max_iter=max_iter)
            f = jax.jit(lambda: solve_structured_fast_batch(
                sgs, a_b, scs, l_b, u_b, opt=opt, backend=backend))
            return f

        def m_dense(max_iter):
            opt = SolverOptions(max_iter=max_iter)
            return jax.jit(lambda: jax.vmap(
                lambda p: solve_refined(p, opt))(pbs))

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "out", "structured_ik.json")
        ref_x = None
        # pallas and dense are the decisive comparison; the xla-backend
        # row is informative only and its executables are the ones the
        # relay rejects most -- opt in with IK_XLA=1
        rows_to_run = [
            ("structured_fast_pallas",
             lambda mi: m_structured(mi, "pallas")),
            ("dense_fast", m_dense),
        ]
        if os.environ.get("IK_XLA") == "1":
            rows_to_run.append(
                ("structured_fast_xla", lambda mi: m_structured(mi, "xla")))
        for name, mk in rows_to_run:
            try:
                x, ok, t = measure(mk, batch)
            except (RuntimeError, jax.errors.JaxRuntimeError) as e:
                print(f"# row {name}/batch={batch} lost: {str(e)[:80]}",
                      file=sys.stderr)
                continue
            row = dict(name=f"ik/{name}/nb={NB}/s={S}/batch={batch}",
                       batch=batch,
                       ms_per_solve=t / batch * 1e3,
                       solves_per_sec=batch / t,
                       success_rate=ok)
            if ref_x is None:
                ref_x = x
            else:
                row["max_diff_vs_pallas"] = float(
                    jnp.max(jnp.abs(x - ref_x)))
            rows.append(row)
            print(json.dumps(row))
            merged = list(rows)
            if os.path.exists(path):  # keep rows from other runs/batches
                try:
                    names = {r["name"] for r in merged}
                    merged += [r for r in json.load(open(path))
                               if r.get("name") not in names]
                except Exception:
                    pass
            with open(path, "w") as fh:  # land partial results immediately
                json.dump(sorted(merged, key=lambda r: r["name"]), fh,
                          indent=2)
            import subprocess
            subprocess.run(["git", "add", path], cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), check=False)


if __name__ == "__main__":
    main()
