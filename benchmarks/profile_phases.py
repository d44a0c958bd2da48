"""Phase-level timing of the headline pallas solve (init / kernel / refine).

Run on TPU:  python benchmarks/profile_phases.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.solver.fast import (
    _init_fast,
    _refine_batch,
    _state_from_kernel_out,
)
from jrlqp_tpu.ops.pallas.gi_kernel import run_loop_pallas
from jrlqp_tpu.testing.batch_gen import random_qp_batch

N, M = 50, 100
BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
opt = SolverOptions(max_iter=150)
opt32 = opt.with_(dtype=jnp.float32, zero_z_threshold=1e-6)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


pbs = random_qp_batch(jax.random.key(0), BATCH, N, M, act_frac=0.3)
pb32 = pbs.with_dtype(jnp.float32)
sync(pb32)

init_fn = jax.jit(jax.vmap(lambda p: _init_fast(p, opt32)))
t_init, state0 = timeit(init_fn, pb32)
print(f"init:   {t_init*1e3:8.2f} ms")

kern_fn = jax.jit(lambda p, s: run_loop_pallas(p, s, opt.max_iter))
t_kern, out = timeit(kern_fn, pb32, state0)
print(f"kernel: {t_kern*1e3:8.2f} ms")

st = _state_from_kernel_out(out, BATCH)
for irs in (1, 2, 3):
    ref_fn = jax.jit(lambda p, s, _i=irs: _refine_batch(p, s, _i))
    t_ref, res = timeit(ref_fn, pbs, st)
    from jrlqp_tpu.testing.kkt import kkt_residual
    resid = jax.jit(jax.vmap(kkt_residual))(res.x, res.multipliers, pbs)
    ok = float(jnp.mean((resid <= 1e-8) & (res.status == 0)))
    print(f"refine(ir={irs}): {t_ref*1e3:8.2f} ms   pass={ok:.4f}")

it = np.asarray(out["it"])
print(f"iterations: mean {it.mean():.1f}  max {it.max()}")
# pack-imbalance diagnostic: sum over packs of (max - member) iterations
P = 16
packs = it[: (len(it) // P) * P].reshape(-1, P)
waste = (packs.max(axis=1, keepdims=True) - packs).mean()
print(f"pack waste (random order): {waste:.1f} it/lane of {packs.max(axis=1).mean():.1f} pack-max mean")
s = np.sort(it)
packs_s = s[: (len(s) // P) * P].reshape(-1, P)
waste_s = (packs_s.max(axis=1, keepdims=True) - packs_s).mean()
print(f"pack waste (sorted):       {waste_s:.1f} it/lane of {packs_s.max(axis=1).mean():.1f} pack-max mean")
total = t_init + t_kern
print(f"total (init+kernel+ir3) ~= {(t_init + t_kern)*1e3:.1f} + refine")
