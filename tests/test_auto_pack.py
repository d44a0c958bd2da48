"""Pack-size selection for the whole-solve Pallas kernel: VMEM budget
model + self-healing on Mosaic scoped-VMEM compile failures."""
import numpy as np
import jax

from jrlqp_tpu import SolverOptions
from jrlqp_tpu.ops.pallas import gi_kernel
from jrlqp_tpu.solver import fast
from jrlqp_tpu.testing.batch_gen import random_qp_batch
from jrlqp_tpu.testing.kkt import kkt_residual


def test_auto_pack_respects_budget(monkeypatch):
    """A tiny VMEM budget must force pack=1 instead of raising."""
    monkeypatch.setenv("JRLQP_VMEM_BUDGET_MB", "1")
    assert gi_kernel._auto_pack(64, 104) == 1
    monkeypatch.delenv("JRLQP_VMEM_BUDGET_MB")
    assert gi_kernel._auto_pack(64, 104) >= 4


def test_auto_pack_monotone_in_size(monkeypatch):
    monkeypatch.delenv("JRLQP_VMEM_BUDGET_MB", raising=False)
    small = gi_kernel._auto_pack(16, 24)
    big = gi_kernel._auto_pack(256, 512)
    assert small >= big >= 1


def test_solve_refined_pallas_self_heals_on_vmem_failure(monkeypatch):
    """When the auto-sized pack fails at Mosaic compile with a scoped-VMEM
    error, solve_refined_pallas must retry at the next-smaller pack (and
    memoize it) instead of raising. Simulated: the jitted body raises a
    VMEM-looking error for pack None/>2 and solves in interpret mode
    otherwise (CPU cannot trigger real Mosaic failures)."""
    real = fast._solve_refined_pallas_jit
    attempts = []

    def fake(pbs, opt, ir_steps, interpret, pack,
             fused_init=False):
        attempts.append(pack)
        eff = pack if pack is not None else gi_kernel._auto_pack(
            gi_kernel._round_up(pbs.a.shape[1] + 1, 8),
            gi_kernel._round_up(max(pbs.C.shape[1], 1), 8))
        if eff > 2:
            raise RuntimeError(
                "Mosaic failed: scoped vmem limit exceeded: requested "
                "21234567 bytes, allocation limit 17000000 bytes")
        return real(pbs, opt, ir_steps, True, eff)

    monkeypatch.setattr(fast, "_solve_refined_pallas_jit", fake)
    gi_kernel._PROVEN_PACK.clear()
    pbs = random_qp_batch(jax.random.key(0), 4, 6, 10, act_frac=0.3)
    opt = SolverOptions(max_iter=60)
    res = fast.solve_refined_pallas(pbs, opt)
    assert np.asarray(res.status == 0).all()
    resid = jax.vmap(kkt_residual)(res.x, res.multipliers, pbs)
    assert float(np.max(np.asarray(resid))) <= 1e-8
    # stepped down to a pack <= 2 and memoized it
    assert attempts[-1] is not None and attempts[-1] <= 2
    key = (gi_kernel._round_up(7, 8), gi_kernel._round_up(10, 8))
    assert gi_kernel._PROVEN_PACK.get(key) == attempts[-1]
    # second call goes straight to the proven pack
    n_prev = len(attempts)
    res2 = fast.solve_refined_pallas(pbs, opt)
    assert np.asarray(res2.status == 0).all()
    assert len(attempts) == n_prev + 1
    gi_kernel._PROVEN_PACK.clear()


def test_non_vmem_errors_propagate(monkeypatch):
    """Unrelated compile/runtime failures must NOT be swallowed by the
    self-healing retry loop."""
    def fake(pbs, opt, ir_steps, interpret, pack,
             fused_init=False):
        raise RuntimeError("something unrelated went wrong")

    monkeypatch.setattr(fast, "_solve_refined_pallas_jit", fake)
    gi_kernel._PROVEN_PACK.clear()
    pbs = random_qp_batch(jax.random.key(1), 2, 5, 8, act_frac=0.3)
    try:
        fast.solve_refined_pallas(pbs, SolverOptions(max_iter=30))
        raised = False
    except RuntimeError as e:
        raised = "unrelated" in str(e)
    assert raised
