"""Pallas whole-solve kernel for the explicit-form GI iteration (float32).

The XLA-composed iteration (:mod:`jrlqp_tpu.solver.fast`) spends most of its
wall clock on per-op dispatch: each of the ~60 small batched ops in the loop
body costs fixed overhead, and a 60-90-iteration solve pays it every
iteration. This kernel runs the ENTIRE active-set loop for one problem per
grid program with all state resident in VMEM -- one kernel launch per batch,
zero per-op dispatch, which is the speed-of-light structure for this solver
on TPU (SURVEY.md section 7 / M3).

Layout decisions (see the Pallas TPU guide):
- one problem per grid program; matrices padded to multiples of 8 (f32
  sublane); vectors stored as (1, X) rows;
- all index updates (status flips, activation order, condensed multipliers)
  are broadcasted-iota masked ``where``s -- no scatters;
- dynamic row reads (C[idx], Ns[l]) are masked-reduction gathers;
- bound/constraint index spaces are remapped so padded general-constraint
  slots sit between the real constraints and the bounds;
- the Cholesky-based init (H0 = G^-1, x0 = -G^-1 a, equality
  auto-activation) runs OUTSIDE the kernel as one-time batched XLA ops
  (:func:`jrlqp_tpu.solver.fast._init_fast`); the kernel runs the loop.

Reproduces :func:`jrlqp_tpu.solver.fast.fast_iteration` (differential-tested
in interpret mode on CPU and against the XLA path on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...problems import QPProblem
from ...types import (
    EQUALITY,
    FIXED,
    INFEASIBLE,
    LINEAR_DEPENDENCY_DETECTED,
    LOWER,
    LOWER_BOUND,
    MAX_ITER_REACHED,
    RUNNING,
    SUCCESS,
    UPPER,
    UPPER_BOUND,
)

__all__ = ["run_loop_pallas"]

BIG = 1e30  # f32 infinity proxy inside the kernel


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(
    G_ref, C_ref, l_ref, u_ref, xl_ref, xu_ref,
    H0_ref, Ns0_ref, x0_ref, u0_ref, st0_ref, ao0_ref, scal0_ref,
    x_out, u_out, st_out, ao_out, scal_out, H_out, Ns_out,
    *, n, m, np_, mp_, mtp_, max_iter,
):
    f32 = jnp.float32
    # Mosaic cannot convert 64-bit scalars; under jax_enable_x64 every bare
    # Python int in a traced op becomes a weak int64 scalar, so pin all
    # integer scalar constants to int32.
    i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
    one, zero_i, neg1 = i32(1), i32(0), i32(-1)
    G = G_ref[0]        # (np_, np_)
    C = C_ref[0]        # (mp_, np_)
    lo = l_ref[0]       # (1, mp_)
    up = u_ref[0]       # (1, mp_)
    xlo = xl_ref[0]     # (1, np_)
    xup = xu_ref[0]     # (1, np_)

    iot_n = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    iot_m = jax.lax.broadcasted_iota(jnp.int32, (1, mp_), 1)
    iot_mt = jax.lax.broadcasted_iota(jnp.int32, (1, mtp_), 1)
    row_n = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    real_n = iot_n < i32(n)
    real_m = iot_m < i32(m)

    def gather_row(M, idx):
        mask = jax.lax.broadcasted_iota(jnp.int32, M.shape, 0) == idx
        return jnp.sum(jnp.where(mask, M, f32(0.0)), axis=0, keepdims=True)

    def matvec(A, v):
        """(r, c) @ (1, c) -> (1, r) via MXU."""
        return jnp.dot(A, v.reshape(-1, 1), preferred_element_type=f32).reshape(1, -1)

    def body(carry):
        (x, H, Ns, uvec, status, aorder, q, it, term, skip1, sc_idx, sc_st) = carry

        # ---- step 1: most-violated selection ----
        cx = matvec(C, x)  # (1, mp_)
        sl = cx - lo
        su = up - cx
        act_c = status[:, :mp_] != zero_i
        cand_c = jnp.where(act_c | ~real_m, f32(BIG), jnp.minimum(sl, su))
        st_c = jnp.where(sl <= su, jnp.int32(LOWER), jnp.int32(UPPER))
        slb = x - xlo
        sub = xup - x
        act_b = status[:, mp_:] != zero_i
        cand_b = jnp.where(act_b | ~real_n, f32(BIG), jnp.minimum(slb, sub))
        st_b = jnp.where(slb <= sub, jnp.int32(LOWER_BOUND),
                         jnp.int32(UPPER_BOUND))
        cand = jnp.concatenate([cand_c, cand_b], axis=1)  # (1, mtp_)
        sts = jnp.concatenate([st_c, st_b], axis=1)
        p = jax.lax.argmin(cand[0, :], 0, jnp.int32)
        viol = jnp.min(cand[0, :])
        # int reductions are unsupported in Mosaic: sum tiny ints in f32
        sel_st = jnp.sum(
            jnp.where(iot_mt == p, sts.astype(f32), f32(0.0))
        ).astype(jnp.int32)

        do_select = jnp.logical_not(skip1)
        success = do_select & (viol >= f32(0.0))
        sc_idx = jnp.where(do_select, p, sc_idx)
        sc_st = jnp.where(do_select, sel_st, sc_st)
        uvec = jnp.where(do_select & (iot_n == q), f32(0.0), uvec)

        # ---- signed constraint normal ----
        sign = jnp.where((sc_st == i32(UPPER)) | (sc_st == i32(UPPER_BOUND)),
                         f32(-1), f32(1))
        is_bnd = sc_st >= i32(LOWER_BOUND)
        crow = gather_row(C, jnp.clip(sc_idx, zero_i, i32(mp_ - 1)))  # (1, np_)
        e = (iot_n == (sc_idx - i32(mp_))).astype(f32)
        nplus = sign * jnp.where(is_bnd, e, crow)

        # ---- direction z = H n+, dual direction r = N* n+ ----
        z = matvec(H, nplus)
        r = matvec(Ns, nplus)

        # ---- step lengths ----
        ao_clip = jnp.clip(aorder, zero_i, i32(mtp_ - 1))  # (1, np_)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (np_, mtp_), 1)
                  == ao_clip.reshape(np_, 1)).astype(f32)
        stat_k = matvec(onehot, status.astype(f32))  # (1, np_)
        eligible = (
            (iot_n < q) & (stat_k != EQUALITY) & (stat_k != FIXED) & (r > 0)
        )
        r_safe = jnp.where(eligible, r, f32(1.0))
        tks = jnp.where(eligible, uvec / r_safe, f32(BIG))
        lpos = jax.lax.argmin(tks[0, :], 0, jnp.int32)
        t1 = jnp.minimum(jnp.min(tks[0, :]), f32(BIG))

        znorm2 = jnp.sum(z * z)
        nz = jnp.sum(nplus * z)
        nx = jnp.sum(nplus * x)
        bidx = jnp.clip(sc_idx - i32(mp_), zero_i, i32(np_ - 1))
        cidx = jnp.clip(sc_idx, zero_i, i32(mp_ - 1))
        b_gen = jnp.sum(jnp.where(iot_m == cidx,
                                  jnp.where(sc_st == i32(UPPER), up, lo),
                                  f32(0.0)))
        b_bnd = jnp.sum(jnp.where(iot_n == bidx,
                                  jnp.where(sc_st == i32(UPPER_BOUND), xup, xlo),
                                  f32(0.0)))
        b = jnp.where(is_bnd, b_bnd, b_gen)
        nz_safe = jnp.where(nz != f32(0.0), nz, f32(1.0))
        t2 = jnp.where(znorm2 > f32(1e-12), (sign * b - nx) / nz_safe, f32(BIG))
        t = jnp.minimum(t1, t2)

        infeasible = t >= f32(BIG)
        dual_step = (t2 >= f32(BIG)) & ~infeasible
        full_step = ~infeasible & ~dual_step & (t2 <= t1)

        uq = jnp.sum(jnp.where(iot_n == q, uvec, f32(0.0)))
        r_head = jnp.where(iot_n < q, r, f32(0.0))
        u_stepped = uvec - t * r_head
        u_stepped = jnp.where(iot_n == q, u_stepped + t, u_stepped)

        primal = ~infeasible & ~dual_step
        x_new = jnp.where(primal, x + t * z, x)
        # objective update omitted in-kernel; recomputed at finalize

        # ---- add update: H -= z z^T/d, N* rows -= r z^T/d, new row z^T/d --
        nn = jnp.sum(nplus * nplus)
        dependent = nz <= f32(1e-5) * (f32(1.0) + nn)
        dsafe = jnp.where(dependent, f32(1.0), nz)
        zn = z / dsafe
        H_add = H - jnp.dot(z.reshape(np_, 1), zn, preferred_element_type=f32)
        rmask = jnp.where(iot_n < q, r, f32(0.0))
        Ns_add = Ns - jnp.dot(rmask.reshape(np_, 1), zn,
                              preferred_element_type=f32)
        Ns_add = jnp.where(row_n == q, zn, Ns_add)
        status_add = jnp.where(iot_mt == sc_idx, sc_st, status)
        aorder_add = jnp.where(iot_n == q, sc_idx, aorder)
        term_add = jnp.where(dependent, i32(LINEAR_DEPENDENCY_DETECTED), term)

        # ---- remove update (rank-one downdate + row shift) ----
        nl = gather_row(Ns, jnp.clip(lpos, zero_i, i32(np_ - 1)))
        v = matvec(G, nl)  # (1, np_): G n_l*^T
        w = matvec(Ns, v)
        wl = jnp.sum(jnp.where(iot_n == lpos, w, f32(0.0)))
        wl_safe = jnp.where(jnp.abs(wl) > f32(0.0), wl, f32(1.0))
        H_rem = H + jnp.dot(nl.reshape(np_, 1), nl / wl_safe,
                            preferred_element_type=f32)
        wmask = jnp.where((iot_n < q) & (iot_n != lpos), w, f32(0.0))
        Ns_rem = Ns - jnp.dot((wmask / wl_safe).reshape(np_, 1), nl,
                              preferred_element_type=f32)
        rolled = pltpu.roll(Ns_rem, i32(np_ - 1), axis=0)  # left-roll by 1
        Ns_rem = jnp.where((row_n >= lpos) & (row_n < q - one), rolled, Ns_rem)
        Ns_rem = jnp.where(row_n >= q - one, f32(0.0), Ns_rem)
        rem_idx = jnp.sum(
            jnp.where(iot_n == lpos, ao_clip.astype(f32), f32(0.0))
        ).astype(jnp.int32)
        status_rem = jnp.where(iot_mt == rem_idx, zero_i, status)
        ao_roll = pltpu.roll(aorder, i32(np_ - 1), axis=1)
        aorder_rem = jnp.where((iot_n >= lpos) & (iot_n < q - one), ao_roll, aorder)
        aorder_rem = jnp.where(iot_n >= q - one, neg1, aorder_rem)
        # u has the candidate at slot q: shift range goes up to q (candidate
        # lands at slot q-1 = the new candidate slot), then clear >= q
        u_roll = pltpu.roll(u_stepped, i32(np_ - 1), axis=1)
        u_rem = jnp.where((iot_n >= lpos) & (iot_n < q), u_roll, u_stepped)
        u_rem = jnp.where(iot_n >= q, f32(0.0), u_rem)

        # ---- select outcome ----
        stop = success | infeasible
        adv = ~stop
        add_sel = adv & full_step

        H_n = jnp.where(add_sel, H_add, jnp.where(adv, H_rem, H))
        Ns_n = jnp.where(add_sel, Ns_add, jnp.where(adv, Ns_rem, Ns))
        x_n = jnp.where(adv, x_new, x)
        u_n = jnp.where(add_sel, u_stepped, jnp.where(adv, u_rem, uvec))
        status_n = jnp.where(add_sel, status_add,
                             jnp.where(adv, status_rem, status))
        aorder_n = jnp.where(add_sel, aorder_add,
                             jnp.where(adv, aorder_rem, aorder))
        q_n = jnp.where(add_sel, q + one, jnp.where(adv, q - one, q))
        it_n = jnp.where(adv, it + one, it)
        term_n = jnp.where(
            stop,
            jnp.where(success, jnp.int32(SUCCESS), jnp.int32(INFEASIBLE)),
            jnp.where(add_sel, term_add, term),
        ).astype(jnp.int32)
        skip1_n = jnp.where(adv, ~full_step, skip1)
        del uq  # objective tracking is done at finalize time
        return (x_n, H_n, Ns_n, u_n, status_n, aorder_n, q_n, it_n,
                term_n, skip1_n, sc_idx, sc_st)

    def cond(carry):
        it = carry[7]
        term = carry[8]
        return (term == i32(RUNNING)) & (it < i32(max_iter))

    scal0 = scal0_ref[0]  # (1, 8) int32
    init = (
        x0_ref[0], H0_ref[0], Ns0_ref[0], u0_ref[0], st0_ref[0], ao0_ref[0],
        scal0[0, 0], scal0[0, 1], scal0[0, 2], scal0[0, 3] != zero_i,
        scal0[0, 4], scal0[0, 5],
    )
    out = jax.lax.while_loop(cond, body, init)
    (x, H, Ns, uvec, status, aorder, q, it, term, skip1, sc_idx, sc_st) = out
    term = jnp.where(term == i32(RUNNING), i32(MAX_ITER_REACHED),
                     term).astype(jnp.int32)

    x_out[0] = x
    u_out[0] = uvec
    st_out[0] = status
    ao_out[0] = aorder
    H_out[0] = H
    Ns_out[0] = Ns
    zero = jnp.zeros((1, 1), jnp.int32)
    scal_out[0] = jnp.concatenate(
        [
            q.reshape(1, 1), it.reshape(1, 1), term.reshape(1, 1),
            skip1.astype(jnp.int32).reshape(1, 1),
            sc_idx.reshape(1, 1), sc_st.reshape(1, 1), zero, zero,
        ],
        axis=1,
    )


def run_loop_pallas(pb32: QPProblem, state0, max_iter: int,
                    interpret: bool = False):
    """Run the GI loop via the Pallas kernel for a batch of f32 problems.

    ``pb32``: stacked QPProblem (leading batch dim, float32). ``state0``: the
    batched FastState from vmapped ``_init_fast``. Returns a dict of final
    batched state pieces (x, u, status, aorder, q, it, term) in the
    library's (m+n) index layout.
    """
    B, n = pb32.a.shape
    m = pb32.C.shape[1]
    np_ = _round_up(n + 1, 8)
    mp_ = _round_up(max(m, 1), 8)
    mtp_ = mp_ + np_
    f32 = jnp.float32

    def pad2(A, r, c):
        return jnp.zeros((B, r, c), f32).at[:, : A.shape[1], : A.shape[2]].set(
            A.astype(f32)
        )

    def padrow(v, c, fill=0.0):
        out = jnp.full((B, 1, c), fill, f32)
        return out.at[:, 0, : v.shape[1]].set(
            jnp.nan_to_num(v.astype(f32), posinf=BIG * 10, neginf=-BIG * 10)
        )

    G = pad2(pb32.G, np_, np_)
    C = pad2(pb32.C, mp_, np_)
    l = padrow(pb32.l, mp_, fill=-BIG * 10)
    u = padrow(pb32.u, mp_, fill=BIG * 10)
    xl = padrow(pb32.xl, np_, fill=-BIG * 10)
    xu = padrow(pb32.xu, np_, fill=BIG * 10)
    H0 = pad2(state0.H, np_, np_)
    Ns0 = pad2(state0.Ns, np_, np_)
    x0 = padrow(state0.x, np_)
    u0 = padrow(state0.u[:, : n + 1], np_)
    st_c = state0.status[:, :m]
    st_b = state0.status[:, m:]
    st0 = jnp.zeros((B, 1, mtp_), jnp.int32)
    st0 = st0.at[:, 0, :m].set(st_c).at[:, 0, mp_:mp_ + n].set(st_b)
    ao = state0.aorder
    ao_remap = jnp.where(ao >= m, ao - m + mp_, ao)
    ao_remap = jnp.where(ao < 0, -1, ao_remap)
    ao0 = jnp.full((B, 1, np_), -1, jnp.int32).at[:, 0, :n].set(ao_remap)
    sc_idx0 = jnp.where(state0.sc_idx >= m, state0.sc_idx - m + mp_,
                        state0.sc_idx)
    scal0 = jnp.stack(
        [
            state0.q, state0.it, state0.term,
            state0.skip1.astype(jnp.int32), sc_idx0, state0.sc_status,
            jnp.zeros_like(state0.q), jnp.zeros_like(state0.q),
        ],
        axis=-1,
    )[:, None, :].astype(jnp.int32)

    kern = functools.partial(
        _kernel, n=n, m=m, np_=np_, mp_=mp_, mtp_=mtp_, max_iter=max_iter
    )

    def spec(*shape):
        # index_map must return int32: bare 0s trace as int64 under x64,
        # which Mosaic cannot return from the index-map function
        return pl.BlockSpec(
            (1,) + shape,
            lambda i, _k=len(shape): (i,) + (jnp.zeros((), jnp.int32),) * _k,
            memory_space=pltpu.VMEM,
        )

    x, uvec, status, aorder, scal, H, Ns = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            spec(np_, np_), spec(mp_, np_), spec(1, mp_), spec(1, mp_),
            spec(1, np_), spec(1, np_), spec(np_, np_), spec(np_, np_),
            spec(1, np_), spec(1, np_), spec(1, mtp_), spec(1, np_),
            spec(1, 8),
        ],
        out_specs=[
            spec(1, np_), spec(1, np_), spec(1, mtp_), spec(1, np_),
            spec(1, 8), spec(np_, np_), spec(np_, np_),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, np_), f32),
            jax.ShapeDtypeStruct((B, 1, np_), f32),
            jax.ShapeDtypeStruct((B, 1, mtp_), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, np_), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, np_, np_), f32),
            jax.ShapeDtypeStruct((B, np_, np_), f32),
        ],
        interpret=interpret,
    )(G, C, l, u, xl, xu, H0, Ns0, x0, u0, st0, ao0, scal0)

    status_full = jnp.concatenate(
        [status[:, 0, :m], status[:, 0, mp_:mp_ + n]], axis=1
    )
    ao_out = aorder[:, 0, :n]
    ao_back = jnp.where(ao_out >= mp_, ao_out - mp_ + m, ao_out)
    ao_back = jnp.where(ao_out < 0, -1, ao_back)
    return dict(
        x=x[:, 0, :n],
        u=uvec[:, 0, :n],
        status=status_full,
        aorder=ao_back,
        q=scal[:, 0, 0],
        it=scal[:, 0, 1],
        term=scal[:, 0, 2],
        H=H[:, :n, :n],
        Ns=Ns[:, :n, :n],
    )
