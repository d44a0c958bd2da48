"""Pallas kernels for structured block Cholesky factorizations (float32).

TPU-native fused versions of the XLA-composed blocked LLTs in
:mod:`jrlqp_tpu.structured.blocks` (ref algorithms:
src/decomposition/triBlockDiagLLT.cpp:9-35 and
src/decomposition/blockArrowLLT.cpp:52-81). The XLA versions pay per-step
dispatch for every tiny (s, s) Cholesky / triangular solve in the chain --
at IK sizes (nb=9, s=48) that overhead dominates the ~3 MFLOP of real work.
Here ONE kernel launch per batch runs the whole chain with every block
resident in VMEM (nb * s * s * 4B ~ 100 KB per problem).

Design notes:
- one problem per grid program. Blocks are FOLDED into 3-D refs
  (1, nb*sp, sp): this Mosaic toolchain rejects 4-D block shapes, and
  static sublane slices of a folded 2-D array lower cleanly. ``sp`` is s
  padded to the f32 sublane multiple (8) -- diagonal blocks are
  identity-padded so factor/inverse stay exact, off blocks zero-padded;
- the chain across blocks is a static Python unroll over nb (block count
  is a compile-time constant);
- the per-block Cholesky is a masked one-hot column loop (fori over s,
  each step a rank-one MXU update) -- no dynamic scalar indexing, no
  data-dependent shapes;
- each factor block's INVERSE is computed in-kernel by masked forward
  substitution, so the factor output turns every downstream solve into
  pure (s, s) @ (s, k) MXU gemms (the reference's triangular solves,
  triBlockDiagLLT.cpp:37-158, become matmuls);
- the fused solve kernel runs the forward + backward block chain for a
  multi-rhs in one launch (the reference marks these loops [OPTIM]
  parallelizable, blockArrowLLT.cpp:118-120,217; on TPU the win is
  fusion + MXU, not threads).

All kernels are f32 (TPU-native); the f64 XLA versions remain the
correctness oracles (differential tests in tests/test_block_llt_pallas.py).
Under jax_enable_x64 all scalar constants are pinned to i32/f32 (Mosaic
cannot lower 64-bit scalars: the i64 convert rule recurses and f64 tiles
trip the <=32-bit layout check).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "tri_block_llt_pallas",
    "tri_block_solve_pallas",
    "block_arrow_llt_pallas",
    "block_arrow_solve_pallas",
]

f32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chol_inplace(A, s: int):
    """Cholesky factor of an (s, s) SPD block via a masked column loop.

    Right-looking outer-product form: at step j, divide column j of the
    working matrix by sqrt(pivot) and subtract its outer product. All
    indexing is one-hot matvecs (no dynamic scalar loads).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    def body(j, carry):
        Aw, L = carry
        ej = (cols1 == j).astype(f32)                      # (1, s)
        piv = jnp.sum((Aw @ ej.T) * ej.T)                  # Aw[j, j]
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(piv, f32(1e-30)))
        col = (Aw @ ej.T) * inv_sqrt                       # (s, 1)
        col = jnp.where(rows >= j, col, f32(0.0))
        L = L + col @ ej
        Aw = Aw - col @ col.T
        return Aw, L

    _, L = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(s), body, (A, jnp.zeros((s, s), f32)),
        unroll=False
    )
    return L


def _tri_inv(L, s: int):
    """X = L^{-1} for lower-triangular L, masked forward substitution by
    rows (row i uses only rows < i of X, which are already final)."""
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)

    def body(i, X):
        ei = (cols1 == i).astype(f32)                      # (1, s)
        Lrow = ei @ L                                      # (1, s)
        Lii = jnp.sum(Lrow * ei)
        below = jnp.where(cols1 < i, Lrow, f32(0.0))       # strict lower part
        Xi = (ei - below @ X) / Lii                        # (1, s)
        return X + (rows == i).astype(f32) @ Xi

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(s), body,
                             jnp.zeros((s, s), f32), unroll=False)


# ---------------------------------------------------------------------------
# folded-layout helpers (host side)
# ---------------------------------------------------------------------------


def _fold(x, sp: int, eye_pad: bool):
    """(B, nb, s, s) -> (B, nb*sp, sp): pad each block to (sp, sp)
    (identity padding for diagonal blocks keeps chol/inverse exact) and
    stack the blocks along the sublane axis."""
    B, nb, s, _ = x.shape
    x = x.astype(f32)
    if sp != s:
        pad = jnp.zeros((B, nb, sp, sp), f32)
        if eye_pad:
            k = jnp.arange(sp)
            diag_pad = jnp.where((k[:, None] == k[None, :]) & (k[:, None] >= s),
                                 f32(1.0), f32(0.0))
            pad = pad + diag_pad
        x = pad.at[:, :, :s, :s].set(x)
    return x.reshape(B, nb * sp, sp)


def _fold_rhs(r, sp: int):
    """(B, nb, s, k) -> (B, nb*sp, kp) with zero padding."""
    B, nb, s, k = r.shape
    kp = _round_up(k, 8)
    out = jnp.zeros((B, nb, sp, kp), f32)
    out = out.at[:, :, :s, :k].set(r.astype(f32))
    return out.reshape(B, nb * sp, kp), kp


def _unfold(y, nb: int, sp: int, s: int, k: int):
    """(B, nb*sp, kp) -> (B, nb, s, k)."""
    B = y.shape[0]
    return y.reshape(B, nb, sp, -1)[:, :, :s, :k]


def _spec(rows, cols):
    # index_map must return int32: bare 0s trace as int64 under x64,
    # which Mosaic cannot return from the index-map function
    zero = lambda: jnp.zeros((), jnp.int32)  # noqa: E731
    return pl.BlockSpec((1, rows, cols), lambda b: (b, zero(), zero()),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# tri-block-diagonal
# ---------------------------------------------------------------------------


def _tri_llt_kernel(diag_ref, off_ref, Ld_ref, Lo_ref, Li_ref, *, nb, s):
    """L_i = chol(D_i - Sp_{i-1} Sp_{i-1}^T), Sp_i = S_i L_i^{-T}
    (ref: triBlockDiagLLT.cpp:9-35), plus Linv_i = L_i^{-1}. Blocks are
    rows [i*s, (i+1)*s) of the folded refs; static slices."""
    M = jnp.zeros((s, s), f32)
    for i in range(nb):
        A = diag_ref[0, i * s:(i + 1) * s, :] - M
        L = _chol_inplace(A, s)
        Li = _tri_inv(L, s)
        Ld_ref[0, i * s:(i + 1) * s, :] = L
        Li_ref[0, i * s:(i + 1) * s, :] = Li
        if i < nb - 1:
            Sp = jnp.dot(off_ref[0, i * s:(i + 1) * s, :], Li.T,
                         preferred_element_type=f32)
            Lo_ref[0, i * s:(i + 1) * s, :] = Sp
            M = jnp.dot(Sp, Sp.T, preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_block_llt_pallas(diag: jax.Array, off: jax.Array,
                         interpret: bool = False):
    """Batched tri-block-diagonal LLT, whole chain fused in one kernel.

    diag: (B, nb, s, s), off: (B, nb-1, s, s), float32. Returns
    (L_diag, L_off, Linv_diag) with Linv_diag[i] = L_i^{-1} so solves are
    pure gemms. Differential-tested against
    :func:`jrlqp_tpu.structured.blocks.tri_block_diag_llt`.
    """
    B, nb, s, _ = diag.shape
    sp = _round_up(s, 8)
    diag_f = _fold(diag, sp, eye_pad=True)
    # off folded at nb blocks (last slot unused) keeps one ref layout
    off_f = _fold(jnp.concatenate(
        [off, jnp.zeros((B, 1, s, s), off.dtype)], axis=1), sp,
        eye_pad=False)
    out = pl.pallas_call(
        functools.partial(_tri_llt_kernel, nb=nb, s=sp),
        grid=(B,),
        in_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp)],
        out_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp),
                   _spec(nb * sp, sp)],
        out_shape=[jax.ShapeDtypeStruct((B, nb * sp, sp), f32)] * 3,
        interpret=interpret,
    )(diag_f, off_f)
    Ld = _unfold(out[0], nb, sp, s, s)
    Lo = _unfold(out[1], nb, sp, s, s)[:, :nb - 1]
    Li = _unfold(out[2], nb, sp, s, s)
    return Ld, Lo, Li


def _tri_solve_kernel(Lo_ref, Li_ref, r_ref, y_ref, *, nb, s, k, lower_only):
    """Fused y = G^{-1} r (or y = L^{-1} r when lower_only): forward then
    backward block chain, all gemms (ref: triBlockDiagLLT.cpp:37-158)."""
    ys = []
    prev = jnp.zeros((s, k), f32)
    for i in range(nb):
        rhs = r_ref[0, i * s:(i + 1) * s, :]
        if i > 0:
            rhs = rhs - jnp.dot(Lo_ref[0, (i - 1) * s:i * s, :], prev,
                                preferred_element_type=f32)
        prev = jnp.dot(Li_ref[0, i * s:(i + 1) * s, :], rhs,
                       preferred_element_type=f32)
        ys.append(prev)
    if lower_only:
        for i in range(nb):
            y_ref[0, i * s:(i + 1) * s, :] = ys[i]
        return
    nxt = jnp.zeros((s, k), f32)
    for i in range(nb - 1, -1, -1):
        rhs = ys[i]
        if i < nb - 1:
            rhs = rhs - jnp.dot(Lo_ref[0, i * s:(i + 1) * s, :].T, nxt,
                                preferred_element_type=f32)
        nxt = jnp.dot(Li_ref[0, i * s:(i + 1) * s, :].T, rhs,
                      preferred_element_type=f32)
        y_ref[0, i * s:(i + 1) * s, :] = nxt


@functools.partial(jax.jit, static_argnames=("interpret", "lower_only"))
def tri_block_solve_pallas(L_off: jax.Array, Linv: jax.Array, r: jax.Array,
                           interpret: bool = False,
                           lower_only: bool = False):
    """Fused blocked solve y = G^{-1} r (forward + backward chain in one
    launch). L_off/Linv from :func:`tri_block_llt_pallas`; r is
    (B, nb, s, k). ``lower_only`` returns L^{-1} r (forward chain only)."""
    B, nb, s, k = r.shape
    sp = _round_up(s, 8)
    Lo_f = _fold(jnp.concatenate(
        [L_off, jnp.zeros((B, 1, s, s), L_off.dtype)], axis=1), sp,
        eye_pad=False)
    Li_f = _fold(Linv, sp, eye_pad=True)
    r_f, kp = _fold_rhs(r, sp)
    y = pl.pallas_call(
        functools.partial(_tri_solve_kernel, nb=nb, s=sp, k=kp,
                          lower_only=lower_only),
        grid=(B,),
        in_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp),
                  _spec(nb * sp, kp)],
        out_specs=_spec(nb * sp, kp),
        out_shape=jax.ShapeDtypeStruct((B, nb * sp, kp), f32),
        interpret=interpret,
    )(Lo_f, Li_f, r_f)
    return _unfold(y, nb, sp, s, k)


# ---------------------------------------------------------------------------
# block-arrow
# ---------------------------------------------------------------------------


def _arrow_llt_kernel(diag_ref, side_ref, Ld_ref, Lo_ref, Li_ref, *, nb, s):
    """Per-block chol(D_i), B_i = S_i L_i^{-T}, Schur complement on the
    last block (ref: blockArrowLLT.cpp:52-81). The up-arrow roll is done
    by the caller."""
    acc = jnp.zeros((s, s), f32)
    for i in range(nb - 1):
        L = _chol_inplace(diag_ref[0, i * s:(i + 1) * s, :], s)
        Li = _tri_inv(L, s)
        Bi = jnp.dot(side_ref[0, i * s:(i + 1) * s, :], Li.T,
                     preferred_element_type=f32)
        Ld_ref[0, i * s:(i + 1) * s, :] = L
        Li_ref[0, i * s:(i + 1) * s, :] = Li
        Lo_ref[0, i * s:(i + 1) * s, :] = Bi
        acc = acc + jnp.dot(Bi, Bi.T, preferred_element_type=f32)
    last = slice((nb - 1) * s, nb * s)
    L_last = _chol_inplace(diag_ref[0, last, :] - acc, s)
    Ld_ref[0, last, :] = L_last
    Li_ref[0, last, :] = _tri_inv(L_last, s)


@functools.partial(jax.jit, static_argnames=("up", "interpret"))
def block_arrow_llt_pallas(diag: jax.Array, side: jax.Array,
                           up: bool = False, interpret: bool = False):
    """Batched block-arrow LLT fused in one kernel. Up arrows are reduced
    to down arrows by the same implicit roll as the reference
    (ref: blockArrowLLT.h:34-48); use :func:`block_arrow_solve_pallas`
    (same ``up``) for solves so rhs rolls match."""
    B, nb, s, _ = diag.shape
    if up:
        diag = jnp.roll(diag, -1, axis=1)
    sp = _round_up(s, 8)
    diag_f = _fold(diag, sp, eye_pad=True)
    side_f = _fold(jnp.concatenate(
        [side, jnp.zeros((B, 1, s, s), side.dtype)], axis=1), sp,
        eye_pad=False)
    out = pl.pallas_call(
        functools.partial(_arrow_llt_kernel, nb=nb, s=sp),
        grid=(B,),
        in_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp)],
        out_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp),
                   _spec(nb * sp, sp)],
        out_shape=[jax.ShapeDtypeStruct((B, nb * sp, sp), f32)] * 3,
        interpret=interpret,
    )(diag_f, side_f)
    Ld = _unfold(out[0], nb, sp, s, s)
    Lo = _unfold(out[1], nb, sp, s, s)[:, :nb - 1]
    Li = _unfold(out[2], nb, sp, s, s)
    return Ld, Lo, Li


def _arrow_solve_kernel(Lo_ref, Li_ref, r_ref, y_ref, *, nb, s, k):
    """Fused y = G^{-1} r for the arrow factor
    (ref: blockArrowLLT.cpp:92-277): independent head blocks, the last
    block gathers/scatters the coupling."""
    heads = []
    acc = jnp.zeros((s, k), f32)
    for i in range(nb - 1):
        yi = jnp.dot(Li_ref[0, i * s:(i + 1) * s, :],
                     r_ref[0, i * s:(i + 1) * s, :],
                     preferred_element_type=f32)
        heads.append(yi)
        acc = acc + jnp.dot(Lo_ref[0, i * s:(i + 1) * s, :], yi,
                            preferred_element_type=f32)
    last = slice((nb - 1) * s, nb * s)
    y_last = jnp.dot(Li_ref[0, last, :], r_ref[0, last, :] - acc,
                     preferred_element_type=f32)
    # backward
    w_last = jnp.dot(Li_ref[0, last, :].T, y_last,
                     preferred_element_type=f32)
    y_ref[0, last, :] = w_last
    for i in range(nb - 1):
        rhs = heads[i] - jnp.dot(Lo_ref[0, i * s:(i + 1) * s, :].T, w_last,
                                 preferred_element_type=f32)
        y_ref[0, i * s:(i + 1) * s, :] = jnp.dot(
            Li_ref[0, i * s:(i + 1) * s, :].T, rhs,
            preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("up", "interpret"))
def block_arrow_solve_pallas(L_side: jax.Array, Linv: jax.Array,
                             r: jax.Array, up: bool = False,
                             interpret: bool = False):
    """Fused y = G^{-1} r for a block-arrow factor from
    :func:`block_arrow_llt_pallas`. r: (B, nb, s, k)."""
    B, nb, s, k = r.shape
    if up:
        r = jnp.roll(r, -1, axis=1)
    sp = _round_up(s, 8)
    Lo_f = _fold(jnp.concatenate(
        [L_side, jnp.zeros((B, 1, s, s), L_side.dtype)], axis=1), sp,
        eye_pad=False)
    Li_f = _fold(Linv, sp, eye_pad=True)
    r_f, kp = _fold_rhs(r, sp)
    y = pl.pallas_call(
        functools.partial(_arrow_solve_kernel, nb=nb, s=sp, k=kp),
        grid=(B,),
        in_specs=[_spec(nb * sp, sp), _spec(nb * sp, sp),
                  _spec(nb * sp, kp)],
        out_specs=_spec(nb * sp, kp),
        out_shape=jax.ShapeDtypeStruct((B, nb * sp, kp), f32),
        interpret=interpret,
    )(Lo_f, Li_f, r_f)
    y = _unfold(y, nb, sp, s, k)
    if up:
        y = jnp.roll(y, 1, axis=1)
    return y
