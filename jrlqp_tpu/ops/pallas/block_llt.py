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
- P problems per grid program (``pack``). The per-block Cholesky/inverse
  is a masked column loop of ~2s sequential steps; at P=1 each step is a
  tiny latency-bound VPU op, so the whole chain is pipeline-latency bound.
  Packing P problems turns every step into a (P, s, s) batched op and every
  block matmul into a batched dot_general -- P-fold amortization of the
  sequential chain's latency (the same trick as the GI kernel's packed
  variant, ops/pallas/gi_kernel.py). Default pack is VMEM-budget sized.
- Blocks are FOLDED into 3-D refs (1, nb*P*sp, sp): this Mosaic toolchain
  rejects 4-D block shapes, and static sublane slices of a folded 2-D
  array lower cleanly; slices are reshaped to (P, sp, sp) in-kernel
  (sublane-split reshapes are layout-preserving for sp % 8 == 0). ``sp``
  is s padded to the f32 sublane multiple (8) -- diagonal blocks are
  identity-padded so factor/inverse stay exact, off blocks zero-padded;
- the chain across blocks is a static Python unroll over nb (block count
  is a compile-time constant);
- the per-block Cholesky is a masked one-hot column loop (fori over s,
  each step a rank-one update) -- no dynamic scalar indexing, no
  data-dependent shapes; the working matrix stays symmetric, so the
  transposed column is read as a row (no in-kernel transposes);
- each factor block's INVERSE is computed in-kernel by masked forward
  substitution, so the factor output turns every downstream solve into
  pure batched (s, s) @ (s, k) MXU gemms (the reference's triangular
  solves, triBlockDiagLLT.cpp:37-158, become matmuls);
- the fused solve kernel runs the forward + backward block chain for a
  multi-rhs in one launch (the reference marks these loops [OPTIM]
  parallelizable, blockArrowLLT.cpp:118-120,217; on TPU the win is
  fusion + MXU + packing, not threads).

All kernels are f32 (TPU-native); the f64 XLA versions remain the
correctness oracles (differential tests in tests/test_block_llt_pallas.py).
Under jax_enable_x64 all scalar constants are pinned to i32/f32 (Mosaic
cannot lower 64-bit scalars: the i64 convert rule recurses and f64 tiles
trip the <=32-bit layout check).
"""
from __future__ import annotations

import functools
import os

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


def _bmm(A, B):
    """(P, r, k) @ (P, k, c) -> (P, r, c) batched on the MXU."""
    return jax.lax.dot_general(A, B, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=f32)


def _bmm_nt(A, B):
    """(P, r, k) @ (P, c, k)^T -> (P, r, c): contract both dim-2."""
    return jax.lax.dot_general(A, B, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=f32)


def _bmm_tn(A, B):
    """(P, k, r)^T @ (P, k, c) -> (P, r, c): contract both dim-1."""
    return jax.lax.dot_general(A, B, (((1,), (1,)), ((0,), (0,))),
                               preferred_element_type=f32)


def _chol_b(A, s: int):
    """Cholesky factors of (P, s, s) SPD blocks via a masked column loop.

    Right-looking outer-product form, batched over P: at step j, scale
    column j of the working matrix by rsqrt(pivot) and subtract its outer
    product. The working matrix stays symmetric, so the transposed column
    is row j -- all indexing is broadcasted-iota masking.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)

    def body(j, carry):
        Aw, L = carry
        ej = (cols == j).astype(f32)                       # (1, 1, s)
        ei = (rows == j).astype(f32)                       # (1, s, 1)
        col = jnp.sum(Aw * ej, axis=2, keepdims=True)      # (P, s, 1)
        row = jnp.sum(Aw * ei, axis=1, keepdims=True)      # (P, 1, s) = col^T
        piv = jnp.sum(col * ei, axis=1, keepdims=True)     # (P, 1, 1)
        isq = jax.lax.rsqrt(jnp.maximum(piv, f32(1e-30)))
        colL = jnp.where(rows >= j, col * isq, f32(0.0))
        rowL = jnp.where(cols >= j, row * isq, f32(0.0))
        L = L + colL * ej
        Aw = Aw - colL * rowL
        return Aw, L

    _, L = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(s), body, (A, jnp.zeros_like(A)),
        unroll=False
    )
    return L


def _tri_inv_b(L, s: int):
    """X = L^{-1} for (P, s, s) lower-triangular L, masked forward
    substitution by rows (row i uses only rows < i of X, already final)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)

    def body(i, X):
        ei = (rows == i).astype(f32)                       # (1, s, 1)
        Lrow = jnp.sum(L * ei, axis=1, keepdims=True)      # (P, 1, s)
        Lii = jnp.sum(Lrow * (cols == i), axis=2, keepdims=True)  # (P, 1, 1)
        below = jnp.where(cols < i, Lrow, f32(0.0))        # strict lower part
        Xi = ((cols == i).astype(f32) - _bmm(below, X)) / Lii  # (P, 1, s)
        return X + ei * Xi

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(s), body,
                             jnp.zeros_like(L), unroll=False)


# ---------------------------------------------------------------------------
# folded-layout helpers (host side)
# ---------------------------------------------------------------------------


def _pad_batch(x, P: int):
    """(B, ...) -> (Bp, ...) with Bp a multiple of P (wrap padding)."""
    B = x.shape[0]
    pad = (-B) % P
    if pad:
        x = jnp.take(x, jnp.arange(B + pad) % B, axis=0)
    return x


def _fold(x, sp: int, P: int, eye_pad: bool):
    """(B, nb, s, s) -> (B//P, nb*P*sp, sp): pad each block to (sp, sp)
    (identity padding for diagonal blocks keeps chol/inverse exact), then
    interleave so block i of all P pack members is contiguous along the
    sublane axis (rows [i*P*sp, (i+1)*P*sp) of the folded ref)."""
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
    x = x.reshape(B // P, P, nb, sp, sp).transpose(0, 2, 1, 3, 4)
    return x.reshape(B // P, nb * P * sp, sp)


def _fold_rhs(r, sp: int, P: int):
    """(B, nb, s, k) -> (B//P, nb*P*sp, kp) with zero padding."""
    B, nb, s, k = r.shape
    kp = _round_up(k, 8)
    out = jnp.zeros((B, nb, sp, kp), f32)
    out = out.at[:, :, :s, :k].set(r.astype(f32))
    out = out.reshape(B // P, P, nb, sp, kp).transpose(0, 2, 1, 3, 4)
    return out.reshape(B // P, nb * P * sp, kp), kp


def _unfold(y, B: int, nb: int, sp: int, P: int, s: int, k: int):
    """(B//P, nb*P*sp, kp) -> (B, nb, s, k) (drops batch wrap padding)."""
    kp = y.shape[-1]
    y = y.reshape(-1, nb, P, sp, kp).transpose(0, 2, 1, 3, 4)
    return y.reshape(-1, nb, sp, kp)[:B, :, :s, :k]


def _spec(rows, cols):
    # index_map must return int32: bare 0s trace as int64 under x64,
    # which Mosaic cannot return from the index-map function
    zero = lambda: jnp.zeros((), jnp.int32)  # noqa: E731
    return pl.BlockSpec((1, rows, cols), lambda b: (b, zero(), zero()),
                        memory_space=pltpu.VMEM)


def _auto_pack(bytes_pp: int, B: int) -> int:
    """Largest pack whose per-program VMEM footprint (``bytes_pp`` live
    buffers per problem plus ~50% compiler headroom) fits the budget,
    clamped to B. Mis-sizing on an unknown TPU generation fails LOUDLY at
    Mosaic compile time -- override with ``pack=`` or
    ``JRLQP_VMEM_BUDGET_MB`` there."""
    budget = int(os.environ.get("JRLQP_VMEM_BUDGET_MB", "13")) * 2 ** 20
    for cand in (16, 8, 4, 2):
        if cand <= B and cand * bytes_pp * 1.5 <= budget:
            return cand
    return 1


def _llt_bytes_pp(nb: int, sp: int) -> int:
    # 2 input + 3 output folded factor buffers
    return 5 * nb * sp * sp * 4


def _solve_bytes_pp(nb: int, sp: int, kp: int) -> int:
    # 2 factor buffers + in/out rhs + ~1 rhs worth of chain intermediates
    return (2 * sp + 3 * kp) * nb * sp * 4


# ---------------------------------------------------------------------------
# tri-block-diagonal
# ---------------------------------------------------------------------------


def _tri_llt_kernel(diag_ref, off_ref, Ld_ref, Lo_ref, Li_ref, *, nb, s, P):
    """L_i = chol(D_i - Sp_{i-1} Sp_{i-1}^T), Sp_i = S_i L_i^{-T}
    (ref: triBlockDiagLLT.cpp:9-35), plus Linv_i = L_i^{-1}. Block i of all
    P pack members is rows [i*P*s, (i+1)*P*s) of the folded refs; static
    slices reshaped to (P, s, s)."""
    M = jnp.zeros((P, s, s), f32)
    for i in range(nb):
        sl = slice(i * P * s, (i + 1) * P * s)
        A = diag_ref[0, sl, :].reshape(P, s, s) - M
        L = _chol_b(A, s)
        Li = _tri_inv_b(L, s)
        Ld_ref[0, sl, :] = L.reshape(P * s, s)
        Li_ref[0, sl, :] = Li.reshape(P * s, s)
        if i < nb - 1:
            S = off_ref[0, sl, :].reshape(P, s, s)
            Sp = _bmm_nt(S, Li)                  # S L^{-T}
            Lo_ref[0, sl, :] = Sp.reshape(P * s, s)
            M = _bmm_nt(Sp, Sp)


@functools.partial(jax.jit, static_argnames=("interpret", "pack"))
def tri_block_llt_pallas(diag: jax.Array, off: jax.Array,
                         interpret: bool = False,
                         pack: int | None = None):
    """Batched tri-block-diagonal LLT, whole chain fused in one kernel,
    ``pack`` problems per grid program (None = VMEM-budget auto).

    diag: (B, nb, s, s), off: (B, nb-1, s, s), float32. Returns
    (L_diag, L_off, Linv_diag) with Linv_diag[i] = L_i^{-1} so solves are
    pure gemms. Differential-tested against
    :func:`jrlqp_tpu.structured.blocks.tri_block_diag_llt`.
    """
    B, nb, s, _ = diag.shape
    sp = _round_up(s, 8)
    P = pack or _auto_pack(_llt_bytes_pp(nb, sp), B)
    diag_p = _pad_batch(diag, P)
    off_p = _pad_batch(off, P)
    diag_f = _fold(diag_p, sp, P, eye_pad=True)
    # off folded at nb blocks (last slot unused) keeps one ref layout
    off_f = _fold(jnp.concatenate(
        [off_p, jnp.zeros((off_p.shape[0], 1, s, s), off_p.dtype)], axis=1),
        sp, P, eye_pad=False)
    grid = diag_f.shape[0]
    out = pl.pallas_call(
        functools.partial(_tri_llt_kernel, nb=nb, s=sp, P=P),
        grid=(grid,),
        in_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp)],
        out_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp),
                   _spec(nb * P * sp, sp)],
        out_shape=[jax.ShapeDtypeStruct((grid, nb * P * sp, sp), f32)] * 3,
        interpret=interpret,
    )(diag_f, off_f)
    Ld = _unfold(out[0], B, nb, sp, P, s, s)
    Lo = _unfold(out[1], B, nb, sp, P, s, s)[:, :nb - 1]
    Li = _unfold(out[2], B, nb, sp, P, s, s)
    return Ld, Lo, Li


def _tri_solve_kernel(Lo_ref, Li_ref, r_ref, y_ref, *, nb, s, k, P,
                      lower_only):
    """Fused y = G^{-1} r (or y = L^{-1} r when lower_only): forward then
    backward block chain, all batched gemms
    (ref: triBlockDiagLLT.cpp:37-158)."""
    def blk(ref, i):
        return ref[0, i * P * s:(i + 1) * P * s, :].reshape(P, s, -1)

    ys = []
    prev = jnp.zeros((P, s, k), f32)
    for i in range(nb):
        rhs = blk(r_ref, i)
        if i > 0:
            rhs = rhs - _bmm(blk(Lo_ref, i - 1), prev)
        prev = _bmm(blk(Li_ref, i), rhs)
        ys.append(prev)
    if lower_only:
        for i in range(nb):
            y_ref[0, i * P * s:(i + 1) * P * s, :] = ys[i].reshape(P * s, k)
        return
    nxt = jnp.zeros((P, s, k), f32)
    for i in range(nb - 1, -1, -1):
        rhs = ys[i]
        if i < nb - 1:
            rhs = rhs - _bmm_tn(blk(Lo_ref, i), nxt)
        nxt = _bmm_tn(blk(Li_ref, i), rhs)
        y_ref[0, i * P * s:(i + 1) * P * s, :] = nxt.reshape(P * s, k)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "lower_only", "pack"))
def tri_block_solve_pallas(L_off: jax.Array, Linv: jax.Array, r: jax.Array,
                           interpret: bool = False,
                           lower_only: bool = False,
                           pack: int | None = None):
    """Fused blocked solve y = G^{-1} r (forward + backward chain in one
    launch, ``pack`` problems per program). L_off/Linv from
    :func:`tri_block_llt_pallas`; r is (B, nb, s, k). ``lower_only``
    returns L^{-1} r (forward chain only)."""
    B, nb, s, k = r.shape
    sp = _round_up(s, 8)
    kp = _round_up(k, 8)
    P = pack or _auto_pack(_solve_bytes_pp(nb, sp, kp), B)
    Lo_f = _fold(_pad_batch(jnp.concatenate(
        [L_off, jnp.zeros((B, 1, s, s), L_off.dtype)], axis=1), P), sp, P,
        eye_pad=False)
    Li_f = _fold(_pad_batch(Linv, P), sp, P, eye_pad=True)
    r_f, kp = _fold_rhs(_pad_batch(r, P), sp, P)
    grid = r_f.shape[0]
    y = pl.pallas_call(
        functools.partial(_tri_solve_kernel, nb=nb, s=sp, k=kp, P=P,
                          lower_only=lower_only),
        grid=(grid,),
        in_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp),
                  _spec(nb * P * sp, kp)],
        out_specs=_spec(nb * P * sp, kp),
        out_shape=jax.ShapeDtypeStruct((grid, nb * P * sp, kp), f32),
        interpret=interpret,
    )(Lo_f, Li_f, r_f)
    return _unfold(y, B, nb, sp, P, s, k)


# ---------------------------------------------------------------------------
# block-arrow
# ---------------------------------------------------------------------------


def _arrow_llt_kernel(diag_ref, side_ref, Ld_ref, Lo_ref, Li_ref, *, nb, s,
                      P):
    """Per-block chol(D_i), B_i = S_i L_i^{-T}, Schur complement on the
    last block (ref: blockArrowLLT.cpp:52-81). The up-arrow roll is done
    by the caller."""
    acc = jnp.zeros((P, s, s), f32)
    for i in range(nb - 1):
        sl = slice(i * P * s, (i + 1) * P * s)
        L = _chol_b(diag_ref[0, sl, :].reshape(P, s, s), s)
        Li = _tri_inv_b(L, s)
        Bi = _bmm_nt(side_ref[0, sl, :].reshape(P, s, s), Li)
        Ld_ref[0, sl, :] = L.reshape(P * s, s)
        Li_ref[0, sl, :] = Li.reshape(P * s, s)
        Lo_ref[0, sl, :] = Bi.reshape(P * s, s)
        acc = acc + _bmm_nt(Bi, Bi)
    last = slice((nb - 1) * P * s, nb * P * s)
    L_last = _chol_b(diag_ref[0, last, :].reshape(P, s, s) - acc, s)
    Ld_ref[0, last, :] = L_last.reshape(P * s, s)
    Li_ref[0, last, :] = _tri_inv_b(L_last, s).reshape(P * s, s)


@functools.partial(jax.jit, static_argnames=("up", "interpret", "pack"))
def block_arrow_llt_pallas(diag: jax.Array, side: jax.Array,
                           up: bool = False, interpret: bool = False,
                           pack: int | None = None):
    """Batched block-arrow LLT fused in one kernel, ``pack`` problems per
    program. Up arrows are reduced to down arrows by the same implicit roll
    as the reference (ref: blockArrowLLT.h:34-48); use
    :func:`block_arrow_solve_pallas` (same ``up``) for solves so rhs rolls
    match."""
    B, nb, s, _ = diag.shape
    if up:
        diag = jnp.roll(diag, -1, axis=1)
    sp = _round_up(s, 8)
    P = pack or _auto_pack(_llt_bytes_pp(nb, sp), B)
    diag_f = _fold(_pad_batch(diag, P), sp, P, eye_pad=True)
    side_f = _fold(_pad_batch(jnp.concatenate(
        [side, jnp.zeros((B, 1, s, s), side.dtype)], axis=1), P), sp, P,
        eye_pad=False)
    grid = diag_f.shape[0]
    out = pl.pallas_call(
        functools.partial(_arrow_llt_kernel, nb=nb, s=sp, P=P),
        grid=(grid,),
        in_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp)],
        out_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp),
                   _spec(nb * P * sp, sp)],
        out_shape=[jax.ShapeDtypeStruct((grid, nb * P * sp, sp), f32)] * 3,
        interpret=interpret,
    )(diag_f, side_f)
    Ld = _unfold(out[0], B, nb, sp, P, s, s)
    Lo = _unfold(out[1], B, nb, sp, P, s, s)[:, :nb - 1]
    Li = _unfold(out[2], B, nb, sp, P, s, s)
    return Ld, Lo, Li


def _arrow_solve_kernel(Lo_ref, Li_ref, r_ref, y_ref, *, nb, s, k, P):
    """Fused y = G^{-1} r for the arrow factor
    (ref: blockArrowLLT.cpp:92-277): independent head blocks, the last
    block gathers/scatters the coupling."""
    def blk(ref, i):
        return ref[0, i * P * s:(i + 1) * P * s, :].reshape(P, s, -1)

    heads = []
    acc = jnp.zeros((P, s, k), f32)
    for i in range(nb - 1):
        yi = _bmm(blk(Li_ref, i), blk(r_ref, i))
        heads.append(yi)
        acc = acc + _bmm(blk(Lo_ref, i), yi)
    y_last = _bmm(blk(Li_ref, nb - 1), blk(r_ref, nb - 1) - acc)
    # backward
    w_last = _bmm_tn(blk(Li_ref, nb - 1), y_last)
    y_ref[0, (nb - 1) * P * s:nb * P * s, :] = w_last.reshape(P * s, k)
    for i in range(nb - 1):
        rhs = heads[i] - _bmm_tn(blk(Lo_ref, i), w_last)
        y_ref[0, i * P * s:(i + 1) * P * s, :] = _bmm_tn(
            blk(Li_ref, i), rhs).reshape(P * s, k)


@functools.partial(jax.jit, static_argnames=("up", "interpret", "pack"))
def block_arrow_solve_pallas(L_side: jax.Array, Linv: jax.Array,
                             r: jax.Array, up: bool = False,
                             interpret: bool = False,
                             pack: int | None = None):
    """Fused y = G^{-1} r for a block-arrow factor from
    :func:`block_arrow_llt_pallas`. r: (B, nb, s, k); ``pack`` problems
    per program."""
    B, nb, s, k = r.shape
    if up:
        r = jnp.roll(r, -1, axis=1)
    sp = _round_up(s, 8)
    kp = _round_up(k, 8)
    P = pack or _auto_pack(_solve_bytes_pp(nb, sp, kp), B)
    Lo_f = _fold(_pad_batch(jnp.concatenate(
        [L_side, jnp.zeros((B, 1, s, s), L_side.dtype)], axis=1), P), sp, P,
        eye_pad=False)
    Li_f = _fold(_pad_batch(Linv, P), sp, P, eye_pad=True)
    r_f, kp = _fold_rhs(_pad_batch(r, P), sp, P)
    grid = r_f.shape[0]
    y = pl.pallas_call(
        functools.partial(_arrow_solve_kernel, nb=nb, s=sp, k=kp, P=P),
        grid=(grid,),
        in_specs=[_spec(nb * P * sp, sp), _spec(nb * P * sp, sp),
                  _spec(nb * P * sp, kp)],
        out_specs=_spec(nb * P * sp, kp),
        out_shape=jax.ShapeDtypeStruct((grid, nb * P * sp, kp), f32),
        interpret=interpret,
    )(Lo_f, Li_f, r_f)
    y = _unfold(y, B, nb, sp, P, s, k)
    if up:
        y = jnp.roll(y, 1, axis=1)
    return y
