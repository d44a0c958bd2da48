"""Double-single ("two-float32") compensated arithmetic for TPU.

TPU has no hardware float64: XLA emulates it in software, and batched f64
contractions run ~20x slower than f32 (measured on v5e). The iterative-
refinement epilogue of the fast GI engine needs a handful of *one-time*
high-precision residual products (G x, C x, C^T mu) whose accuracy floor
must sit well below the 1e-8 KKT target -- but plain f32 accumulation over
n~50 terms floors at ~sqrt(n)*eps32 ~ 5e-7.

This module implements the classic error-free-transformation toolbox
(Dekker/Veltkamp splitting + Knuth TwoSum; see Ogita, Rump & Oishi,
"Accurate Sum and Dot Product", SISC 2005) as vectorized f32 tensor ops:

- every f64 operand is represented as an (hi, lo) f32 pair with
  x == hi + lo up to 2^-48 relative;
- elementwise products are made exact with a Veltkamp split (the 4097
  trick splits a 24-bit f32 mantissa into two 12-bit halves whose
  products are exact in f32);
- contractions reduce with a pairwise TwoSum tree, carrying a running
  compensation term.

The result of :func:`dd_contract` matches a float64 contraction to
~1e-13 relative -- far below the 1e-8 KKT bar -- while running entirely
as f32 VPU ops (~10x cheaper than XLA's f64 emulation, measured).

No reference counterpart: the reference is a CPU library with native
float64 (SURVEY.md section 6); this is the TPU-native substitute.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["split_f64", "join_f64", "dd_contract", "dd_matvec"]

_F32 = jnp.float32
# Veltkamp split constant for f32 (24-bit mantissa -> two 12-bit halves)
_SPLIT = jnp.float32(4097.0)  # 2**12 + 1


def split_f64(x):
    """f64 array -> (hi, lo) f32 pair with x == hi + lo (2^-48 relative).

    Infinities map to (inf, nan); callers must mask non-finite entries
    *before* splitting (active-constraint bounds are always finite).
    """
    hi = x.astype(_F32)
    lo = (x - hi.astype(x.dtype)).astype(_F32)
    return hi, lo


def join_f64(hi, lo):
    """(hi, lo) f32 pair -> f64 array."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _two_prod(a, b):
    """Exact product: returns (p, e) with a*b == p + e, p = fl(a*b).

    Veltkamp-split based (no FMA dependency); if XLA fuses the `a*b - p`
    forms into FMAs the result only gets *more* exact.
    """
    p = a * b
    ca = a * _SPLIT
    ah = ca - (ca - a)
    al = a - ah
    cb = b * _SPLIT
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_sum(a, b):
    """Exact sum: returns (s, e) with a + b == s + e, s = fl(a+b)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _dd_add(ah, al, bh, bl):
    """(ah, al) + (bh, bl) -> renormalized (hi, lo) pair."""
    s, e = _two_sum(ah, bh)
    t = (al + bl) + e
    hi = s + t
    lo = t - (hi - s)
    return hi, lo


def _dd_sum(ph, pl, axis: int):
    """Compensated pairwise-tree sum of a dd tensor along `axis`."""
    size = ph.shape[axis]
    n2 = 1 << max(size - 1, 0).bit_length()  # next power of two
    if n2 != size:
        pad = [(0, 0)] * ph.ndim
        pad[axis] = (0, n2 - size)
        ph = jnp.pad(ph, pad)
        pl = jnp.pad(pl, pad)
    while n2 > 1:
        half = n2 // 2
        ah = lax.slice_in_dim(ph, 0, half, axis=axis)
        bh = lax.slice_in_dim(ph, half, n2, axis=axis)
        al = lax.slice_in_dim(pl, 0, half, axis=axis)
        bl = lax.slice_in_dim(pl, half, n2, axis=axis)
        ph, pl = _dd_add(ah, al, bh, bl)
        n2 = half
    return jnp.squeeze(ph, axis=axis), jnp.squeeze(pl, axis=axis)


def dd_contract(Ah, Al, vh, vl, axis: int = -1):
    """Compensated contraction sum_j A[..., j, ...] * v[..., j].

    ``(Ah, Al)``: dd pair for the tensor A; ``(vh, vl)``: dd pair for the
    vector v, shaped so that ``v`` broadcasts against ``A`` with its last
    axis aligned to ``A``'s `axis`. Returns an (hi, lo) f32 pair of the
    contraction with ~2^-48 relative accuracy.

    Typical uses (B = batch):
      y  = G x   : dd_contract(Gh, Gl, xh[:, None, :], xl[:, None, :], -1)
      cx = C x   : same with C (B, m, n)
      w  = C^T mu: dd_contract(Ch, Cl, muh[:, :, None], mul[:, :, None], -2)
    """
    axis = axis % Ah.ndim
    ph, pe = _two_prod(Ah, vh)
    # cross terms are eps32-relative; f32 rounding on them is eps32^2-level
    pl = pe + (Ah * vl + Al * vh)
    return _dd_sum(ph, pl, axis)


def dd_matvec(Ah, Al, xh, xl):
    """Batched (..., r, c) @ (..., c) -> (..., r) dd pair."""
    return dd_contract(Ah, Al, xh[..., None, :], xl[..., None, :], axis=-1)
