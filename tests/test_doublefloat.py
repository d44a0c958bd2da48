"""Accuracy tests for the double-single compensated contraction
(jrlqp_tpu.ops.doublefloat) against numpy float64 oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from jrlqp_tpu.ops.doublefloat import (
    dd_contract,
    dd_matvec,
    join_f64,
    split_f64,
)


def _rel_err(got, want):
    scale = np.maximum(np.abs(want), 1e-30)
    return np.max(np.abs(got - want) / scale)


def test_split_join_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64,)) * np.exp(rng.uniform(-20, 20, 64)))
    hi, lo = split_f64(x)
    back = np.asarray(join_f64(hi, lo))
    assert _rel_err(back, np.asarray(x)) < 2 ** -47


def test_dd_matvec_matches_f64():
    rng = np.random.default_rng(1)
    B, r, c = 16, 13, 50
    A = rng.standard_normal((B, r, c))
    x = rng.standard_normal((B, c))
    want = np.einsum("bij,bj->bi", A, x)
    Ah, Al = split_f64(jnp.asarray(A))
    xh, xl = split_f64(jnp.asarray(x))
    gh, gl = jax.jit(dd_matvec)(Ah, Al, xh, xl)
    got = np.asarray(join_f64(gh, gl))
    # f32 accumulation would floor at ~5e-7 absolute; dd must be ~1e-13
    assert np.max(np.abs(got - want)) < 1e-12


def test_dd_matvec_cancellation():
    """The hard case: the contraction result is tiny relative to the terms
    (exactly the KKT-residual situation: N lam ~ G x + a)."""
    rng = np.random.default_rng(2)
    B, n = 8, 50
    A = rng.standard_normal((B, n, n))
    x = rng.standard_normal((B, n))
    y = np.einsum("bij,bj->bi", A, x)
    # build v so that A v cancels to ~1e-8 of the term magnitude
    Ainv = np.linalg.inv(A)
    v = x - np.einsum("bij,bj->bi", Ainv, y * (1 - 1e-8))
    want = np.einsum("bij,bj->bi", A, v)  # ~1e-8 * |y|
    Ah, Al = split_f64(jnp.asarray(A))
    vh, vl = split_f64(jnp.asarray(v))
    gh, gl = jax.jit(dd_matvec)(Ah, Al, vh, vl)
    got = np.asarray(join_f64(gh, gl))
    assert np.max(np.abs(got - want)) < 1e-13  # abs error vs O(1) terms


def test_dd_contract_transposed_axis():
    rng = np.random.default_rng(3)
    B, m, n = 4, 100, 50
    C = rng.standard_normal((B, m, n))
    mu = rng.standard_normal((B, m))
    want = np.einsum("bji,bj->bi", C, mu)
    Ch, Cl = split_f64(jnp.asarray(C))
    mh, ml = split_f64(jnp.asarray(mu))
    gh, gl = jax.jit(
        lambda a, b, c, d: dd_contract(a, b, c[:, :, None], d[:, :, None], axis=-2)
    )(Ch, Cl, mh, ml)
    got = np.asarray(join_f64(gh, gl))
    assert np.max(np.abs(got - want)) < 1e-12


def test_dd_contract_nonpow2_axis():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((3, 7, 37))
    x = rng.standard_normal((3, 37))
    want = np.einsum("bij,bj->bi", A, x)
    Ah, Al = split_f64(jnp.asarray(A))
    xh, xl = split_f64(jnp.asarray(x))
    gh, gl = dd_matvec(Ah, Al, xh, xl)
    got = np.asarray(join_f64(gh, gl))
    assert np.max(np.abs(got - want)) < 1e-12
