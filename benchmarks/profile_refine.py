"""Micro-profile of _refine_batch internals on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

B, n, m = 4096, 50, 100
key = jax.random.key(0)
ks = jax.random.split(key, 8)
G64 = jax.random.normal(ks[0], (B, n, n), jnp.float64)
C64 = jax.random.normal(ks[1], (B, m, n), jnp.float64)
x64 = jax.random.normal(ks[2], (B, n), jnp.float64)
idxs = jax.random.randint(ks[3], (B, n), 0, m)
G32 = G64.astype(jnp.float32)
x32 = x64.astype(jnp.float32)
vals = jax.random.normal(ks[4], (B, n), jnp.float64)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def t(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.2f} ms")
    return out


t("einsum f32 (B,n,n)@(B,n)", lambda A, v: jnp.einsum("bij,bj->bi", A, v), G32, x32)
t("einsum f64 (B,n,n)@(B,n)", lambda A, v: jnp.einsum("bij,bj->bi", A, v), G64, x64)
t("einsum f64 (B,m,n)@(B,n)", lambda A, v: jnp.einsum("bij,bj->bi", A, v), C64, x64)
M = jnp.concatenate([G64, G64], axis=1)
t("einsum f64 (B,2n,n)@(B,n)", lambda A, v: jnp.einsum("bij,bj->bi", A, v), M, x64)
t("gather take_along f64 (B,n,n) rows from C", lambda C, i: jnp.take_along_axis(C, i[:, :, None], axis=1), C64, idxs)
t("one_hot f64 (B,n,n)", lambda i: jax.nn.one_hot(i % n, n, dtype=jnp.float64), idxs)
t("scatter-add vmap (B,m+n)", lambda i, v: jax.vmap(lambda mu, ii, vv: mu.at[ii].add(vv))(jnp.zeros((B, m + n), jnp.float64), i, v), idxs, vals)
t("concat f64 (B,2n,n)", lambda A: jnp.concatenate([A, A], axis=1), G64)
t("astype f64->f32 (B,n,n)", lambda A: A.astype(jnp.float32), G64)
t("einsum f64 (B,n,m)@(B,m) C^T", lambda A, v: jnp.einsum("bji,bj->bi", A, v), C64, jnp.concatenate([x64, x64], 1))
