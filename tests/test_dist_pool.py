"""Fused pooled distance kernels (ops/dist_pool.py) against the plain XLA
formulation: values and gradients, both score kinds, odd shapes (padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kge_tpu.ops.dist_pool import pooled_dist_scores


def _ref_l1(q, pool, sel, F):
    K = sel.shape[1]
    pool3 = pool.reshape(K, F, -1)
    oh = jax.nn.one_hot(sel, F, dtype=q.dtype)
    cand = jnp.einsum("njf,jfd->njd", oh, pool3,
                      precision=jax.lax.Precision.HIGHEST)
    return -jnp.sum(jnp.abs(q[:, None, :] - cand), axis=2)


def _ref_cmod(q_re, q_im, pool_re, pool_im, sel, F):
    K = sel.shape[1]
    oh = jax.nn.one_hot(sel, F, dtype=q_re.dtype)
    c_re = jnp.einsum("njf,jfd->njd", oh, pool_re.reshape(K, F, -1),
                      precision=jax.lax.Precision.HIGHEST)
    c_im = jnp.einsum("njf,jfd->njd", oh, pool_im.reshape(K, F, -1),
                      precision=jax.lax.Precision.HIGHEST)
    d_re = q_re[:, None, :] - c_re
    d_im = q_im[:, None, :] - c_im
    return -jnp.sum(jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30), axis=2)


@pytest.mark.parametrize("n,K,F,d", [(16, 8, 4, 32), (7, 5, 3, 20),
                                     (8, 128, 4, 128)])
def test_l1_matches_reference(n, K, F, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(K * F, d)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    out = pooled_dist_scores([q], [pool], sel, F, "l1")
    ref = _ref_l1(q, pool, sel, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,K,F,d", [(16, 8, 4, 32), (5, 6, 2, 12)])
def test_cmod_matches_reference(n, K, F, d):
    rng = np.random.default_rng(1)
    arrs = [
        jnp.asarray(rng.normal(size=s).astype(np.float32))
        for s in [(n, d), (n, d), (K * F, d), (K * F, d)]
    ]
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    out = pooled_dist_scores(arrs[:2], arrs[2:], sel, F, "cmod")
    ref = _ref_cmod(*arrs, sel, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_l1_gradients_match():
    rng = np.random.default_rng(2)
    n, K, F, d = 12, 8, 4, 24
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(K * F, d)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))

    def loss_kernel(q, pool):
        return jnp.sum(w * pooled_dist_scores([q], [pool], sel, F, "l1"))

    def loss_ref(q, pool):
        return jnp.sum(w * _ref_l1(q, pool, sel, F))

    gk = jax.grad(loss_kernel, argnums=(0, 1))(q, pool)
    gr = jax.grad(loss_ref, argnums=(0, 1))(q, pool)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_cmod_gradients_match():
    rng = np.random.default_rng(3)
    n, K, F, d = 9, 7, 3, 16
    arrs = [
        jnp.asarray(rng.normal(size=s).astype(np.float32))
        for s in [(n, d), (n, d), (K * F, d), (K * F, d)]
    ]
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))

    def loss_kernel(*a):
        return jnp.sum(w * pooled_dist_scores(a[:2], a[2:], sel, F, "cmod"))

    def loss_ref(*a):
        return jnp.sum(w * _ref_cmod(*a, sel, F))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*arrs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*arrs)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bad_arity_raises():
    q = jnp.zeros((4, 8))
    pool = jnp.zeros((8, 8))
    sel = jnp.zeros((4, 4), jnp.int32)
    with pytest.raises(ValueError):
        pooled_dist_scores([q, q], [pool, pool], sel, 2, "l1")
    with pytest.raises(ValueError):
        pooled_dist_scores([q], [pool], sel, 2, "nope")


@pytest.mark.parametrize("kind,npairs", [("l1", 1), ("cmod", 2)])
def test_bench_shape_f8_values_and_grads(kind, npairs):
    """pool_factor=8 (the config default / bench shape) through values and
    gradients."""
    rng = np.random.default_rng(7)
    n, K, F, d = 8, 16, 8, 32
    qs = [jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
          for _ in range(npairs)]
    pools = [jnp.asarray(rng.normal(size=(K * F, d)).astype(np.float32))
             for _ in range(npairs)]
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))
    ref_fn = _ref_l1 if kind == "l1" else _ref_cmod

    def loss_kernel(*a):
        return jnp.sum(
            w * pooled_dist_scores(a[:npairs], a[npairs:], sel, F, kind)
        )

    def loss_ref(*a):
        return jnp.sum(w * ref_fn(*a, sel, F))

    args = (*qs, *pools)
    np.testing.assert_allclose(
        float(loss_kernel(*args)), float(loss_ref(*args)), rtol=1e-5
    )
    gk = jax.grad(loss_kernel, argnums=tuple(range(2 * npairs)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(2 * npairs)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dim_not_multiple_of_tile():
    """d=384 (128-padded but not a multiple of the 256 dim tile) must not
    silently drop trailing dims — caught by review."""
    rng = np.random.default_rng(11)
    n, K, F, d = 8, 8, 4, 384
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(K * F, d)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, F, size=(n, K)).astype(np.int32))
    out = pooled_dist_scores([q], [pool], sel, F, "l1")
    ref = _ref_l1(q, pool, sel, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda q, p: jnp.sum(
        pooled_dist_scores([q], [p], sel, F, "l1")))(q, pool)
    gr = jax.grad(lambda q, p: jnp.sum(_ref_l1(q, p, sel, F)))(q, pool)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)
