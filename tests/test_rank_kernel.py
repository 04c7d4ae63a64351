"""Fused filtered-rank kernel (ops/rank_kernel.py) vs the plain XLA
formulation: greater/close counts with tie semantics, label-value
extraction, score epilogue, padding edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kge_tpu.ops.rank_kernel import fused_rank_counts


def _ref(q, T, pivot, cols, E, atol, rtol, score_map=None):
    S = q @ T.T
    if score_map is not None:
        S = score_map(S)
    valid = jnp.arange(T.shape[0])[None, :] < E
    close = jnp.abs(S - pivot[:, None]) <= atol + rtol * jnp.abs(pivot)[:, None]
    greater = (S > pivot[:, None]) & ~close
    g = jnp.sum(greater & valid, axis=1)
    c = jnp.sum(close & valid, axis=1)
    cl = jnp.clip(cols, 0, T.shape[0] - 1)
    vals = jnp.take_along_axis(S, cl, axis=1)
    vals = jnp.where(cols < E, vals, 0.0)
    return g, c, vals


@pytest.mark.parametrize("n,E,D,kmax", [(8, 50, 16, 4), (5, 300, 32, 7)])
def test_counts_and_vals_match_reference(n, E, D, kmax):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    T = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    pivot = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, E + 3, size=(n, kmax)).astype(np.int32))
    g, c, vals = fused_rank_counts(q, T, pivot, cols, E, 1e-5, 1e-4)
    rg, rc, rvals = _ref(q, T, pivot, cols, E, 1e-5, 1e-4)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(rg))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                               rtol=1e-5, atol=1e-6)


def test_score_epilogue_applies():
    rng = np.random.default_rng(1)
    n, E, D, kmax = 6, 40, 8, 3
    q = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    T = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    smap = lambda d: -jnp.sqrt(jnp.maximum(-d, 0.0) + 1e-30)
    pivot = jnp.asarray(rng.normal(size=(n,)).astype(np.float32)) - 3.0
    cols = jnp.asarray(rng.integers(0, E, size=(n, kmax)).astype(np.int32))
    g, c, vals = fused_rank_counts(q, T, pivot, cols, E, 1e-5, 1e-4,
                                   score_map=smap)
    rg, rc, rvals = _ref(q, T, pivot, cols, E, 1e-5, 1e-4, score_map=smap)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(rg))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                               rtol=1e-5, atol=1e-6)


def test_self_pivot_ties():
    """A pivot equal to one of the row's own scores must count that
    position as close (self-tie), never as greater."""
    rng = np.random.default_rng(2)
    n, E, D = 4, 30, 8
    q = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    T = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    ids = jnp.asarray([0, 5, 17, 29])
    S = q @ T.T
    pivot = S[jnp.arange(n), ids]
    cols = jnp.zeros((n, 2), jnp.int32)
    g, c, _ = fused_rank_counts(q, T, pivot, cols, E, 1e-5, 1e-4)
    assert np.all(np.asarray(c) >= 1)
