"""Pallas sorted block-sparse scatter-add + custom-VJP embedding gather
(interpret mode on CPU; the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kge_tpu.ops import pallas_ops


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    pallas_ops.set_gather_mode("xla")


@pytest.mark.parametrize(
    "E,D,B",
    [(100, 64, 257), (7, 8, 12), (600, 130, 3000), (2048, 128, 4096)],
)
def test_sorted_scatter_add_matches_xla(E, D, B):
    rng = np.random.default_rng(E + D + B)
    ids = jnp.asarray(rng.integers(0, E, B))
    upd = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    got = pallas_ops.sorted_scatter_add(ids, upd, E, interpret=True)
    want = jnp.zeros((E, D)).at[ids].add(upd)
    assert np.allclose(got, want, atol=1e-5), float(jnp.abs(got - want).max())


def test_sorted_scatter_add_skewed_rows():
    """Hub rows with many duplicate updates exercise the multi-chunk path."""
    rng = np.random.default_rng(0)
    E, D, B = 50, 64, 2000
    ids = jnp.asarray(np.where(rng.random(B) < 0.8, 3, rng.integers(0, E, B)))
    upd = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    got = pallas_ops.sorted_scatter_add(ids, upd, E, interpret=True)
    want = jnp.zeros((E, D)).at[ids].add(upd)
    assert np.allclose(got, want, atol=1e-4, rtol=1e-5)


def test_embedding_gather_grad_parity():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 300, 128))

    pallas_ops.set_gather_mode("pallas")

    def f(t):
        return jnp.sum(jnp.sin(pallas_ops.embedding_gather(t, ids)) ** 2)

    def f_ref(t):
        return jnp.sum(jnp.sin(t[ids]) ** 2)

    assert np.allclose(f(table), f_ref(table))
    g1 = jax.grad(f)(table)
    g2 = jax.grad(f_ref)(table)
    assert np.allclose(g1, g2, atol=1e-5, rtol=1e-4)


def test_training_with_pallas_gather():
    """End-to-end: a training job with pallas_gather=always still learns."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("train.type", "negative_sampling")
    config.set("train.pallas_gather", "always")
    config.set("valid.every", 0)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    traces = job.run_epoch_group(3)
    assert pallas_ops.gather_mode() == "pallas"
    losses = [t["avg_loss"] for t in traces]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_rows_set_fallback_matches_scatter():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    ids = jnp.asarray([4, 9, 9, 30])
    rows = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    rows = rows.at[2].set(rows[1])  # duplicates must carry identical rows
    got = pallas_ops.rows_set(table, ids, rows, interpret=True)
    want = table.at[ids].set(rows)
    assert np.allclose(got, want)
