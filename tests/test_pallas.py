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


@pytest.mark.parametrize("opt_type", ["adam", "adagrad", "adamw"])
def test_fused_sorted_update_matches_dense_rule(opt_type):
    """fused_sorted_update == dense [scatter-add grad + optimizer rule]
    for dense-semantics rules (Adam moments decay on untouched rows)."""
    from kge_tpu.ops.optim import _RULES
    from kge_tpu.ops.pallas_ops import fused_sorted_update

    rng = np.random.default_rng(hash(opt_type) % 2**31)
    E, D, B = 700, 128, 900
    args = {"weight_decay": 0.01} if opt_type != "adamw" else {
        "weight_decay": 0.01, "betas": (0.9, 0.999)}
    init_fn, update_fn, _ = _RULES[opt_type]
    param = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    state = init_fn(param, args)
    # non-trivial state so decay effects on untouched rows are visible
    state = {k: jnp.asarray(rng.random((E, D)).astype(np.float32)) * 0.1
             for k in state}
    ids = jnp.asarray(rng.integers(0, E, B))
    upd = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    lr, step = 0.05, 3.0

    keys = sorted(state.keys())

    def rule(g, p, st_tuple, lr_, step_):
        st = dict(zip(keys, st_tuple))
        delta, new_state = update_fn(g, st, p, lr_, step_, args)
        return p + delta, tuple(new_state[k] for k in keys)

    got_p, got_states = fused_sorted_update(
        ids, upd, param, tuple(state[k] for k in keys), lr, step, rule,
        interpret=True,
    )
    g_dense = jnp.zeros_like(param).at[ids].add(upd)
    want_p, want_states = rule(
        g_dense, param, tuple(state[k] for k in keys), lr, step
    )
    assert np.allclose(got_p, want_p, atol=1e-5), \
        float(jnp.abs(got_p - want_p).max())
    for g_s, w_s in zip(got_states, want_states):
        assert np.allclose(g_s, w_s, atol=1e-5)


def test_sparse_update_trajectory_matches_dense_adam():
    """3 epochs of NegSamp training with Adam: the row-sparse step (which
    routes table updates through fused_sorted_update) must track the
    standard dense step."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    losses = {}
    for mode in ("never", "always"):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set_all({
            "train.type": "negative_sampling",
            "negative_sampling.num_samples.s": 2,
            "negative_sampling.num_samples.o": 2,
            "train.optimizer.default.type": "Adam",
            "train.optimizer.default.args.+++": "override",
            "train.optimizer.default.args.lr": 0.01,
            "train.optimizer.default.args.weight_decay": 0.01,
            "train.max_epochs": 3,
            "train.batch_size": 6,
            "train.sparse_embedding_update": mode,
            "valid.every": 0,
            "complex.entity_embedder.dim": 8,
            "complex.relation_embedder.dim": 8,
        }, create=True)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        traces = job.run_epoch_group(3)
        if mode == "always":
            assert job._sparse_update, "sparse path did not engage for Adam"
        losses[mode] = [t["avg_loss"] for t in traces]
    np.testing.assert_allclose(
        losses["always"], losses["never"], rtol=2e-4
    )
