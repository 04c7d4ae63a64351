"""picked_scores: bit-exact per-row column extraction (ops/pick.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kge_tpu.ops.pick import _onehot_pick, picked_scores


@pytest.mark.parametrize("v", [7, 128, 300, 1000])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_onehot_pick_matches_take_along(v, dtype):
    rng = np.random.default_rng(0)
    n, k = 64, 13
    S = jnp.asarray(rng.standard_normal((n, v)), dtype=dtype)
    idx = jnp.asarray(rng.integers(0, v, (n, k)), dtype=jnp.int32)
    expect = jnp.take_along_axis(S, idx, axis=1)
    got = _onehot_pick(S, idx)
    # extraction is a copy: bit-exact in any dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
    assert got.dtype == expect.dtype


def test_onehot_pick_gradient_matches_scatter_add():
    rng = np.random.default_rng(1)
    n, v, k = 32, 500, 9
    S = jnp.asarray(rng.standard_normal((n, v)), dtype=jnp.float32)
    # duplicate columns within a row must accumulate their cotangents
    idx = jnp.asarray(rng.integers(0, v, (n, k)), dtype=jnp.int32)
    idx = idx.at[:, 1].set(idx[:, 0])

    def f_ref(S):
        return jnp.sum(jnp.sin(jnp.take_along_axis(S, idx, axis=1)) ** 2)

    def f_new(S):
        return jnp.sum(jnp.sin(_onehot_pick(S, idx)) ** 2)

    g_ref = jax.grad(f_ref)(S)
    g_new = jax.grad(f_new)(S)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize(
    "model_name",
    ["complex", "distmult", "rescal", "cp", "simple",
     "reciprocal_relations_model"],
)
@pytest.mark.parametrize("slot", [0, 2])
def test_grouped_all_scores_match_flat(model_name, slot):
    """score_slot_all_grouped == score_po/score_sp with targets=None,
    for every factorizing scorer and the reciprocal wrapper."""
    from kge_tpu.models import KgeModel
    from tests.util import get_test_config, get_test_dataset

    config = get_test_config()
    options = {"model": model_name}
    if model_name == "reciprocal_relations_model":
        options["reciprocal_relations_model"] = {
            "base_model": {"type": "complex"}
        }
    config.load_options(options)
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))

    triples = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(3).integers(0, 7, 5),
                np.random.default_rng(4).integers(0, 3, 5),
                np.random.default_rng(5).integers(0, 7, 5),
            ],
            axis=1,
        ),
        dtype=jnp.int32,
    )
    grouped = model.score_slot_all_grouped(params, triples, slot)
    assert grouped is not None
    n_ent = dataset.num_entities()
    flat_from_grouped = grouped.reshape(grouped.shape[0], -1)[:, :n_ent]
    if slot == 0:
        flat = model.score_po(params, triples[:, 1], triples[:, 2], None)
    else:
        flat = model.score_sp(params, triples[:, 0], triples[:, 1], None)
    np.testing.assert_allclose(
        np.asarray(flat_from_grouped), np.asarray(flat), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("slot", [0, 2])
def test_grouped_pick_matches_flat_pick(slot):
    """picked_scores_grouped over grouped scores == take_along over flat."""
    from kge_tpu.models import KgeModel
    from kge_tpu.ops.pick import picked_scores_grouped
    from tests.util import get_test_config, get_test_dataset

    config = get_test_config()
    config.load_options({"model": "complex"})
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(6)
    triples = jnp.asarray(
        np.stack(
            [rng.integers(0, 7, 5), rng.integers(0, 3, 5),
             rng.integers(0, 7, 5)], axis=1,
        ),
        dtype=jnp.int32,
    )
    idx = jnp.asarray(rng.integers(0, 7, (5, 4)), dtype=jnp.int32)
    grouped = model.score_slot_all_grouped(params, triples, slot)
    picked = picked_scores_grouped(grouped, idx)
    if slot == 0:
        flat = model.score_po(params, triples[:, 1], triples[:, 2], None)
    else:
        flat = model.score_sp(params, triples[:, 0], triples[:, 1], None)
    expect = jnp.take_along_axis(flat, idx, axis=1)
    np.testing.assert_allclose(
        np.asarray(picked), np.asarray(expect), rtol=1e-5, atol=1e-5
    )


def test_exact_all_training_same_loss_grouped_and_flat():
    """One epoch of implementation=all NegSamp training: the grouped-pick
    path must trace the same losses as the flat path."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    losses = {}
    for forced in (False, True):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set_all({
            "train.type": "negative_sampling",
            "negative_sampling.implementation": "all",
            "negative_sampling.num_samples.s": 4,
            "negative_sampling.num_samples.o": 4,
            "train.max_epochs": 1,
            "train.batch_size": 6,
            "valid.every": 0,
        }, create=True)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        job._force_grouped_all = forced
        trace = job.run_epoch_group(1)[0]
        losses[forced] = trace["avg_loss"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_picked_scores_delegates_consistently():
    rng = np.random.default_rng(2)
    S = jnp.asarray(rng.standard_normal((8, 50)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, 50, (8, 4)), dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(picked_scores(S, idx)),
        np.asarray(jnp.take_along_axis(S, idx, axis=1)),
    )
