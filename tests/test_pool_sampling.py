"""Pool-implementation negative sampling: exact per-row marginals, correct
scoring semantics, and training integration (see
negative_sampling.implementation "pool" in config-default.yaml)."""

import numpy as np
import pytest

from tests.util import DATASET_DIR, get_test_config, get_test_dataset


def make_pool_job(model="complex", **options):
    from kge_tpu.job import TrainingJob

    config = get_test_config(
        **{
            "train.type": "negative_sampling",
            "negative_sampling.implementation": "pool",
            "negative_sampling.num_samples.s": 4,
            "negative_sampling.num_samples.o": 4,
            "train.batch_size": 6,
            "train.max_epochs": 2,
            "valid.every": 0,
            "lookup_embedder.dim": 8,
        }
    )
    config.load_options({"model": model})
    for k, v in options.items():
        config.set(k, v, create=True)
    dataset = get_test_dataset(config)
    return TrainingJob.create(config, dataset)


@pytest.mark.parametrize("model", ["complex", "transe", "rotate"])
def test_pool_scores_match_explicit_selection(model):
    """The pool-scored negatives must equal score_spo of the selected pool
    entities (the selection semantics, checked against a direct compute) —
    both for the matmul pool path (bilinear models) and the row-candidate
    pool path (distance models)."""
    import jax
    import jax.numpy as jnp

    job = make_pool_job(model)
    job._prepare()
    job._is_prepared = True
    params = job.model_params
    triples = jnp.asarray(job.triples[:6].astype(np.int32))
    rng = jax.random.PRNGKey(3)
    slot = 2  # O
    drawn = job._draw_negatives_on_device(triples, slot, rng)
    pool = drawn["neg_pool_2"]
    sel = drawn["neg_sel_2"]
    from kge_tpu.models import Ctx

    ctx = Ctx(train=False, rng=None, stats={})
    batch = {"triples": triples, **drawn}
    scores = job._score_negatives(params, triples, slot, batch, ctx)

    # explicit: resolve each row's selected entity ids and score via spo
    m = job._pool_factor
    slots = np.arange(sel.shape[1]) * m + np.asarray(sel)
    ent = np.asarray(pool)[slots]  # n, k entity ids
    for i in range(triples.shape[0]):
        expected = job.model.score_spo(
            params,
            jnp.full(ent.shape[1], triples[i, 0]),
            jnp.full(ent.shape[1], triples[i, 1]),
            jnp.asarray(ent[i]),
            direction="o",
            ctx=ctx,
        )
        np.testing.assert_allclose(
            np.asarray(scores[i]), np.asarray(expected), rtol=1e-4, atol=1e-5
        )


def test_pool_marginal_distribution_uniform():
    """Each row's samples must be marginally uniform over the vocabulary and
    within-row draws must behave like iid (duplicate rate)."""
    import jax
    import jax.numpy as jnp

    job = make_pool_job(**{"negative_sampling.num_samples.s": 16})
    job._prepare()
    job._is_prepared = True
    V = job.dataset.num_entities()
    m = job._pool_factor
    n, k = 64, 16
    triples = jnp.zeros((n, 3), jnp.int32)
    counts = np.zeros(V)
    trials = 200
    for t in range(trials):
        drawn = job._draw_negatives_on_device(
            triples, 0, jax.random.PRNGKey(t)
        )
        pool = np.asarray(drawn["neg_pool_0"])
        sel = np.asarray(drawn["neg_sel_0"])
        vals = pool[np.arange(k) * m + sel]
        counts += np.bincount(vals.reshape(-1), minlength=V)
    freq = counts / counts.sum()
    # uniform marginal: each entity ~ 1/V
    assert np.all(np.abs(freq - 1.0 / V) < 0.25 / V), freq * V


def test_pool_training_decreases_loss(tmp_path):
    job = make_pool_job()
    job.config.folder = str(tmp_path)
    job.config.init_folder()
    job._prepare()
    job._is_prepared = True
    traces = job.run_epoch_group(8)
    assert traces[-1]["avg_loss"] < traces[0]["avg_loss"]
    assert np.isfinite(traces[-1]["avg_loss"])


def test_pool_rejects_shared_and_filtering():
    with pytest.raises(ValueError, match="shared"):
        job = make_pool_job(**{"negative_sampling.shared": True})
        job._prepare()
    with pytest.raises(ValueError, match="filter"):
        job = make_pool_job(**{"negative_sampling.filtering.s": True})
        job._prepare()


def test_pool_frequency_sampling_marginal():
    """Pool draws follow the unigram^alpha distribution when
    sampling_type=frequency."""
    import jax
    import jax.numpy as jnp

    job = make_pool_job(
        **{
            "negative_sampling.sampling_type": "frequency",
            "negative_sampling.num_samples.s": 16,
        }
    )
    job._prepare()
    job._is_prepared = True
    V = job.dataset.num_entities()
    m = job._pool_factor
    k = 16
    triples = jnp.zeros((16, 3), jnp.int32)
    counts = np.zeros(V)
    for t in range(300):
        drawn = job._draw_negatives_on_device(
            triples, 0, jax.random.PRNGKey(t)
        )
        pool = np.asarray(drawn["neg_pool_0"])
        sel = np.asarray(drawn["neg_sel_0"])
        vals = pool[np.arange(k) * m + sel]
        counts += np.bincount(vals.reshape(-1), minlength=V)
    freq = counts / counts.sum()
    cdf = np.asarray(job._sampler._cdf[0])
    expected = np.diff(np.concatenate([[0.0], cdf]))
    np.testing.assert_allclose(freq, expected, atol=0.02)


@pytest.mark.parametrize("model,loss", [
    ("transe", "margin_ranking"), ("rotate", "bce_self_adversarial"),
])
def test_pooled_kernel_matches_xla_path(model, loss):
    """negative_sampling.pooled_kernel=always (fused Pallas kernel,
    interpreted off-TPU) must reproduce the XLA pooled path's per-batch
    loss for distance models."""
    import jax
    import jax.numpy as jnp

    losses = {}
    for mode in ("never", "always"):
        job = make_pool_job(
            model,
            **{
                "train.loss": loss,
                "negative_sampling.pooled_kernel": mode,
                "random_seed.default": 5,
            },
        )
        job._prepare()
        job._is_prepared = True
        params = job.model_params
        triples = jnp.asarray(job.triples[:6].astype(np.int32))
        batch = {
            "triples": triples,
            "mask": jnp.ones(6, jnp.float32),
            "true_size": 6,
        }
        loss_val, _ = job._loss_for_batch(params, batch, jax.random.PRNGKey(9))
        losses[mode] = float(loss_val)
    assert np.isfinite(losses["always"])
    np.testing.assert_allclose(losses["always"], losses["never"],
                               rtol=1e-5, atol=1e-6)


def test_pooled_kernel_gradients_match_xla_path():
    """Gradients through the fused kernel path equal the XLA path's."""
    import jax
    import jax.numpy as jnp

    grads = {}
    for mode in ("never", "always"):
        job = make_pool_job(
            "transe",
            **{
                "train.loss": "margin_ranking",
                "negative_sampling.pooled_kernel": mode,
                "random_seed.default": 5,
            },
        )
        job._prepare()
        job._is_prepared = True
        params = job.model_params
        triples = jnp.asarray(job.triples[:6].astype(np.int32))
        batch = {
            "triples": triples,
            "mask": jnp.ones(6, jnp.float32),
            "true_size": 6,
        }

        def loss_fn(p):
            val, _ = job._loss_for_batch(p, batch, jax.random.PRNGKey(9))
            return val

        grads[mode] = jax.grad(loss_fn)(params)
    ga = jax.tree_util.tree_leaves(grads["always"])
    gn = jax.tree_util.tree_leaves(grads["never"])
    for a, b in zip(ga, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
