"""TransE/RotatE L2 matmul-expansion scoring paths: equality with the
direct pairwise formulation, and the distance-model auto-implementation
policy (pool when eligible, triple otherwise; standard heuristic for L2)."""

import numpy as np
import pytest

from tests.util import get_test_config, get_test_dataset


def _make_model(model, l_norm, **options):
    from kge_tpu.models import KgeModel

    config = get_test_config(**{
        "lookup_embedder.dim": 16,
        f"{model}.l_norm": l_norm,
        **options,
    })
    config.load_options({"model": model})
    config.set(f"{model}.l_norm", l_norm)
    dataset = get_test_dataset(config)
    m = KgeModel.create(config, dataset)
    import jax

    return m, m.init_params(jax.random.PRNGKey(0))


def _pairwise_ref(model_name, params, model, s, p, targets, slot):
    """Direct [n, m, d] pairwise distance computation (no expansion)."""
    import jax.numpy as jnp

    ent = params["entity_embedder"]["embeddings"]
    rel = params["relation_embedder"]["embeddings"]
    if model_name == "transe":
        if slot == 2:
            q = ent[s] + rel[p]
        else:
            q = ent[s] - rel[p]  # here s carries the object ids
        diff = q[:, None, :] - ent[targets][None, :, :]
        return -jnp.sqrt(jnp.sum(diff * diff, axis=2) + 1e-30)
    # rotate
    d = ent.shape[1]
    e_re, e_im = ent[:, :d // 2], ent[:, d // 2:]
    ph = rel[p]
    p_re, p_im = jnp.cos(ph), jnp.sin(ph)
    if slot == 2:
        a_re, a_im = e_re[s], e_im[s]
        q_re = a_re * p_re - a_im * p_im
        q_im = a_re * p_im + a_im * p_re
    else:
        a_re, a_im = e_re[s], e_im[s]
        q_re = p_re * a_re + p_im * a_im
        q_im = p_re * a_im - p_im * a_re
    d_re = q_re[:, None, :] - e_re[targets][None, :, :]
    d_im = q_im[:, None, :] - e_im[targets][None, :, :]
    return -jnp.sqrt(jnp.sum(d_re ** 2 + d_im ** 2, axis=2) + 1e-30)


@pytest.mark.parametrize("model", ["transe", "rotate"])
def test_l2_many_targets_matches_pairwise(model):
    import jax.numpy as jnp

    m, params = _make_model(model, 2.0)
    n_ent = m.dataset.num_entities()
    s = jnp.asarray([0, 1, 2, 3])
    p = jnp.asarray([0, 1, 2, 0])
    targets = jnp.arange(n_ent)
    sp = m.score_sp(params, s, p)  # expansion path
    ref = _pairwise_ref(model, params, m, s, p, targets, 2)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    po = m.score_po(params, p, s)  # objects in s position of the helper
    ref_po = _pairwise_ref(model, params, m, s, p, targets, 0)
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref_po),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model", ["transe", "rotate"])
def test_l2_spo_unchanged_vs_l1_formulation(model):
    """The spo (positive-triple) form stays on the exact-norm path: L2
    scores from score_spo must equal the direct norm computation."""
    import jax.numpy as jnp

    m, params = _make_model(model, 2.0)
    s = jnp.asarray([0, 1, 2, 3])
    p = jnp.asarray([0, 1, 2, 0])
    o = jnp.asarray([4, 5, 6, 1])
    spo = m.score_spo(params, s, p, o)
    many = m.score_sp(params, s, p)
    picked = np.asarray(many)[np.arange(4), np.asarray(o)]
    np.testing.assert_allclose(np.asarray(spo), picked, rtol=1e-4, atol=1e-4)


def test_transe_l2_score_emb_neg_matches_direct():
    import jax
    import jax.numpy as jnp

    m, params = _make_model("transe", 2.0)
    rng = np.random.default_rng(0)
    n, k = 5, 7
    s = jnp.asarray(rng.integers(0, 7, n))
    p = jnp.asarray(rng.integers(0, 3, n))
    o = jnp.asarray(rng.integers(0, 7, n))
    samples = jnp.asarray(rng.integers(0, 7, (n, k)).astype(np.int32))
    triples = jnp.stack([s, p, o], axis=1).astype(jnp.int32)
    neg = m.score_spo_neg(params, triples, samples, 2)
    for i in range(n):
        expected = m.score_spo(
            params, jnp.full(k, s[i]), jnp.full(k, p[i]), samples[i]
        )
        np.testing.assert_allclose(np.asarray(neg[i]), np.asarray(expected),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model,l_norm,options,expected", [
    ("transe", 1.0, {}, "pool"),
    ("transe", 1.0, {"negative_sampling.filtering.s": True}, "triple"),
    ("transe", 1.0, {"negative_sampling.shared": True}, "triple"),
    ("rotate", 1.0, {}, "pool"),
    # L2 factorizes onto the MXU: the standard auto ladder applies
    # (pool preferred; "all" when exactness is demanded)
    ("transe", 2.0, {}, "pool"),
    ("transe", 2.0, {"negative_sampling.auto_exact": True}, "all"),
])
def test_distance_auto_implementation_policy(model, l_norm, options, expected):
    from kge_tpu.job import TrainingJob

    config = get_test_config(**{
        "train.type": "negative_sampling",
        "negative_sampling.num_samples.s": 4,
        "train.batch_size": 6,
        "valid.every": 0,
        "lookup_embedder.dim": 16,
        **options,
    })
    config.load_options({"model": model})
    config.set(f"{model}.l_norm", l_norm)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    assert config.get("negative_sampling.implementation") == expected


@pytest.mark.parametrize("model", ["transe", "rotate"])
def test_l2_factorized_grouped_matches_sp(model):
    """The augmented-embedding factorization (grouped full-vocab scoring
    with sqrt epilogue) must match the direct L2 expansion path."""
    import jax.numpy as jnp

    m, params = _make_model(model, 2.0)
    E = m.dataset.num_entities()
    s = jnp.asarray([0, 1, 2, 3])
    p = jnp.asarray([0, 1, 2, 0])
    o = jnp.asarray([4, 5, 6, 1])
    triples = jnp.stack([s, p, o], axis=1)
    for slot, direct in ((2, m.score_sp(params, s, p)),
                         (0, m.score_po(params, p, o))):
        g = m.score_slot_all_grouped(params, triples, slot)
        assert g is not None
        flat = np.asarray(g).reshape(4, -1)[:, :E]
        np.testing.assert_allclose(flat, np.asarray(direct),
                                   rtol=1e-4, atol=1e-4)


def test_transe_l2_relation_slot_factorizes():
    import jax.numpy as jnp

    m, params = _make_model("transe", 2.0)
    R = m.dataset.num_relations()
    s = jnp.asarray([0, 1, 2])
    o = jnp.asarray([3, 4, 5])
    triples = jnp.stack([s, jnp.zeros(3, jnp.int32), o], axis=1)
    g = m.score_slot_all_grouped(params, triples, 1)
    assert g is not None
    direct = m.score_so(params, s, o)
    np.testing.assert_allclose(
        np.asarray(g).reshape(3, -1)[:, :R], np.asarray(direct),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("model", ["transe", "rotate"])
def test_l2_exact_all_implementation_trains(model):
    """implementation=all (grouped scores + gather-free picks) produces
    the same per-batch loss as implementation=triple for L2 models (same
    negatives, different scoring path)."""
    import jax
    import jax.numpy as jnp

    from kge_tpu.job import TrainingJob

    losses = {}
    for impl in ("triple", "all"):
        config = get_test_config(**{
            "train.type": "negative_sampling",
            "negative_sampling.implementation": impl,
            "negative_sampling.num_samples.s": 4,
            "negative_sampling.on_device": "never",
            "train.batch_size": 6,
            "valid.every": 0,
            "lookup_embedder.dim": 16,
            "random_seed.default": 5,
        })
        config.load_options({"model": model})
        config.set(f"{model}.l_norm", 2.0)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        job._prepare()
        job._is_prepared = True
        job._force_grouped_all = impl == "all"
        batch = next(job._batches())
        batch = {k: jnp.asarray(v) if not np.isscalar(v) else v
                 for k, v in batch.items()}
        val, _ = job._loss_for_batch(
            job.model_params, batch, jax.random.PRNGKey(2)
        )
        losses[impl] = float(val)
    np.testing.assert_allclose(losses["all"], losses["triple"],
                               rtol=1e-5, atol=1e-6)


def test_transe_l2_score_so_shape_and_values():
    """s_o with n_batch != num_relations: the L2 expansion must return
    [n, R] row-aligned scores (a reshape keyed on the relation count
    scrambled this — caught by review)."""
    import jax.numpy as jnp

    m, params = _make_model("transe", 2.0)
    R = m.dataset.num_relations()
    s = jnp.asarray([0, 1, 2, 3, 4])   # 5 rows vs R=3 relations
    o = jnp.asarray([3, 4, 5, 6, 0])
    out = m.score_so(params, s, o)
    assert out.shape == (5, R)
    for i in range(5):
        for p in range(R):
            expected = m.score_spo(
                params, s[i:i+1], jnp.asarray([p]), o[i:i+1]
            )
            np.testing.assert_allclose(
                float(out[i, p]), float(expected[0]), rtol=1e-4, atol=1e-4
            )


def test_distance_auto_exact_respected():
    """auto_exact=True must keep pairwise distance models off the pool
    implementation (rows correlate through the shared pool)."""
    from kge_tpu.job import TrainingJob

    config = get_test_config(**{
        "train.type": "negative_sampling",
        "negative_sampling.num_samples.s": 4,
        "negative_sampling.auto_exact": True,
        "train.batch_size": 6,
        "valid.every": 0,
        "lookup_embedder.dim": 16,
    })
    config.load_options({"model": "transe"})
    config.set("transe.l_norm", 1.0)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    assert config.get("negative_sampling.implementation") == "triple"
