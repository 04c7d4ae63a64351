"""Model tests.

The load-bearing invariant (reference tests/test_model.py:29-71): for every
model, ``score_spo`` must agree with ``score_sp``/``score_po`` (and
``score_so`` where supported) over the full cross product of entities and
relations, within tie tolerance. Also: RotatE phase normalization must
preserve scores, and params must re-initialize deterministically per seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kge_tpu.models import EVAL_CTX, KgeModel

from tests.util import get_test_config, get_test_dataset

ATOL, RTOL = 1e-5, 1e-4


def make_model(model_name, **options):
    config = get_test_config()
    config.load_options({"model": model_name})
    for k, v in options.items():
        config.set(k, v, create=True)
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, dataset


BASE_MODELS = [
    ("complex", {}),
    ("distmult", {}),
    ("transe", {}),
    ("rescal", {}),
    ("rotate", {}),
    ("cp", {}),
    ("simple", {}),
    ("transh", {}),
    ("relational_tucker3", {"relational_tucker3.relation_embedder.base_embedder.dim": 6}),
]

RECIPROCAL_MODELS = [
    ("conve", {"reciprocal_relations_model.base_model.type": "conve",
               "conve.entity_embedder.dim": 8,
               "conve.relation_embedder.dim": 8,
               "conve.entity_embedder.dropout": 0.0,
               "conve.relation_embedder.dropout": 0.0,
               "conve.feature_map_dropout": 0.0,
               "conve.projection_dropout": 0.0}),
    ("transformer", {"reciprocal_relations_model.base_model.type": "transformer",
                     "transformer.entity_embedder.dim": 16,
                     "transformer.relation_embedder.dim": 16,
                     "transformer.encoder.nhead": 2,
                     "transformer.encoder.num_layers": 1,
                     "transformer.encoder.dim_feedforward": 32,
                     "transformer.encoder.dropout": 0.0}),
    ("complex", {"reciprocal_relations_model.base_model.type": "complex"}),
]


def all_spo(dataset):
    E, R = dataset.num_entities(), dataset.num_relations()
    s, p, o = np.meshgrid(np.arange(E), np.arange(R), np.arange(E), indexing="ij")
    return (
        jnp.asarray(s.reshape(-1)),
        jnp.asarray(p.reshape(-1)),
        jnp.asarray(o.reshape(-1)),
    )


@pytest.mark.parametrize("model_name,options", BASE_MODELS,
                         ids=[m for m, _ in BASE_MODELS])
def test_scoring_consistency(model_name, options):
    model, params, dataset = make_model(model_name, **options)
    E, R = dataset.num_entities(), dataset.num_relations()
    s, p, o = all_spo(dataset)

    spo = np.asarray(model.score_spo(params, s, p, o))

    # score_sp over unique (s, p) pairs
    su, pu = jnp.asarray(np.repeat(np.arange(E), R)), jnp.asarray(np.tile(np.arange(R), E))
    sp_all = np.asarray(model.score_sp(params, su, pu))  # [E*R, E]
    assert np.allclose(spo, sp_all.reshape(-1), atol=ATOL, rtol=RTOL)

    # score_po over unique (p, o) pairs
    pu2 = jnp.asarray(np.repeat(np.arange(R), E))
    ou2 = jnp.asarray(np.tile(np.arange(E), R))
    po_all = np.asarray(model.score_po(params, pu2, ou2))  # [R*E, E]
    # po_all[i, j] = score(j, p_i, o_i); spo ordered (s, p, o)
    expected = spo.reshape(E, R, E)
    got = po_all.reshape(R, E, E).transpose(2, 0, 1)  # [s, p, o]
    assert np.allclose(expected, got, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("model_name,options",
                         [m for m in BASE_MODELS if m[0] in
                          ("complex", "distmult", "rescal")],
                         ids=["complex", "distmult", "rescal"])
def test_score_so_consistency(model_name, options):
    model, params, dataset = make_model(model_name, **options)
    E, R = dataset.num_entities(), dataset.num_relations()
    s, p, o = all_spo(dataset)
    spo = np.asarray(model.score_spo(params, s, p, o))
    su = jnp.asarray(np.repeat(np.arange(E), E))
    ou = jnp.asarray(np.tile(np.arange(E), E))
    so_all = np.asarray(model.score_so(params, su, ou))  # [E*E, R]
    got = so_all.reshape(E, E, R).transpose(0, 2, 1)  # [s, p, o]
    assert np.allclose(spo.reshape(E, R, E), got, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("base,options", RECIPROCAL_MODELS,
                         ids=[m for m, _ in RECIPROCAL_MODELS])
def test_reciprocal_scoring_consistency(base, options):
    config = get_test_config()
    config.load_options({"model": "reciprocal_relations_model"})
    for k, v in options.items():
        config.set(k, v, create=True)
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    E, R = dataset.num_entities(), dataset.num_relations()
    s, p, o = all_spo(dataset)

    spo_o = np.asarray(model.score_spo(params, s, p, o, direction="o"))
    spo_s = np.asarray(model.score_spo(params, s, p, o, direction="s"))

    su, pu = jnp.asarray(np.repeat(np.arange(E), R)), jnp.asarray(np.tile(np.arange(R), E))
    sp_all = np.asarray(model.score_sp(params, su, pu))
    assert np.allclose(spo_o, sp_all.reshape(-1), atol=ATOL, rtol=RTOL)

    pu2 = jnp.asarray(np.repeat(np.arange(R), E))
    ou2 = jnp.asarray(np.tile(np.arange(E), R))
    po_all = np.asarray(model.score_po(params, pu2, ou2))
    got = po_all.reshape(R, E, E).transpose(2, 0, 1)
    assert np.allclose(spo_s.reshape(E, R, E), got, atol=ATOL, rtol=RTOL)

    # score_sp_po stitches both directions
    n = min(E, R)
    idx = jnp.arange(n)
    both = np.asarray(model.score_sp_po(params, idx, idx % R, idx))
    assert both.shape == (n, 2 * E)
    assert np.allclose(
        both[:, :E],
        np.asarray(model.score_sp(params, idx, idx % R)),
        atol=ATOL, rtol=RTOL,
    )

    with pytest.raises(ValueError):
        model.score_spo(params, s, p, o)
    with pytest.raises(ValueError):
        model.score_so(params, s, o)


def test_rotate_phase_normalization_preserves_scores():
    model, params, dataset = make_model("rotate")
    s, p, o = all_spo(dataset)
    before = np.asarray(model.score_spo(params, s, p, o))
    # push phases far out of range, scores must be unchanged after renorm
    shifted = {
        **params,
        "relation_embedder": {
            "embeddings": params["relation_embedder"]["embeddings"] + 6 * np.pi
        },
    }
    renormed = model.postprocess_params(shifted)
    after = np.asarray(model.score_spo(renormed, s, p, o))
    assert np.allclose(before, after, atol=1e-4, rtol=1e-4)
    phases = np.asarray(renormed["relation_embedder"]["embeddings"])
    assert (phases >= -np.pi).all() and (phases < np.pi).all()


def test_init_deterministic():
    model, params, _ = make_model("complex")
    params2 = model.init_params(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    params3 = model.init_params(jax.random.PRNGKey(1))
    leaves = list(zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(params3)))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in leaves)


def test_conve_requires_direction():
    config = get_test_config()
    config.load_options({"model": "conve"})
    config.set("conve.entity_embedder.dim", 8, create=True)
    config.set("conve.relation_embedder.dim", 8, create=True)
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    s = jnp.arange(2)
    with pytest.raises(ValueError):
        model.score_spo(params, s, s, s)
    out = model.score_spo(params, s, jnp.zeros(2, dtype=jnp.int32), s, direction="o")
    assert out.shape == (2,)


@pytest.mark.parametrize("model_name", ["transe", "transh", "rotate"])
def test_pairwise_chunking_matches_unchunked(model_name, monkeypatch):
    """Distance-family sp_/_po forms chunk their [n, chunk, d] intermediate
    over targets; with a tiny chunk budget the scores must be unchanged."""
    from kge_tpu.models import translation

    model, params, dataset = make_model(model_name)
    E, R = dataset.num_entities(), dataset.num_relations()
    s = jnp.asarray(np.arange(E) % E)
    p = jnp.asarray(np.arange(E) % R)
    # m=300 targets (> the 128-row chunk floor) so a budget of 1 element
    # forces ceil(300/128)=3 chunks incl. a padded tail
    targets = jnp.asarray(np.arange(300) % E)

    unchunked_sp = np.asarray(model.score_sp(params, s, p, targets))
    unchunked_po = np.asarray(model.score_po(params, p, s, targets))

    monkeypatch.setattr(translation, "_PAIRWISE_BUDGET_ELEMS", 1)
    chunked_sp = np.asarray(model.score_sp(params, s, p, targets))
    chunked_po = np.asarray(model.score_po(params, p, s, targets))

    assert np.allclose(unchunked_sp, chunked_sp, atol=ATOL, rtol=RTOL)
    assert np.allclose(unchunked_po, chunked_po, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("model_name", ["transe", "transh", "rotate"])
def test_distance_models_force_triple_negatives(model_name):
    """Pairwise (L1) distance models resolve
    negative_sampling.implementation=auto to "pool" when its requirements
    hold (no MXU advantage in many-targets scoring; the pooled select /
    kernel path is the fast per-row form), and to "triple" when pool is
    unavailable (see test_translation_l2 for the full policy table)."""
    import tempfile

    from kge_tpu.job import TrainingJob
    from tests.util import get_test_config, get_test_dataset

    config = get_test_config()
    config.load_options({"model": model_name})
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", 3)
    config.folder = tempfile.mkdtemp(prefix="kge-test-")
    config.init_folder()
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    assert job._implementation == "pool"


@pytest.mark.parametrize("model_name,options", BASE_MODELS,
                         ids=[m for m, _ in BASE_MODELS])
def test_score_spo_neg_matches_score_spo(model_name, options):
    """Per-row negative scoring (kept slots embedded once) must equal
    score_spo over the materialized corrupted triples, for every slot."""
    model, params, dataset = make_model(model_name, **options)
    E, R = dataset.num_entities(), dataset.num_relations()
    rng = np.random.default_rng(4)
    n, k = 5, 4
    triples = jnp.asarray(
        np.stack([rng.integers(0, E, n), rng.integers(0, R, n),
                  rng.integers(0, E, n)], axis=1).astype(np.int32)
    )
    for slot, vocab in ((0, E), (1, R), (2, E)):
        samples = jnp.asarray(rng.integers(0, vocab, (n, k)).astype(np.int32))
        got = np.asarray(
            model.score_spo_neg(params, triples, samples, slot, EVAL_CTX)
        )
        cols = [np.asarray(triples[:, i]) for i in range(3)]
        flat = []
        for i in range(3):
            if i == slot:
                flat.append(np.asarray(samples).reshape(-1))
            else:
                flat.append(np.repeat(cols[i], k))
        expected = np.asarray(
            model.score_spo(params, jnp.asarray(flat[0]), jnp.asarray(flat[1]),
                            jnp.asarray(flat[2]), ctx=EVAL_CTX)
        ).reshape(n, k)
        assert np.allclose(got, expected, atol=ATOL, rtol=RTOL), (model_name, slot)


def test_score_spo_neg_reciprocal():
    """Reciprocal wrapper: slot-s corruption routes through p+|R|."""
    model, params, dataset = make_model(
        "reciprocal_relations_model",
        **{"reciprocal_relations_model.base_model.type": "distmult"},
    )
    E, R = dataset.num_entities(), dataset.num_relations()
    rng = np.random.default_rng(5)
    n, k = 4, 3
    triples = jnp.asarray(
        np.stack([rng.integers(0, E, n), rng.integers(0, R, n),
                  rng.integers(0, E, n)], axis=1).astype(np.int32)
    )
    for slot in (0, 2):
        samples = jnp.asarray(rng.integers(0, E, (n, k)).astype(np.int32))
        got = np.asarray(
            model.score_spo_neg(params, triples, samples, slot, EVAL_CTX)
        )
        direction = "s" if slot == 0 else "o"
        flat_s = np.asarray(samples).reshape(-1) if slot == 0 else np.repeat(
            np.asarray(triples[:, 0]), k)
        flat_o = np.asarray(samples).reshape(-1) if slot == 2 else np.repeat(
            np.asarray(triples[:, 2]), k)
        expected = np.asarray(
            model.score_spo(
                params, jnp.asarray(flat_s),
                jnp.asarray(np.repeat(np.asarray(triples[:, 1]), k)),
                jnp.asarray(flat_o), direction=direction, ctx=EVAL_CTX,
            )
        ).reshape(n, k)
        assert np.allclose(got, expected, atol=ATOL, rtol=RTOL), slot
    with pytest.raises(ValueError):
        model.score_spo_neg(params, triples,
                            jnp.zeros((n, k), jnp.int32), 1, EVAL_CTX)
