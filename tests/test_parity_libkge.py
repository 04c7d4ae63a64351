"""Golden numerical parity against the actual reference implementation.

Runs LibKGE (torch CPU) on the fixture dataset, copies its initialized
weights into our params, and requires allclose agreement of scores, losses,
penalties, gradients, and optimizer updates — the BASELINE.json parity gate.
"""

import sys

import numpy as np
import pytest

from tests.libkge_stub import install, libkge_available

pytestmark = pytest.mark.skipif(
    not libkge_available(), reason="reference LibKGE not importable"
)

install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.util import DATASET_DIR, get_test_config, get_test_dataset  # noqa: E402

ATOL, RTOL = 1e-5, 1e-4


def make_ref_model(model_name, options=None):
    from kge import Config as RefConfig, Dataset as RefDataset
    from kge.model import KgeModel as RefKgeModel

    config = RefConfig()
    config.set("console.quiet", True)
    config.set("job.device", "cpu")
    config.set("model", model_name)
    config._import(model_name)
    config.set("dataset.name", "dataset_test")
    for k, v in (options or {}).items():
        config.set(k, v, create=True)
    torch.manual_seed(42)
    dataset = RefDataset.create(config, folder=str(DATASET_DIR))
    model = RefKgeModel.create(config, dataset)
    model.eval()
    return model, config, dataset


def make_our_model(model_name, options=None):
    from kge_tpu.models import KgeModel

    config = get_test_config()
    config.load_options({"model": model_name})
    for k, v in (options or {}).items():
        config.set(k, v, create=True)
    dataset = get_test_dataset(config)
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def copy_tables(ref_model, params):
    """Copy the reference's embedding tables into our params."""
    ent = ref_model.get_s_embedder()._embeddings.weight.detach().numpy()
    rel = ref_model.get_p_embedder()._embeddings.weight.detach().numpy()
    new = dict(params)
    new["entity_embedder"] = {
        **params["entity_embedder"], "embeddings": jnp.asarray(ent)
    }
    new["relation_embedder"] = {
        **params["relation_embedder"], "embeddings": jnp.asarray(rel)
    }
    return new


PARITY_MODELS = [
    ("complex", {}),
    ("distmult", {}),
    ("transe", {}),
    ("rescal", {}),
    ("rotate", {}),
    ("cp", {}),
    ("simple", {}),
    ("transh", {}),
]


@pytest.mark.parametrize("model_name,options", PARITY_MODELS,
                         ids=[m for m, _ in PARITY_MODELS])
def test_score_parity(model_name, options):
    ref_model, _, ref_dataset = make_ref_model(model_name, options)
    our_model, params = make_our_model(model_name, options)
    params = copy_tables(ref_model, params)

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    s, p, o = np.meshgrid(np.arange(E), np.arange(R), np.arange(E), indexing="ij")
    s, p, o = s.reshape(-1), p.reshape(-1), o.reshape(-1)

    ts, tp, to = (torch.from_numpy(x.astype(np.int64)) for x in (s, p, o))
    with torch.no_grad():
        ref_spo = ref_model.score_spo(ts, tp, to).numpy()
        su, pu = np.repeat(np.arange(E), R), np.tile(np.arange(R), E)
        ref_sp = ref_model.score_sp(
            torch.from_numpy(su), torch.from_numpy(pu)
        ).numpy()
        pu2, ou2 = np.repeat(np.arange(R), E), np.tile(np.arange(E), R)
        ref_po = ref_model.score_po(
            torch.from_numpy(pu2), torch.from_numpy(ou2)
        ).numpy()

    our_spo = np.asarray(our_model.score_spo(
        params, jnp.asarray(s), jnp.asarray(p), jnp.asarray(o)
    ))
    our_sp = np.asarray(our_model.score_sp(
        params, jnp.asarray(su), jnp.asarray(pu)
    ))
    our_po = np.asarray(our_model.score_po(
        params, jnp.asarray(pu2), jnp.asarray(ou2)
    ))

    assert np.allclose(ref_spo, our_spo, atol=ATOL, rtol=RTOL), (
        np.abs(ref_spo - our_spo).max()
    )
    assert np.allclose(ref_sp, our_sp, atol=ATOL, rtol=RTOL)
    assert np.allclose(ref_po, our_po, atol=ATOL, rtol=RTOL)


LOSSES = ["kl", "bce", "bce_mean", "bce_self_adversarial", "margin_ranking",
          "soft_margin", "se"]


@pytest.mark.parametrize("loss_name", LOSSES)
def test_loss_parity(loss_name):
    from kge import Config as RefConfig
    from kge.util.loss import KgeLoss as RefKgeLoss

    from kge_tpu.config import Config
    from kge_tpu.ops.losses import KgeLoss

    rng = np.random.default_rng(3)
    n, m = 7, 5
    scores = rng.normal(size=(n, m)).astype(np.float32)
    labels_idx = np.zeros(n, dtype=np.int64)  # positives in column 0
    labels_mat = np.zeros((n, m), dtype=np.float32)
    labels_mat[np.arange(n), labels_idx] = 1.0

    ref_config = RefConfig()
    ref_config.set("console.quiet", True)
    ref_config.set("job.device", "cpu")
    ref_config.set("train.loss", loss_name)
    ref_config.set("train.type", "negative_sampling")
    ref_loss = RefKgeLoss.create(ref_config)

    our_config = Config()
    our_config.set("console.quiet", True)
    our_config.set("train.loss", loss_name)
    our_config.set("train.type", "negative_sampling")
    our_loss = KgeLoss.create(our_config)

    kwargs = {"num_negatives": m - 1} if loss_name == "margin_ranking" else {}

    for labels, tlabels in (
        (labels_idx, torch.from_numpy(labels_idx)),
        (labels_mat, torch.from_numpy(labels_mat)),
    ):
        if loss_name == "margin_ranking" and labels.ndim == 1:
            pass  # margin ranking works from the matrix form internally
        ref_val = float(
            ref_loss(torch.from_numpy(scores), tlabels, **kwargs)
        )
        our_val = float(our_loss(jnp.asarray(scores), jnp.asarray(labels)))
        assert np.isclose(ref_val, our_val, atol=1e-4, rtol=1e-4), (
            loss_name, labels.ndim, ref_val, our_val
        )


@pytest.mark.parametrize("regularize,weighted,space", [
    ("lp", False, "euclidean"),
    ("lp", True, "euclidean"),
    ("n3", False, "complex"),
    ("n3", True, "complex"),
])
def test_penalty_parity(regularize, weighted, space):
    model_name = "complex" if space == "complex" else "distmult"
    options = {
        f"{model_name}.entity_embedder.regularize": regularize,
        f"{model_name}.entity_embedder.regularize_weight": 0.3,
        f"{model_name}.entity_embedder.regularize_args.weighted": weighted,
        f"{model_name}.relation_embedder.regularize": regularize,
        f"{model_name}.relation_embedder.regularize_weight": 0.1,
        f"{model_name}.relation_embedder.regularize_args.weighted": weighted,
    }
    ref_model, _, ref_dataset = make_ref_model(model_name, options)
    our_model, params = make_our_model(model_name, options)
    params = copy_tables(ref_model, params)

    triples = torch.from_numpy(
        np.asarray(get_test_dataset().split("train")).astype(np.int64)
    )
    ref_pens = ref_model.penalty(batch={"triples": triples})
    our_pens = our_model.penalty(
        params, batch={"triples": jnp.asarray(triples.numpy())}
    )
    ref_total = float(sum(v for _, v in ref_pens))
    our_total = float(sum(v for _, v in our_pens))
    assert np.isclose(ref_total, our_total, atol=1e-5, rtol=1e-4), (
        ref_total, our_total,
        [(n, float(v)) for n, v in ref_pens],
        [(n, float(v)) for n, v in our_pens],
    )


def test_gradient_parity_complex_kl():
    """Full backward parity: KL loss over [pos | sampled negatives] for
    ComplEx — entity and relation table gradients must agree."""
    ref_model, ref_config, ref_dataset = make_ref_model("complex")
    our_model, params = make_our_model("complex")
    params = copy_tables(ref_model, params)

    rng = np.random.default_rng(11)
    n, num_neg = 8, 4
    triples = np.stack([
        rng.integers(0, 7, n), rng.integers(0, 3, n), rng.integers(0, 7, n)
    ], axis=1).astype(np.int64)
    negs = rng.integers(0, 7, (n, num_neg)).astype(np.int64)

    # reference: score [pos|negs] per row (o-corruption), KL loss / n
    ref_model.train()
    ts = torch.from_numpy(triples)
    tneg = torch.from_numpy(negs)
    pos = ref_model.score_spo(ts[:, 0], ts[:, 1], ts[:, 2], direction="o")
    s_rep = ts[:, 0].repeat_interleave(num_neg)
    p_rep = ts[:, 1].repeat_interleave(num_neg)
    neg_scores = ref_model.score_spo(
        s_rep, p_rep, tneg.reshape(-1), direction="o"
    ).view(n, num_neg)
    scores = torch.cat([pos.view(-1, 1), neg_scores], dim=1)
    labels = torch.zeros(n, dtype=torch.long)
    loss = torch.nn.functional.cross_entropy(
        scores, labels, reduction="sum"
    ) / n
    loss.backward()
    ref_ent_grad = ref_model.get_s_embedder()._embeddings.weight.grad.numpy()
    ref_rel_grad = ref_model.get_p_embedder()._embeddings.weight.grad.numpy()

    def our_loss(p_):
        pos = our_model.score_spo(
            p_, jnp.asarray(triples[:, 0]), jnp.asarray(triples[:, 1]),
            jnp.asarray(triples[:, 2]),
        ).reshape(-1, 1)
        neg = our_model.score_spo(
            p_, jnp.asarray(np.repeat(triples[:, 0], num_neg)),
            jnp.asarray(np.repeat(triples[:, 1], num_neg)),
            jnp.asarray(negs.reshape(-1)),
        ).reshape(n, num_neg)
        sc = jnp.concatenate([pos, neg], axis=1)
        logz = jax.nn.logsumexp(sc, axis=1)
        return jnp.sum(logz - sc[:, 0]) / n

    our_val, grads = jax.value_and_grad(our_loss)(params)
    assert np.isclose(float(loss), float(our_val), atol=1e-5, rtol=1e-4)
    assert np.allclose(
        ref_ent_grad, np.asarray(grads["entity_embedder"]["embeddings"]),
        atol=1e-5, rtol=1e-4,
    )
    assert np.allclose(
        ref_rel_grad, np.asarray(grads["relation_embedder"]["embeddings"]),
        atol=1e-5, rtol=1e-4,
    )


@pytest.mark.parametrize("opt_name", ["Adagrad", "Adam", "SGD", "RMSprop"])
def test_optimizer_update_parity(opt_name):
    """Our functional optimizers must reproduce torch.optim updates."""
    from kge_tpu.config import Config
    from kge_tpu.ops.optim import KgeOptimizer

    rng = np.random.default_rng(5)
    w = rng.normal(size=(6, 4)).astype(np.float32)
    grads = [rng.normal(size=(6, 4)).astype(np.float32) for _ in range(3)]
    lr = 0.17

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    args = {"lr": lr}
    if opt_name == "SGD":
        args["momentum"] = 0.9
    topt = getattr(torch.optim, opt_name)([tw], **args)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    config = Config()
    config.set("console.quiet", True)
    config.set("train.optimizer.default.type", opt_name)
    config.set("train.optimizer.default.args.lr", lr)
    if opt_name == "SGD":
        config.set("train.optimizer.default.args.momentum", 0.9, create=True)
    params = {"w": jnp.asarray(w)}
    opt = KgeOptimizer.create(config, params)
    state = opt.init(params)
    lrs = jnp.asarray(opt.base_lrs())
    for g in grads:
        params, state = opt.update({"w": jnp.asarray(g)}, state, params, lrs)

    assert np.allclose(
        tw.detach().numpy(), np.asarray(params["w"]), atol=1e-5, rtol=1e-4
    ), np.abs(tw.detach().numpy() - np.asarray(params["w"])).max()


@pytest.mark.parametrize("chunk_size", [-1, 25])
def test_entity_ranking_parity(tmp_path, chunk_size):
    """Filtered entity-ranking metrics (raw / filtered / filtered_with_test,
    MRR, Hits@k, mean rank) must match the reference's EntityRankingJob on a
    shared synthetic dataset with identical model weights."""
    from tests.util import make_synthetic_dataset

    folder = make_synthetic_dataset(
        tmp_path / "rank_synth", num_entities=64, num_relations=8,
        num_train=512, num_valid=48, num_test=48, seed=3,
    )

    # reference run
    from kge import Config as RefConfig, Dataset as RefDataset
    from kge.job import EvaluationJob as RefEvaluationJob
    from kge.model import KgeModel as RefKgeModel

    ref_config = RefConfig()
    ref_config.set("console.quiet", True)
    ref_config.set("job.device", "cpu")
    ref_config.set("model", "complex")
    ref_config._import("complex")
    ref_config.set("dataset.name", "rank_synth")
    ref_config.set("eval.split", "valid")
    for flag in ("head_and_tail", "relation_type", "argument_frequency"):
        ref_config.set(f"entity_ranking.metrics_per.{flag}", True)
    ref_config.folder = str(tmp_path / "ref_exp")
    ref_config.init_folder()
    torch.manual_seed(7)
    ref_dataset = RefDataset.create(ref_config, folder=str(folder))
    ref_model = RefKgeModel.create(ref_config, ref_dataset)
    ref_model.eval()
    ref_job = RefEvaluationJob.create(ref_config, ref_dataset, model=ref_model)
    ref_trace = ref_job.run()

    # our run with the reference's weights
    from kge_tpu import Config, Dataset
    from kge_tpu.job import EvaluationJob
    from kge_tpu.models import KgeModel

    config = Config()
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "rank_synth")
    config.set("eval.split", "valid")
    for flag in ("head_and_tail", "relation_type", "argument_frequency"):
        config.set(f"entity_ranking.metrics_per.{flag}", True)
    config.set("entity_ranking.chunk_size", chunk_size)
    config.set("parallel.data", 1)
    config.set("parallel.model", 1)
    dataset = Dataset.create(config, folder=str(folder))
    model = KgeModel.create(config, dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    params = copy_tables(ref_model, params)
    job = EvaluationJob.create(config, dataset, model=model)
    job.model_params = params
    job.epoch = 0
    trace = job._evaluate()

    keys = [
        k for k in ref_trace
        if k.startswith(("mean_rank", "mean_reciprocal_rank", "hits_at_"))
    ]
    assert "mean_reciprocal_rank_filtered_with_test" in keys
    for k in keys:
        assert k in trace, k
        assert np.isclose(ref_trace[k], trace[k], atol=1e-9), (
            k, ref_trace[k], trace[k]
        )


# -- neural models, projection embedder, reciprocal wrapper (VERDICT r2 #5) ----


def _copy_conve(ref_model, params):
    """Reference ConvE modules -> our scorer param pytree. Copies must be
    deep: torch .numpy() shares storage and jax CPU arrays can alias numpy
    buffers, so a later in-place torch update (BN running stats) would
    silently change our params."""
    sc = ref_model._scorer
    scorer = {
        "conv_w": jnp.array(sc.convolution.weight.detach().numpy().copy()),
        "proj_w": jnp.array(sc.projection.weight.detach().numpy().copy()),
        "proj_b": jnp.array(sc.projection.bias.detach().numpy().copy()),
        "bn1_mean": jnp.array(sc.bn1.running_mean.numpy().copy()),
        "bn1_var": jnp.array(sc.bn1.running_var.numpy().copy()),
        "bn2_mean": jnp.array(sc.bn2.running_mean.numpy().copy()),
        "bn2_var": jnp.array(sc.bn2.running_var.numpy().copy()),
    }
    if sc.convolution.bias is not None:
        scorer["conv_b"] = jnp.array(
            sc.convolution.bias.detach().numpy().copy()
        )
    new = copy_tables(ref_model, params)
    new["scorer"] = scorer
    return new


CONVE_OPTS = {
    "conve.entity_embedder.dim": 32,
    "conve.relation_embedder.dim": 32,
    "conve.feature_map_dropout": 0.0,
    "conve.projection_dropout": 0.0,
    "conve.entity_embedder.dropout": 0.0,
    "conve.relation_embedder.dropout": 0.0,
}


def test_conve_score_parity_and_bn_stats():
    """ConvE golden test: eval-mode scores match; a train-mode forward
    produces the same batch statistics and EMA-updated running stats as the
    torch BatchNorm modules (reference conve.py:61-92)."""
    ref_model, _, ref_dataset = make_ref_model("conve", CONVE_OPTS)
    our_model, params = make_our_model("conve", CONVE_OPTS)
    params = _copy_conve(ref_model, params)

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    su, pu = np.repeat(np.arange(E), R), np.tile(np.arange(R), E)
    with torch.no_grad():
        ref_sp = ref_model.score_sp(
            torch.from_numpy(su), torch.from_numpy(pu)
        ).numpy()
    our_sp = np.asarray(
        our_model.score_sp(params, jnp.asarray(su), jnp.asarray(pu))
    )
    assert np.allclose(ref_sp, our_sp, atol=1e-4, rtol=1e-3), (
        np.abs(ref_sp - our_sp).max()
    )

    # train-mode forward: running stats must update identically
    from kge_tpu.models import Ctx

    ref_model.train()
    s = torch.arange(E, dtype=torch.long)
    p = torch.from_numpy(np.arange(E) % R)
    ref_model.score_sp(s, p)
    ref_bn1_mean = ref_model._scorer.bn1.running_mean.detach().numpy()
    ref_bn2_var = ref_model._scorer.bn2.running_var.detach().numpy()

    stats = {}
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(0), stats=stats)
    our_model.score_sp(
        params, jnp.asarray(s.numpy()), jnp.asarray(p.numpy()), ctx=ctx
    )
    np.testing.assert_allclose(
        ref_bn1_mean, np.asarray(stats["bn1_mean"]), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        ref_bn2_var, np.asarray(stats["bn2_var"]), atol=1e-4, rtol=1e-3
    )


def test_conve_gradient_parity():
    """Scorer-parameter (conv, projection) and table gradients of a summed
    eval-mode score batch must match."""
    ref_model, _, ref_dataset = make_ref_model("conve", CONVE_OPTS)
    our_model, params = make_our_model("conve", CONVE_OPTS)
    params = _copy_conve(ref_model, params)

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    su, pu = np.repeat(np.arange(E), R), np.tile(np.arange(R), E)

    ref_model.zero_grad()
    ref_model.score_sp(torch.from_numpy(su), torch.from_numpy(pu)).sum().backward()
    ref = {
        "conv_w": ref_model._scorer.convolution.weight.grad.numpy(),
        "proj_w": ref_model._scorer.projection.weight.grad.numpy(),
        "proj_b": ref_model._scorer.projection.bias.grad.numpy(),
        "ent": ref_model.get_s_embedder()._embeddings.weight.grad.numpy(),
        "rel": ref_model.get_p_embedder()._embeddings.weight.grad.numpy(),
    }

    def our_sum(p_):
        return jnp.sum(
            our_model.score_sp(p_, jnp.asarray(su), jnp.asarray(pu))
        )

    grads = jax.grad(our_sum)(params)
    np.testing.assert_allclose(
        ref["conv_w"], np.asarray(grads["scorer"]["conv_w"]),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        ref["proj_w"], np.asarray(grads["scorer"]["proj_w"]),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        ref["proj_b"], np.asarray(grads["scorer"]["proj_b"]),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        ref["ent"], np.asarray(grads["entity_embedder"]["embeddings"]),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        ref["rel"], np.asarray(grads["relation_embedder"]["embeddings"]),
        atol=1e-4, rtol=1e-3,
    )


TRANSFORMER_OPTS = {
    "transformer.entity_embedder.dim": 16,
    "transformer.relation_embedder.dim": 16,
    "transformer.encoder.nhead": 4,
    "transformer.encoder.dim_feedforward": 32,
    "transformer.encoder.num_layers": 2,
    "transformer.encoder.dropout": 0.0,
    "transformer.entity_embedder.dropout": 0.0,
    "transformer.relation_embedder.dropout": 0.0,
}


def test_transformer_score_parity():
    """Transformer ("no context" HittER) golden test against the torch
    TransformerEncoder (reference transformer.py:25-105)."""
    ref_model, _, ref_dataset = make_ref_model("transformer", TRANSFORMER_OPTS)
    our_model, params = make_our_model("transformer", TRANSFORMER_OPTS)
    params = copy_tables(ref_model, params)

    sc = ref_model._scorer
    scorer = {
        "cls": jnp.asarray(sc.cls_emb.detach().numpy()),
        "sub_type": jnp.asarray(sc.sub_type_emb.detach().numpy()),
        "rel_type": jnp.asarray(sc.rel_type_emb.detach().numpy()),
        "layers": [],
    }
    for layer in sc.encoder.layers:
        scorer["layers"].append({
            "in_proj_w": jnp.asarray(layer.self_attn.in_proj_weight.detach().numpy()),
            "in_proj_b": jnp.asarray(layer.self_attn.in_proj_bias.detach().numpy()),
            "out_proj_w": jnp.asarray(layer.self_attn.out_proj.weight.detach().numpy()),
            "out_proj_b": jnp.asarray(layer.self_attn.out_proj.bias.detach().numpy()),
            "linear1_w": jnp.asarray(layer.linear1.weight.detach().numpy()),
            "linear1_b": jnp.asarray(layer.linear1.bias.detach().numpy()),
            "linear2_w": jnp.asarray(layer.linear2.weight.detach().numpy()),
            "linear2_b": jnp.asarray(layer.linear2.bias.detach().numpy()),
            "norm1_scale": jnp.asarray(layer.norm1.weight.detach().numpy()),
            "norm1_bias": jnp.asarray(layer.norm1.bias.detach().numpy()),
            "norm2_scale": jnp.asarray(layer.norm2.weight.detach().numpy()),
            "norm2_bias": jnp.asarray(layer.norm2.bias.detach().numpy()),
        })
    params["scorer"] = scorer

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    su, pu = np.repeat(np.arange(E), R), np.tile(np.arange(R), E)
    with torch.no_grad():
        ref_sp = ref_model.score_sp(
            torch.from_numpy(su), torch.from_numpy(pu)
        ).numpy()
    our_sp = np.asarray(
        our_model.score_sp(params, jnp.asarray(su), jnp.asarray(pu))
    )
    assert np.allclose(ref_sp, our_sp, atol=1e-4, rtol=1e-3), (
        np.abs(ref_sp - our_sp).max()
    )


def test_relational_tucker3_score_parity():
    """RelationalTucker3: RESCAL scoring through a projected (Tucker3)
    relation embedder (reference relational_tucker3.py,
    tucker3_relation_embedder.py)."""
    opts = {
        "relational_tucker3.entity_embedder.dim": 8,
        "relational_tucker3.relation_embedder.base_embedder.dim": 6,
        "relational_tucker3.entity_embedder.dropout": 0.0,
        "relational_tucker3.relation_embedder.dropout": 0.0,
    }
    ref_model, _, ref_dataset = make_ref_model("relational_tucker3", opts)
    our_model, params = make_our_model("relational_tucker3", opts)

    ent = ref_model.get_s_embedder()._embeddings.weight.detach().numpy()
    ref_rel = ref_model.get_p_embedder()
    rel_base = ref_rel.base_embedder._embeddings.weight.detach().numpy()
    projection = ref_rel.projection.weight.detach().numpy()
    params = dict(params)
    params["entity_embedder"] = {
        **params["entity_embedder"], "embeddings": jnp.asarray(ent)
    }
    params["relation_embedder"] = {
        **params["relation_embedder"],
        "base": {
            **params["relation_embedder"]["base"],
            "embeddings": jnp.asarray(rel_base),
        },
        "projection": jnp.asarray(projection),
    }

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    s, p, o = np.meshgrid(np.arange(E), np.arange(R), np.arange(E), indexing="ij")
    s, p, o = s.reshape(-1), p.reshape(-1), o.reshape(-1)
    with torch.no_grad():
        ref_spo = ref_model.score_spo(
            torch.from_numpy(s.astype(np.int64)),
            torch.from_numpy(p.astype(np.int64)),
            torch.from_numpy(o.astype(np.int64)),
        ).numpy()
    our_spo = np.asarray(our_model.score_spo(
        params, jnp.asarray(s), jnp.asarray(p), jnp.asarray(o)
    ))
    assert np.allclose(ref_spo, our_spo, atol=1e-4, rtol=1e-3), (
        np.abs(ref_spo - our_spo).max()
    )


def test_reciprocal_wrapper_score_parity():
    """Reciprocal relations wrapper: score_po must route through the base
    model's score_sp with p+|R| (reference
    reciprocal_relations_model.py:85-91) — golden against the reference
    wrapper wrapping ComplEx."""
    opts = {"reciprocal_relations_model.base_model.type": "complex"}
    ref_model, _, ref_dataset = make_ref_model("reciprocal_relations_model", opts)
    our_model, params = make_our_model("reciprocal_relations_model", opts)
    params = copy_tables(ref_model, params)

    E, R = ref_dataset.num_entities(), ref_dataset.num_relations()
    su, pu = np.repeat(np.arange(E), R), np.tile(np.arange(R), E)
    pu2, ou2 = np.repeat(np.arange(R), E), np.tile(np.arange(E), R)
    with torch.no_grad():
        ref_sp = ref_model.score_sp(
            torch.from_numpy(su), torch.from_numpy(pu)
        ).numpy()
        ref_po = ref_model.score_po(
            torch.from_numpy(pu2), torch.from_numpy(ou2)
        ).numpy()
        ref_spo = ref_model.score_spo(
            torch.from_numpy(su), torch.from_numpy(pu),
            torch.from_numpy((np.arange(E * R) % E).astype(np.int64)),
            direction="o",
        ).numpy()
    our_sp = np.asarray(our_model.score_sp(params, jnp.asarray(su), jnp.asarray(pu)))
    our_po = np.asarray(our_model.score_po(params, jnp.asarray(pu2), jnp.asarray(ou2)))
    our_spo = np.asarray(our_model.score_spo(
        params, jnp.asarray(su), jnp.asarray(pu),
        jnp.asarray(np.arange(E * R) % E), direction="o",
    ))
    assert np.allclose(ref_sp, our_sp, atol=ATOL, rtol=RTOL)
    assert np.allclose(ref_po, our_po, atol=ATOL, rtol=RTOL)
    assert np.allclose(ref_spo, our_spo, atol=ATOL, rtol=RTOL)
