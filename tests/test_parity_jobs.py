"""Job-level golden parity against the reference: batch loss values AND
gradients for the KvsAll and 1vsAll training strategies and for
naive-shared negative-sampling scoring (VERDICT r2 item 5; reference
kge/job/train_KvsAll.py:242-295, train_1vsAll.py:48-82,
kge/util/sampler.py:383-469)."""

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

from tests.test_parity_libkge import copy_tables, make_ref_model  # noqa: E402
from tests.util import get_test_config, get_test_dataset  # noqa: E402

ATOL, RTOL = 1e-5, 1e-4


def make_our_job(train_type, **options):
    from kge_tpu.job import TrainingJob

    config = get_test_config(
        **{
            "train.type": train_type,
            "train.batch_size": 100,
            "valid.every": 0,
        }
    )
    config.load_options({"model": "complex"})
    for k, v in options.items():
        config.set(k, v, create=True)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    return job


def grads_close(ref_model, our_grads):
    ref_ent = ref_model.get_s_embedder()._embeddings.weight.grad.numpy()
    ref_rel = ref_model.get_p_embedder()._embeddings.weight.grad.numpy()
    np.testing.assert_allclose(
        ref_ent, np.asarray(our_grads["entity_embedder"]["embeddings"]),
        atol=ATOL, rtol=RTOL,
    )
    np.testing.assert_allclose(
        ref_rel, np.asarray(our_grads["relation_embedder"]["embeddings"]),
        atol=ATOL, rtol=RTOL,
    )


@pytest.mark.parametrize("smoothing", [0.0, 0.3])
def test_kvsall_batch_loss_and_grad_parity(smoothing):
    """Our KvsAll per-type batch loss (dense labels from CSR coords, label
    smoothing, KgeLoss sum / batch size) must match a torch replica of the
    reference subbatch computation on the same queries and weights."""
    ref_model, ref_config, _ = make_ref_model("complex")
    from kge.util import KgeLoss as RefKgeLoss

    ref_config.set("train.type", "KvsAll")
    ref_loss = RefKgeLoss.create(ref_config)

    job = make_our_job("KvsAll", **{"KvsAll.label_smoothing": smoothing})
    params = copy_tables(ref_model, job.model_params)
    E = job.dataset.num_entities()

    checked = set()
    for batch in job._batches():
        qtype = batch["qtype"]
        if qtype in checked:
            continue
        checked.add(qtype)
        n = batch["true_size"]

        def our_loss(p_):
            value, _ = job._loss_for_qtype(
                qtype, p_, {k: jnp.asarray(v) for k, v in batch.items()
                            if not isinstance(v, str)},
                jax.random.PRNGKey(0),
            )
            return value

        our_val, our_grads = jax.value_and_grad(our_loss)(params)

        # torch replica of the reference subbatch computation
        ref_model.zero_grad()
        queries = torch.from_numpy(batch["queries"][:n])
        if qtype == "sp_":
            scores = ref_model.score_sp(queries[:, 0], queries[:, 1])
        else:
            scores = ref_model.score_po(queries[:, 0], queries[:, 1])
        labels = torch.zeros(n, E)
        rows = batch["label_rows"]
        cols = batch["label_cols"]
        valid = rows < n
        labels[rows[valid], cols[valid]] = 1.0
        if smoothing > 0:
            labels = (1.0 - smoothing) * labels + 1.0 / E
        ref_val = ref_loss(scores, labels) / n
        ref_val.backward()

        assert np.isclose(float(ref_val), float(our_val), atol=ATOL, rtol=RTOL), (
            qtype, float(ref_val), float(our_val)
        )
        grads_close(ref_model, our_grads)
    assert checked == {"sp_", "_po"}


def test_1vsall_batch_loss_and_grad_parity():
    """Both-direction full-vocabulary CE of the 1vsAll strategy
    (reference train_1vsAll.py:48-82)."""
    ref_model, ref_config, _ = make_ref_model("complex")
    from kge.util import KgeLoss as RefKgeLoss

    ref_config.set("train.type", "1vsAll")
    ref_loss = RefKgeLoss.create(ref_config)

    job = make_our_job("1vsAll")
    params = copy_tables(ref_model, job.model_params)
    batch = next(job._batches())
    n = batch["true_size"]

    def our_loss(p_):
        value, _ = job._loss_for_batch(
            p_, {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, str)},
            jax.random.PRNGKey(0),
        )
        return value

    our_val, our_grads = jax.value_and_grad(our_loss)(params)

    ref_model.zero_grad()
    triples = torch.from_numpy(batch["triples"][:n])
    scores_sp = ref_model.score_sp(triples[:, 0], triples[:, 1])
    loss = ref_loss(scores_sp, triples[:, 2]) / n
    scores_po = ref_model.score_po(triples[:, 1], triples[:, 2])
    loss = loss + ref_loss(scores_po, triples[:, 0]) / n
    loss.backward()

    assert np.isclose(float(loss), float(our_val), atol=ATOL, rtol=RTOL)
    grads_close(ref_model, our_grads)


def test_negsamp_naive_shared_scoring_and_loss_parity():
    """Naive-shared negatives: every row scores against the same shared
    candidate list (reference NaiveSharedNegativeSample, sampler.py:383-469);
    batch loss and gradients must agree given identical candidates."""
    ref_model, ref_config, _ = make_ref_model("complex")
    from kge.util import KgeLoss as RefKgeLoss

    ref_config.set("train.type", "negative_sampling")
    ref_loss = RefKgeLoss.create(ref_config)

    job = make_our_job(
        "negative_sampling",
        **{
            "negative_sampling.shared": True,
            "negative_sampling.shared_type": "naive",
            "negative_sampling.num_samples.s": 5,
            "negative_sampling.num_samples.o": 5,
            # host-side sampling so the test controls the candidates
            "negative_sampling.on_device": "never",
        },
    )
    params = copy_tables(ref_model, job.model_params)
    batch = next(job._batches())
    n = batch["true_size"]
    num = 5

    # overwrite the drawn candidates with a fixed list (shape [num+1]: the
    # sampler pads naive-shared rows with one unused spare)
    rng = np.random.default_rng(5)
    for slot in (0, 2):
        batch[f"neg_unique_{slot}"] = rng.integers(
            0, 7, num + 1
        ).astype(batch[f"neg_unique_{slot}"].dtype)
        batch.pop(f"neg_gather_{slot}", None)

    def our_loss(p_):
        value, _ = job._loss_for_batch(
            p_, {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, str)},
            jax.random.PRNGKey(0),
        )
        return value

    our_val, our_grads = jax.value_and_grad(our_loss)(params)

    # torch replica: per slot, scores = [pos | score against shared list]
    ref_model.zero_grad()
    triples = torch.from_numpy(batch["triples"][:n].astype(np.int64))
    total = None
    for slot, direction in ((0, "s"), (2, "o")):
        shared = torch.from_numpy(
            batch[f"neg_unique_{slot}"][:num].astype(np.int64)
        )
        pos = ref_model.score_spo(
            triples[:, 0], triples[:, 1], triples[:, 2], direction=direction
        ).view(-1, 1)
        if slot == 0:
            neg = ref_model.score_po(triples[:, 1], triples[:, 2], shared)
        else:
            neg = ref_model.score_sp(triples[:, 0], triples[:, 1], shared)
        scores = torch.cat([pos, neg], dim=1)
        labels = torch.zeros(n, dtype=torch.long)
        value = ref_loss(scores, labels) / n
        total = value if total is None else total + value
    total.backward()

    assert np.isclose(float(total), float(our_val), atol=ATOL, rtol=RTOL), (
        float(total), float(our_val)
    )
    grads_close(ref_model, our_grads)
