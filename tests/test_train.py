"""Training job tests: all strategies run, loss decreases, forward-only
epochs are deterministic, checkpoints resume exactly (reference
tests/test_train.py's invariants, adapted to the jitted-step design)."""

import glob
import os
import tempfile

import numpy as np
import pytest

from kge_tpu.job import Job, TrainingJob
from kge_tpu.utils.io import load_checkpoint

from tests.util import get_test_config, get_test_dataset


def make_job(train_type="negative_sampling", model="complex", folder=None,
             forward_only=False, **options):
    config = get_test_config()
    config.load_options({"model": model})
    config.set("train.type", train_type)
    config.set("train.max_epochs", 2)
    config.set("train.batch_size", 5)
    config.set("valid.every", 0)
    config.set("train.optimizer.default.args.lr", 0.05)
    for k, v in options.items():
        config.set(k, v, create=True)
    config.folder = folder or tempfile.mkdtemp(prefix="kge-test-")
    config.init_folder()
    dataset = get_test_dataset(config)
    return TrainingJob.create(config, dataset, forward_only=forward_only)


STRATEGIES = ["negative_sampling", "1vsAll", "KvsAll"]


@pytest.mark.parametrize("train_type", STRATEGIES)
def test_loss_decreases(train_type):
    job = make_job(train_type, **{"train.max_epochs": 8})
    job._prepare()
    job._is_prepared = True
    losses = []
    for epoch in range(1, 9):
        job.epoch = epoch
        trace = job.run_epoch()
        losses.append(trace["avg_loss"])
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("train_type", STRATEGIES)
def test_forward_only_deterministic(train_type):
    """Forward-only epochs with identical seed produce identical losses
    (the reference's subbatch-invariance analogue for the jitted step)."""
    values = []
    for _ in range(2):
        job = make_job(train_type, forward_only=True)
        job._prepare()
        job._is_prepared = True
        job.epoch = 1
        values.append(job.run_epoch()["avg_loss"])
    assert values[0] == pytest.approx(values[1], abs=1e-6)


def test_checkpoints_written_and_resume():
    folder = tempfile.mkdtemp(prefix="kge-test-")
    job = make_job(
        "negative_sampling", folder=folder,
        **{"train.max_epochs": 3, "train.checkpoint.every": 1,
           "train.checkpoint.keep": 3, "valid.every": 3,
           "entity_ranking.hits_at_k_s": [1, 3]},
    )
    result = job.run()
    files = sorted(os.path.basename(f) for f in glob.glob(f"{folder}/checkpoint_*"))
    assert "checkpoint_00003.pt" in files
    assert "checkpoint_best.pt" in files

    # resume from epoch 3: nothing further to do (max reached), state intact
    checkpoint = load_checkpoint(
        job.config.best_or_last_checkpoint_file(folder)
    )
    job2 = Job.create_from(checkpoint)
    assert job2.epoch == 3
    assert len(job2.valid_trace) == 1
    # resumed params identical to saved ones
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(job.model_params),
        jax.tree_util.tree_leaves(job2.model_params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))

    # training further epochs from the checkpoint works
    job2.config.set("train.max_epochs", 4)
    job2.run()
    assert job2.epoch == 4


def test_resume_continues_optimizer_state():
    folder = tempfile.mkdtemp(prefix="kge-test-")
    job = make_job(
        "1vsAll", folder=folder,
        **{"train.max_epochs": 2, "train.optimizer.default.type": "Adam"},
    )
    job.run()
    checkpoint = load_checkpoint(job.config.checkpoint_file(2))
    job2 = Job.create_from(checkpoint)
    job2._prepare()
    job2._is_prepared = True
    # Adam moments restored, not reinitialized
    m = job2.opt_state["leaves"][0]["m"]
    assert float(np.abs(np.asarray(m)).sum()) > 0


def test_early_stopping_patience():
    folder = tempfile.mkdtemp(prefix="kge-test-")
    job = make_job(
        "negative_sampling", folder=folder,
        **{"train.max_epochs": 40, "valid.every": 1,
           "valid.early_stopping.patience": 2,
           "valid.metric": "mean_reciprocal_rank_filtered",
           "entity_ranking.hits_at_k_s": [1, 3],
           "train.optimizer.default.args.lr": 0.0},  # no progress
    )
    job.run()
    assert job.epoch < 40


def test_regex_parameter_groups():
    """A separate lr for relation parameters via regex groups."""
    job = make_job(
        "negative_sampling",
        **{"train.optimizer.relation": {
            "regex": ".*_relation_embedder.*", "args": {"lr": 0.9}},
           },
    )
    job._prepare()
    job._is_prepared = True
    names = job.optimizer.parameter_names_list
    assert any("_relation_embedder" in n for n in names)
    rel_group = [g for g in job.optimizer.groups if g.name == "relation"]
    assert rel_group and rel_group[0].base_lr == 0.9
    labels = job.optimizer._labels
    rel_idx = job.optimizer.groups.index(rel_group[0])
    matched = [n for n, l in zip(names, labels) if l == rel_idx]
    assert matched == [n for n in names if "_relation_embedder" in n]


def test_frequency_sampler_and_shared():
    job = make_job(
        "negative_sampling",
        **{"negative_sampling.sampling_type": "frequency",
           "negative_sampling.num_samples.s": 4},
    )
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    trace = job.run_epoch()
    assert np.isfinite(trace["avg_loss"])


def test_shared_negative_sampling_trains():
    job = make_job(
        "negative_sampling",
        **{"negative_sampling.shared": True,
           "negative_sampling.shared_type": "default",
           "negative_sampling.num_samples.s": 4},
    )
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    trace = job.run_epoch()
    assert np.isfinite(trace["avg_loss"])


def test_filtered_negative_sampling():
    job = make_job(
        "negative_sampling",
        **{"negative_sampling.filtering.s": True,
           "negative_sampling.filtering.o": True,
           "negative_sampling.num_samples.s": 5},
    )
    job._prepare()
    job._is_prepared = True
    # drawn negatives must avoid known positives
    triples = job.triples
    sampler = job._sampler
    neg = sampler.sample(triples.astype(np.int64), 2)  # slot O
    sp_index = job.dataset.index("train_sp_to_o")
    samples = neg.materialized_samples()
    for i in range(len(triples)):
        positives = set(sp_index.get(int(triples[i, 0]), int(triples[i, 1])).tolist())
        assert not (set(samples[i].tolist()) & positives)


def test_rotate_phases_stay_normalized_after_training():
    job = make_job("negative_sampling", model="rotate")
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    job.run_epoch()
    phases = np.asarray(job.model_params["relation_embedder"]["embeddings"])
    assert (phases >= -np.pi).all() and (phases < np.pi).all()


@pytest.mark.parametrize("train_type", STRATEGIES)
def test_subbatch_invariance(train_type):
    """Forward-only avg_loss is identical with and without subbatching
    (the reference's core training invariant, tests/test_train.py:33-70)."""
    values = {}
    for sub in (-1, 3):
        job = make_job(
            train_type, forward_only=True,
            # host-side sampling: negatives must not depend on subbatch rng
            **{"train.subbatch_size": sub, "train.batch_size": 6,
               "negative_sampling.on_device": "never"},
        )
        job._prepare()
        job._is_prepared = True
        job.epoch = 1
        values[sub] = job.run_epoch()["avg_loss"]
    assert values[-1] == pytest.approx(values[3], rel=1e-5), values


@pytest.mark.parametrize("train_type", STRATEGIES)
def test_subbatch_training_matches(train_type):
    """One training epoch with gradient accumulation produces the same
    parameters as without (identical gradients by construction)."""
    import jax

    params = {}
    for sub in (-1, 3):
        job = make_job(
            train_type,
            **{"train.subbatch_size": sub, "train.batch_size": 6,
               "train.epoch_scan": "never",
               "negative_sampling.on_device": "never"},
        )
        job._prepare()
        job._is_prepared = True
        job.epoch = 1
        job.run_epoch()
        params[sub] = job.model_params
    for a, b in zip(jax.tree_util.tree_leaves(params[-1]),
                    jax.tree_util.tree_leaves(params[3])):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), train_type


def test_pretrained_initialization(tmp_path):
    """Embeddings initialize from a packaged model, matched by external id."""
    import jax
    from kge_tpu.utils.package import package_model
    from kge_tpu.models import KgeModel

    folder = str(tmp_path / "pre")
    job = make_job("negative_sampling", folder=folder,
                   **{"train.max_epochs": 1, "train.checkpoint.every": 1})
    job.run()
    pkg = package_model(job.config.checkpoint_file(1))

    job2 = make_job(
        "negative_sampling",
        **{"complex.entity_embedder.pretrain.model_filename": pkg},
    )
    job2._prepare()
    job2._is_prepared = True
    trained = np.asarray(job.model_params["entity_embedder"]["embeddings"])
    initialized = np.asarray(job2.model_params["entity_embedder"]["embeddings"])
    assert np.allclose(trained, initialized)
    # relations were NOT pretrained -> must differ from job's trained ones
    r1 = np.asarray(job.model_params["relation_embedder"]["embeddings"])
    r2 = np.asarray(job2.model_params["relation_embedder"]["embeddings"])
    assert not np.allclose(r1, r2)


def test_run_epoch_group_matches_sequential():
    """Grouped epochs (one fused dispatch) must train like sequential
    epochs: same trace structure, decreasing loss, correct epoch numbers."""
    import numpy as np
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("train.type", "negative_sampling")
    config.set("train.max_epochs", 4)
    config.set("valid.every", 0)
    config.set("random_seed.default", 7)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    traces = job.run_epoch_group(4)
    assert [t["epoch"] for t in traces] == [1, 2, 3, 4]
    assert job.epoch == 4
    losses = [t["avg_loss"] for t in traces]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert all(t.get("scanned") for t in traces)


def test_bfloat16_compute_mode():
    """parallel.compute_dtype=bfloat16 trains stably (params stay float32;
    losses are computed in float32)."""
    import jax.numpy as jnp
    import numpy as np
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("train.type", "negative_sampling")
    config.set("parallel.compute_dtype", "bfloat16")
    config.set("valid.every", 0)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    traces = job.run_epoch_group(3)
    assert job.model_params["entity_embedder"]["embeddings"].dtype == jnp.float32
    losses = [t["avg_loss"] for t in traces]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    # scorer sees bfloat16 embeddings
    from kge_tpu.models import EVAL_CTX
    emb = job.model._entity_embedder.embed(
        job.model_params["entity_embedder"], jnp.arange(3), EVAL_CTX
    )
    assert emb.dtype == jnp.bfloat16


@pytest.mark.parametrize("options", [
    {"negative_sampling.shared": True,
     "negative_sampling.shared_type": "default"},  # shared, on-device
    {"negative_sampling.shared": False,
     "negative_sampling.implementation": "triple"},
    {"negative_sampling.shared": False,
     "negative_sampling.implementation": "batch"},
    # pin the implementation below: fused/unfused must compare the same
    # scoring path (auto would resolve them differently)
    {"complex.entity_embedder.dropout": 0.3,
     "negative_sampling.implementation": "triple"},
    {"complex.entity_embedder.regularize": "lp",
     "complex.entity_embedder.regularize_weight": 0.01,
     "complex.entity_embedder.regularize_args.weighted": True,
     "negative_sampling.implementation": "triple"},
    {"negative_sampling.filtering.o": True,
     "negative_sampling.implementation": "triple"},  # host-side sampling
])
def test_fused_scoring_matches_unfused(options):
    """The fused (localized single-gather) scoring path reproduces the
    unfused trajectory exactly under the same seeds — including dropout,
    weighted regularization, and host-drawn filtered negatives."""
    results = {}
    for mode in ("never", "always"):
        job = make_job(
            "negative_sampling",
            **{"negative_sampling.num_samples.s": 3,
               "negative_sampling.num_samples.o": 3,
               "negative_sampling.fused_scoring": mode,
               "random_seed.default": 11,
               **options},
        )
        traces = job.run_epoch_group(3)
        if mode == "always":
            assert job._fused
        results[mode] = (
            [t["avg_loss"] for t in traces],
            np.asarray(job.model_params["entity_embedder"]["embeddings"]),
            np.asarray(job.model_params["relation_embedder"]["embeddings"]),
        )
    assert np.allclose(results["never"][0], results["always"][0],
                       rtol=1e-5, atol=1e-6), (results["never"][0],
                                               results["always"][0])
    assert np.allclose(results["never"][1], results["always"][1],
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(results["never"][2], results["always"][2],
                       rtol=1e-5, atol=1e-6)


def test_fused_scoring_subbatched_matches():
    """Fused scoring composes with gradient-accumulation subbatches."""
    results = {}
    for mode in ("never", "always"):
        job = make_job(
            "negative_sampling",
            **{"negative_sampling.num_samples.s": 3,
               "train.batch_size": 4,
               "train.subbatch_size": 2,
               "negative_sampling.fused_scoring": mode,
               "random_seed.default": 3},
        )
        traces = job.run_epoch_group(2)
        results[mode] = (
            [t["avg_loss"] for t in traces],
            np.asarray(job.model_params["entity_embedder"]["embeddings"]),
        )
    assert np.allclose(results["never"][0], results["always"][0],
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(results["never"][1], results["always"][1],
                       rtol=1e-5, atol=1e-6)


def test_localized_paths_refuse_reciprocal_models():
    """Models with internal relation-id arithmetic (the reciprocal wrapper)
    must not consume localized batches: fused auto turns itself off,
    fused always errors, and the sparse-update path stays off even when
    forced (its localized ids would make p + |R| index garbage)."""
    job = make_job(
        "negative_sampling", model="reciprocal_relations_model",
        **{"reciprocal_relations_model.base_model.type": "distmult",
           "negative_sampling.num_samples.s": 3,
           "train.sparse_embedding_update": "always"},
    )
    job._prepare()
    job._is_prepared = True
    assert not job._fused
    assert not job._sparse_update
    job.epoch = 1
    trace = job.run_epoch()
    assert np.isfinite(trace["avg_loss"])

    with pytest.raises(ValueError, match="fused_scoring"):
        job = make_job(
            "negative_sampling", model="reciprocal_relations_model",
            **{"reciprocal_relations_model.base_model.type": "distmult",
               "negative_sampling.fused_scoring": "always"},
        )
        job._prepare()


def test_sparse_embedding_update_matches_dense():
    """Row-sparse table updates must reproduce the dense Adagrad trajectory
    exactly (same seeds, same losses, same final tables)."""
    import jax.numpy as jnp
    import numpy as np
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    results = {}
    for mode in ("never", "always"):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set("train.type", "negative_sampling")
        config.set("train.sparse_embedding_update", mode)
        config.set("negative_sampling.num_samples.s", 3)
        config.set("negative_sampling.num_samples.o", 3)
        config.set("valid.every", 0)
        config.set("random_seed.default", 21)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        traces = job.run_epoch_group(3)
        results[mode] = (
            [t["avg_loss"] for t in traces],
            np.asarray(job.model_params["entity_embedder"]["embeddings"]),
            np.asarray(job.model_params["relation_embedder"]["embeddings"]),
        )
        if mode == "always":
            assert job._sparse_update

    for i in range(3):
        assert np.allclose(
            results["never"][0], results["always"][0], rtol=1e-5, atol=1e-6
        ), (results["never"][0], results["always"][0])
    assert np.allclose(results["never"][1], results["always"][1],
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(results["never"][2], results["always"][2],
                       rtol=1e-5, atol=1e-6)


def test_sparse_update_with_shared_negatives():
    """Sparse updates compose with shared negative sampling: identical
    trajectory to the dense step under the same seeds."""
    import numpy as np
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    results = {}
    for mode in ("never", "always"):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set("train.type", "negative_sampling")
        config.set("train.sparse_embedding_update", mode)
        config.set("negative_sampling.num_samples.s", 4)
        config.set("negative_sampling.shared", True)
        config.set("negative_sampling.shared_type", "default")
        config.set("valid.every", 0)
        config.set("random_seed.default", 5)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        traces = job.run_epoch_group(3)
        if mode == "always":
            assert job._sparse_update
        results[mode] = (
            [t["avg_loss"] for t in traces],
            np.asarray(job.model_params["entity_embedder"]["embeddings"]),
        )
    assert np.allclose(results["never"][0], results["always"][0],
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(results["never"][1], results["always"][1],
                       rtol=1e-5, atol=1e-6)


def test_console_format_expression_applied(capsys):
    """console.format.train_epoch renders epoch trace entries on the console
    (reference kge/job/trace.py:257-273)."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set_all({
        "train.type": "negative_sampling",
        "train.max_epochs": 1,
        "train.batch_size": 6,
        "valid.every": 0,
        "console.quiet": False,
        "console.format.train_epoch":
            "f\"EPOCH_FMT epoch={epoch} loss={avg_loss:.2f}\"",
    }, create=True)
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job.run_epoch_group(1)
    out = capsys.readouterr().out
    assert "EPOCH_FMT epoch=1 loss=" in out


def test_batch_implementation_matches_all_and_triple():
    """'batch' (static-shape in-batch dedup, reference sampler.py:307-344),
    'all', and 'triple' must produce identical per-epoch losses — they
    compute the same (row, sample) dot products through different target
    sets."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    losses = {}
    for impl in ("triple", "batch", "all"):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set_all({
            "train.type": "negative_sampling",
            "negative_sampling.implementation": impl,
            "negative_sampling.num_samples.s": 5,
            "negative_sampling.num_samples.o": 5,
            "train.max_epochs": 1,
            "train.batch_size": 6,
            "valid.every": 0,
        }, create=True)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        losses[impl] = job.run_epoch_group(1)[0]["avg_loss"]
    np.testing.assert_allclose(losses["batch"], losses["all"], rtol=1e-5)
    np.testing.assert_allclose(losses["batch"], losses["triple"], rtol=1e-5)


@pytest.mark.parametrize("shared_type", ["naive", "default"])
def test_shared_negatives_same_loss_multi_and_per_slot(shared_type):
    """The embed-once path for shared negatives must trace the same losses
    as the per-slot scoring path."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.job import TrainingJob

    losses = {}
    for forced in (False, True):
        config = get_test_config()
        config.load_options({"model": "complex"})
        config.set_all({
            "train.type": "negative_sampling",
            "negative_sampling.shared": True,
            "negative_sampling.shared_type": shared_type,
            "negative_sampling.num_samples.s": 4,
            "negative_sampling.num_samples.o": 4,
            "train.max_epochs": 2,
            "train.batch_size": 6,
            "valid.every": 0,
        }, create=True)
        dataset = get_test_dataset(config)
        job = TrainingJob.create(config, dataset)
        job._force_grouped_all = forced
        traces = job.run_epoch_group(2)
        losses[forced] = [t["avg_loss"] for t in traces]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
