"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY.md §4): an N-device sharded run must produce the
same training trajectory as a 1-device run (identical host-side batches,
sharded device compute) within floating-point reassociation tolerance.
"""

import tempfile

import jax
import numpy as np
import pytest

from kge_tpu.dataset import Dataset
from kge_tpu.job import TrainingJob
from kge_tpu.parallel import DeviceCtx

from tests.util import get_test_config, make_synthetic_dataset


def make_job(folder, data_axis, model_axis, train_type="negative_sampling",
             **options):
    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("dataset.name", "synth_par")
    config.set("train.type", train_type)
    config.set("train.batch_size", 64)
    config.set("train.max_epochs", 1)
    config.set("valid.every", 0)
    config.set("parallel.data", data_axis)
    config.set("parallel.model", model_axis)
    config.set("complex.entity_embedder.dim", 16, create=True)
    config.set("complex.relation_embedder.dim", 16, create=True)
    config.set("train.optimizer.default.args.lr", 0.1)
    for k, v in options.items():
        config.set(k, v, create=True)
    config.folder = tempfile.mkdtemp(prefix="kge-par-")
    config.init_folder()
    dataset = Dataset.create(config, folder=str(folder))
    return TrainingJob.create(config, dataset)


@pytest.fixture(scope="module")
def synth_folder(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("data") / "synth_par"
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _epoch_losses(job, epochs=2):
    job._prepare()
    job._is_prepared = True
    losses = []
    for e in range(1, epochs + 1):
        job.epoch = e
        losses.append(job.run_epoch()["avg_loss"])
    return losses


@pytest.mark.parametrize("mesh", [(8, 1), (4, 2), (1, 8)],
                         ids=["dp8", "dp4xmp2", "mp8"])
@pytest.mark.parametrize("train_type", ["negative_sampling", "1vsAll"])
def test_sharded_matches_single_device(synth_folder, mesh, train_type):
    base = make_job(synth_folder, 1, 1, train_type)
    losses_1 = _epoch_losses(base)

    data_axis, model_axis = mesh
    sharded = make_job(synth_folder, data_axis, model_axis, train_type)
    losses_n = _epoch_losses(sharded)
    assert sharded.device_ctx.active

    assert np.allclose(losses_1, losses_n, rtol=1e-4, atol=1e-5), (
        losses_1, losses_n
    )
    # entity table really is sharded over the model axis
    if model_axis > 1:
        sharding = sharded.model_params["entity_embedder"]["embeddings"].sharding
        assert sharding.spec[0] == "model"


def test_kvsall_sharded(synth_folder):
    base = make_job(synth_folder, 1, 1, "KvsAll")
    sharded = make_job(synth_folder, 4, 2, "KvsAll")
    l1 = _epoch_losses(base, 1)
    ln = _epoch_losses(sharded, 1)
    assert np.allclose(l1, ln, rtol=1e-4, atol=1e-5), (l1, ln)


def test_indivisible_mesh_errors(synth_folder):
    job = make_job(synth_folder, 1, 1)
    job.config.set("parallel.data", 3)  # 64 % 3 != 0
    job.config.set("parallel.model", 1)
    with pytest.raises(ValueError, match="divisible"):
        job._prepare()


def test_sharded_checkpoint_roundtrip(synth_folder):
    """Sharded params save to a host checkpoint and reload on one device."""
    from kge_tpu.job import Job
    from kge_tpu.utils.io import load_checkpoint

    job = make_job(synth_folder, 4, 2)
    job.config.set("train.max_epochs", 1)
    job.run()
    ckpt_file = job.config.checkpoint_file(1)
    checkpoint = load_checkpoint(ckpt_file)
    params = checkpoint["model"][0]
    table = params["entity_embedder"]["embeddings"]
    assert isinstance(table, np.ndarray) and table.shape == (64, 16)
    # resume single-device from the sharded run's checkpoint
    checkpoint["config"].set("parallel.data", 1)
    checkpoint["config"].set("parallel.model", 1)
    job2 = Job.create_from(checkpoint, dataset=job.dataset)
    job2.config.set("train.max_epochs", 2)
    job2.run()
    assert job2.epoch == 2


def test_sharded_eval_matches_single_device(synth_folder):
    """Filtered entity-ranking metrics must be identical whether the entity
    table is replicated on one device or row-sharded over the mesh (the
    score matmuls and rank reductions partition via GSPMD)."""
    from kge_tpu.job import EvaluationJob

    results = {}
    for name, (d, m) in (("single", (1, 1)), ("sharded", (2, 4))):
        job = make_job(synth_folder, d, m)
        job._prepare()
        job._is_prepared = True
        ev = EvaluationJob.create(job.config, job.dataset, job, job.model)
        ev.model_params = job.model_params
        ev.epoch = 1
        results[name] = ev._evaluate()

    for k in results["single"]:
        if k.startswith(("mean_rank", "mean_reciprocal_rank", "hits_at_")):
            assert np.isclose(
                results["single"][k], results["sharded"][k], atol=1e-9
            ), (k, results["single"][k], results["sharded"][k])


def test_run_epoch_group_sharded(synth_folder):
    """Grouped fused epochs must work under a device mesh too."""
    job = make_job(synth_folder, 4, 2)
    traces = job.run_epoch_group(3)
    losses = [t["avg_loss"] for t in traces]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_partitioned_edges_trains_and_is_deterministic(synth_folder):
    """parallel.partition_edges=always: each data shard shuffles within its
    own contiguous share of the triples. The run must be reproducible, cover
    every example, and converge like the unpartitioned run."""
    losses = {}
    for run in ("a", "b"):
        job = make_job(
            synth_folder, 4, 2,
            **{"parallel.partition_edges": "always",
               "random_seed.default": 5},
        )
        job._prepare()
        job._is_prepared = True
        assert job._partition_edges
        traces = job.run_epoch_group(3)
        assert traces[-1]["size"] == job.num_examples
        losses[run] = [t["avg_loss"] for t in traces]
        assert all(np.isfinite(v) for v in losses[run])
    assert losses["a"] == losses["b"]
    # learning happens (loss drops over epochs)
    assert losses["a"][-1] < losses["a"][0]


def test_partitioned_edges_independent_of_model_axis(synth_folder):
    """The partitioned trajectory depends only on the data-axis size, not on
    the model axis — the invariance that makes per-host feeding lossless."""
    losses = {}
    for model_axis in (1, 2):
        job = make_job(
            synth_folder, 4, model_axis,
            **{"parallel.partition_edges": "always",
               "random_seed.default": 5},
        )
        job._prepare()
        job._is_prepared = True
        traces = job.run_epoch_group(2)
        losses[model_axis] = [round(t["avg_loss"], 5) for t in traces]
    assert losses[1] == losses[2]


def test_ring_scoring_engages_and_matches(synth_folder):
    """parallel.ring_scoring=auto routes model-sharded full-vocab scoring
    through the explicit ppermute ring (parallel/ring.py); results must
    match GSPMD's default schedule (each row's query part is nonzero on
    exactly one shard, so the ring sum is bit-exact)."""
    import jax.numpy as jnp

    from kge_tpu.models.base import EVAL_CTX

    results = {}
    for mode in ("auto", "never"):
        job = make_job(
            synth_folder, 2, 4, train_type="1vsAll",
            **{"parallel.ring_scoring": mode},
        )
        job._prepare()
        job._is_prepared = True
        ring_out = job.model._ring_score(
            job.model_params,
            jnp.arange(8, dtype=jnp.int32),
            jnp.zeros(8, dtype=jnp.int32),
            2,
            EVAL_CTX,
        )
        if mode == "auto":
            assert ring_out is not None, "ring did not engage on model mesh"
            flat = job.model.score_sp(
                job.model_params,
                jnp.arange(8, dtype=jnp.int32),
                jnp.zeros(8, dtype=jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(ring_out), np.asarray(flat), rtol=0, atol=0
            )
        else:
            assert ring_out is None
        job.epoch = 1
        results[mode] = job.run_epoch()["avg_loss"]
    np.testing.assert_allclose(results["auto"], results["never"], rtol=1e-6)
