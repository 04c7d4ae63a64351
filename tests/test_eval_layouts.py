"""The two label-coordinate device layouts of entity-ranking eval
("perrow" one-hot-pick vs "flat" coordinate pairs) must produce identical
metrics — they read the same score-matrix entries."""

import jax
import numpy as np

from tests.util import get_test_config, make_synthetic_dataset


def _run_eval(tmp_path, budget):
    from kge_tpu import Config, Dataset
    from kge_tpu.job import EvaluationJob
    from kge_tpu.job.eval_entity_ranking import EntityRankingJob
    from kge_tpu.models import KgeModel

    folder = make_synthetic_dataset(
        tmp_path / "layout_synth", num_entities=50, num_relations=6,
        num_train=400, num_valid=40, num_test=40, seed=5,
    )
    config = Config()
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "layout_synth")
    config.set("eval.split", "valid")
    config.set("eval.batch_size", 16)
    dataset = Dataset.create(config, folder=str(folder))
    model = KgeModel.create(config, dataset)
    job = EvaluationJob.create(config, dataset, model=model)
    job.model_params = model.init_params(jax.random.PRNGKey(4))
    job.epoch = 0
    old = EntityRankingJob._PERROW_BUDGET
    EntityRankingJob._PERROW_BUDGET = budget
    try:
        trace = job._evaluate()
    finally:
        EntityRankingJob._PERROW_BUDGET = old
    return trace


def test_perrow_and_flat_layouts_agree(tmp_path):
    perrow = _run_eval(tmp_path / "a", 64 << 20)
    flat = _run_eval(tmp_path / "b", 0)
    keys = [
        k for k in perrow
        if k.startswith(("mean_rank", "mean_reciprocal_rank", "hits_at_"))
    ]
    assert keys
    for k in keys:
        assert np.isclose(perrow[k], flat[k], atol=0), (
            k, perrow[k], flat[k]
        )


def test_reciprocal_grouped_consistency_clean(tmp_path):
    """Grouped-path eval of a reciprocal model must use the per-direction
    positive scores for the consistency check (on CPU the paths agree
    exactly, so max excess must be <= 0) — caught by review."""
    from kge_tpu import Config, Dataset
    from kge_tpu.job import EvaluationJob
    from kge_tpu.models import KgeModel

    folder = make_synthetic_dataset(
        tmp_path / "recip_synth", num_entities=40, num_relations=5,
        num_train=300, num_valid=30, num_test=30, seed=9,
    )
    config = Config()
    config.set("console.quiet", True)
    config.load_options({"model": "reciprocal_relations_model"})
    config.set("reciprocal_relations_model.base_model.type", "complex")
    config.set("dataset.name", "recip_synth")
    config.set("eval.split", "valid")
    config.set("entity_ranking.tie_handling.warn_only", False)
    dataset = Dataset.create(config, folder=str(folder))
    model = KgeModel.create(config, dataset)
    job = EvaluationJob.create(config, dataset, model=model)
    job.model_params = model.init_params(jax.random.PRNGKey(2))
    job.epoch = 0
    trace = job._evaluate()  # raises ValueError if the check trips
    assert np.isfinite(trace["mean_reciprocal_rank_filtered"])
