"""Search job tests: manual, grid, Sobol/random auto-search with resume."""

import os
import tempfile

import numpy as np
import pytest
import yaml

from kge_tpu.job import Job
from kge_tpu.job.search import AxSearchJob, SearchSpace
from kge_tpu.utils.io import load_checkpoint

from tests.util import get_test_config, get_test_dataset


def make_search_config(search_type, folder=None, **options):
    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("job.type", "search")
    config.set("search.type", search_type)
    config.set("train.type", "negative_sampling")
    config.set("train.max_epochs", 2)
    config.set("train.batch_size", 6)
    config.set("valid.every", 2)
    config.set("valid.metric", "mean_reciprocal_rank_filtered")
    config.set("entity_ranking.hits_at_k_s", [1, 3])
    config.set("complex.entity_embedder.dim", 8, create=True)
    config.set("complex.relation_embedder.dim", 8, create=True)
    for k, v in options.items():
        config.set(k, v, create=True)
    config.folder = folder or tempfile.mkdtemp(prefix="kge-search-")
    config.init_folder()
    return config


def test_manual_search():
    config = make_search_config(
        "manual_search",
        **{"manual_search.configurations": [
            {"folder": "lr01", "train.optimizer.default.args.lr": 0.1},
            {"folder": "lr03", "train.optimizer.default.args.lr": 0.3},
        ]},
    )
    dataset = get_test_dataset(config)
    job = Job.create(config, dataset)
    results = job.run()
    assert len(results) == 2
    assert all(r[1] is not None for r in results)
    # each trial has its own folder with checkpoints and trace
    for sub in ("lr01", "lr03"):
        assert os.path.isfile(os.path.join(config.folder, sub, "trace.yaml"))
        assert any(
            f.startswith("checkpoint") for f in
            os.listdir(os.path.join(config.folder, sub))
        )
    # search trace contains per-trial entries with the metric
    entries = [
        yaml.safe_load(line) for line in open(config.tracefile())
    ]
    done = [e for e in entries if e.get("event") == "search_completed"]
    assert len(done) >= 2


def test_manual_search_multi_worker():
    """Trials run in spawned worker processes pinned to devices from
    search.device_pool (reference kge/job/search.py:36-97)."""
    config = make_search_config(
        "manual_search",
        **{
            "search.num_workers": 2,
            "search.device_pool": ["cpu", "cpu"],
            "manual_search.configurations": [
                {"folder": "lr01", "train.optimizer.default.args.lr": 0.1},
                {"folder": "lr02", "train.optimizer.default.args.lr": 0.2},
                {"folder": "lr03", "train.optimizer.default.args.lr": 0.3},
            ],
        },
    )
    dataset = get_test_dataset(config)
    job = Job.create(config, dataset)
    results = job.run()
    assert len(results) == 3
    assert all(r[1] is not None for r in results)
    for sub in ("lr01", "lr02", "lr03"):
        assert os.path.isfile(os.path.join(config.folder, sub, "trace.yaml"))
    # each worker claimed a distinct device slot from the pool
    lock_dir = os.path.join(config.folder, ".device_locks")
    assert len(os.listdir(lock_dir)) == 2
    # the search trace records every trial (written by the parent process)
    entries = [yaml.safe_load(line) for line in open(config.tracefile())]
    done = [e for e in entries if e.get("event") == "search_completed"]
    assert len(done) >= 3


def test_grid_search():
    config = make_search_config(
        "grid_search",
        **{"grid_search.parameters": {
            "train.optimizer.default.args.lr": [0.1, 0.3],
            "negative_sampling.num_samples.s": [2, 4],
        }},
    )
    dataset = get_test_dataset(config)
    job = Job.create(config, dataset)
    results = job.run()
    assert len(results) == 4
    subdirs = [
        d for d in os.listdir(config.folder)
        if os.path.isdir(os.path.join(config.folder, d)) and d != "config"
    ]
    assert len(subdirs) == 4


def test_search_space_mapping():
    space = SearchSpace([
        {"name": "train.optimizer.default.args.lr", "type": "range",
         "bounds": [0.001, 1.0], "log_scale": True, "value_type": "float"},
        {"name": "negative_sampling.num_samples.s", "type": "range",
         "bounds": [1, 16]},
        {"name": "train.loss", "type": "choice", "values": ["kl", "bce"]},
        {"name": "model", "type": "fixed", "value": "complex"},
    ])
    assert space.num_tunable == 3
    conf = space.from_unit(np.array([0.5, 0.5, 0.1]))
    assert 0.001 <= conf["train.optimizer.default.args.lr"] <= 1.0
    assert isinstance(conf["negative_sampling.num_samples.s"], int)
    assert conf["train.loss"] == "kl"
    assert conf["model"] == "complex"
    # extremes stay in bounds
    lo = space.from_unit(np.array([0.0, 0.0, 0.0]))
    hi = space.from_unit(np.array([1.0, 1.0, 0.999]))
    assert lo["negative_sampling.num_samples.s"] == 1
    assert hi["negative_sampling.num_samples.s"] == 16
    assert hi["train.loss"] == "bce"


SPACE = [
    {"name": "train.optimizer.default.args.lr", "type": "range",
     "bounds": [0.01, 0.5], "log_scale": True, "value_type": "float"},
    {"name": "negative_sampling.num_samples.s", "type": "choice",
     "values": [2, 4]},
]


def test_ax_search_runs_and_resumes():
    folder = tempfile.mkdtemp(prefix="kge-search-")
    config = make_search_config(
        "ax_search", folder=folder,
        **{"ax_search.num_trials": 3, "ax_search.num_sobol_trials": 2,
           "ax_search.parameters": SPACE},
    )
    dataset = get_test_dataset(config)
    job = Job.create(config, dataset)
    result = job.run()
    assert result["best_parameters"] is not None
    assert np.isfinite(result["metric_value"])
    assert len(job.parameters) == 3

    # resume: no new trials needed, same best
    checkpoint = load_checkpoint(config.checkpoint_file(1))
    job2 = Job.create_from(checkpoint)
    assert len(job2.parameters) == 3
    result2 = job2.run()
    assert result2["metric_value"] == pytest.approx(result["metric_value"])

    # resume with a higher budget proposes more trials deterministically
    job2.config.set("ax_search.num_trials", 4)
    job2._num_trials = 4
    result3 = job2.run()
    assert len(job2.parameters) == 4
    # the sobol prefix is unchanged on replay
    assert job2.parameters[:2] == job.parameters[:2]


def test_ax_search_gp_ei_proposal():
    """After the Sobol phase the GP+EI proposer should concentrate near the
    optimum of a smooth objective (instead of sampling uniformly)."""
    config = make_search_config(
        "ax_search",
        **{"ax_search.num_trials": 20, "ax_search.num_sobol_trials": 4,
           "ax_search.parameters": SPACE},
    )
    dataset = get_test_dataset(config)
    job = Job.create(config, dataset)
    rng = np.random.default_rng(0)
    opt = np.array([0.7, 0.3])
    for i in range(12):
        u = rng.random(2)
        job._unit_points[i] = [float(x) for x in u]
        job.parameters.append(job.space.from_unit(u))
        value = 1.0 - float(np.sum((u - opt) ** 2))
        job.results.append({"mean_reciprocal_rank_filtered": value})
    u_next = job._model_based_point(12)
    assert u_next.shape == (2,)
    assert np.all((u_next >= 0.0) & (u_next <= 1.0))
    # uniform random averages ~0.25 squared distance on this objective
    assert float(np.sum((u_next - opt) ** 2)) < 0.15
    # deterministic given identical observations (resume replay)
    u_again = job._model_based_point(12)
    assert np.allclose(u_next, u_again)


def test_kcore_decomposition(tmp_path):
    """Core numbers and subset datasets of a synthetic graph."""
    from kge_tpu.utils.subgraph import KCoreManager, core_numbers
    from kge_tpu.dataset import Dataset
    from tests.util import make_synthetic_dataset

    # triangle (3-core-ish: each vertex degree 2 -> core 2) plus a pendant
    edges = np.array([[0, 1], [1, 2], [2, 0], [3, 0]])
    core = core_numbers(4, edges)
    assert core.tolist() == [2, 2, 2, 1]

    folder = make_synthetic_dataset(tmp_path / "synth_kcore", num_entities=32,
                                    num_relations=4, num_train=256)
    config = get_test_config()
    config.set("dataset.name", "synth_kcore")
    dataset = Dataset.create(config, folder=str(folder))
    mgr = KCoreManager(config, dataset)
    stats = mgr.decompose(valid_frac=0.2, valid_max=50)
    assert len(stats) >= 1
    for s in stats:
        sub_config = get_test_config()
        sub_config.set("dataset.name", os.path.basename(s["folder"]))
        sub = Dataset.create(sub_config, folder=s["folder"])
        assert sub.num_entities() == s["num_entities"]
        train = sub.split("train")
        assert train[:, 0].max() < s["num_entities"]
        assert train[:, 1].max() < s["num_relations"]
        # entity ids map back into the parent vocabulary
        assert set(sub.entity_ids()) <= set(dataset.entity_ids())


def test_grash_search(tmp_path):
    from tests.util import make_synthetic_dataset
    from kge_tpu.dataset import Dataset

    folder = make_synthetic_dataset(tmp_path / "synth_grash", num_entities=32,
                                    num_relations=4, num_train=256)
    config = make_search_config(
        "grash_search",
        **{"grash_search.num_trials": 4, "grash_search.eta": 2,
           "grash_search.search_budget": 2,
           "grash_search.variant": "combined",
           "grash_search.seed": 3,
           "grash_search.keep_pretrained": True,
           "grash_search.parameters": SPACE,
           "train.max_epochs": 4,
           "dataset.name": "synth_grash"},
    )
    dataset = Dataset.create(config, folder=str(folder))
    job = Job.create(config, dataset)
    result = job.run()
    assert result["best_parameters"] is not None
    assert np.isfinite(result["metric_value"])
    # keep_pretrained: each non-final-round trial left a packaged model for
    # the next round to initialize from
    round0 = [d for d in os.listdir(config.folder) if d.startswith("round0-")]
    assert len(round0) == 4
    assert all(
        os.path.isfile(os.path.join(config.folder, d, "model_best.pt"))
        for d in round0
    )
    # search resume: completed trials come from the cache (no re-training);
    # the fixture dataset lives outside the data roots, so pass it in
    checkpoint = load_checkpoint(config.checkpoint_file(1))
    job2 = Job.create_from(checkpoint, dataset=dataset)
    assert len(job2.trial_cache) >= 5  # 4 trials round 0 + >=1 round 1
    result2 = job2.run()
    assert result2["metric_value"] == pytest.approx(result["metric_value"])


def test_grash_search_epoch_variant(tmp_path):
    """Epoch variant: later rounds resume the predecessor's checkpoint."""
    from tests.util import make_synthetic_dataset
    from kge_tpu.dataset import Dataset

    folder = make_synthetic_dataset(tmp_path / "synth_grash_e",
                                    num_entities=32, num_relations=4,
                                    num_train=256)
    config = make_search_config(
        "grash_search",
        **{"grash_search.num_trials": 4, "grash_search.eta": 2,
           "grash_search.search_budget": 2,
           "grash_search.variant": "epoch",
           "grash_search.seed": 3,
           "grash_search.parameters": SPACE,
           "train.max_epochs": 4,
           "dataset.name": "synth_grash_e"},
    )
    dataset = Dataset.create(config, folder=str(folder))
    job = Job.create(config, dataset)
    result = job.run()
    assert np.isfinite(result["metric_value"])
    # the survivor's round-1 folder contains a checkpoint copied from its
    # round-0 run (resume), i.e. training continued past the early epochs
    round1 = [d for d in os.listdir(config.folder) if d.startswith("round1-")]
    assert len(round1) == 2
    for d in round1:
        trace_file = os.path.join(config.folder, d, "trace.yaml")
        entries = [yaml.safe_load(line) for line in open(trace_file)]
        resumed = [e for e in entries if e.get("event") == "job_resumed"]
        assert resumed, f"round-1 trial {d} did not resume round 0"


def test_device_checkout_is_exclusive(tmp_path):
    """Worker device checkout claims each pool slot at most once."""
    from kge_tpu.job.search import _checkout_device

    pool = ["cpu", "cpu", "tpu:0"]
    lock_dir = str(tmp_path / "locks")
    claimed = [_checkout_device(pool, lock_dir) for _ in range(4)]
    assert claimed[:3] == pool
    assert claimed[3] is None  # pool exhausted


def test_pin_device_sets_platform_env(monkeypatch):
    from kge_tpu.job.search import _pin_device

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("TPU_VISIBLE_DEVICES", raising=False)
    _pin_device("tpu:3")
    import os
    assert os.environ["JAX_PLATFORMS"] == "tpu"
    assert os.environ["TPU_VISIBLE_DEVICES"] == "3"
    _pin_device("cpu")
    assert os.environ["JAX_PLATFORMS"] == "cpu"
