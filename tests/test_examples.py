"""Every example config must load cleanly against the defaults (typed keys,
model yaml imports, search spaces)."""

import glob
import os

import pytest
import yaml

from kge_tpu.config import Config

EXAMPLES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.yaml"))
)


@pytest.mark.parametrize(
    "path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES]
)
def test_example_config_loads(path):
    config = Config()
    config.set("console.quiet", True)
    with open(path) as f:
        options = yaml.safe_load(f)
    config.load_options(options)  # typed validation + model yaml import
    if config.get("job.type") == "search":
        search_type = config.get("search.type")
        assert config.get(f"{search_type}.class_name")


def test_toy_search_examples_build_jobs(tmp_path):
    """The toy search examples construct their SearchJob (no training run)."""
    from kge_tpu.dataset import Dataset
    from kge_tpu.job import Job

    fixture = os.path.join(os.path.dirname(__file__), "data", "dataset_test")
    for name in ("toy-complex-search-grid.yaml", "toy-complex-search-ax.yaml",
                 "toy-complex-search-manual.yaml"):
        path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
        config = Config()
        config.set("console.quiet", True)
        with open(path) as f:
            config.load_options(yaml.safe_load(f))
        config.folder = str(tmp_path / name.replace(".yaml", ""))
        config.init_folder()
        dataset = Dataset.create(config, folder=fixture)
        job = Job.create(config, dataset)
        assert job is not None
