"""Dump tooling tests: trace CSV/YAML export with the reference's flag
surface (keys renames, lineage, truncation, search mode), checkpoint and
config dumps (reference kge/util/dump.py behavior)."""

import argparse
import contextlib
import glob
import io
import os
import tempfile

import pytest
import yaml

from kge_tpu.utils import dump as dump_mod

from tests.util import get_test_config, get_test_dataset


@pytest.fixture(scope="module")
def trained_folder():
    """A real 3-epoch training run with validation — produces trace.yaml,
    config.yaml, and checkpoints."""
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("train.type", "KvsAll")
    config.set("train.max_epochs", 3)
    config.set("train.batch_size", 6)
    config.set("valid.every", 3)
    config.set("entity_ranking.hits_at_k_s", [1, 3])
    config.set("train.optimizer.default.args.lr", 0.2, create=True)
    config.folder = os.path.join(
        tempfile.mkdtemp(prefix="kge-dump-test-"), "exp"
    )
    config.init_folder()  # fresh path: writes config.yaml + config/
    dataset = get_test_dataset(config)
    job = TrainingJob.create(config, dataset)
    job.run()
    return config.folder


def run_dump(argv):
    parser = argparse.ArgumentParser()
    subparsers = parser.add_subparsers(dest="command")
    dump_mod.add_dump_parsers(subparsers)
    args = parser.parse_args(["dump"] + argv)
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        dump_mod.dump(args)
    return out.getvalue()


def test_dump_trace_csv(trained_folder):
    out = run_dump(["trace", trained_folder])
    lines = [l for l in out.strip().splitlines() if l]
    header = lines[0].split(",")
    assert "epoch" in header and "avg_loss" in header
    # 3 train epochs + 1 valid
    assert len(lines) >= 4


def test_dump_trace_yaml(trained_folder):
    out = run_dump(["trace", trained_folder, "--yaml"])
    entries = [yaml.safe_load(l) for l in out.strip().splitlines()]
    assert all(isinstance(e, dict) for e in entries)
    assert any(e.get("job") == "train" for e in entries)


def test_dump_trace_filters(trained_folder):
    train_only = run_dump(["trace", trained_folder, "--train", "--yaml"])
    assert all(
        yaml.safe_load(l).get("job") == "train"
        for l in train_only.strip().splitlines()
    )
    valid_only = run_dump(["trace", trained_folder, "--valid", "--yaml"])
    assert all(
        yaml.safe_load(l).get("split") == "valid"
        for l in valid_only.strip().splitlines()
    )


def test_dump_trace_truncate(trained_folder):
    out = run_dump(["trace", trained_folder, "--yaml", "--truncate", "2"])
    entries = [yaml.safe_load(l) for l in out.strip().splitlines()]
    assert entries and all(e.get("epoch", 0) <= 2 for e in entries)


def test_dump_trace_keys_and_header(trained_folder):
    out = run_dump([
        "trace", trained_folder, "--train",
        "-k", "lr=train.optimizer.default.args.lr", "model", "$base_model",
    ])
    lines = out.strip().splitlines()
    header = lines[0].split(",")
    assert header[-3:] == ["lr", "model", "$base_model"]
    row = lines[1].split(",")
    assert row[header.index("model")] == "complex"
    assert row[header.index("$base_model")] == "complex"
    # config fallback resolved the lr
    assert float(row[header.index("lr")]) > 0

    no_header = run_dump(["trace", trained_folder, "--train", "--no-header"])
    assert len(no_header.strip().splitlines()) == len(lines) - 1


def test_dump_trace_no_default_keys(trained_folder):
    out = run_dump([
        "trace", trained_folder, "--train", "-K", "-k", "epoch",
    ])
    header = out.strip().splitlines()[0].split(",")
    assert header == ["epoch"]


def test_dump_trace_list_keys(trained_folder):
    out = run_dump(["trace", trained_folder, "--list-keys"])
    keys = out.strip().splitlines()
    assert "avg_loss" in keys and "job_id" in keys


def test_dump_trace_from_checkpoint(trained_folder):
    ckpt = sorted(glob.glob(os.path.join(trained_folder, "checkpoint_0*.pt")))[-1]
    out = run_dump(["trace", ckpt, "--truncate", "--yaml"])
    entries = [yaml.safe_load(l) for l in out.strip().splitlines()]
    assert entries


def test_dump_trace_search_mode(tmp_path):
    """--search picks each trial's best validation result."""
    trace = tmp_path / "trace.yaml"
    rows = [
        {"job": "search", "scope": "train", "folder": "00000",
         "metric_value": 0.1, "epoch": 1},
        {"job": "search", "scope": "train", "folder": "00000",
         "metric_value": 0.3, "epoch": 2},
        {"job": "search", "scope": "train", "folder": "00001",
         "metric_value": 0.2, "epoch": 1},
    ]
    with open(trace, "w") as f:
        for r in rows:
            f.write(yaml.dump(r, default_flow_style=True,
                              width=float("inf")).strip() + "\n")
    out = run_dump(["trace", str(tmp_path), "--search", "--yaml"])
    entries = [yaml.safe_load(l) for l in out.strip().splitlines()]
    assert len(entries) == 2
    by_folder = {str(e["folder"]): e["metric_value"] for e in entries}
    assert by_folder == {"00000": 0.3, "00001": 0.2}


def test_dump_checkpoint(trained_folder):
    out = run_dump(["checkpoint", trained_folder])
    overview = yaml.safe_load(out)
    assert overview["type"] == "train"
    assert overview["num_parameters"] > 0
    assert overview["model"] == "complex"


def test_dump_config_minimal(trained_folder):
    out = run_dump(["config", trained_folder, "--minimal"])
    minimal = yaml.safe_load(out)
    assert minimal.get("model") == "complex"
    # defaults are not included
    assert "modules" not in minimal
