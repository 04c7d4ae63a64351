"""Preprocessing toolkit tests (reference tests/test_preprocess.py)."""

import os

import numpy as np
import pytest
import yaml

from kge_tpu.data.preprocess import preprocess_default


@pytest.fixture()
def raw_folder(tmp_path):
    folder = tmp_path / "rawds"
    folder.mkdir()
    train = [
        ("alice", "knows", "bob"),
        ("bob", "knows", "carol"),
        ("carol", "likes", "alice"),
        ("dave", "knows", "alice"),
        ("alice", "likes", "dave"),
    ]
    valid = [
        ("alice", "knows", "carol"),
        ("eve", "knows", "bob"),       # eve unseen in train
    ]
    test = [
        ("bob", "likes", "dave"),
        ("alice", "admires", "bob"),   # admires unseen in train
    ]
    for name, rows in (("train", train), ("valid", valid), ("test", test)):
        with open(folder / f"{name}.txt", "w") as f:
            for row in rows:
                f.write("\t".join(row) + "\n")
    return folder


def test_preprocess_default(raw_folder):
    info = preprocess_default(str(raw_folder))
    # ids dense and contiguous; train entities come first
    assert info["num_entities"] == 5  # alice bob carol dave eve
    assert info["num_relations"] == 3  # knows likes admires

    train = np.loadtxt(raw_folder / "train.del", dtype=int).reshape(-1, 3)
    assert len(train) == 5
    assert train.max() < 5

    # maps written with dense contiguous ids
    ids = {}
    for line in open(raw_folder / "entity_ids.del"):
        idx, name = line.strip().split("\t")
        ids[int(idx)] = name
    assert sorted(ids.keys()) == list(range(5))
    assert ids[0] == "alice"  # first seen in train

    # filtered splits exclude rows with unseen entities/relations
    vwu = np.loadtxt(raw_folder / "valid_without_unseen.del", dtype=int)
    assert vwu.reshape(-1, 3).shape[0] == 1  # eve row dropped
    twu = np.loadtxt(raw_folder / "test_without_unseen.del", dtype=int)
    assert twu.reshape(-1, 3).shape[0] == 1  # admires row dropped

    # train_sample sized like valid
    sample = np.loadtxt(raw_folder / "train_sample.del", dtype=int).reshape(-1, 3)
    assert len(sample) == 2

    # dataset.yaml complete and loadable by the framework
    with open(raw_folder / "dataset.yaml") as f:
        meta = yaml.safe_load(f)
    assert meta["dataset"]["num_entities"] == 5
    assert meta["dataset"]["files.train.size"] == 5

    from kge_tpu import Config, Dataset

    config = Config()
    config.set("console.quiet", True)
    config.set("dataset.name", "rawds")
    dataset = Dataset.create(config, folder=str(raw_folder))
    assert dataset.num_entities() == 5
    assert dataset.entity_strings(0) == "alice"


def test_preprocess_labeled(tmp_path):
    folder = tmp_path / "labeled"
    folder.mkdir()
    with open(folder / "train.txt", "w") as f:
        f.write("a\tr\tb\n" "b\tr\tc\n")
    for name in ("valid", "test"):
        with open(folder / f"{name}.txt", "w") as f:
            f.write("a\tr\tc\t1\n" "c\tr\ta\t-1\n")
    info = preprocess_default(str(folder), labeled=True)
    labels = np.loadtxt(folder / "valid_labels.del", dtype=int)
    assert labels.tolist() == [1, -1]


def test_trace_analysis(tmp_path):
    from kge_tpu.job.trace import Trace

    trace_file = tmp_path / "trace.yaml"
    with open(trace_file, "w") as f:
        f.write('{job: train, job_id: aaa, scope: epoch, epoch: 1, avg_loss: 1.0}\n')
        f.write('{job: train, job_id: aaa, scope: epoch, epoch: 2, avg_loss: 0.5}\n')
        f.write('{job: eval, job_id: bbb, parent_job_id: aaa, scope: epoch, epoch: 2, split: valid, mean_reciprocal_rank: 0.3}\n')
    trace = Trace(str(trace_file))
    assert len(trace.entries) == 3
    assert len(trace.filter({"job": "train"})) == 2
    df = trace.to_dataframe({"job": "train"})
    assert list(df["epoch"]) == [1, 2]
    entries = Trace.grep_training_trace_entries(str(trace_file), job_id="aaa")
    assert len(entries) == 3
