"""CLI surface tests: start/create/resume/test verbs, dotted-key overrides,
preset conflicts, and loud failure on mistyped keys (reference surface:
kge/cli.py:87-165)."""

import os
import subprocess
import sys

import pytest
import yaml

from tests.util import DATASET_DIR, TESTS_DIR

REPO_ROOT = str(TESTS_DIR.parent)


def run_cli(argv, cwd, check=True):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "kge_tpu"] + argv,
        cwd=str(cwd), env=env, capture_output=True, text=True, timeout=600,
    )
    if check and proc.returncode != 0:
        raise AssertionError(
            f"kge-tpu {' '.join(argv)} failed:\n{proc.stdout}\n{proc.stderr}"
        )
    return proc


def write_toy_config(path):
    options = {
        "job": {"device": "cpu"},
        "model": "complex",
        "dataset": {"name": str(DATASET_DIR)},
        "train": {"type": "KvsAll", "max_epochs": 1, "batch_size": 4},
        "lookup_embedder": {"dim": 8},
        "valid": {"every": 0},
        "console": {"quiet": True},
        "random_seed": {"default": 2},
    }
    with open(path, "w") as f:
        yaml.safe_dump(options, f)


def test_start_runs_and_writes_folder(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    folder = tmp_path / "exp"
    run_cli(
        ["start", str(conf), "--folder", str(folder),
         "--train.max_epochs=2", "-e", "2"],
        cwd=tmp_path,
    )
    assert (folder / "config.yaml").exists()
    assert (folder / "trace.yaml").exists()
    saved = yaml.safe_load(open(folder / "config.yaml"))
    assert saved["train"]["max_epochs"] == 2
    # checkpoints: init + last epoch
    assert (folder / "checkpoint_00000.pt").exists()
    assert (folder / "checkpoint_best.pt").exists() or (
        folder / "checkpoint_00002.pt"
    ).exists()


def test_create_does_not_run(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    folder = tmp_path / "exp-create"
    run_cli(["create", str(conf), "--folder", str(folder)], cwd=tmp_path)
    assert (folder / "config.yaml").exists()
    assert not (folder / "checkpoint_00000.pt").exists()


def test_resume_and_test_verb(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    folder = tmp_path / "exp-resume"
    run_cli(["start", str(conf), "--folder", str(folder)], cwd=tmp_path)
    # the test verb rewrites to resume + eval on the test split
    run_cli(["test", str(folder)], cwd=tmp_path)
    entries = [
        yaml.safe_load(line) for line in open(folder / "trace.yaml")
    ]
    eval_entries = [
        e for e in entries
        if e.get("job") == "eval" and e.get("scope") == "epoch"
    ]
    assert eval_entries, "test verb must produce an eval trace entry"
    assert eval_entries[-1]["split"] == "test"
    assert "mean_reciprocal_rank_filtered" in eval_entries[-1]


def test_preset_conflict_is_rejected(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    folder = tmp_path / "exp-conflict"
    run_cli(["start", str(conf), "--folder", str(folder)], cwd=tmp_path)
    proc = run_cli(
        ["test", str(folder), "--eval.split", "valid"],
        cwd=tmp_path, check=False,
    )
    assert proc.returncode != 0
    assert "conflict" in (proc.stdout + proc.stderr).lower()


def test_unknown_key_fails_loudly(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    proc = run_cli(
        ["start", str(conf), "--folder", str(tmp_path / "x"),
         "--train.not_a_real_key", "3"],
        cwd=tmp_path, check=False,
    )
    assert proc.returncode != 0


def test_missing_value_is_rejected(tmp_path):
    conf = tmp_path / "toy.yaml"
    write_toy_config(conf)
    proc = run_cli(
        ["start", str(conf), "--train.max_epochs"], cwd=tmp_path, check=False
    )
    assert proc.returncode != 0
