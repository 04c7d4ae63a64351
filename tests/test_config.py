"""Config system tests: dotted access, typed set, type-hierarchy defaults,
imports, +++ extension keys, flatten, checkpoint naming."""

import os
import tempfile

import pytest
import yaml

from kge_tpu import Config


def test_get_dotted():
    config = Config()
    assert config.get("train.type") == "KvsAll"
    assert config.get("train.checkpoint.every") == 5
    with pytest.raises(KeyError):
        config.get("train.nonexistent")


def test_set_type_checking():
    config = Config()
    config.set("train.max_epochs", 7)
    assert config.get("train.max_epochs") == 7
    # string -> int coercion
    config.set("train.max_epochs", "9")
    assert config.get("train.max_epochs") == 9
    # int -> float coercion
    config.set("train.loss_arg", 2)
    assert config.get("train.loss_arg") == 2.0
    # incompatible type
    with pytest.raises(ValueError):
        config.set("train.max_epochs", [1, 2])
    # unknown key without create
    with pytest.raises(KeyError):
        config.set("train.not_a_key", 1)


def test_plusplusplus_extension():
    config = Config()
    # user group allows arbitrary keys via +++
    config.set("user.my_param", 0.5)
    assert config.get("user.my_param") == 0.5
    # optimizer args too
    config.set("train.optimizer.default.args.lr", 0.1)
    assert config.get("train.optimizer.default.args.lr") == 0.1
    # and +++ markers are stripped from get() results
    assert "+++" not in config.get("user")


def test_model_import_and_type_hierarchy_defaults():
    config = Config()
    config._import("complex")
    assert config.get("complex.class_name") == "ComplEx"
    # complex.entity_embedder.dim is not set explicitly -> falls back through
    # entity_embedder.type == lookup_embedder to lookup_embedder.dim
    assert config.get_default("complex.entity_embedder.dim") == 100
    assert config.get("complex.entity_embedder.space") == "complex"
    # override beats the hierarchy
    config.set("complex.entity_embedder.dim", 64, create=True)
    assert config.get_default("complex.entity_embedder.dim") == 64


def test_load_options_imports_model():
    config = Config()
    config.load_options({"model": "distmult"})
    assert config.get("model") == "distmult"
    assert config.get("distmult.class_name") == "DistMult"


def test_flatten_roundtrip():
    flat = Config.flatten({"a": {"b": 1, "c": {"d": 2}}, "e": 3})
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}


def test_checkpoint_file_names(tmp_path):
    config = Config(folder=str(tmp_path))
    assert config.checkpoint_file(5).endswith("checkpoint_00005.pt")
    assert config.checkpoint_file("best").endswith("checkpoint_best.pt")
    assert config.last_checkpoint_number() is None
    open(config.checkpoint_file(3), "w").close()
    open(config.checkpoint_file(11), "w").close()
    assert config.last_checkpoint_number() == 11
    # best wins over last
    assert Config.best_or_last_checkpoint_file(str(tmp_path)).endswith(
        "checkpoint_00011.pt"
    )
    open(config.checkpoint_file("best"), "w").close()
    assert Config.best_or_last_checkpoint_file(str(tmp_path)).endswith(
        "checkpoint_best.pt"
    )


def test_trace_and_log(tmp_path):
    config = Config(folder=str(tmp_path))
    config.set("console.quiet", True)
    entry = config.trace(job="train", epoch=1, metric=0.5)
    assert "timestamp" in entry and "entry_id" in entry
    with open(config.tracefile()) as f:
        line = f.readline()
    rec = yaml.safe_load(line)
    assert rec["job"] == "train" and rec["epoch"] == 1
    config.log("hello world", echo=False)
    with open(config.logfile()) as f:
        assert "hello world" in f.read()


def test_deprecated_key_migration():
    config = Config()
    config.set("console.quiet", True)
    config.load_options({"negative_sampling": {"num_negatives_s": 5}})
    assert config.get("negative_sampling.num_samples.s") == 5


def test_clone_and_save(tmp_path):
    config = Config(folder=str(tmp_path))
    config.set("train.max_epochs", 3)
    clone = config.clone("sub")
    assert clone.folder == os.path.join(str(tmp_path), "sub")
    assert clone.get("train.max_epochs") == 3
    clone.set("train.max_epochs", 4)
    assert config.get("train.max_epochs") == 3
    f = tmp_path / "saved.yaml"
    config.save(str(f))
    config2 = Config(load_default=False)
    config2.load(str(f), create=True)
    assert config2.get("train.max_epochs") == 3


def test_full_deprecation_rule_set():
    """Old LibKGE config keys from any published era must load unchanged
    (reference kge/config.py:693-904)."""
    from kge_tpu import Config

    c = Config()
    c.set("console.quiet", True)
    c.load_options({
        "model": "inverse_relations_model",
        "inverse_relations_model": {"base_model": {"type": "complex"}},
        "train": {
            "type": "spo", "loss": "ce", "auto_correct": True,
            "optimizer": "Adagrad", "optimizer_args": {"lr": 0.3},
        },
        "eval": {"data": "test", "chunk_size": 100,
                 "metrics_per_relation_type": True},
        "negative_sampling": {"num_negatives_o": 7, "filter_true_o": True,
                              "score_func_type": "sp_po"},
        "checkpoint": {"every": 10, "keep": 2},
        "lookup_embedder": {"regularize": "l2",
                            "regularize_args": {"weight": 0.1}},
    })
    assert c.get("model") == "reciprocal_relations_model"
    assert c.get("reciprocal_relations_model.base_model.type") == "complex"
    assert c.get("train.type") == "1vsAll"
    assert c.get("train.loss") == "kl"
    assert c.get("job.auto_correct") is True
    assert c.get("train.optimizer.default.type") == "Adagrad"
    assert c.get("train.optimizer.default.args.lr") == 0.3
    assert c.get("eval.split") == "test"
    assert c.get("entity_ranking.chunk_size") == 100
    assert c.get("entity_ranking.metrics_per.relation_type") is True
    assert c.get("negative_sampling.num_samples.o") == 7
    assert c.get("negative_sampling.filtering.o") is True
    assert c.get("negative_sampling.implementation") == "batch"
    assert c.get("train.checkpoint.every") == 10
    assert c.get("train.checkpoint.keep") == 2
    assert c.get("lookup_embedder.regularize") == "lp"
    assert float(c.get("lookup_embedder.regularize_args.p")) == 2.0
    assert c.get("lookup_embedder.regularize_weight") == 0.1
