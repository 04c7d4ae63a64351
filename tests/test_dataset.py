"""Data layer tests: loading, maps, binary cache equality, KvsAll indexes."""

import glob
import os

import numpy as np
import pytest

from kge_tpu.dataset import Dataset
from kge_tpu.indexing import KvsAllIndex, where_in

from tests.util import DATASET_DIR, get_test_config, get_test_dataset


@pytest.fixture()
def clean_cache():
    def _clean():
        for f in glob.glob(str(DATASET_DIR / "*.kgecache")):
            os.remove(f)

    _clean()
    yield
    _clean()


def test_load_splits_and_maps(clean_cache):
    dataset = get_test_dataset()
    assert dataset.num_entities() == 7
    assert dataset.num_relations() == 3
    train = dataset.split("train")
    assert train.shape == (12, 3)
    assert train.dtype == np.int32
    assert dataset.split("valid").shape == (3, 3)
    assert dataset.split("test").shape == (3, 3)
    assert dataset.entity_ids(0) == "e0"
    assert dataset.relation_ids(2) == "r2"
    assert list(dataset.entity_ids(np.array([1, 3]))) == ["e1", "e3"]


def test_cache_roundtrip(clean_cache):
    d1 = get_test_dataset()
    d1.index("train_sp_to_o")
    # caches must now exist
    caches = glob.glob(str(DATASET_DIR / "*.kgecache"))
    assert any("triples-train" in c for c in caches)
    assert any("index-train_sp_to_o" in c for c in caches)
    # a fresh load from cache must be identical
    d2 = get_test_dataset()
    assert np.array_equal(d1.split("train"), d2.split("train"))
    i1, i2 = d1.index("train_sp_to_o"), d2.index("train_sp_to_o")
    assert np.array_equal(i1.keys(), i2.keys())
    assert np.array_equal(i1._values, i2._values)
    assert np.array_equal(i1._values_offset, i2._values_offset)


def test_kvsall_index_semantics():
    triples = np.array(
        [[0, 0, 1], [0, 0, 2], [1, 0, 2], [0, 1, 3], [2, 2, 0]], dtype=np.int32
    )
    idx = KvsAllIndex(triples, [0, 1], 2)
    assert sorted(idx.get(0, 0).tolist()) == [1, 2]
    assert idx.get(1, 0).tolist() == [2]
    assert idx.get(0, 1).tolist() == [3]
    assert idx.get(5, 5).tolist() == []
    assert len(idx) == 4  # unique (s,p) pairs

    rows, values = idx.get_all_coords(
        np.array([0, 1, 9]), np.array([0, 0, 9])
    )
    # query 0 -> {1,2}, query 1 -> {2}, query 2 -> {}
    assert rows.tolist() == [0, 0, 1]
    assert sorted(values[:2].tolist()) == [1, 2]
    assert values[2] == 2


def test_kvsall_index_po():
    dataset = get_test_dataset()
    idx = dataset.index("train_po_to_s")
    train = dataset.split("train")
    for p, o in {(int(t[1]), int(t[2])) for t in train}:
        expected = sorted(
            int(t[0]) for t in train if t[1] == p and t[2] == o
        )
        assert sorted(idx.get(p, o).tolist()) == expected


def test_where_in():
    x = np.array([3, 1, 4, 1, 5, 9, 2, 6])
    assert where_in(x, np.array([1, 9])).tolist() == [1, 3, 5]
    assert where_in(x, np.array([1, 9]), not_in=True).tolist() == [0, 2, 4, 6, 7]


def test_relation_types():
    dataset = get_test_dataset()
    rt = dataset.index("relation_types")
    all_relations = set()
    for s in rt.values():
        all_relations |= s
    assert all_relations == {0, 1, 2}


def test_frequency_percentiles():
    dataset = get_test_dataset()
    fp = dataset.index("frequency_percentiles")
    assert set(fp.keys()) == {"subject", "relation", "object"}
    for quartiles in fp.values():
        assert set(quartiles.keys()) == {"25%", "50%", "75%", "top"}


def test_shallow_copy_shares_data():
    dataset = get_test_dataset()
    copy = dataset.shallow_copy()
    assert copy.num_entities() == dataset.num_entities()
    assert copy.split("train") is dataset.split("train")


def test_from_dir_ingests_raw_splits(tmp_path):
    """dataset.from_dir preprocesses a raw train/valid/test.txt directory in
    place and (optionally) verifies the raw checksum first."""
    import hashlib

    from kge_tpu import Config, Dataset

    d = tmp_path / "rawset"
    d.mkdir()
    triples = [("a", "r1", "b"), ("b", "r1", "c"), ("c", "r2", "a"),
               ("a", "r2", "c"), ("b", "r2", "a")]
    (d / "train.txt").write_text(
        "".join(f"{s}\t{p}\t{o}\n" for s, p, o in triples)
    )
    (d / "valid.txt").write_text("a\tr1\tc\n")
    (d / "test.txt").write_text("c\tr1\tb\n")
    h = hashlib.sha256()
    for f in ("train.txt", "valid.txt", "test.txt"):
        h.update((d / f).read_bytes())

    config = Config()
    config.set("console.quiet", True)
    config.set("dataset.name", "rawset")
    config.set("dataset.from_dir", str(d))
    config.set("dataset.from_dir_checksum", h.hexdigest())
    dataset = Dataset.create(config)
    assert dataset.num_entities() == 3
    assert dataset.num_relations() == 2
    assert len(dataset.split("train")) == 5
    assert (d / "dataset.yaml").exists()

    # wrong checksum must fail before any use
    config2 = Config()
    config2.set("console.quiet", True)
    config2.set("dataset.name", "rawset")
    config2.set("dataset.from_dir", str(d))
    config2.set("dataset.from_dir_checksum", "0" * 64)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checksum"):
        Dataset.create(config2)

    # already-preprocessed folders load directly
    config3 = Config()
    config3.set("console.quiet", True)
    config3.set("dataset.name", "rawset")
    config3.set("dataset.from_dir", str(d))
    dataset3 = Dataset.create(config3)
    assert len(dataset3.split("test")) == 1


def test_from_dir_checksum_after_raw_removal(tmp_path):
    """A preprocessed from_dir with the raw splits deleted must keep
    loading even when a checksum is configured (it was verified at ingest
    time); a raw-less UN-preprocessed dir with a checksum must error."""
    import hashlib

    from kge_tpu import Config, Dataset

    d = tmp_path / "rawset2"
    d.mkdir()
    (d / "train.txt").write_text("a\tr1\tb\nb\tr1\tc\nc\tr1\ta\n")
    (d / "valid.txt").write_text("a\tr1\tc\n")
    (d / "test.txt").write_text("c\tr1\tb\n")
    h = hashlib.sha256()
    for f in ("train.txt", "valid.txt", "test.txt"):
        h.update((d / f).read_bytes())
    digest = h.hexdigest()

    config = Config()
    config.set("console.quiet", True)
    config.set("dataset.name", "rawset2")
    config.set("dataset.from_dir", str(d))
    config.set("dataset.from_dir_checksum", digest)
    Dataset.create(config)  # ingests + verifies

    for f in ("train.txt", "valid.txt", "test.txt"):
        (d / f).unlink()
    config2 = Config()
    config2.set("console.quiet", True)
    config2.set("dataset.name", "rawset2")
    config2.set("dataset.from_dir", str(d))
    config2.set("dataset.from_dir_checksum", digest)
    ds = Dataset.create(config2)
    assert len(ds.split("train")) == 3

    import pytest as _pytest

    empty = tmp_path / "nothing"
    empty.mkdir()
    config3 = Config()
    config3.set("console.quiet", True)
    config3.set("dataset.name", "nothing")
    config3.set("dataset.from_dir", str(empty))
    config3.set("dataset.from_dir_checksum", digest)
    with _pytest.raises(IOError, match="missing"):
        Dataset.create(config3)
