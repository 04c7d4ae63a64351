"""Native C++ host-side kernels: build, parse, membership, filtered resample."""

import numpy as np
import pytest

from kge_tpu import native
from kge_tpu.indexing import KvsAllIndex

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_parse_triples(tmp_path):
    rng = np.random.default_rng(0)
    triples = rng.integers(0, 1000, (5000, 3)).astype(np.int32)
    path = tmp_path / "train.del"
    np.savetxt(path, triples, fmt="%d", delimiter="\t")
    out = native.parse_triples(str(path))
    assert out.dtype == np.int32
    assert np.array_equal(out, triples)


def test_parse_triples_malformed(tmp_path):
    path = tmp_path / "bad.del"
    path.write_text("1\t2\t3\n4\tx\t6\n")
    with pytest.raises(ValueError):
        native.parse_triples(str(path))


def test_parse_matches_dataset_loader(tmp_path):
    from kge_tpu.dataset import Dataset

    rng = np.random.default_rng(1)
    triples = rng.integers(0, 50, (200, 3)).astype(np.int32)
    path = tmp_path / "t.del"
    np.savetxt(path, triples, fmt="%d", delimiter="\t")
    loaded = Dataset._load_triples_file(str(path))
    assert np.array_equal(loaded, triples)


def test_where_in():
    x = np.array([1, 5, 9, 5, 2, 7], dtype=np.int64)
    y = np.array([5, 2], dtype=np.int64)
    assert np.array_equal(native.where_in(x, y), np.array([1, 3, 4]))
    assert np.array_equal(native.where_in(x, y, not_in=True), np.array([0, 2, 5]))


@pytest.mark.parametrize("use_cdf", [False, True])
def test_filter_resample(use_cdf):
    rng = np.random.default_rng(2)
    vocab = 40
    triples = np.stack(
        [rng.integers(0, vocab, 300), rng.integers(0, 5, 300),
         rng.integers(0, vocab, 300)], axis=1,
    ).astype(np.int32)
    index = KvsAllIndex(triples, [0, 1], 2)  # sp -> o
    batch = triples[:64]
    rows_idx = index.lookup_rows(batch[:, 0], batch[:, 1])
    _, offsets, values = index.csr()

    samples = rng.integers(0, vocab, (64, 16)).astype(np.int64)
    cdf = None
    if use_cdf:
        counts = np.bincount(triples[:, 2], minlength=vocab) + 1.0
        cdf = np.cumsum(counts / counts.sum())
    replaced = native.filter_resample(
        samples, rows_idx, offsets, values, vocab, seed=7, cdf=cdf,
    )
    assert replaced is not None and replaced >= 0
    # no sample may be a known positive of its row
    for i in range(64):
        r = rows_idx[i]
        positives = values[offsets[r] : offsets[r + 1]] if r >= 0 else []
        assert not np.isin(samples[i], positives).any()
    assert samples.min() >= 0 and samples.max() < vocab


def test_sampler_uses_native_filtering():
    """End-to-end: the sampler's fast path must produce positive-free
    negatives (native or fallback)."""
    from tests.util import get_test_config, get_test_dataset
    from kge_tpu.ops.sampler import KgeSampler

    config = get_test_config()
    config.set("negative_sampling.num_samples.s", 6)
    config.set("negative_sampling.num_samples.o", 6)
    config.set("negative_sampling.filtering.s", True)
    config.set("negative_sampling.filtering.o", True)
    config.set("negative_sampling.filtering.implementation", "fast")
    dataset = get_test_dataset(config)
    sampler = KgeSampler.create(config, "negative_sampling", dataset)
    sampler.seed(0)
    triples = dataset.split("train").astype(np.int64)
    for slot in (0, 2):
        neg = sampler.sample(triples, slot)
        index = sampler._positives_index(slot)
        pair_cols = [[1, 2], [0, 2], [0, 1]][slot]
        for i in range(len(triples)):
            positives = index.get(
                int(triples[i, pair_cols[0]]), int(triples[i, pair_cols[1]])
            )
            assert not np.isin(neg.samples[i], positives).any()
