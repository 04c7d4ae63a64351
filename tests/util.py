"""Shared helpers for tests."""

import os
import pathlib

from kge_tpu import Config, Dataset

TESTS_DIR = pathlib.Path(__file__).resolve().parent
DATASET_DIR = TESTS_DIR / "data" / "dataset_test"


def get_test_config(**options) -> Config:
    config = Config()
    config.set("console.quiet", True)
    config.set("job.device", "cpu")
    config.set("dataset.name", "dataset_test")
    config.set("random_seed.default", 0)
    # tests run on a single (virtual) device unless they opt into a mesh
    config.set("parallel.data", 1)
    config.set("parallel.model", 1)
    for k, v in options.items():
        config.set(k, v, create=True)
    return config


def get_test_dataset(config=None, preload=True) -> Dataset:
    if config is None:
        config = get_test_config()
    return Dataset.create(config, preload_data=preload, folder=str(DATASET_DIR))


def make_synthetic_dataset(folder, num_entities=64, num_relations=8,
                           num_train=512, num_valid=32, num_test=32, seed=0):
    """Write a random synthetic dataset in the .del format; every entity and
    relation is guaranteed to appear in train."""
    import numpy as np

    folder = pathlib.Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    def rand_triples(n):
        return np.stack(
            [rng.integers(0, num_entities, n),
             rng.integers(0, num_relations, n),
             rng.integers(0, num_entities, n)],
            axis=1,
        )

    train = rand_triples(num_train)
    # ensure coverage
    train[:num_entities, 0] = np.arange(num_entities)
    train[:num_relations, 1] = np.arange(num_relations)
    valid, test = rand_triples(num_valid), rand_triples(num_test)
    for name, arr in (("train", train), ("valid", valid), ("test", test)):
        np.savetxt(folder / f"{name}.del", arr, fmt="%d", delimiter="\t")
    with open(folder / "entity_ids.del", "w") as f:
        for i in range(num_entities):
            f.write(f"{i}\te{i}\n")
    with open(folder / "relation_ids.del", "w") as f:
        for i in range(num_relations):
            f.write(f"{i}\tr{i}\n")
    with open(folder / "dataset.yaml", "w") as f:
        f.write(
            "dataset:\n"
            f"  name: {folder.name}\n"
            f"  num_entities: {num_entities}\n"
            f"  num_relations: {num_relations}\n"
        )
    return folder
