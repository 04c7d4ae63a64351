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
    for k, v in options.items():
        config.set(k, v, create=True)
    return config


def get_test_dataset(config=None, preload=True) -> Dataset:
    if config is None:
        config = get_test_config()
    return Dataset.create(config, preload_data=preload, folder=str(DATASET_DIR))
