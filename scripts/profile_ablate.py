"""Ablation of the bench config on the real chip: time run_epoch_group(5)
under config variations to locate the per-batch cost inside the scanned step."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_job(**over):
    from __graft_entry__ import _write_synthetic_dataset
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-abl-"), "abl_fb15k237"),
        num_entities=14541, num_relations=237, num_train=272115,
    )
    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "abl_fb15k237")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", 8192)
    config.set("train.optimizer.default.type", "Adagrad")
    config.set("train.optimizer.default.args.lr", 0.1)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", 512, create=True)
    config.set("complex.relation_embedder.dim", 512, create=True)
    config.set("random_seed.default", 0)
    for k, v in over.items():
        config.set(k, v, create=True)
    dataset = Dataset.create(config, folder=str(folder))
    return TrainingJob.create(config, dataset)


def timed(name, **over):
    import jax

    job = build_job(**over)
    job._prepare()
    job._is_prepared = True
    job.run_epoch_group(5)  # compile + warmup
    t0 = time.time()
    traces = job.run_epoch_group(5)
    dt = time.time() - t0
    nb = traces[-1]["batches"]
    per_batch = dt / (5 * nb) * 1e3
    tps = traces[-1]["size"] * 5 / dt
    print(f"{name:34s} {dt:6.3f}s  {per_batch:7.3f} ms/batch  {tps/1e6:6.2f}M t/s")
    del job


if __name__ == "__main__":
    variants = [
        ("baseline", {}),
        ("sgd", {"train.optimizer.default.type": "SGD"}),
        ("neg=16", {"negative_sampling.num_samples.s": 16}),
        ("dim=128", {"complex.entity_embedder.dim": 128,
                     "complex.relation_embedder.dim": 128}),
        ("batch=32768", {"train.batch_size": 32768}),
        ("shared_naive", {"negative_sampling.shared_type": "naive"}),
        ("not_shared", {"negative_sampling.shared": False}),
    ]
    only = sys.argv[1:]
    for name, over in variants:
        if only and name not in only:
            continue
        timed(name, **over)
