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


def build_job():
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
    dataset = Dataset.create(config, folder=str(folder))
    return TrainingJob.create(config, dataset)


def main():
    job = build_job()
    job._prepare()
    job._is_prepared = True

    # warmup epoch fraction: run a few batches to trigger compilation
    job.epoch = 1
    warm_batches = 0
    import jax
    import jax.numpy as jnp

    lr_vec = job._current_lrs()
    t0 = time.time()
    for batch in job._batches():
        device_batch = {
            k: jnp.asarray(v) for k, v in batch.items()
            if k != "true_size" and not isinstance(v, str)
        }
        key = jax.random.PRNGKey(warm_batches)
        job.model_params, job.opt_state, cost, aux = job._jitted_step(
            job.model_params, job.opt_state, device_batch, key, lr_vec
        )
        warm_batches += 1
        if warm_batches >= 3:
            break
    float(cost)  # sync
    compile_time = time.time() - t0

    # timed epoch (host batch prep + device step, full pipeline)
    job.epoch = 2
    t0 = time.time()
    trace = job.run_epoch()
    epoch_time = time.time() - t0
    triples_per_sec = trace["size"] / epoch_time

    sys.stderr.write(
        f"bench: {trace['size']} triples in {epoch_time:.2f}s "
        f"(prepare {trace['prepare_time']:.2f}s, forward+step "
        f"{trace['forward_time']:.2f}s, compile {compile_time:.1f}s, "
        f"avg_loss {trace['avg_loss']:.4f})\n"
    )
    print(json.dumps({
        "metric": "negsamp_triples_per_sec_per_chip",
        "value": round(triples_per_sec, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_sec / BASELINE_TRIPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
