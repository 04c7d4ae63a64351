"""Profile filtered entity-ranking eval + KvsAll training throughput on a
synthetic FB15k-237-shaped dataset (not part of the test suite)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from __graft_entry__ import _write_synthetic_dataset


def build(train_type="negative_sampling", dim=512, batch=8192):
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-prof-"), "prof_fb"),
        num_entities=14541, num_relations=237, num_train=272115,
        num_valid=17535, num_test=20466,
    )
    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "prof_fb")
    config.set("train.type", train_type)
    config.set("train.batch_size", batch)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", dim, create=True)
    config.set("complex.relation_embedder.dim", dim, create=True)
    config.set("eval.batch_size", 256)
    dataset = Dataset.create(config, folder=str(folder))
    job = TrainingJob.create(config, dataset)
    return job


def profile_eval():
    job = build()
    job._prepare()
    job._is_prepared = True
    ev = job.valid_job if job.valid_job is not None else None
    from kge_tpu.job.eval import EvaluationJob

    ev = EvaluationJob.create(job.config, job.dataset, job, job.model)
    ev.model_params = job.model_params
    ev.epoch = 1
    t0 = time.time()
    trace = ev._evaluate()
    t1 = time.time()
    n = trace["size"]
    print(f"eval first run (incl compile): {t1-t0:.2f}s for {n} triples")
    ev.epoch = 2
    t0 = time.time()
    trace = ev._evaluate()
    t1 = time.time()
    print(f"eval steady: {t1-t0:.2f}s = {n/(t1-t0):.1f} triples/s "
          f"(mrr_filt={trace['mean_reciprocal_rank_filtered']:.4f})")


def profile_kvsall():
    job = build(train_type="KvsAll", batch=1024)
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    t0 = time.time()
    trace = job.run_epoch()
    t1 = time.time()
    print(f"KvsAll epoch1 (incl compile): {t1-t0:.2f}s")
    job.epoch = 2
    t0 = time.time()
    trace = job.run_epoch()
    t1 = time.time()
    n = trace.get("size", job.num_examples)
    print(f"KvsAll steady: {t1-t0:.2f}s = {n/(t1-t0):.1f} examples/s "
          f"avg_loss={trace['avg_loss']:.3f} scanned={trace.get('scanned')}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "eval"
    if which == "eval":
        profile_eval()
    else:
        profile_kvsall()
