"""Wikidata5M-scale fused-update measurement: Adam (dense semantics, no
zero-gradient fixed points) on a 4.8M-entity table — the optimizer the
pure row-sparse path must reject. Compares the standard dense step
against the row-sparse step routed through fused_sorted_update
(train.sparse_embedding_update always vs never)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE_ROOT = os.environ.get("KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from profile_bigvocab import _write_synthetic_dataset, E, R, DIM, BATCH

TRAIN = 2_400_000


def run(mode, folder):
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "big_synth")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", BATCH)
    config.set("train.optimizer.default.type", "Adam")
    config.set("train.optimizer.default.args.lr", 1e-3, create=True)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", DIM, create=True)
    config.set("complex.relation_embedder.dim", DIM, create=True)
    config.set("train.sparse_embedding_update", mode)
    config.set("train.epoch_scan", "never")

    dataset = Dataset.create(config, folder=str(folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    if mode == "always":
        assert job._sparse_update, "fused sparse path did not engage"
    job.epoch = 1
    t0 = time.time()
    trace = job.run_epoch()
    print(f"[{mode}] epoch1 (compile): {time.time()-t0:.1f}s", flush=True)
    job.epoch = 2
    t0 = time.time()
    trace = job.run_epoch()
    dt = time.time() - t0
    print(
        f"[{mode}] steady: {TRAIN/dt/1e6:.2f}M triples/s "
        f"(avg_loss {trace['avg_loss']:.3f})",
        flush=True,
    )
    return TRAIN / dt


def main():
    t0 = time.time()
    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-fused-"), "big_synth"),
        num_entities=E, num_relations=R, num_train=TRAIN,
        num_valid=1024, num_test=1024,
    )
    print(f"dataset written in {time.time()-t0:.1f}s", flush=True)
    modes = sys.argv[1:] or ["never", "always"]
    rates = {m: run(m, folder) for m in modes}
    if len(rates) == 2:
        print(f"fused speedup: {rates['always']/rates['never']:.2f}x")


if __name__ == "__main__":
    main()
