"""Wikidata5M-scale single-chip smoke: 4.8M entities, ComplEx d=256,
shared negative sampling + chunked filtered eval on synthetic data."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

E, R = 4_800_000, 800
TRAIN = 4_800_000  # enough for a timing signal; real set is 21M


def _write_synthetic_dataset(folder, num_entities, num_relations, num_train,
                             num_valid, num_test, seed=0):
    """Fast writer for huge synthetic datasets (pandas to_csv)."""
    import pathlib

    import numpy as np
    import pandas as pd

    folder = pathlib.Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    def rand(n):
        arr = np.stack(
            [rng.integers(0, num_entities, n),
             rng.integers(0, num_relations, n),
             rng.integers(0, num_entities, n)], axis=1,
        ).astype(np.int64)
        return arr

    train = rand(num_train)
    train[:, 0] = np.arange(num_train) % num_entities  # cover all entities
    train[:num_relations, 1] = np.arange(num_relations)
    for name, arr in (("train", train), ("valid", rand(num_valid)),
                      ("test", rand(num_test))):
        pd.DataFrame(arr).to_csv(folder / f"{name}.del", sep="\t",
                                 header=False, index=False)
    ids = pd.DataFrame({0: np.arange(num_entities),
                        1: [f"e{i}" for i in range(num_entities)]})
    ids.to_csv(folder / "entity_ids.del", sep="\t", header=False, index=False)
    rds = pd.DataFrame({0: np.arange(num_relations),
                        1: [f"r{i}" for i in range(num_relations)]})
    rds.to_csv(folder / "relation_ids.del", sep="\t", header=False, index=False)
    with open(folder / "dataset.yaml", "w") as f:
        f.write(
            f"dataset:\n  name: {folder.name}\n"
            f"  num_entities: {num_entities}\n"
            f"  num_relations: {num_relations}\n"
        )
    return folder
DIM = 128
BATCH = 8192


def main():
    from kge_tpu import Config, Dataset
    from kge_tpu.job import EvaluationJob, TrainingJob

    t0 = time.time()
    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-big-"), "big_synth"),
        num_entities=E, num_relations=R, num_train=TRAIN,
        num_valid=2048, num_test=2048,
    )
    print(f"dataset written in {time.time()-t0:.1f}s", flush=True)

    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "big_synth")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", BATCH)
    config.set("train.optimizer.default.type", "Adagrad")
    config.set("train.optimizer.default.args.lr", 0.1)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", DIM, create=True)
    config.set("complex.relation_embedder.dim", DIM, create=True)
    config.set("eval.batch_size", 256)  # 64 -> 256: amortizes the per-batch table reads (~2.5x eval t/s)
    config.set("train.epoch_scan", os.environ.get("KGE_SCAN", "auto"))
    config.set("entity_ranking.chunk_size", 1_200_000)

    t0 = time.time()
    dataset = Dataset.create(config, folder=str(folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    print(f"prepared in {time.time()-t0:.1f}s "
          f"(table {E*DIM*2*4/1e9:.1f} GB + opt state)", flush=True)

    job.epoch = 1
    t0 = time.time()
    trace = job.run_epoch()
    print(f"epoch1 (compile): {time.time()-t0:.1f}s", flush=True)
    job.epoch = 2
    t0 = time.time()
    trace = job.run_epoch()
    dt = time.time() - t0
    print(f"train steady: {TRAIN/dt/1e6:.2f}M triples/s "
          f"(avg_loss {trace['avg_loss']:.3f})", flush=True)

    ev = EvaluationJob.create(config, dataset, job, job.model)
    ev.model_params = job.model_params
    ev.epoch = 2
    t0 = time.time()
    trace = ev._evaluate()
    dt = time.time() - t0
    print(f"eval (incl compile): {dt:.1f}s for {trace['size']} triples, "
          f"mrr_filt={trace['mean_reciprocal_rank_filtered']:.5f}", flush=True)
    ev.epoch = 3
    t0 = time.time()
    trace = ev._evaluate()
    dt = time.time() - t0
    print(f"eval steady: {trace['size']/dt:.1f} triples/s", flush=True)


if __name__ == "__main__":
    main()
