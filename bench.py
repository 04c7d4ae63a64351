"""Benchmark: the BASELINE.json workload set on one chip.

Measures, in priority order within a wall-clock budget:

1. ``negsamp_shared``  — ComplEx d=512, 128 shared negatives (headline;
   the reference's recommended fast configuration)
2. ``negsamp_perrow``  — 128 per-row negatives via the pooled sampler
   (exact per-row marginals; see negative_sampling.implementation "pool")
3. ``negsamp_perrow_exact`` — 128 per-row negatives, implementation "all"
   (fully independent rows, the reference's exact semantics; gather-free
   grouped score picks, ops/pick.py)
4. ``kvsall``          — full-vocabulary KvsAll queries/s
5. ``eval_filtered``   — filtered entity-ranking triples/s

All on a synthetic FB15k-237-shaped dataset (14541 entities / 237
relations / 272k train triples). Prints ONE JSON line with the headline
metric plus an ``extra`` dict holding the remaining workloads.
``vs_baseline`` is measured against 1e5 triples/s — a representative
LibKGE GPU figure (the reference publishes no throughput numbers;
BASELINE.md targets >=10x a GPU baseline).

Budget strategy (round-3 lesson: one cold whole-epoch-scan compile took
748s of a 540s budget and every later stage was skipped): the persistent
XLA compilation cache under $KGE_CACHE is the primary defense, and a
stamp file records WHICH full stages have compiled executables for the
CURRENT source tree. Stages whose full (scanned) variant is warm run
directly; cold stages first run a cheap-compiling "quick" variant
(per-batch dispatch, 1+1 epochs) so every workload lands a number, and
only upgrade to the full variant when the remaining budget could absorb a
cold whole-epoch compile. A SIGTERM/SIGINT handler prints the JSON line
with whatever has been measured. To pre-warm after hot-path changes:
``KGE_BENCH_BUDGET=100000 python bench.py`` (see scripts/warm_bench.sh).
"""

import glob
import hashlib
import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CACHE_ROOT = os.environ.get(
    "KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu")
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.makedirs(os.path.join(CACHE_ROOT, "jax"), exist_ok=True)

import numpy as np

BASELINE_TRIPLES_PER_SEC = 1.0e5

NUM_ENTITIES = 14541
NUM_RELATIONS = 237
NUM_TRAIN = 272115
NUM_VALID = 20000
DIM = 512
BATCH_SIZE = 8192
NUM_NEG = 128

DEADLINE = time.time() + float(os.environ.get("KGE_BENCH_BUDGET", "540"))
RESULTS = {}
NOTES = {}
STAMP_FILE = os.path.join(CACHE_ROOT, "bench_stamp.json")

# how long a COLD compile of each variant may take (measured v5e, with
# margin); a stage is attempted only when the remaining budget exceeds
# the allowance for the coldest thing it might compile
COLD_FULL_ALLOWANCE = 900   # whole-epoch scanned executables
COLD_QUICK_ALLOWANCE = 180  # per-batch step executables
WARM_ALLOWANCE = 75         # cache hit + dataset/index setup + timed epochs


def remaining():
    return DEADLINE - time.time()


def source_fingerprint() -> str:
    h = hashlib.sha256()
    files = sorted(
        glob.glob(os.path.join(REPO, "kge_tpu", "**", "*.py"), recursive=True)
    ) + [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__graft_entry__.py")]
    for f in files:
        try:
            with open(f, "rb") as fh:
                h.update(f.encode())
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()


def load_stamp(fp: str):
    try:
        with open(STAMP_FILE) as f:
            stamp = json.load(f)
        if stamp.get("fingerprint") == fp:
            return set(stamp.get("full_stages", []))
    except (OSError, ValueError):
        pass
    return set()


def save_stamp(fp: str, full_stages):
    try:
        with open(STAMP_FILE + ".tmp", "w") as f:
            json.dump(
                {"fingerprint": fp, "full_stages": sorted(full_stages)}, f
            )
        os.replace(STAMP_FILE + ".tmp", STAMP_FILE)
    except OSError:
        pass


def emit_and_exit(signum=None, frame=None):
    print(json.dumps(result_line()), flush=True)
    if signum is not None:
        sys.stderr.write(f"bench: signal {signum}, emitted partial results\n")
        os._exit(0)


def result_line():
    headline = RESULTS.get("negsamp_shared")
    extra = {
        k: round(v, 1) for k, v in RESULTS.items() if k != "negsamp_shared"
    }
    extra.update(NOTES)
    return {
        "metric": "negsamp_triples_per_sec_per_chip",
        "value": round(headline, 1) if headline else None,
        "unit": "triples/s",
        "vs_baseline": (
            round(headline / BASELINE_TRIPLES_PER_SEC, 3) if headline else None
        ),
        "extra": extra,
    }


def bench_dataset_folder():
    """Synthetic dataset persisted under the cache root so preprocessing
    and index caches survive across invocations."""
    from __graft_entry__ import _write_synthetic_dataset

    folder = os.path.join(CACHE_ROOT, "bench_data", "bench_fb15k237")
    if not os.path.isfile(os.path.join(folder, "dataset.yaml")):
        _write_synthetic_dataset(
            folder, num_entities=NUM_ENTITIES, num_relations=NUM_RELATIONS,
            num_train=NUM_TRAIN, num_valid=NUM_VALID, num_test=64,
        )
    return folder


def build_config(overrides=()):
    from kge_tpu import Config

    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "bench_fb15k237")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", NUM_NEG)
    config.set("train.batch_size", BATCH_SIZE)
    config.set("train.optimizer.default.type", "Adagrad")
    config.set("train.optimizer.default.args.lr", 0.1)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", DIM, create=True)
    config.set("complex.relation_embedder.dim", DIM, create=True)
    config.set("random_seed.default", 0)
    for key, value in overrides:
        config.set(key, value, create=True)
    return config


def build_job(overrides=()):
    from kge_tpu import Dataset
    from kge_tpu.job import TrainingJob

    folder = bench_dataset_folder()
    config = build_config(overrides)
    dataset = Dataset.create(config, folder=folder)
    return TrainingJob.create(config, dataset)


def timed_epoch_groups(job, epochs):
    """(warmup_seconds, triples_per_second, last_trace) over one warm + one
    timed group of the same size (the group executable is cached per
    size)."""
    t0 = time.time()
    job.run_epoch_group(epochs)
    warmup = time.time() - t0
    t0 = time.time()
    traces = job.run_epoch_group(epochs)
    dt = time.time() - t0
    return warmup, traces[-1]["size"] * epochs / dt, traces[-1]


def stage_negsamp(name, overrides, epochs=4, quick=False):
    if quick:
        overrides = tuple(overrides) + (("train.epoch_scan", "never"),)
        epochs = 1
    job = build_job(overrides)
    job._prepare()
    job._is_prepared = True
    warmup, tps, trace = timed_epoch_groups(job, epochs)
    RESULTS[name] = max(tps, RESULTS.get(name, 0.0))
    sys.stderr.write(
        f"bench[{name}{' quick' if quick else ''}]: {tps/1e6:.2f}M triples/s "
        f"(warmup {warmup:.0f}s, avg_loss {trace['avg_loss']:.4f}, "
        f"scanned={trace.get('scanned', False)})\n"
    )


def stage_kvsall(quick=False):
    overrides = [("train.type", "KvsAll"), ("train.batch_size", 512)]
    if quick:
        overrides.append(("train.epoch_scan", "never"))
    job = build_job(tuple(overrides))
    job._prepare()
    job._is_prepared = True
    warmup, qps, trace = timed_epoch_groups(job, 1 if quick else 2)
    RESULTS["kvsall_queries_per_sec"] = max(
        qps, RESULTS.get("kvsall_queries_per_sec", 0.0)
    )
    sys.stderr.write(
        f"bench[kvsall{' quick' if quick else ''}]: {qps/1e3:.0f}k queries/s "
        f"(warmup {warmup:.0f}s, avg_loss {trace['avg_loss']:.4f})\n"
    )


def stage_eval(quick=False):
    from kge_tpu import Dataset
    from kge_tpu.job import EvaluationJob
    from kge_tpu.models import KgeModel
    import jax

    folder = bench_dataset_folder()
    config = build_config((("eval.batch_size", 256),))
    config.set("job.type", "eval")
    config.set("eval.split", "valid")
    dataset = Dataset.create(config, folder=folder)
    model = KgeModel.create(config, dataset)
    job = EvaluationJob.create(config, dataset, model=model)
    job.model_params = model.init_params(jax.random.PRNGKey(0))
    job.epoch = 0
    t0 = time.time()
    job._evaluate()  # compile + first run
    warmup = time.time() - t0
    # an eval pass is ~0.1s; take the best of two to shake off host jitter
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        trace = job._evaluate()
        dt = min(dt, time.time() - t0)
    tps = NUM_VALID / dt
    RESULTS["eval_filtered_triples_per_sec"] = max(
        tps, RESULTS.get("eval_filtered_triples_per_sec", 0.0)
    )
    sys.stderr.write(
        f"bench[eval]: {tps/1e3:.1f}k triples/s (warmup {warmup:.0f}s, "
        f"mrr_filt {trace.get('mean_reciprocal_rank_filtered', -1):.4f})\n"
    )


# (key, result name, full runner, quick runner); priority order
STAGES = [
    (
        "negsamp_shared",
        "negsamp_shared",
        lambda quick=False: stage_negsamp(
            "negsamp_shared",
            (("negative_sampling.shared", True),
             ("negative_sampling.shared_type", "default")),
            quick=quick,
        ),
    ),
    (
        "negsamp_perrow",
        "negsamp_perrow_triples_per_sec",
        lambda quick=False: stage_negsamp(
            "negsamp_perrow_triples_per_sec",
            (("negative_sampling.implementation", "pool"),),
            quick=quick,
        ),
    ),
    (
        "negsamp_perrow_exact",
        "negsamp_perrow_exact_triples_per_sec",
        lambda quick=False: stage_negsamp(
            "negsamp_perrow_exact_triples_per_sec",
            (("negative_sampling.implementation", "all"),),
            epochs=3,
            quick=quick,
        ),
    ),
    ("kvsall", "kvsall_queries_per_sec", stage_kvsall),
    ("eval", "eval_filtered_triples_per_sec", stage_eval),
]


def main():
    signal.signal(signal.SIGTERM, emit_and_exit)
    signal.signal(signal.SIGINT, emit_and_exit)

    # the env vars above cover forked workers; config.update is the form
    # verified to engage the persistent cache on the axon platform
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_ROOT, "jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if jax.device_count() == 1:
        NOTES["multichip"] = (
            "unavailable (1 chip): >=80% 1->N scaling is unmeasurable here; "
            "multi-chip correctness is validated by the virtual-mesh dryrun "
            "(MULTICHIP json) and the two-process test suite"
        )

    fp = source_fingerprint()
    warm_stages = load_stamp(fp)
    if not warm_stages:
        sys.stderr.write(
            "bench: compile cache COLD for this source tree — quick "
            "variants first, full upgrades if budget allows\n"
        )
        NOTES["compile_cache"] = "cold"

    def attempt(key, fn, allowance, label, quick=False):
        if remaining() < allowance:
            sys.stderr.write(
                f"bench: skipping {key} {label} ({remaining():.0f}s left, "
                f"needs {allowance}s)\n"
            )
            return False
        try:
            fn(quick=quick)
            return True
        except Exception as e:  # a failed stage must not kill the line
            sys.stderr.write(f"bench: stage {key} {label} failed: {e!r}\n")
            return False

    # pass 1: warm full stages directly; cold stages via the quick variant
    for key, _result, fn in STAGES:
        if key in warm_stages:
            if not attempt(key, fn, WARM_ALLOWANCE, "full(warm)", quick=False):
                warm_stages.discard(key)
        elif key == "eval":
            # eval has a single modestly-compiling variant
            if attempt(key, lambda quick=False: stage_eval(), 150, "full"):
                warm_stages.add(key)
        else:
            attempt(key, fn, COLD_QUICK_ALLOWANCE, "quick", quick=True)

    # pass 2: upgrade cold stages to the full scanned variant while the
    # budget could absorb a cold whole-epoch compile
    for key, _result, fn in STAGES:
        if key in warm_stages or key == "eval":
            continue
        if attempt(key, fn, COLD_FULL_ALLOWANCE, "full(cold)", quick=False):
            warm_stages.add(key)

    save_stamp(fp, warm_stages)
    emit_and_exit()


if __name__ == "__main__":
    main()
