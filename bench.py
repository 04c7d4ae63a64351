"""Benchmark: the BASELINE.json workload set on one chip.

Measures, in priority order within a wall-clock budget:

1. ``negsamp_shared``  — ComplEx d=512, 128 shared negatives (headline;
   the reference's recommended fast configuration)
2. ``negsamp_perrow``  — 128 per-row negatives via the pooled sampler
   (exact per-row marginals; see negative_sampling.implementation "pool")
3. ``negsamp_perrow_exact`` — 128 per-row negatives, implementation "all"
   (fully independent rows, the reference's exact semantics; gather-free
   grouped score picks, ops/pick.py)
4. ``transe_margin``   — TransE-L1 d=128, margin ranking, 128 per-row
   negatives (the BASELINE distance-model workload)
5. ``rotate_selfadv``  — RotatE-L1 d=1024, self-adversarial BCE, Adam
   (fused pooled-distance kernel, ops/dist_pool.py)
6. ``kvsall``          — full-vocabulary KvsAll queries/s
7. ``eval_filtered``   — filtered entity-ranking triples/s

``extra.roofline`` reports each stage's achieved TFLOP/s and GB/s from
closed-form work models against v5e peaks, with the limiting resource
named (the units BASELINE's "speed-of-light" target is written in).

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


# ----------------------------------------------------------------- roofline
#
# Achieved FLOP/s and HBM bytes/s per stage from closed-form work models of
# the known shapes, against v5e peaks, with the limiting resource named.
# Public v5e numbers: 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The VPU figure is
# an estimate (8x128 lanes x ~0.94 GHz x 2 FLOP/lane/cycle) used for the
# elementwise-bound distance-model stages. Work models count the dominant
# terms only (score matmuls / distance chains fwd+bwd, embedding gathers +
# scatters, dense optimizer passes) — they rank headroom; they are not
# cycle-accurate.

V5E_MXU_BF16 = 197e12
V5E_VPU_EST = 2e12
V5E_HBM = 8.19e11

VP = -(-NUM_ENTITIES // 128) * 128  # padded vocab in grouped layouts


def _work_models():
    D2 = 2 * DIM          # ComplEx embedding vector length (f32 floats)
    B, K = BATCH_SIZE, NUM_NEG
    table = (NUM_ENTITIES + NUM_RELATIONS) * D2 * 4
    # per-step optimizer traffic: dense grad write+read, Adagrad state r+w,
    # params r+w over both tables
    opt = 6 * table
    gathers = 3 * D2 * 4          # s/p/o embedding rows per triple
    return {
        # ComplEx shared: embed-once, per slot one [B, D2] x [D2, K+2]
        # matmul fwd + 2 transposed matmuls bwd
        "negsamp_shared": dict(
            unit_flops=2 * 3 * 2 * D2 * (K + 2),
            unit_bytes=2 * gathers + opt / B,
            engine="mxu",
        ),
        # pool: same shape with K*pool_factor(=8) pool columns per slot
        "negsamp_perrow_triples_per_sec": dict(
            unit_flops=2 * 3 * 2 * D2 * (8 * K + 1),
            unit_bytes=2 * gathers + opt / B,
            engine="mxu",
        ),
        # exact per-row: full-vocab grouped matmuls + one-hot picks
        "negsamp_perrow_exact_triples_per_sec": dict(
            unit_flops=2 * (3 * 2 * D2 * VP + 2 * 2 * K * VP),
            unit_bytes=2 * gathers + opt / B + 2 * 3 * VP * D2 * 4 / B,
            engine="mxu",
        ),
        # KvsAll: per query one full-vocab matmul fwd + 2 bwd
        "kvsall_queries_per_sec": dict(
            unit_flops=3 * 2 * D2 * VP,
            unit_bytes=gathers + opt / 512 + 3 * VP * D2 * 4 / 512,
            engine="mxu",
        ),
        # filtered eval: both directions forward-only + rank reduction
        "eval_filtered_triples_per_sec": dict(
            unit_flops=2 * 2 * D2 * VP,
            unit_bytes=gathers + 2 * VP * D2 * 4 / 256 + 2 * VP * 4,
            engine="mxu",
        ),
        # TransE-L1 pooled (d=128): elementwise select+|diff| chain,
        # ~6 VPU ops/element fwd and ~12 bwd over 2 slots x K x d
        "transe_margin_triples_per_sec": dict(
            unit_flops=2 * K * 128 * 18,
            unit_bytes=2 * 3 * 128 * 4 + 6 * (NUM_ENTITIES + NUM_RELATIONS) * 128 * 4 / B,
            engine="vpu",
        ),
        # RotatE-L1 selfadv (d=1024): cmod kernel, ~30 VPU ops per
        # (slot, negative, complex dim) incl. F=8 select fwd+bwd
        "rotate_selfadv_triples_per_sec": dict(
            unit_flops=2 * K * 512 * 30,
            unit_bytes=2 * 3 * 1024 * 4 + 10 * (NUM_ENTITIES + NUM_RELATIONS) * 1024 * 4 / 4096,
            engine="vpu",
        ),
    }


def roofline():
    models = _work_models()
    out = {
        "note": (
            "closed-form work models (~10% accuracy): they rank headroom; "
            ">=100% means the stage sits at its engine's roofline within "
            "model error. eval additionally carries a fixed ~22 ms "
            "dispatch+fetch round trip per evaluation (axon tunnel)."
        )
    }
    for key, rate in RESULTS.items():
        m = models.get(key)
        if not m:
            continue
        flops = rate * m["unit_flops"]
        byps = rate * m["unit_bytes"]
        peak = V5E_MXU_BF16 if m["engine"] == "mxu" else V5E_VPU_EST
        pct_compute = 100.0 * flops / peak
        pct_hbm = 100.0 * byps / V5E_HBM
        bound = (m["engine"] if pct_compute >= pct_hbm else "hbm")
        out[key] = {
            "tflops": round(flops / 1e12, 2),
            "gbps": round(byps / 1e9, 1),
            "pct_of_peak": round(max(pct_compute, pct_hbm), 1),
            "bound": bound,
        }
    return out


def result_line():
    headline = RESULTS.get("negsamp_shared")
    extra = {
        k: round(v, 1) for k, v in RESULTS.items() if k != "negsamp_shared"
    }
    extra.update(NOTES)
    if RESULTS:
        extra["roofline"] = roofline()
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


def build_config(overrides=(), model="complex", dim=None):
    from kge_tpu import Config

    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": model})
    config.set("dataset.name", "bench_fb15k237")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", NUM_NEG)
    config.set("train.batch_size", BATCH_SIZE)
    config.set("train.optimizer.default.type", "Adagrad")
    config.set("train.optimizer.default.args.lr", 0.1)
    config.set("valid.every", 0)
    config.set("lookup_embedder.dim", DIM if dim is None else dim)
    config.set("random_seed.default", 0)
    for key, value in overrides:
        config.set(key, value, create=True)
    return config


def build_job(overrides=(), model="complex", dim=None):
    from kge_tpu import Dataset
    from kge_tpu.job import TrainingJob

    folder = bench_dataset_folder()
    config = build_config(overrides, model=model, dim=dim)
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


def stage_negsamp(name, overrides, epochs=4, quick=False, model="complex",
                  dim=None):
    if quick:
        overrides = tuple(overrides) + (("train.epoch_scan", "never"),)
        epochs = 1
    job = build_job(overrides, model=model, dim=dim)
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
    config = build_config((("eval.batch_size", 1024),))
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
    # an eval pass is ~0.07s with a ~22 ms fetch round trip; take the best
    # of four to shake off tunnel/host jitter
    dt = float("inf")
    for _ in range(4):
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
    (
        "transe_margin",
        "transe_margin_triples_per_sec",
        lambda quick=False: stage_negsamp(
            "transe_margin_triples_per_sec",
            (("train.loss", "margin_ranking"), ("train.loss_arg", 4.0),
             ("transe.l_norm", 1.0)),
            quick=quick, model="transe", dim=128,
        ),
    ),
    (
        "rotate_selfadv",
        "rotate_selfadv_triples_per_sec",
        lambda quick=False: stage_negsamp(
            "rotate_selfadv_triples_per_sec",
            (("train.loss", "bce_self_adversarial"),
             ("train.batch_size", 4096),
             ("train.optimizer.default.type", "Adam"),
             ("train.optimizer.default.args.lr", 0.001)),
            epochs=2, quick=quick, model="rotate", dim=1024,
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
