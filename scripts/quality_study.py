"""Cross-framework convergence study: train BOTH the reference (LibKGE,
torch CPU) and kge_tpu to convergence on the same learnable synthetic
knowledge graph with the same recipe, and compare filtered test MRR.

Rationale: the BASELINE quality gate asks for FB15k-237 MRR within 0.002
of LibKGE, but this environment has no network egress, so the published
datasets cannot be downloaded. This study is the closest achievable
evidence: a planted-factorization graph (a frozen random ComplEx
"teacher" generates plausible triples) gives a learnable ranking task on
which full 40-epoch trajectories — optimizer state, regularization, and
sampling distributions compounding — must land both frameworks at the
same quality. Single-step score/gradient parity is covered separately by
tests/test_parity_libkge.py.

Usage:  python scripts/quality_study.py [--epochs 40] [--dim 128]
                                        [--seeds 11 12 13]
Each (recipe, seed, epochs) result is appended to --results-json
(default <workdir>/quality_results.json) so runs can be split across
invocations; QUALITY.md is regenerated from the full accumulated set
every time (per-seed tables + mean/spread of the filtered-MRR diff).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

E, R = 500, 10
N_TRAIN, N_VALID, N_TEST = 30000, 1500, 1500
TEACHER_DIM = 8


def generate_dataset(folder, seed=0):
    """Plant a frozen random ComplEx teacher and sample its top-scoring
    completions: for random (s, p), o is drawn from the teacher's softmax
    over a random candidate subset. Yields a graph with learnable
    structure (filtered MRR well above random for a trained model)."""
    rng = np.random.default_rng(seed)
    d = TEACHER_DIM
    ent = rng.normal(size=(E, 2 * d)).astype(np.float32)
    rel = rng.normal(size=(R, 2 * d)).astype(np.float32)

    def scores(s_ids, p_ids, cand):  # [n, c]
        s_re, s_im = ent[s_ids, :d], ent[s_ids, d:]
        p_re, p_im = rel[p_ids, :d], rel[p_ids, d:]
        u = np.concatenate([s_re * p_re - s_im * p_im,
                            s_re * p_im + s_im * p_re], axis=1)
        return np.einsum("nd,ncd->nc", u, ent[cand])

    total = N_TRAIN + N_VALID + N_TEST
    step = 5000
    c = 256  # candidate subset per query
    chunks = []
    seen = set()
    while sum(len(ch) for ch in chunks) < total:
        s = rng.integers(0, E, step)
        p = rng.integers(0, R, step)
        cand = rng.integers(0, E, (step, c))
        sc = scores(s, p, cand) * 2.0
        sc -= sc.max(axis=1, keepdims=True)
        prob = np.exp(sc)
        prob /= prob.sum(axis=1, keepdims=True)
        pick = (prob.cumsum(axis=1) > rng.random((step, 1))).argmax(axis=1)
        drawn = np.stack([s, p, cand[np.arange(step), pick]], axis=1)
        fresh = [t for t in drawn.tolist() if tuple(t) not in seen]
        seen.update(map(tuple, fresh))
        chunks.append(np.asarray(fresh, dtype=np.int64))
    triples = np.concatenate(chunks)[:total]
    rng.shuffle(triples)
    # ensure every entity/relation appears in train
    triples[:E, 0] = np.arange(E)
    triples[:R, 1] = np.arange(R)
    train = triples[: N_TRAIN]
    valid = triples[N_TRAIN : N_TRAIN + N_VALID]
    test = triples[N_TRAIN + N_VALID : N_TRAIN + N_VALID + N_TEST]

    os.makedirs(folder, exist_ok=True)
    for name, arr in (("train", train), ("valid", valid), ("test", test)):
        np.savetxt(os.path.join(folder, f"{name}.del"), arr, fmt="%d",
                   delimiter="\t")
    with open(os.path.join(folder, "entity_ids.del"), "w") as f:
        for i in range(E):
            f.write(f"{i}\te{i}\n")
    with open(os.path.join(folder, "relation_ids.del"), "w") as f:
        for i in range(R):
            f.write(f"{i}\tr{i}\n")
    with open(os.path.join(folder, "dataset.yaml"), "w") as f:
        f.write(
            f"dataset:\n  name: {os.path.basename(folder)}\n"
            f"  num_entities: {E}\n  num_relations: {R}\n"
        )
    return folder


# Recipes mirror the BASELINE "Reference configs" row (scaled to the
# synthetic graph): the ComplEx 1vsAll+KL headline, TransE NegSamp with
# margin ranking, and RotatE with self-adversarial BCE.
RECIPES = {
    "complex-1vsAll-kl": {
        "model": "complex",
        "options": {
            "train.type": "1vsAll",
            "train.loss": "kl",
            "train.batch_size": 512,
            "train.optimizer.default.type": "Adagrad",
            "train.optimizer.default.args.lr": 0.2,
        },
    },
    "transe-negsamp-margin": {
        "model": "transe",
        "options": {
            "train.type": "negative_sampling",
            "train.loss": "margin_ranking",
            "train.loss_arg": 4.0,
            "train.batch_size": 512,
            "negative_sampling.num_samples.s": 32,
            # distance models have no sp_/_po matmul form; "batch"/"all"
            # make the reference materialize n x unique pairwise scores
            # (hours on CPU) — "triple" is the natural implementation for
            # them in both frameworks
            "negative_sampling.implementation": "triple",
            "train.optimizer.default.type": "Adagrad",
            "train.optimizer.default.args.lr": 0.1,
        },
    },
    "rotate-negsamp-selfadv": {
        "model": "rotate",
        "options": {
            "train.type": "negative_sampling",
            "train.loss": "bce_self_adversarial",
            "train.loss_arg": 0.0,
            "train.batch_size": 512,
            "negative_sampling.num_samples.s": 32,
            "negative_sampling.implementation": "triple",
            "train.optimizer.default.type": "Adam",
            "train.optimizer.default.args.lr": 0.001,
        },
    },
}

BASE_OPTIONS = {
    "valid.every": 0,
    "console.quiet": True,
}


def run_reference(folder, epochs, dim, workdir, recipe_name, seed=11):
    sys.path.insert(0, "/root/reference")
    from libkge_stub import install

    install()
    import torch
    from kge import Config as RefConfig, Dataset as RefDataset
    from kge.job import EvaluationJob as RefEvaluationJob, Job as RefJob

    recipe = RECIPES[recipe_name]
    torch.manual_seed(seed)
    config = RefConfig()
    config.set("console.quiet", True)
    config.set("job.device", "cpu")
    config._import(recipe["model"])
    config.set("model", recipe["model"])
    config.set("dataset.name", os.path.basename(folder))
    for k, v in {**BASE_OPTIONS, **recipe["options"]}.items():
        config.set(k, v)
    config.set("lookup_embedder.dim", dim)
    config.set("train.max_epochs", epochs)
    config.set("eval.split", "test")
    config.folder = os.path.join(workdir, f"ref_exp_{recipe_name}_s{seed}")
    config.init_folder()
    dataset = RefDataset.create(config, folder=folder)
    job = RefJob.create(config, dataset)
    t0 = time.time()
    job.run()
    train_time = time.time() - t0
    eval_job = RefEvaluationJob.create(
        config, dataset, model=job.model
    )
    trace = eval_job.run()
    return trace, train_time


def run_ours(folder, epochs, dim, workdir, recipe_name, seed=11):
    from kge_tpu import Config, Dataset
    from kge_tpu.job import EvaluationJob, TrainingJob

    recipe = RECIPES[recipe_name]
    config = Config()
    config.set("console.quiet", True)
    config.set("job.device", "cpu")
    config.load_options({"model": recipe["model"]})
    config.set("dataset.name", os.path.basename(folder))
    for k, v in {**BASE_OPTIONS, **recipe["options"]}.items():
        config.set(k, v)
    config.set("lookup_embedder.dim", dim)
    config.set("train.max_epochs", epochs)
    config.set("eval.split", "test")
    config.set("random_seed.default", seed)
    config.folder = os.path.join(workdir, f"our_exp_{recipe_name}_s{seed}")
    config.init_folder()
    from kge_tpu.utils.seed import apply_device_config, seed_from_config

    apply_device_config(config)
    seed_from_config(config)
    dataset = Dataset.create(config, folder=folder)
    job = TrainingJob.create(config, dataset)
    t0 = time.time()
    if not job._is_prepared:
        job._prepare()
        job._is_prepared = True
    traces = job.run_epoch_group(epochs)
    train_time = time.time() - t0
    eval_conf = config.clone()
    eval_conf.set("job.type", "eval")
    eval_job = EvaluationJob.create(eval_conf, dataset, model=job.model)
    eval_job.model_params = job.model_params
    eval_job.epoch = epochs
    trace = eval_job._evaluate()
    return trace, train_time, traces


def run_recipe(args, folder, recipe_name, seed):
    """One recipe+seed through both frameworks; returns a result dict."""
    our_trace, our_time, epoch_traces = run_ours(
        folder, args.epochs, args.dim, args.workdir, recipe_name, seed
    )
    print(
        f"[{recipe_name} s{seed}] ours: MRR_filt "
        f"{our_trace['mean_reciprocal_rank_filtered']:.4f} in {our_time:.0f}s",
        flush=True,
    )
    ref_trace, ref_time = run_reference(
        folder, args.epochs, args.dim, args.workdir, recipe_name, seed
    )
    print(
        f"[{recipe_name} s{seed}] reference: MRR_filt "
        f"{ref_trace['mean_reciprocal_rank_filtered']:.4f} in {ref_time:.0f}s",
        flush=True,
    )
    metric_keys = [
        "mean_reciprocal_rank_filtered", "mean_reciprocal_rank",
        "hits_at_1_filtered", "hits_at_3_filtered", "hits_at_10_filtered",
    ]
    return dict(
        name=recipe_name, seed=seed, epochs=args.epochs, dim=args.dim,
        our={k: float(our_trace[k]) for k in metric_keys},
        ref={k: float(ref_trace[k]) for k in metric_keys},
        our_time=our_time, ref_time=ref_time,
        last_loss=float(epoch_traces[-1]["avg_loss"]),
    )


def load_results(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return []


def save_result(path, result):
    results = load_results(path)
    results = [
        r for r in results
        if not (r["name"] == result["name"] and r["seed"] == result["seed"])
    ] + [result]
    with open(path + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(path + ".tmp", path)
    return results


def recipe_section(runs):
    """Section for one recipe over all its seeds: per-seed MRR rows with
    mean +/- spread, plus the full metric table of the first seed."""
    runs = sorted(runs, key=lambda r: r["seed"])
    keys = ["mean_reciprocal_rank_filtered", "mean_reciprocal_rank",
            "hits_at_1_filtered", "hits_at_3_filtered", "hits_at_10_filtered"]
    deltas = [
        abs(r["ref"]["mean_reciprocal_rank_filtered"]
            - r["our"]["mean_reciprocal_rank_filtered"])
        for r in runs
    ]
    seed_rows = "\n".join(
        f"| {r['seed']} | {r['ref']['mean_reciprocal_rank_filtered']:.4f} | "
        f"{r['our']['mean_reciprocal_rank_filtered']:.4f} | {d:.4f} |"
        for r, d in zip(runs, deltas)
    )
    ours = [r["our"]["mean_reciprocal_rank_filtered"] for r in runs]
    refs = [r["ref"]["mean_reciprocal_rank_filtered"] for r in runs]
    r0 = runs[0]
    metric_rows = "\n".join(
        f"| {k} | {r0['ref'][k]:.4f} | {r0['our'][k]:.4f} | "
        f"{abs(r0['ref'][k] - r0['our'][k]):.4f} |"
        for k in keys
    )
    recipe = RECIPES[r0["name"]]
    opts = ", ".join(f"{k.split('.')[-1]}={v}"
                     for k, v in recipe["options"].items())
    mean_delta = abs(float(np.mean(refs)) - float(np.mean(ours)))
    spread = (
        f"Per-framework seed spread (std): reference "
        f"{np.std(refs):.4f}, kge_tpu {np.std(ours):.4f}. "
        if len(runs) > 1 else ""
    )
    return f"""
## {r0['name']} ({r0['epochs']} epochs, {len(runs)} seed{'s' if len(runs) > 1 else ''})

Model `{recipe['model']}`; {opts}.

| seed | ref MRR_filt | kge_tpu MRR_filt | abs diff |
|---|---|---|---|
{seed_rows}

Mean filtered MRR: reference {np.mean(refs):.4f}, kge_tpu
{np.mean(ours):.4f}; **diff of means = {mean_delta:.4f}** (gate analogue:
0.002). {spread}Per-seed diffs: mean {np.mean(deltas):.4f}, max
{max(deltas):.4f}.

Full metrics for seed {r0['seed']}:

| metric (test) | LibKGE (torch CPU) | kge_tpu | abs diff |
|---|---|---|---|
{metric_rows}

Train time (seed {r0['seed']}): reference {r0['ref_time']:.0f}s vs kge_tpu
{r0['our_time']:.0f}s on the same CPU host. Last-epoch train loss (ours):
{r0['last_loss']:.4f}.
""", mean_delta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--workdir", default="/tmp/kge_quality")
    ap.add_argument(
        "--recipes", nargs="*", default=list(RECIPES.keys()),
        choices=list(RECIPES.keys()),
    )
    ap.add_argument("--seeds", nargs="*", type=int, default=[11])
    ap.add_argument("--results-json", default=None,
                    help="accumulated results file (default "
                         "<workdir>/quality_results.json)")
    ap.add_argument("--md-only", action="store_true",
                    help="regenerate QUALITY.md from accumulated results "
                         "without running anything")
    args = ap.parse_args()
    results_json = args.results_json or os.path.join(
        args.workdir, "quality_results.json"
    )

    os.makedirs(args.workdir, exist_ok=True)
    folder = os.path.join(args.workdir, "quality_synth")
    results = load_results(results_json)
    if not args.md_only:
        generate_dataset(folder)
        print("dataset generated", flush=True)
        for name in args.recipes:
            for seed in args.seeds:
                results = save_result(
                    results_json, run_recipe(args, folder, name, seed)
                )
    if not results:
        sys.exit(f"no accumulated results in {results_json}; run recipes first")

    by_recipe = {}
    for r in results:
        by_recipe.setdefault(r["name"], []).append(r)
    sections, deltas = zip(
        *(recipe_section(runs) for runs in by_recipe.values())
    )
    n_seeds = max(len(runs) for runs in by_recipe.values())

    with open(os.path.join(REPO, "QUALITY.md"), "w") as f:
        f.write(f"""# Quality reproduction study

**Goal.** BASELINE.json gates on "ComplEx-d512 on FB15k-237: filtered MRR
within 0.002 of LibKGE". This environment has **no network egress** (DNS
resolution fails), so FB15k-237/WN18RR cannot be downloaded. This study is
the closest achievable substitute: both frameworks train **to convergence**
on the same learnable synthetic knowledge graph with the same recipe, so
any systematic training-dynamics divergence (optimizer-state drift,
regularization, sampling) would surface as a quality gap. Single-step
score/gradient/metric parity against the actual reference is separately
enforced by `tests/test_parity_libkge.py` / `test_parity_jobs.py` (allclose
at 1e-5..1e-4, exact metric equality for ranking).

**Dataset.** Planted-factorization graph: a frozen random ComplEx teacher
(d={TEACHER_DIM}) scores candidate objects for random (s, p) queries; objects are
sampled from the teacher's softmax. {E} entities / {R} relations /
{N_TRAIN} train, {N_VALID} valid, {N_TEST} test triples. Reproduce with
`python scripts/quality_study.py` (same fixed seeds).

**Recipes (identical settings for both frameworks, d={args.dim},
epochs per section below, no early stopping; {n_seeds} training seeds per
recipe — the dataset is fixed, the model init / sampling / optimizer
trajectories vary).** Filtered entity ranking on test with each
framework's own eval pipeline — they agree to 1e-9 on shared weights
(`test_entity_ranking_parity`). Random-guess MRR on this graph is
~{(1/E)*np.log(E):.4f}.

Headline: **max |mean(ref) - mean(ours)| filtered-MRR diff over recipes =
{max(deltas):.4f}** (gate analogue: 0.002). Per-seed diffs and both
frameworks' own seed spreads are reported per recipe below, so a diff can
be judged against seed noise.
{''.join(sections)}""")
    print(
        f"QUALITY.md written (max diff of means {max(deltas):.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
