"""Measure TransE/RotatE NegSamp training throughput on the real chip.

Usage: python scripts/exp_transe.py [impl ...] [--model rotate] [--norm 1]
Runs the actual TrainingJob at the verdict target shape (d=128, batch
8192, 128 per-row negatives, margin loss) for each requested
negative_sampling.implementation and prints triples/s.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE_ROOT = os.environ.get("KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impls", nargs="*", default=["pool"])
    ap.add_argument("--model", default="transe")
    ap.add_argument("--norm", type=float, default=2.0)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--neg", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--scan", default="auto")
    ap.add_argument("--loss", default="margin_ranking")
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()
    if args.profile:
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_ROOT, "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import bench
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = bench.bench_dataset_folder()
    for impl in args.impls:
        config = Config(folder=None)
        config.set("console.quiet", True)
        config.load_options({"model": args.model})
        config.set("dataset.name", "bench_fb15k237")
        config.set("train.type", "negative_sampling")
        config.set("train.loss", args.loss)
        if args.loss == "margin_ranking":
            config.set("train.loss_arg", 4.0)
        config.set("negative_sampling.num_samples.s", args.neg)
        config.set("negative_sampling.implementation", impl)
        config.set("train.batch_size", args.batch)
        config.set("train.epoch_scan", args.scan)
        config.set("train.optimizer.default.type", "Adagrad")
        config.set("train.optimizer.default.args.lr", 0.1)
        config.set("valid.every", 0)
        config.set("lookup_embedder.dim", args.dim, create=True)
        if args.model == "transe":
            config.set("transe.l_norm", args.norm, create=True)
        elif args.model == "rotate":
            config.set("rotate.l_norm", args.norm, create=True)
        config.set("random_seed.default", 0)
        dataset = Dataset.create(config, folder=folder)
        job = TrainingJob.create(config, dataset)
        job._prepare()
        job._is_prepared = True
        t0 = time.time()
        job.run_epoch_group(args.epochs)
        warm = time.time() - t0
        t0 = time.time()
        traces = job.run_epoch_group(args.epochs)
        dt = time.time() - t0
        tps = traces[-1]["size"] * args.epochs / dt
        print(
            f"[{args.model} l{args.norm:g} {impl}] {tps/1e6:.3f}M triples/s "
            f"(warmup {warm:.0f}s, loss {traces[-1]['avg_loss']:.4f}, "
            f"scanned={traces[-1].get('scanned', False)})",
            flush=True,
        )
        if args.profile:
            import glob
            logdir = f"/tmp/transe_prof_{impl}"
            os.system(f"rm -rf {logdir}")
            import jax.numpy as jnp
            with jax.profiler.trace(logdir):
                job.run_epoch_group(1)
                # force a dependent fetch so device events land in the trace
                float(jnp.sum(
                    job.model_params["entity_embedder"]["embeddings"][0]
                ))
            from xprof.convert import raw_to_tool_data
            xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplane, "framework_op_stats", {}
            )
            import csv
            import io
            rows = list(csv.DictReader(io.StringIO(
                data.decode() if isinstance(data, bytes) else data
            )))
            print("host_or_device values:",
                  {r.get("host_or_device") for r in rows})
            rows = [r for r in rows if r.get("host_or_device") == "Device"]
            rows.sort(
                key=lambda r: -float(r.get("total_self_time_in_us", 0) or 0)
            )
            total = sum(
                float(r.get("total_self_time_in_us", 0) or 0) for r in rows
            )
            nsteps = -(-272115 // args.batch)
            print(f"device self time: {total/1e3:.1f} ms / epoch "
                  f"({nsteps} steps)")
            for r in rows[:20]:
                t = float(r.get("total_self_time_in_us", 0) or 0)
                print(
                    f"{t/1e3:8.2f} ms {100*t/total:5.1f}%  "
                    f"{r.get('op_type','?'):22s} "
                    f"{(r.get('op_name','?') or '?')[:86]}"
                )


if __name__ == "__main__":
    main()
