"""Dump commands: export traces as CSV, checkpoints and configs as YAML
(reference kge/util/dump.py, simplified to the load-bearing surface)."""

from __future__ import annotations

import csv
import io
import os
import sys
from typing import Any, Dict, List, Optional

import yaml

from kge_tpu.config import Config


def add_dump_parsers(subparsers):
    parser = subparsers.add_parser(
        "dump", help="Dump objects to stdout"
    )
    dump_subparsers = parser.add_subparsers(title="dump_command", dest="dump_command")
    dump_subparsers.required = True

    trace_parser = dump_subparsers.add_parser(
        "trace", help="Dump trace entries as CSV"
    )
    trace_parser.add_argument("source", help="trace file or job folder")
    trace_parser.add_argument("--train", action="store_true",
                              help="include training epochs")
    trace_parser.add_argument("--valid", action="store_true",
                              help="include validation epochs")
    trace_parser.add_argument("--test", action="store_true",
                              help="include test evaluations")
    trace_parser.add_argument("--search", action="store_true",
                              help="include search trace entries")
    trace_parser.add_argument("--keysfile", type=str, default=None,
                              help="file with additional keys to include")
    trace_parser.add_argument("--keys", "-k", nargs="*", default=[],
                              help="additional trace keys to include")
    trace_parser.add_argument("--yaml", action="store_true",
                              help="dump raw yaml instead of CSV")

    checkpoint_parser = dump_subparsers.add_parser(
        "checkpoint", help="Dump a checkpoint overview as YAML"
    )
    checkpoint_parser.add_argument("source", help="checkpoint file or job folder")
    checkpoint_parser.add_argument("--keys", "-k", nargs="*", default=[])

    config_parser = dump_subparsers.add_parser(
        "config", help="Dump a configuration"
    )
    config_parser.add_argument("source", help="config file, folder, or checkpoint")
    config_parser.add_argument(
        "--minimal", action="store_true",
        help="only dump options that differ from the defaults",
    )
    config_parser.add_argument(
        "--raw", action="store_true", help="dump the stored file unmodified"
    )


def dump(args):
    if args.dump_command == "trace":
        _dump_trace(args)
    elif args.dump_command == "checkpoint":
        _dump_checkpoint(args)
    elif args.dump_command == "config":
        _dump_config(args)
    else:
        raise ValueError(f"unknown dump command {args.dump_command}")


def _resolve_trace_file(source: str) -> str:
    if os.path.isdir(source):
        return os.path.join(source, "trace.yaml")
    return source


def _read_trace(path: str) -> List[Dict[str, Any]]:
    entries = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(yaml.safe_load(line))
    return entries


_DEFAULT_TRACE_COLUMNS = [
    "job", "job_id", "type", "scope", "epoch", "split", "event",
    "avg_loss", "avg_cost", "epoch_time",
    "mean_reciprocal_rank_filtered", "mean_reciprocal_rank_filtered_with_test",
    "mean_reciprocal_rank", "hits_at_1_filtered", "hits_at_3_filtered",
    "hits_at_10_filtered", "mean_rank_filtered",
]


def _dump_trace(args):
    path = _resolve_trace_file(args.source)
    entries = _read_trace(path)

    # filter by entry kind; default (no flags): everything epoch-scoped
    any_filter = args.train or args.valid or args.test or args.search
    selected = []
    for e in entries:
        scope = e.get("scope")
        if scope not in ("epoch", None):
            continue
        job = e.get("job")
        if not any_filter:
            selected.append(e)
        elif args.train and job == "train" and e.get("event") == "epoch_completed":
            selected.append(e)
        elif args.valid and e.get("event") == "eval_completed" and \
                e.get("split") == "valid":
            selected.append(e)
        elif args.test and e.get("event") == "eval_completed" and \
                e.get("split") == "test":
            selected.append(e)
        elif args.search and job == "search":
            selected.append(e)

    if args.yaml:
        for e in selected:
            print(yaml.dump(e, default_flow_style=True, width=float("inf")).strip())
        return

    extra_keys = list(args.keys)
    if args.keysfile:
        with open(args.keysfile) as f:
            extra_keys += [line.strip() for line in f if line.strip()]
    columns = _DEFAULT_TRACE_COLUMNS + [
        k for k in extra_keys if k not in _DEFAULT_TRACE_COLUMNS
    ]
    used = [c for c in columns if any(c in e for e in selected)]
    writer = csv.writer(sys.stdout)
    writer.writerow(used)
    for e in selected:
        writer.writerow([e.get(c, "") for c in used])


def _dump_checkpoint(args):
    from kge_tpu.utils.io import load_checkpoint
    from kge_tpu.ops.optim import parameter_names

    source = args.source
    if os.path.isdir(source):
        source = Config.best_or_last_checkpoint_file(source)
    checkpoint = load_checkpoint(source)
    overview: Dict[str, Any] = {
        "file": source,
        "type": checkpoint.get("type"),
        "epoch": checkpoint.get("epoch"),
        "job_id": checkpoint.get("job_id"),
    }
    if "model" in checkpoint and checkpoint["model"] is not None:
        params = checkpoint["model"][0]
        names = parameter_names(params)
        import jax

        leaves = jax.tree_util.tree_leaves(params)
        overview["parameter_names"] = names
        overview["parameter_shapes"] = {
            n: list(l.shape) for n, l in zip(names, leaves)
        }
        overview["num_parameters"] = int(sum(l.size for l in leaves))
    if "valid_trace" in checkpoint and checkpoint["valid_trace"]:
        last = checkpoint["valid_trace"][-1]
        overview["last_valid_epoch"] = last.get("epoch")
        overview["last_valid_metrics"] = {
            k: v for k, v in last.items()
            if isinstance(v, float) and ("rank" in k or "hits" in k)
        }
    if "config" in checkpoint and checkpoint["config"] is not None:
        cfg = checkpoint["config"]
        overview["model"] = cfg.options.get("model")
        overview["dataset"] = cfg.options.get("dataset", {}).get("name")
    if args.keys:
        for k in args.keys:
            overview[k] = checkpoint.get(k)
    print(yaml.dump(overview, default_flow_style=False))


def _dump_config(args):
    source = args.source
    if os.path.isdir(source):
        source = os.path.join(source, "config.yaml")
    if source.endswith(".pt"):
        from kge_tpu.utils.io import load_checkpoint

        checkpoint = load_checkpoint(source)
        options = checkpoint["config"].options
    else:
        with open(source) as f:
            options = yaml.safe_load(f)
    if args.raw:
        print(yaml.dump(options, default_flow_style=False))
        return
    if args.minimal:
        default = Config().options
        flat_default = Config.flatten(default)
        flat = Config.flatten(options)
        minimal: Dict[str, Any] = {}
        for k, v in flat.items():
            if "+++" in k or v == "+++":
                continue
            if flat_default.get(k, "__missing__") != v:
                minimal[k] = v
        print(yaml.dump(minimal, default_flow_style=False))
        return
    # full: defaults overlaid with the stored options
    config = Config()
    config.load_options(options, create=True)
    print(yaml.dump(config.options, default_flow_style=False))
