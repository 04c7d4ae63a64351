"""Command-line interface.

Same UX as the reference (kge/cli.py): commands start/create/resume and the
meta-commands eval/valid/test (rewritten to resume with job.type=eval), plus
dump and package; every configuration key is exposed as a ``--key`` flag
(typed from the defaults, unknown keys re-parsed), with short options
-d/-j/-e/-m.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import traceback

import yaml

from kge_tpu import Config, Dataset
from kge_tpu.misc import kge_base_dir
from kge_tpu.utils.dump import add_dump_parsers, dump
from kge_tpu.utils.io import get_checkpoint_file, load_checkpoint
from kge_tpu.utils.package import add_package_parser, package_model
from kge_tpu.utils.seed import seed_from_config


def argparse_bool_type(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    elif v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def process_meta_command(args, meta_command, fixed_args):
    """Rewrite a meta command into its base command with fixed options."""
    if args.command == meta_command:
        for k, v in fixed_args.items():
            if k != "command" and vars(args).get(k) and vars(args)[k] != v:
                raise ValueError(
                    "invalid argument for '{}' command: --{} {}".format(
                        meta_command, k, v
                    )
                )
            vars(args)[k] = v


def create_parser(config, additional_args=[]):
    short_options = {
        "dataset.name": "-d",
        "job.type": "-j",
        "train.max_epochs": "-e",
        "model": "-m",
    }
    parser_conf = argparse.ArgumentParser(add_help=False)
    for key, value in Config.flatten(config.options).items():
        if key == "+++" or key.endswith(".+++"):
            continue
        short = short_options.get(key)
        argtype = type(value)
        if argtype == bool:
            argtype = argparse_bool_type
        elif value is None or argtype not in (int, float, str):
            argtype = str
        if short:
            parser_conf.add_argument("--" + key, short, type=argtype)
        else:
            parser_conf.add_argument("--" + key, type=argtype)
    for key in additional_args:
        parser_conf.add_argument(key)
    parser_conf.add_argument(
        "--abort-when-cache-outdated", action="store_const", const=True,
        default=False,
        help="Abort when an outdated cached dataset file is found instead of "
        "recomputing it",
    )

    parser = argparse.ArgumentParser("kge-tpu")
    subparsers = parser.add_subparsers(title="command", dest="command")
    subparsers.required = True

    parser_start = subparsers.add_parser(
        "start", help="Start a new job (create and run it)", parents=[parser_conf]
    )
    parser_create = subparsers.add_parser(
        "create", help="Create a new job (but do not run it)", parents=[parser_conf]
    )
    for p in [parser_start, parser_create]:
        p.add_argument("config", type=str, nargs="?")
        p.add_argument("--folder", "-f", type=str, help="Output folder to use")
        p.add_argument(
            "--run", default=p is parser_start, type=argparse_bool_type,
            help="Whether to immediately run the created job",
        )

    parser_resume = subparsers.add_parser(
        "resume", help="Resume a prior job", parents=[parser_conf]
    )
    parser_eval = subparsers.add_parser(
        "eval", help="Evaluate the result of a prior job", parents=[parser_conf]
    )
    parser_valid = subparsers.add_parser(
        "valid", help="Evaluate a prior job on validation data",
        parents=[parser_conf],
    )
    parser_test = subparsers.add_parser(
        "test", help="Evaluate a prior job on test data", parents=[parser_conf]
    )
    for p in [parser_resume, parser_eval, parser_valid, parser_test]:
        p.add_argument("config", type=str)
        p.add_argument(
            "--checkpoint", type=str, default="default",
            help="Which checkpoint to use: 'default', 'last', 'best', a "
            "number, or a file name",
        )
    add_dump_parsers(subparsers)
    add_package_parser(subparsers)
    return parser


def main():
    from kge_tpu.job import Job

    config = Config()
    parser = create_parser(config)
    args, unknown_args = parser.parse_known_args()
    if len(unknown_args) > 0:
        parser = create_parser(
            config, list(filter(lambda a: a.startswith("--"), unknown_args))
        )
        args = parser.parse_args()

    process_meta_command(args, "create", {"command": "start", "run": False})
    process_meta_command(args, "eval", {"command": "resume", "job.type": "eval"})
    process_meta_command(
        args, "test", {"command": "resume", "job.type": "eval", "eval.split": "test"}
    )
    process_meta_command(
        args, "valid",
        {"command": "resume", "job.type": "eval", "eval.split": "valid"},
    )

    if args.command == "dump":
        dump(args)
        exit()
    if args.command == "package":
        package_model(args.checkpoint, args.file)
        exit()

    if args.command == "start":
        if args.config is None:
            args.config = os.path.join(
                kge_base_dir(), "..", "examples", "toy-complex-train.yaml"
            )
            print(
                "WARNING: No configuration specified; using " + args.config,
                file=sys.stderr,
            )
        if not vars(args)["console.quiet"]:
            print("Loading configuration {}...".format(args.config))
        config.load(args.config)

    if args.command == "resume":
        if os.path.isdir(args.config) and os.path.isfile(
            os.path.join(args.config, "config.yaml")
        ):
            args.config = os.path.join(args.config, "config.yaml")
        if not vars(args)["console.quiet"]:
            print("Resuming from configuration {}...".format(args.config))
        config.load(args.config)
        config.folder = os.path.dirname(args.config)
        if not config.folder:
            config.folder = "."
        if not os.path.exists(config.folder):
            raise ValueError(
                "{} is not a valid config file for resuming".format(args.config)
            )

    # overwrite configuration with command-line arguments
    for key, value in vars(args).items():
        if key in ("command", "config", "run", "folder", "checkpoint",
                   "abort_when_cache_outdated"):
            continue
        if value is not None:
            if key == "search.device_pool":
                value = "".join(value).split(",")
            try:
                current = config.get(key)
                if isinstance(current, bool):
                    value = argparse_bool_type(value)
                elif isinstance(current, (list, dict)) and isinstance(value, str):
                    value = yaml.safe_load(value)
            except KeyError:
                pass
            # no create: a mistyped option name must fail loudly (keys under
            # +++ extension points are still accepted by Config.set)
            config.set(key, value)
            if key == "model":
                config._import(value)

    if args.command == "start":
        if args.folder is None:
            config_name = os.path.splitext(os.path.basename(args.config))[0]
            config.folder = os.path.join(
                os.getcwd(), "local", "experiments",
                datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
                + "-" + config_name,
            )
        else:
            config.folder = args.folder

    try:
        if args.command == "start" and not config.init_folder():
            raise ValueError(
                "output folder {} exists already".format(config.folder)
            )
        config.log("Using folder: {}".format(config.folder))

        checkpoint_file = None
        if hasattr(args, "checkpoint"):
            checkpoint_file = get_checkpoint_file(config, args.checkpoint)

        Dataset._abort_when_cache_outdated = args.abort_when_cache_outdated
        from kge_tpu.utils.seed import apply_device_config

        apply_device_config(config)
        # multi-host runtime must come up before anything touches the XLA
        # backend (including seeding)
        from kge_tpu.parallel import distributed

        distributed.maybe_initialize(config)
        seed_from_config(config)

        if args.command == "start" and not args.run:
            config.log("Job created successfully.")
        else:
            dataset = Dataset.create(config)
            if args.command == "resume":
                if checkpoint_file is not None:
                    checkpoint = load_checkpoint(checkpoint_file)
                    job = Job.create_from(
                        checkpoint, new_config=config, dataset=dataset
                    )
                else:
                    job = Job.create(config, dataset)
                    job.config.log(
                        "No checkpoint found or specified, starting from "
                        "scratch..."
                    )
            else:
                job = Job.create(config, dataset)
            config.log("Configuration:")
            config.log(yaml.dump(config.options, default_flow_style=False),
                       prefix="  ", echo=False)
            job.run()
    except BaseException:
        tb = traceback.format_exc()
        config.log(tb, echo=False)
        raise


if __name__ == "__main__":
    main()
