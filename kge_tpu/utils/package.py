"""Model packaging: strip training state from a checkpoint and embed the
entity/relation id maps, producing a standalone model file loadable with
``KgeModel.create_from`` (reference kge/util/package.py)."""

from __future__ import annotations

import os
from typing import Optional

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.utils.io import load_checkpoint, save_checkpoint


def package_model(input_checkpoint: str, output: Optional[str] = None) -> str:
    """Convert a train checkpoint into a packaged model file."""
    checkpoint = load_checkpoint(input_checkpoint)
    if checkpoint["type"] != "train":
        raise ValueError("can only package train checkpoints")
    if output is None:
        base, _ = os.path.splitext(input_checkpoint)
        output = base + "_package.pt"

    config = Config.create_from(checkpoint)
    dataset = Dataset.create_from(checkpoint, config, preload_data=False)

    packaged = {
        "type": "package",
        "model": checkpoint["model"],
        "valid_trace": checkpoint.get("valid_trace", []),
        "epoch": checkpoint.get("epoch"),
        "job_id": checkpoint.get("job_id"),
    }
    packaged = config.save_to(packaged)
    packaged = dataset.save_to(packaged, ["entity_ids", "relation_ids"])
    save_checkpoint(packaged, output)
    return output


def add_package_parser(subparsers):
    parser = subparsers.add_parser(
        "package", help="Create a packaged model from a checkpoint"
    )
    parser.add_argument("checkpoint", type=str, help="checkpoint file to package")
    parser.add_argument("--file", "-f", type=str, default=None,
                        help="output file name")
