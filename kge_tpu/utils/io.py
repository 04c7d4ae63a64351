"""Checkpoint serialization.

Checkpoints are pickled dicts with the reference's schema (kge/job/
train.py:276-298): ``{type, epoch, valid_trace, model: (params, meta),
optimizer_state, lr_scheduler_state_dict, job_id, config, dataset{...}}``.
Device arrays are converted to numpy on save and restored lazily on load.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import numpy as np

from kge_tpu.config import Config


def _to_numpy(tree):
    from kge_tpu.parallel import distributed

    # under multi-host execution sharded leaves are gathered to every
    # process before conversion
    return distributed.fetch(tree)


def save_checkpoint(checkpoint: Dict[str, Any], filename: str):
    """Atomically write a checkpoint file (process 0 only when multi-host;
    all processes participate in gathering sharded arrays)."""
    from kge_tpu.parallel import distributed

    for key in ("model", "optimizer_state"):
        if key in checkpoint and checkpoint[key] is not None:
            if key == "model":
                params, meta = checkpoint[key]
                checkpoint[key] = (_to_numpy(params), meta)
            else:
                checkpoint[key] = _to_numpy(checkpoint[key])
    if not distributed.is_primary():
        return
    tmpfile = filename + ".tmp"
    with open(tmpfile, "wb") as f:
        pickle.dump(checkpoint, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmpfile, filename)


def get_checkpoint_file(config: Config, checkpoint_arg: str = "default") -> Optional[str]:
    """Resolve a CLI checkpoint argument ('default', 'last', 'best', a
    number, or a filename) to a path (reference kge/util/io.py:7-33)."""
    from kge_tpu.misc import is_number

    if checkpoint_arg == "default":
        if config.get("job.type") in ("eval", "valid", "test"):
            checkpoint_arg = "best"
        else:
            checkpoint_arg = "last"
    if checkpoint_arg == "last":
        cpt_epoch = config.last_checkpoint_number()
        if cpt_epoch is None:
            return None
        return config.checkpoint_file(cpt_epoch)
    elif checkpoint_arg == "best":
        f = config.checkpoint_file("best")
        if os.path.isfile(f):
            return f
        cpt_epoch = config.last_checkpoint_number()
        return config.checkpoint_file(cpt_epoch) if cpt_epoch is not None else None
    elif is_number(checkpoint_arg, int):
        return config.checkpoint_file(int(checkpoint_arg))
    else:
        return checkpoint_arg


def load_checkpoint(checkpoint_file: str, device: Optional[str] = None) -> Dict:
    """Load a checkpoint; adds its file/folder for downstream resume logic
    (reference kge/util/io.py:36-47)."""
    with open(checkpoint_file, "rb") as f:
        checkpoint = pickle.load(f)
    checkpoint["file"] = checkpoint_file
    folder = os.path.dirname(checkpoint_file)
    if "config" in checkpoint and folder:
        checkpoint["folder"] = folder
    return checkpoint
