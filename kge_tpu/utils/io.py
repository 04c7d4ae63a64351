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


SHARDED_MARKER = "__kge_sharded_leaf__"


def _leaf_path_id(path) -> str:
    import jax

    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def _covers_all(index, shape) -> bool:
    return all(
        (sl.start in (None, 0))
        and (sl.stop is None or sl.stop >= dim)
        for sl, dim in zip(index, shape)
    )


def _split_distributed(tree, prefix: str, local_shards: Dict[str, list]):
    """Replace leaves that span non-addressable devices with markers,
    collecting this process's shards into ``local_shards`` (no gather)."""
    import jax

    def visit(path, leaf):
        if not isinstance(leaf, jax.Array):
            return leaf
        if leaf.is_fully_addressable:
            return np.asarray(leaf)
        first = leaf.addressable_shards[0]
        if _covers_all(first.index, leaf.shape):
            # replicated over hosts: any local copy is the whole array
            return np.asarray(first.data)
        path_id = prefix + _leaf_path_id(path)
        local_shards[path_id] = [
            (
                tuple((sl.start, sl.stop) for sl in shard.index),
                np.asarray(shard.data),
            )
            for shard in leaf.addressable_shards
        ]
        return {
            SHARDED_MARKER: True,
            "shape": tuple(leaf.shape),
            "dtype": str(leaf.dtype),
            "path": path_id,
        }

    return jax.tree_util.tree_map_with_path(visit, tree)


def shard_filename(filename: str, process: int) -> str:
    return f"{filename}.shard{process:05d}"


def save_checkpoint(checkpoint: Dict[str, Any], filename: str):
    """Atomically write a checkpoint.

    Multi-host: cross-host-sharded leaves are never gathered — every
    process writes its own shards to ``<filename>.shardNNNNN`` and the
    main file (written by process 0) holds markers plus all replicated
    state. This keeps per-host memory at the shard size (a full gather of
    a Wikidata5M-scale table plus optimizer state would be ~20 GB per
    host)."""
    from kge_tpu.parallel import distributed

    local_shards: Dict[str, list] = {}
    for key in ("model", "optimizer_state"):
        if key in checkpoint and checkpoint[key] is not None:
            if key == "model":
                params, meta = checkpoint[key]
                checkpoint[key] = (
                    _split_distributed(params, "model/", local_shards), meta
                )
            else:
                checkpoint[key] = _split_distributed(
                    checkpoint[key], "opt/", local_shards
                )
    if local_shards:
        shard_file = shard_filename(
            filename, distributed.process_index()
        )
        tmp = shard_file + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {
                    "process": distributed.process_index(),
                    "shards": local_shards,
                },
                f, protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, shard_file)
        import jax

        checkpoint["num_shard_files"] = jax.process_count()
        # order the side effects: no process may proceed (in particular
        # process 0 must not publish the main file, after which the caller
        # may delete the previous checkpoint + shards) until every
        # process's shard file is on disk
        distributed.barrier(f"save_checkpoint:{os.path.basename(filename)}")
    if not distributed.is_primary():
        return
    if local_shards:
        _wait_for_shard_files(filename, checkpoint["num_shard_files"])
    tmpfile = filename + ".tmp"
    with open(tmpfile, "wb") as f:
        pickle.dump(checkpoint, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmpfile, filename)


def _wait_for_shard_files(filename: str, num: int, timeout: float = 120.0):
    """Defense for non-POSIX shared filesystems: after the barrier, poll
    briefly until every shard file is visible before publishing the main
    checkpoint. Raises if shards never appear — an unloadable checkpoint
    must not replace a loadable one."""
    import time

    deadline = time.time() + timeout
    missing = [
        shard_filename(filename, p)
        for p in range(num)
        if not os.path.isfile(shard_filename(filename, p))
    ]
    while missing and time.time() < deadline:
        time.sleep(0.2)
        missing = [f for f in missing if not os.path.isfile(f)]
    if missing:
        raise RuntimeError(
            f"checkpoint shard files missing after {timeout:.0f}s: "
            f"{missing}; refusing to publish an unloadable checkpoint"
        )


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


def _reassemble_sharded(checkpoint: Dict, checkpoint_file: str):
    """Resolve sharded-leaf markers by streaming the per-process shard
    files written next to the checkpoint."""
    num = checkpoint.pop("num_shard_files", 0)
    if not num:
        return checkpoint
    assembled: Dict[str, np.ndarray] = {}
    markers: Dict[str, Dict] = {}

    def collect(leaf):
        if isinstance(leaf, dict) and leaf.get(SHARDED_MARKER):
            markers[leaf["path"]] = leaf
        return leaf

    import jax

    jax.tree_util.tree_map(
        collect, (checkpoint.get("model"), checkpoint.get("optimizer_state")),
        is_leaf=lambda x: isinstance(x, dict) and x.get(SHARDED_MARKER),
    )
    for path_id, marker in markers.items():
        assembled[path_id] = np.empty(
            marker["shape"], dtype=np.dtype(marker["dtype"])
        )
    for p in range(num):
        shard_file = shard_filename(checkpoint_file, p)
        if not os.path.isfile(shard_file):
            raise FileNotFoundError(
                f"missing checkpoint shard file {shard_file} "
                f"({num} expected; was the checkpoint copied without its "
                "shard files?)"
            )
        with open(shard_file, "rb") as f:
            payload = pickle.load(f)
        for path_id, shards in payload["shards"].items():
            target = assembled.get(path_id)
            if target is None:
                continue
            for index, data in shards:
                target[tuple(slice(a, b) for a, b in index)] = data

    def resolve(leaf):
        if isinstance(leaf, dict) and leaf.get(SHARDED_MARKER):
            return assembled[leaf["path"]]
        return leaf

    for key in ("model", "optimizer_state"):
        if checkpoint.get(key) is None:
            continue
        if key == "model":
            params, meta = checkpoint[key]
            checkpoint[key] = (
                jax.tree_util.tree_map(
                    resolve, params,
                    is_leaf=lambda x: isinstance(x, dict)
                    and x.get(SHARDED_MARKER),
                ),
                meta,
            )
        else:
            checkpoint[key] = jax.tree_util.tree_map(
                resolve, checkpoint[key],
                is_leaf=lambda x: isinstance(x, dict)
                and x.get(SHARDED_MARKER),
            )
    return checkpoint


def load_checkpoint(checkpoint_file: str, device: Optional[str] = None) -> Dict:
    """Load a checkpoint; adds its file/folder for downstream resume logic
    (reference kge/util/io.py:36-47). Sharded checkpoints (written by
    multi-host runs) are reassembled from their per-process shard files."""
    with open(checkpoint_file, "rb") as f:
        checkpoint = pickle.load(f)
    checkpoint = _reassemble_sharded(checkpoint, checkpoint_file)
    checkpoint["file"] = checkpoint_file
    folder = os.path.dirname(checkpoint_file)
    if "config" in checkpoint and folder:
        checkpoint["folder"] = folder
    return checkpoint
