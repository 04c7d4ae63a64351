"""Multi-process (multi-host) runtime support.

The reference has no distributed backend (SURVEY.md §5.8); here SPMD
training spans hosts through ``jax.distributed``: every process runs the
same program over the global device mesh, host data is assembled into
global arrays with ``jax.make_array_from_process_local_data``, and
checkpoints/logs are written by process 0. Collectives are inserted by
GSPMD from the sharding annotations (kge_tpu/parallel/mesh.py).

Initialization is config-driven (``parallel.distributed.*``) with
environment fallbacks, so launchers can do either. On a TPU pod slice with
one process per host, ``jax.distributed.initialize()`` auto-detects all
parameters.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

_initialized = False


def maybe_initialize(config=None) -> bool:
    """Initialize the jax distributed runtime when configured.

    Returns True when running multi-process after the call. Safe to call
    repeatedly. Configuration keys (all optional; empty string = unset):

    - ``parallel.distributed.coordinator_address`` — "host:port" of process 0
    - ``parallel.distributed.num_processes``
    - ``parallel.distributed.process_id``
    - ``parallel.distributed.auto`` — call ``jax.distributed.initialize()``
      with no arguments (TPU pod auto-detection)
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    addr = None
    num_processes = None
    process_id = None
    auto = False
    if config is not None:
        addr = config.get("parallel.distributed.coordinator_address") or None
        num_processes = config.get("parallel.distributed.num_processes")
        process_id = config.get("parallel.distributed.process_id")
        auto = bool(config.get("parallel.distributed.auto"))
        if num_processes in ("", -1):
            num_processes = None
        if process_id in ("", -1):
            process_id = None
    if addr is None:
        addr = os.environ.get("KGE_COORDINATOR_ADDRESS")
        if addr:
            num_processes = int(os.environ["KGE_NUM_PROCESSES"])
            process_id = int(os.environ["KGE_PROCESS_ID"])

    # NOTE: no jax call may precede jax.distributed.initialize — even
    # jax.process_count() initializes the XLA backend
    if auto:
        jax.distributed.initialize()
    elif addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
    _initialized = True
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def make_global(mesh, spec, host_array) -> Any:
    """Assemble a global array from identical process-local host data.

    With a replicated ``spec`` every process passes the full array; with a
    sharded spec every process passes the full array as well — each process
    contributes the pieces its local devices own (the data is identical on
    all hosts in this framework's input pipeline, so any process can supply
    any shard).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    if mesh is None or not is_multiprocess():
        return jnp.asarray(host_array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(host_array)
    )


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used to order multi-host side effects, e.g. checkpoint publication:
    process 0 must not publish the main checkpoint file (or delete the
    previous one) until every process has written its shard file."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def fetch(tree) -> Any:
    """device_get that works for non-fully-addressable (multi-host) arrays:
    gathers every leaf to all processes first when needed."""
    if not is_multiprocess():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))
