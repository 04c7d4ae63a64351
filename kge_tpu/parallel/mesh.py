"""Device mesh and sharding specifications.

The parallel strategy for this workload (SURVEY.md §5.7/§5.8): a 2-D logical
mesh ``(data, model)``. Batches are sharded over ``data``; the entity
embedding table is row-sharded over ``model`` so that full-vocabulary
scoring (1vsAll / KvsAll / eval) computes each device's score columns
locally and gathers/scatter-adds of embedding rows ride XLA collectives
over ICI. Relation tables and scorer parameters are replicated (they are
small). With a single device every spec degenerates to fully replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kge_tpu.config import Config


class DeviceCtx:
    """Holds the mesh and derives shardings for params/state/batches."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    @property
    def active(self) -> bool:
        return self.mesh is not None and self.mesh.size > 1

    @property
    def num_devices(self) -> int:
        return self.mesh.size if self.mesh is not None else 1

    @staticmethod
    def create(config: Config, devices=None, batch_divisor=None) -> "DeviceCtx":
        """Build the (data, model) mesh. With `parallel.data: -1` (auto) and a
        `batch_divisor` (the batch size), the data axis shrinks to the largest
        device count that divides the batch, so toy runs work out of the box."""
        from kge_tpu.parallel import distributed

        distributed.maybe_initialize(config)
        if devices is None:
            devices = jax.devices()
        data = config.get("parallel.data")
        model = config.get("parallel.model")
        n = len(devices)
        if model <= 0:
            model = 1
        if data <= 0:
            data = n // model
            if batch_divisor is not None:
                while data > 1 and batch_divisor % data != 0:
                    data -= 1
        if data * model > n:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, "
                f"have {n}"
            )
        if data * model == 1:
            return DeviceCtx(None)
        mesh_devices = np.array(devices[: data * model]).reshape(data, model)
        return DeviceCtx(Mesh(mesh_devices, ("data", "model")))

    # -- sharding specs --------------------------------------------------------

    def _ns(self, spec: P) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, spec)

    def param_spec(self, path_key: str, ndim: int) -> P:
        """PartitionSpec for a parameter leaf, by its pytree path string."""
        if "entity_embedder" in path_key and path_key.endswith("embeddings"):
            # row-shard the entity table over the model axis
            return P("model", *([None] * (ndim - 1)))
        return P()

    def tree_shardings(self, tree) -> Any:
        """Sharding tree for a param (or optimizer-state) pytree: leaves whose
        path contains the entity table follow its row sharding; everything
        else is replicated."""
        if self.mesh is None:
            return None

        def spec_for(path, leaf):
            key = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            if hasattr(leaf, "ndim"):
                return self._ns(self.param_spec(key, leaf.ndim))
            return self._ns(P())

        return jax.tree_util.tree_map_with_path(spec_for, tree)

    def batch_shardings(self, batch: Dict[str, Any]) -> Any:
        """Sharding for a host batch dict: per-example arrays shard over the
        data axis, broadcast/lookup tables replicate."""
        if self.mesh is None:
            return None
        specs = {}
        for k, v in batch.items():
            if (
                k.startswith("neg_unique")
                or k.startswith("neg_pool")
                or k.startswith("label_")
            ):
                specs[k] = self._ns(P())
            elif hasattr(v, "ndim") and v.ndim >= 1:
                specs[k] = self._ns(P("data", *([None] * (v.ndim - 1))))
            else:
                specs[k] = self._ns(P())
        return specs

    def replicated(self):
        if self.mesh is None:
            return None
        return self._ns(P())
