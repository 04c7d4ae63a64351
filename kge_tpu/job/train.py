"""Abstract training job.

Epoch-driven trainer with the reference's control surface (kge/job/train.py):
best-checkpoint tracking, early stopping (patience + threshold), LR warmup,
periodic validation driving a metric-based LR scheduler, checkpoint
retention, NaN abort, and per-epoch timing traces.

TPU-first execution model: each strategy builds ONE jitted ``train_step``
(forward + penalties + backward + optimizer update + post-batch parameter
transforms, with donated state) over fixed-shape batches; batches are
prepared host-side as numpy and the final partial batch is padded + masked
rather than recompiled.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu import misc
from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.job import Job, TrainingOrEvaluationJob
from kge_tpu.models import Ctx, KgeModel
from kge_tpu.ops.losses import KgeLoss
from kge_tpu.ops.optim import KgeLRScheduler, KgeOptimizer
from kge_tpu.utils.io import load_checkpoint, save_checkpoint
from kge_tpu.utils.seed import seed_from_config

S, P, O = 0, 1, 2


class TrainingJob(TrainingOrEvaluationJob):
    """Abstract base job to train a single model with a fixed set of
    hyperparameters."""

    def __init__(self, config: Config, dataset: Dataset, parent_job: Job = None,
                 model: Optional[KgeModel] = None, forward_only: bool = False):
        super().__init__(config, dataset, parent_job)
        if model is None:
            self.model: KgeModel = KgeModel.create(config, dataset)
        else:
            self.model = model
        self.loss = KgeLoss.create(config)
        self.abort_on_nan: bool = config.get("train.abort_on_nan")
        self.batch_size: int = config.get("train.batch_size")
        self._subbatch_size: int = config.get("train.subbatch_size")
        self.device: str = config.get("job.device")
        self.train_split = config.get("train.split")
        self.forward_only = forward_only

        self.config.check("train.trace_level", ["batch", "epoch"])
        self.trace_batch: bool = self.config.get("train.trace_level") == "batch"
        self.epoch: int = 0
        self.is_forward_only = forward_only

        self.valid_trace: List[Dict[str, Any]] = []

        # parameters + mutable state (set in _prepare)
        self.model_params = getattr(self, "model_params", None)
        self.opt_state = None
        self.optimizer: Optional[KgeOptimizer] = None
        self.kge_lr_scheduler: Optional[KgeLRScheduler] = None
        self._lr_warmup = self.config.get("train.lr_warmup")

        self._rng_seed = seed_from_config(config)
        self._root_key = jax.random.PRNGKey(self._rng_seed)
        self._np_rng = np.random.default_rng(self._rng_seed ^ 0xA5A5)

        if not self.is_forward_only:
            self.valid_job = _make_valid_job(config, dataset, self)

        self._jitted_step: Optional[Callable] = None
        self._jitted_loss: Optional[Callable] = None

        if self.__class__ == TrainingJob:
            for f in Job.job_created_hooks:
                f(self)

    # -- factory ---------------------------------------------------------------

    @staticmethod
    def create(config: Config, dataset: Dataset, parent_job: Job = None,
               model: Optional[KgeModel] = None,
               forward_only: bool = False) -> "TrainingJob":
        """Factory by ``train.type`` -> ``<type>.class_name``."""
        train_type = config.get("train.type")
        class_name = config.get_default(train_type + ".class_name")
        return misc.init_from(
            class_name, config.get("modules"),
            config, dataset, parent_job, model=model, forward_only=forward_only,
        )

    # -- run loop (reference train.py:139-258) ---------------------------------

    def _run(self):
        """Start/resume the training job and run to completion."""
        if self.is_forward_only:
            raise Exception(
                f"{self.__class__.__name__} was initialized for forward "
                "only. You can only call run_epoch()"
            )

        # save the initialization for reproducibility (reference
        # train.py:146-147; retained under train.checkpoint.keep_init)
        if self.epoch == 0:
            self._save(self.config.checkpoint_file(0))

        self.config.log("Starting training...")
        checkpoint_every = self.config.get("train.checkpoint.every")
        checkpoint_keep = self.config.get("train.checkpoint.keep")
        metric_name = self.config.get("valid.metric")
        patience = self.config.get("valid.early_stopping.patience")

        while True:
            # checking for model improvement according to metric_name
            # and do early stopping and keep the best checkpoint
            if len(self.valid_trace) > 0 and (
                self.valid_trace[-1]["epoch"] == self.epoch
            ):
                best_index = _best_index(
                    [trace_entry[metric_name] for trace_entry in self.valid_trace],
                    self.config.get("valid.metric_max"),
                )
                if best_index == len(self.valid_trace) - 1:
                    self._save(self.config.checkpoint_file("best"))
                if patience > 0 and len(self.valid_trace) > patience and (
                    best_index < len(self.valid_trace) - patience
                ):
                    self.config.log(
                        "Stopping early ({} did not improve over best result "
                        "in the last {} validation runs).".format(
                            metric_name, patience
                        )
                    )
                    break
                threshold_epochs = self.config.get(
                    "valid.early_stopping.threshold.epochs"
                )
                if threshold_epochs > 0 and self.epoch >= threshold_epochs:
                    achieved = self.valid_trace[best_index][metric_name]
                    target = self.config.get(
                        "valid.early_stopping.threshold.metric_value"
                    )
                    if achieved < target:
                        self.config.log(
                            "Stopping early ({} did not achieve threshold "
                            "value {} after {} epochs".format(
                                metric_name, target, self.epoch
                            )
                        )
                        break

            # should we stop?
            if self.epoch >= self.config.get("train.max_epochs"):
                self.config.log("Maximum number of epochs reached.")
                break

            # update learning rate if warmup is used
            if self.epoch < self._lr_warmup:
                self._warmup_factor = (self.epoch + 1) / (self._lr_warmup + 1)
            else:
                self._warmup_factor = 1.0

            # start a new epoch
            self.epoch += 1
            self.config.log("Starting epoch {}...".format(self.epoch))
            trace_entry = self.run_epoch()
            self.config.log("Finished epoch {}.".format(self.epoch))

            # validate
            if (
                self.config.get("valid.every") > 0
                and (
                    self.epoch % self.config.get("valid.every") == 0
                    or (
                        self.config.get("valid.last")
                        and self.epoch == self.config.get("train.max_epochs")
                    )
                )
            ):
                self.valid_job.epoch = self.epoch
                self.valid_job.model_params = self.model_params
                trace_entry = self.valid_job.run()
                self.valid_trace.append(trace_entry)
                for f in self.post_valid_hooks:
                    f(self)

                # metric-based scheduler step
                if self.kge_lr_scheduler.metric_based:
                    self.kge_lr_scheduler.step(trace_entry[metric_name])
            if not self.kge_lr_scheduler.metric_based:
                self.kge_lr_scheduler.step()

            # create checkpoint and delete old one, if necessary
            self._save(self.config.checkpoint_file(self.epoch))
            if self.epoch > 1:
                delete_checkpoint_epoch = -1
                if checkpoint_every == 0:
                    delete_checkpoint_epoch = self.epoch - 1
                elif (self.epoch - 1) % checkpoint_every != 0:
                    delete_checkpoint_epoch = self.epoch - 1
                elif checkpoint_keep > 0:
                    delete_checkpoint_epoch = (
                        self.epoch - 1 - checkpoint_every * checkpoint_keep
                    )
                if delete_checkpoint_epoch >= 0:
                    if delete_checkpoint_epoch != 0 or not self.config.get(
                        "train.checkpoint.keep_init"
                    ):
                        self._delete_checkpoint(delete_checkpoint_epoch)

        self.trace(event="train_completed", epoch=self.epoch)
        return self.valid_trace[-1] if self.valid_trace else None

    # -- preparation -----------------------------------------------------------

    def _prepare(self):
        """Prepare data, parameters, optimizer, and the jitted step."""
        super()._prepare()

        from kge_tpu.parallel.mesh import DeviceCtx

        self.device_ctx = DeviceCtx.create(
            self.config, batch_divisor=self.batch_size
        )
        # after the mesh: prepare_job hands models the device context
        # (e.g. the ring-scoring mesh)
        self.model.prepare_job(self)

        # pallas embedding-gather gradient (single-device TPU only: pallas
        # calls do not auto-partition over a mesh)
        from kge_tpu.ops import pallas_ops

        self._pallas_gather_mode = self.config.check(
            "train.pallas_gather", ["auto", "never", "always"]
        )

        # initialize parameters unless restored from a checkpoint
        if self.model_params is None:
            key, self._root_key = _split_key(self._root_key)
            self.model_params = self.model.init_params(key)
        self.model_params = jax.tree_util.tree_map(
            jnp.asarray, self.model_params
        )
        if self.device_ctx.active:
            self._check_shardable()
            self.model_params = jax.device_put(
                self.model_params, self.device_ctx.tree_shardings(self.model_params)
            )

        if not self.is_forward_only:
            self.optimizer = KgeOptimizer.create(self.config, self.model_params)
            if self.opt_state is None:
                self.opt_state = self.optimizer.init(self.model_params)
            if self.device_ctx.active:
                self.opt_state = jax.device_put(
                    self.opt_state, self.device_ctx.tree_shardings(self.opt_state)
                )
            self.kge_lr_scheduler = KgeLRScheduler(self.config)
            self._warmup_factor = 1.0
        self.post_valid_hooks: List[Callable[[Job], Any]] = getattr(
            self, "post_valid_hooks", []
        )

        # pallas embedding-gather gradient. Measured on v5e (shared-negative
        # ComplEx d=512, FB15k-237 shapes): the XLA gather/scatter path
        # beats the pallas sorted scatter-add by ~3.5% end-to-end (2.29M vs
        # 2.21M triples/s) at moderate table sizes, and at large tables the
        # kernel's dense per-call-site backward cotangents dominate — so
        # "auto" resolves to XLA; "always" keeps the kernel available
        # (single device only: pallas calls do not partition over a mesh).
        from kge_tpu.ops import pallas_ops

        use_pallas = self._pallas_gather_mode == "always"
        pallas_ops.set_gather_mode("pallas" if use_pallas else "xla")

        # edge partitioning over the data axis (scanned epochs): every data
        # shard owns a contiguous 1/D of the triples and shuffles within it
        mode = self.config.check(
            "parallel.partition_edges", ["auto", "always", "never"]
        )
        from kge_tpu.parallel import distributed

        self._partition_edges = (
            self.device_ctx.active
            and self.device_ctx.mesh.shape["data"] > 1
            and (
                mode == "always"
                or (mode == "auto" and distributed.is_multiprocess())
            )
        )

        self._prepare_data()
        self._build_step_fn()

    def _prepare_data(self):
        """Subclasses: materialize examples for epoch iteration."""
        raise NotImplementedError

    def _build_step_fn(self):
        """Build self._jitted_step / self._jitted_loss from the subclass's
        ``_loss_for_batch(params, batch, rng)`` (returns (loss_value, aux))."""
        self._jitted_step, self._jitted_loss = self._make_step_fns(
            self._loss_for_batch
        )

    def _get_step_fn(self, variant):
        return self._jitted_step

    def _get_loss_fn(self, variant):
        return self._jitted_loss

    def _step_variant(self, batch) -> Optional[str]:
        """A hashable tag selecting which compiled step handles this batch."""
        return None

    def _make_step_fns(self, loss_for_batch):
        if self._subbatch_size > 0:
            loss_for_batch = self._subbatched(loss_for_batch)

        def loss_fn(params, batch, rng):
            loss_value, aux = loss_for_batch(params, batch, rng)
            # penalties (computed once per batch, reference train.py:417-435)
            penalty_batch = {
                k: batch[k] for k in ("triples", "mask") if k in batch
            }
            penalties = self.model.penalty(
                params, batch=penalty_batch, epoch=self.epoch,
            )
            penalty_value = 0.0
            penalty_values = {}
            for name, value in penalties:
                penalty_value = penalty_value + value
                penalty_values[name] = value
            cost = loss_value + penalty_value
            aux = dict(aux)
            aux["avg_loss"] = loss_value
            aux["penalties"] = penalty_values
            return cost, aux

        def train_step(params, opt_state, batch, rng, lr):
            (cost, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            new_params, new_opt_state = self.optimizer.update(
                grads, opt_state, params, lr
            )
            # merge collected batch-norm stats (stored under aux["stats"])
            stats = aux.pop("stats", None)
            if stats:
                scorer = dict(new_params.get("scorer", {}))
                scorer.update(stats)
                new_params = {**new_params, "scorer": scorer}
            new_params = self.model.postprocess_params(new_params)
            return new_params, new_opt_state, cost, aux

        def forward_step(params, batch, rng):
            cost, aux = loss_fn(params, batch, rng)
            return cost, aux

        donate = (0, 1) if not self.is_forward_only else ()
        self._raw_step = train_step
        return jax.jit(train_step, donate_argnums=donate), jax.jit(forward_step)

    def _loss_for_batch(self, params, batch: Dict[str, jnp.ndarray], rng):
        """Strategy-specific loss: returns (summed-and-averaged loss, aux)."""
        raise NotImplementedError

    def _subbatched(self, loss_for_batch):
        """Wrap a batch loss into a sequential scan over subbatches (gradient
        accumulation, reference train.py:595-610): caps live activation
        memory at the subbatch size while keeping identical gradients — each
        subbatch loss is normalized by the FULL batch size, so the summed
        loss (and its gradient) matches the unsubbatched computation."""
        sub = self._subbatch_size

        def subbatched_loss(params, batch, rng):
            bs = batch["mask"].shape[0]
            if bs % sub != 0:
                raise ValueError(
                    f"train.batch_size={bs} must be divisible by "
                    f"train.subbatch_size={sub}"
                )
            n_sub = bs // sub
            denom = jnp.sum(batch["mask"])
            per_example = {
                k: v.reshape((n_sub, sub) + v.shape[1:])
                for k, v in batch.items()
                if hasattr(v, "shape") and v.shape and v.shape[0] == bs
            }
            shared = {
                k: v for k, v in batch.items() if k not in per_example
            }

            # rematerialize each subbatch: without jax.checkpoint the scan's
            # backward keeps every subbatch's forward residuals alive at
            # once — the full-batch activation footprint the subbatching
            # exists to avoid
            @jax.checkpoint
            def subbatch_loss(params, subbatch, key):
                return loss_for_batch(params, subbatch, key)

            def body(carry, xs):
                subbatch, key, offset = xs
                subbatch = dict(subbatch)
                subbatch.update(shared)
                subbatch["__denom__"] = denom
                # lets coordinate-based labels (KvsAll) localize row indexes
                subbatch["__row_offset__"] = offset
                loss_value, aux = subbatch_loss(params, subbatch, key)
                scalars = {"avg_loss": aux.get("avg_loss", loss_value)}
                return carry, (loss_value, scalars)

            keys = jax.random.split(rng, n_sub)
            offsets = jnp.arange(n_sub) * sub
            _, (losses, scalar_list) = jax.lax.scan(
                body, None, (per_example, keys, offsets)
            )
            total = jnp.sum(losses)
            return total, {"avg_loss": total}

        return subbatched_loss

    # -- scan-based epoch (one compiled call per epoch) ------------------------

    def _scan_data(self) -> Optional[Dict[str, np.ndarray]]:
        """Stacked per-batch arrays [num_batches, ...] for the scanned epoch,
        or None when this strategy/configuration can't scan (host-side work
        per batch). Subclasses override."""
        return None

    def _epoch_scan_enabled(self) -> bool:
        mode = self.config.get("train.epoch_scan")
        if mode == "never" or self.is_forward_only:
            return False
        blocked = (
            self.trace_batch
            or self.pre_batch_hooks
            or self.post_batch_hooks
        )
        if mode == "always":
            if blocked:
                raise ValueError(
                    "train.epoch_scan=always conflicts with batch-level "
                    "tracing or batch hooks"
                )
            return True
        return not blocked

    def _run_epoch_scanned(self, data: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Run the whole epoch as one jitted lax.scan over batches: zero
        per-step dispatch and host work (the TPU-native hot path).

        The training triples live on the device across epochs; shuffling and
        batching happen inside the compiled epoch (a permutation plus
        gathers), so the only per-epoch transfers are the rng key in and the
        per-batch loss scalars out.
        """
        ys, meta = self._dispatch_epoch_scanned(data)
        return self._finalize_epoch_scanned(jax.device_get(ys), meta)

    def run_epoch_group(self, num_epochs: int) -> List[Dict[str, Any]]:
        """Run ``num_epochs`` consecutive epochs with ONE deferred device
        fetch for the whole group (scanned path): epochs chain on device
        through donated state, so per-epoch host round-trips — expensive over
        remote device links — are paid once per group. Increments
        ``self.epoch`` per epoch (unlike ``run_epoch``). Steps a non-metric
        LR scheduler between epochs. Falls back to sequential ``run_epoch``
        when the scanned path is unavailable."""
        if not self._is_prepared:
            self._prepare()
            self._is_prepared = True
        base_traces = []
        data = self._scan_data() if (
            num_epochs > 1 and self._epoch_scan_enabled()
        ) else None
        if data is not None and "triples_flat" not in data:
            # strategy with per-epoch host-built scan inputs (KvsAll): each
            # epoch dispatches its own compiled scans, but no epoch fetches
            # before the whole group is enqueued — the host collation of
            # epoch e+1 overlaps the device execution of epoch e (measured
            # ~30% device idle when built serially)
            dispatched = []
            for _ in range(num_epochs):
                self.epoch += 1
                base = dict(
                    type=self.type_str, scope="epoch", epoch=self.epoch,
                    split=self.train_split, batches=0, size=0,
                )
                self.current_trace["epoch"] = base
                for f in self.pre_epoch_hooks:
                    f(self)
                epoch_data = self._scan_data()
                ys, meta = self._dispatch_epoch_scanned(epoch_data)
                # pipelined epochs finalize after the whole group is
                # enqueued, so wall-clock epoch_time would overlap later
                # epochs; record the dispatch end so the trace can carry
                # an honest per-epoch number plus a pipelining flag
                meta["dispatch_end"] = time.time()
                dispatched.append((base, ys, meta))
                if not self.kge_lr_scheduler.metric_based:
                    self.kge_lr_scheduler.step()
            traces = []
            for base, ys, meta in dispatched:
                self.current_trace["epoch"] = base
                traces.append(
                    self._finalize_epoch_scanned(jax.device_get(ys), meta)
                )
            return traces
        if data is None:
            traces = []
            for _ in range(num_epochs):
                self.epoch += 1
                traces.append(self.run_epoch())
                if not self.kge_lr_scheduler.metric_based:
                    self.kge_lr_scheduler.step()
            return traces
        # build inputs for the whole group: per-epoch rng keys and lr vectors
        # (the non-metric scheduler is stepped between epochs host-side)
        group_start = time.time()
        size, nb, prepare_time = self._ensure_epoch_scan(data)
        keys, lrs = [], []
        for _ in range(num_epochs):
            self.epoch += 1
            base = dict(
                type=self.type_str, scope="epoch", epoch=self.epoch,
                split=self.train_split, batches=0, size=0,
            )
            self.current_trace["epoch"] = base
            for f in self.pre_epoch_hooks:
                f(self)
            base_traces.append(base)
            key, self._root_key = _split_key(self._root_key)
            keys.append(key)
            lrs.append(self._current_lrs())
            if not self.kge_lr_scheduler.metric_based:
                self.kge_lr_scheduler.step()

        # one jitted scan over epochs (cached per group size): a single
        # device dispatch + a single fetch for the entire group
        def ensure_group_fn():
            if num_epochs in self._jitted_epoch_groups:
                return
            epoch_fn = self._epoch_fn

            def group_fn(params, opt_state, triples_all, keys, lrs):
                def body(carry, xs):
                    params, opt_state = carry
                    key, lr = xs
                    params, opt_state, ys = epoch_fn(
                        params, opt_state, triples_all, key, lr
                    )
                    return (params, opt_state), ys

                (params, opt_state), ys_all = jax.lax.scan(
                    body, (params, opt_state), (keys, lrs)
                )
                return params, opt_state, ys_all

            self._jitted_epoch_groups[num_epochs] = jax.jit(
                group_fn, donate_argnums=(0, 1)
            )

        while True:
            ensure_group_fn()
            try:
                self.model_params, self.opt_state, ys_all = (
                    self._jitted_epoch_groups[num_epochs](
                        self.model_params, self.opt_state,
                        self._device_epoch_triples,
                        jnp.stack(keys), jnp.stack(lrs),
                    )
                )
                break
            except Exception as e:
                # device OOM auto-tuning applies to scanned groups too
                if not self._handle_oom(e):
                    raise
                self._ensure_epoch_scan(self._scan_data())
        fetched_all = jax.device_get(ys_all)

        traces = []
        for i, base in enumerate(base_traces):
            fetched = jax.tree_util.tree_map(lambda x: x[i], fetched_all)
            meta = dict(
                epoch_start=group_start, prepare_time=prepare_time,
                nb=nb, size=size, epoch=base["epoch"],
            )
            self.current_trace["epoch"] = base
            traces.append(self._finalize_epoch_scanned(fetched, meta))
        return traces

    def _ensure_epoch_scan_partitioned(self, data, size: int, bs: int):
        """Edge-partitioned scan layout: data shard s owns a contiguous
        ``1/D`` of the training triples as rows [s, :, :] of a
        ``(D, L, 3)`` array sharded ``P("data")``; each epoch every shard
        permutes within itself (keys derived from the device-side epoch
        key, so the trajectory is identical for any process layout) and
        every global batch stripes ``bs/D`` rows from each shard. Under
        multi-process execution the array is assembled with
        ``make_array_from_callback`` — each host materializes only the
        rows its own devices hold."""
        D = self.device_ctx.mesh.shape["data"]
        bsl = bs // D
        base = math.ceil(size / D)
        nb = math.ceil(base / bsl)
        L = nb * bsl
        shard_sizes = np.minimum(
            np.maximum(size - np.arange(D) * base, 0), base
        )

        prepare_start = time.time()
        if not hasattr(self, "_device_epoch_triples"):
            from jax.sharding import NamedSharding, PartitionSpec as P_

            tri = data["triples_flat"]
            sharding = NamedSharding(
                self.device_ctx.mesh, P_("data", None, None)
            )
            dummy = tri[-1]

            def shard_rows(index):
                out = []
                for s in range(*index[0].indices(D)):
                    rows = np.broadcast_to(dummy, (L, 3)).copy()
                    n_s = int(shard_sizes[s])
                    rows[:n_s] = tri[s * base : s * base + n_s]
                    out.append(rows)
                block = np.stack(out).astype(np.int32)
                return block[(slice(None),) + tuple(index[1:])]

            self._device_epoch_triples = jax.make_array_from_callback(
                (D, L, 3), sharding, shard_rows
            )
        prepare_time = time.time() - prepare_start

        if not hasattr(self, "_epoch_fn"):
            raw_step = self._raw_step
            sizes = jnp.asarray(shard_sizes)

            def epoch_fn(params, opt_state, triples_all, rng, lr):
                perm_key, scan_key = jax.random.split(rng)
                shard_keys = jax.random.split(perm_key, D)
                perms = jax.vmap(
                    lambda k: jax.random.permutation(k, L)
                )(shard_keys)                                    # (D, L)
                mask_all = (perms < sizes[:, None]).astype(jnp.float32)
                idx = jnp.moveaxis(perms.reshape(D, nb, bsl), 1, 0)
                msk = jnp.moveaxis(mask_all.reshape(D, nb, bsl), 1, 0)

                def body(carry, xs):
                    params, opt_state = carry
                    idx_b, mask_b, key = xs
                    # batched per-shard gather: operand and indices are
                    # both sharded over "data", so no collective moves
                    # triples between shards
                    local = jnp.take_along_axis(
                        triples_all, idx_b[:, :, None], axis=1
                    )
                    batch = {
                        "triples": local.reshape(D * bsl, 3),
                        "mask": mask_b.reshape(-1),
                    }
                    params, opt_state, cost, aux = raw_step(
                        params, opt_state, batch, key, lr
                    )
                    ys = (
                        cost, aux["avg_loss"],
                        {k: v for k, v in aux.get("penalties", {}).items()},
                    )
                    return (params, opt_state), ys

                keys = jax.random.split(scan_key, nb)
                (params, opt_state), ys = jax.lax.scan(
                    body, (params, opt_state), (idx, msk, keys)
                )
                return params, opt_state, ys

            self._epoch_fn = epoch_fn
            self._jitted_epoch = jax.jit(epoch_fn, donate_argnums=(0, 1))
            self._jitted_epoch_groups = {}
        return size, nb, prepare_time

    def _ensure_epoch_scan(self, data: Dict[str, np.ndarray]):
        """Put the epoch data on device and build the pure epoch function +
        its single-epoch jit; returns (size, nb, prepare_time)."""
        size = int(data.pop("__size__"))
        bs = self.batch_size
        if getattr(self, "_partition_edges", False) and "triples_flat" in data:
            return self._ensure_epoch_scan_partitioned(data, size, bs)
        nb = math.ceil(size / bs)
        pad = nb * bs - size

        prepare_start = time.time()
        if not hasattr(self, "_device_epoch_triples"):
            # one extra dummy row serves the padding slots
            triples = np.concatenate(
                [data["triples_flat"], data["triples_flat"][-1:]], axis=0
            )
            from kge_tpu.parallel import distributed

            if distributed.is_multiprocess():
                from jax.sharding import PartitionSpec as P

                arr = distributed.make_global(
                    self.device_ctx.mesh, P(), triples
                )
            else:
                arr = jnp.asarray(triples)
                if self.device_ctx.active:
                    arr = jax.device_put(arr, self.device_ctx.replicated())
            self._device_epoch_triples = arr
        prepare_time = time.time() - prepare_start

        if not hasattr(self, "_epoch_fn"):
            raw_step = self._raw_step

            def epoch_fn(params, opt_state, triples_all, rng, lr):
                perm_key, scan_key = jax.random.split(rng)
                perm = jax.random.permutation(perm_key, size)
                idx = jnp.concatenate(
                    [perm, jnp.full((pad,), size, dtype=perm.dtype)]
                ).reshape(nb, bs)
                mask_all = (idx < size).astype(jnp.float32)

                def body(carry, xs):
                    params, opt_state = carry
                    idx_b, mask_b, key = xs
                    batch = {
                        "triples": triples_all[idx_b],
                        "mask": mask_b,
                    }
                    params, opt_state, cost, aux = raw_step(
                        params, opt_state, batch, key, lr
                    )
                    ys = (
                        cost, aux["avg_loss"],
                        {k: v for k, v in aux.get("penalties", {}).items()},
                    )
                    return (params, opt_state), ys

                keys = jax.random.split(scan_key, nb)
                (params, opt_state), ys = jax.lax.scan(
                    body, (params, opt_state), (idx, mask_all, keys)
                )
                return params, opt_state, ys

            self._epoch_fn = epoch_fn
            self._jitted_epoch = jax.jit(epoch_fn, donate_argnums=(0, 1))
            self._jitted_epoch_groups = {}
        return size, nb, prepare_time

    def _dispatch_epoch_scanned(self, data: Dict[str, np.ndarray]):
        """Dispatch one scanned epoch without fetching its per-batch scalars;
        returns (device ys, meta for ``_finalize_epoch_scanned``)."""
        epoch_start = time.time()
        size, nb, prepare_time = self._ensure_epoch_scan(data)
        key, self._root_key = _split_key(self._root_key)
        while True:
            try:
                self.model_params, self.opt_state, ys = self._jitted_epoch(
                    self.model_params, self.opt_state,
                    self._device_epoch_triples, key, self._current_lrs()
                )
                break
            except Exception as e:
                if not self._handle_oom(e):
                    raise
                size, nb, prepare_time = self._ensure_epoch_scan(
                    self._scan_data()
                )
        meta = dict(
            epoch_start=epoch_start, prepare_time=prepare_time,
            nb=nb, size=size, epoch=self.epoch,
        )
        return ys, meta

    def _finalize_epoch_scanned(self, fetched, meta) -> Dict[str, Any]:
        """Build the epoch trace entry from fetched per-batch scalars."""
        costs, losses, penalties = fetched
        nb, size = meta["nb"], meta["size"]
        epoch_start, prepare_time = meta["epoch_start"], meta["prepare_time"]

        sum_cost = float(np.sum(costs))
        if self.abort_on_nan and math.isnan(sum_cost):
            raise FloatingPointError("Cost became nan, aborting training job")
        epoch_time = time.time() - epoch_start
        extra_timing = {}
        if "dispatch_end" in meta:
            # group-pipelined epoch: epoch_time spans the group's remaining
            # dispatch+execution (finalize runs after the group is enqueued)
            extra_timing = dict(
                dispatch_time=meta["dispatch_end"] - epoch_start,
                group_pipelined=True,
            )
        self.current_trace["epoch"].update(extra_timing)
        self.current_trace["epoch"].update(
            dict(
                batches=nb,
                size=size,
                avg_loss=float(np.mean(losses)),
                avg_cost=sum_cost / nb,
                avg_penalty=float(np.mean(costs - losses)),
                avg_penalties={
                    k: float(np.mean(v)) for k, v in penalties.items()
                },
                epoch_time=epoch_time,
                prepare_time=prepare_time,
                forward_time=epoch_time - prepare_time,
                event="epoch_completed",
                num_parameters=self.model.num_parameters(self.model_params),
                scanned=True,
            )
        )
        for f in self.post_epoch_hooks:
            f(self)
        trace_entry = self.trace(**self.current_trace["epoch"], echo=False, log=True)
        from kge_tpu.job.trace import format_trace_entry

        self.config.log(
            format_trace_entry("train_epoch", trace_entry, self.config),
            prefix="  ",
        )
        self.current_trace["epoch"] = None
        return trace_entry

    # -- epoch loop ------------------------------------------------------------

    def run_epoch(self) -> Dict[str, Any]:
        """Run one epoch and return its trace entry."""
        if not self._is_prepared:
            self._prepare()
            self._is_prepared = True

        if self.config.get("train.profile") and self.config.folder:
            profile_dir = os.path.join(self.config.folder, "profile")
            with jax.profiler.trace(profile_dir):
                return self._run_epoch_inner()
        return self._run_epoch_inner()

    def _run_epoch_inner(self) -> Dict[str, Any]:

        self.current_trace["epoch"] = dict(
            type=self.type_str, scope="epoch", epoch=self.epoch,
            split=self.train_split, batches=0, size=0,
        )
        for f in self.pre_epoch_hooks:
            f(self)

        if self._epoch_scan_enabled():
            data = self._scan_data()
            if data is not None:
                return self._run_epoch_scanned(data)

        epoch_start = time.time()
        num_batches = 0
        total_batches = -(-self.num_examples // self.batch_size)
        prepare_time_total = 0.0
        forward_time_total = 0.0
        #: per-batch device scalars, fetched once at epoch end so the device
        #: pipeline never blocks on the host (critical over remote links)
        pending: List[Any] = []

        lr_vec = self._current_lrs() if not self.is_forward_only else None

        for batch_index, batch in enumerate(self._batches()):
            self.current_trace["batch"] = {
                "type": self.type_str, "scope": "batch",
                "epoch": self.epoch, "split": self.train_split,
                "batch": batch_index, "size": int(batch["true_size"]),
            }
            for f in self.pre_batch_hooks:
                f(self)

            prepare_start = time.time()
            variant = self._step_variant(batch)
            device_batch = {
                k: v for k, v in batch.items()
                if k != "true_size" and not isinstance(v, str)
            }
            if self.device_ctx.active:
                device_batch = jax.device_put(
                    device_batch, self.device_ctx.batch_shardings(device_batch)
                )
            else:
                device_batch = {
                    k: jnp.asarray(v) for k, v in device_batch.items()
                }
            key, self._root_key = _split_key(self._root_key)
            prepare_time_total += time.time() - prepare_start

            forward_start = time.time()
            while True:
                try:
                    if self.is_forward_only:
                        cost, aux = self._get_loss_fn(variant)(
                            self.model_params, device_batch, key
                        )
                    else:
                        (self.model_params, self.opt_state, cost, aux) = (
                            self._get_step_fn(variant)(
                                self.model_params, self.opt_state,
                                device_batch, key, lr_vec,
                            )
                        )
                    break
                except Exception as e:
                    if not self._handle_oom(e):
                        raise
            forward_time_total += time.time() - forward_start

            pending.append((cost, aux))
            num_batches += 1
            self.current_trace["epoch"]["size"] += int(batch["true_size"])

            if self.trace_batch:
                # per-batch tracing needs the values now (syncs the pipeline)
                self.current_trace["batch"].update(
                    avg_loss=float(aux["avg_loss"]), cost=float(cost),
                )
                self.config.trace(**self.current_trace["batch"])
            # in-epoch console feedback (reference train.py:502-524); loss
            # values only under trace_batch — fetching them every batch
            # would sync the deferred-fetch pipeline
            self.config.print(
                "\r{}  batch {}/{}".format(
                    self.config.log_prefix, num_batches - 1, total_batches - 1
                )
                + (
                    ", avg_loss {:.4E}, cost {:.4E}".format(
                        float(aux["avg_loss"]), float(cost)
                    )
                    if self.trace_batch else ""
                )
                + ", time {:6.2f}s\033[K".format(time.time() - epoch_start),
                end="",
                flush=True,
            )
            self.current_trace["batch"] = None
            for f in self.post_batch_hooks:
                f(self)

        # fetch all per-batch scalars in one transfer
        fetched = jax.device_get(
            [(c, a["avg_loss"], a.get("penalties", {})) for c, a in pending]
        )
        sum_cost = float(sum(c for c, _, _ in fetched))
        sum_loss = float(sum(l for _, l, _ in fetched))
        sum_penalties: Dict[str, float] = {}
        for _, _, pens in fetched:
            for name, value in pens.items():
                sum_penalties[name] = sum_penalties.get(name, 0.0) + float(value)

        if self.abort_on_nan and math.isnan(sum_cost):
            raise FloatingPointError("Cost became nan, aborting training job")

        epoch_time = time.time() - epoch_start
        self.current_trace["epoch"].update(
            dict(
                batches=num_batches,
                avg_loss=sum_loss / max(num_batches, 1),
                avg_cost=sum_cost / max(num_batches, 1),
                avg_penalty=(sum_cost - sum_loss) / max(num_batches, 1),
                avg_penalties={
                    k: v / max(num_batches, 1) for k, v in sum_penalties.items()
                },
                epoch_time=epoch_time,
                prepare_time=prepare_time_total,
                forward_time=forward_time_total,
                event="epoch_completed",
                num_parameters=self.model.num_parameters(self.model_params),
            )
        )
        for f in self.post_epoch_hooks:
            f(self)
        trace_entry = self.trace(**self.current_trace["epoch"], echo=False, log=True)
        from kge_tpu.job.trace import format_trace_entry

        self.config.log(
            format_trace_entry("train_epoch", trace_entry, self.config),
            prefix="  ",
        )
        self.current_trace["epoch"] = None
        return trace_entry

    def _batches(self):
        """Yield fixed-shape numpy batches (subclasses)."""
        raise NotImplementedError

    def _current_lrs(self) -> jnp.ndarray:
        base = self.optimizer.base_lrs()
        factor = self._warmup_factor * self.kge_lr_scheduler.factor
        return jnp.asarray(base * factor)

    @property
    def type_str(self) -> str:
        raise NotImplementedError

    # -- checkpointing (reference train.py:260-320) ----------------------------

    def _save(self, filename) -> None:
        self.config.log("Saving checkpoint to {}...".format(filename))
        checkpoint = self.save_to({})
        save_checkpoint(checkpoint, filename)

    def save_to(self, checkpoint: Dict) -> Dict:
        train_checkpoint = {
            "type": "train",
            "epoch": self.epoch,
            "valid_trace": self.valid_trace,
            "model": (self.model_params, self.model.meta),
            "optimizer_state": self.opt_state,
            "lr_scheduler_state_dict": (
                self.kge_lr_scheduler.state_dict()
                if self.kge_lr_scheduler else {}
            ),
            "job_id": self.job_id,
        }
        train_checkpoint = self.config.save_to(train_checkpoint)
        train_checkpoint = self.dataset.save_to(train_checkpoint)
        checkpoint.update(train_checkpoint)
        return checkpoint

    def _load(self, checkpoint: Dict) -> str:
        if checkpoint["type"] != "train":
            raise ValueError("Training can only be continued on trained models")
        self.epoch = checkpoint["epoch"]
        self.valid_trace = checkpoint["valid_trace"]
        if checkpoint.get("optimizer_state") is not None:
            self.opt_state = jax.tree_util.tree_map(
                jnp.asarray, checkpoint["optimizer_state"]
            )
        if self.kge_lr_scheduler is None:
            self.kge_lr_scheduler = KgeLRScheduler(self.config)
        self.kge_lr_scheduler.load_state_dict(
            checkpoint.get("lr_scheduler_state_dict", {})
        )
        self.resumed_from_job_id = checkpoint.get("job_id")
        self.trace(
            event="job_resumed", epoch=self.epoch,
            checkpoint_file=checkpoint.get("file"),
        )
        self.config.log(
            "Resuming training from {} of job {}".format(
                checkpoint.get("file"), self.resumed_from_job_id
            )
        )
        return ""

    def _delete_checkpoint(self, checkpoint_id: int):
        import glob

        filename = self.config.checkpoint_file(checkpoint_id)
        if os.path.exists(filename):
            self.config.log("Removing old checkpoint {}...".format(filename))
            os.remove(filename)
        for shard in glob.glob(filename + ".shard*"):
            os.remove(shard)

    # -- helpers for subclasses ------------------------------------------------

    def _handle_oom(self, e: Exception) -> bool:
        """Device OOM auto-tuning: halve the subbatch size and rebuild the
        compiled step (reference train.py:374-413). Returns True when the
        failed call should be retried."""
        message = str(e)
        oom_markers = (
            "RESOURCE_EXHAUSTED", "Out of memory", "would exceed memory",
            "Ran out of memory",
        )
        # the axon remote-compile helper reports compile-time OOM as a
        # generic HTTP 500, but the same marker also covers transient
        # helper failures — retry once at the current subbatch size before
        # treating it as OOM, so one flaky 500 doesn't permanently halve
        # train.subbatch_size for the run and its resumes
        helper_500 = (
            "tpu_compile_helper" in message
            and not any(m in message for m in oom_markers)
        )
        if helper_500:
            if not getattr(self, "_compile_helper_retried", False):
                self._compile_helper_retried = True
                self.config.log(
                    "Remote-compile helper failed (HTTP 500); retrying once "
                    "at the current subbatch size"
                )
                return True
        elif not any(m in message for m in oom_markers):
            return False
        if not self.config.get("train.subbatch_auto_tune"):
            return False
        # a donated step that failed during execution (not compilation) may
        # have invalidated its input buffers; retrying would only raise
        # "array has been deleted" — propagate the real error instead
        import jax as _jax

        for leaf in _jax.tree_util.tree_leaves(
            (self.model_params, self.opt_state)
        ):
            if isinstance(leaf, _jax.Array) and leaf.is_deleted():
                self.config.log(
                    "Device OOM during execution invalidated donated "
                    "model/optimizer buffers; cannot retry in-process — "
                    "resume from the last checkpoint (train.subbatch_size "
                    "has been reduced for the resume)"
                )
                new = (
                    self.batch_size // 2 if self._subbatch_size <= 0
                    else self._subbatch_size // 2
                )
                if new >= 1:
                    self.config.set("train.subbatch_size", new, log=True)
                return False
        new_size = (
            self.batch_size // 2 if self._subbatch_size <= 0
            else self._subbatch_size // 2
        )
        while new_size > 0 and self.batch_size % new_size != 0:
            new_size -= 1
        if new_size < 1:
            return False
        self.config.log(
            f"Device out of memory; halving subbatch size to {new_size} "
            "and retrying"
        )
        self._subbatch_size = new_size
        self._compile_helper_retried = False  # fresh retry at the new size
        self.config.set("train.subbatch_size", new_size, log=True)
        for attr in ("_jitted_epoch", "_epoch_fn", "_jitted_epoch_groups"):
            if hasattr(self, attr):
                delattr(self, attr)
        self._build_step_fn()
        return True

    def _check_shardable(self):
        """Validate mesh divisibility constraints with actionable errors."""
        mesh = self.device_ctx.mesh
        data = mesh.shape["data"]
        model = mesh.shape["model"]
        if self.batch_size % data != 0:
            raise ValueError(
                f"train.batch_size={self.batch_size} must be divisible by "
                f"the data mesh axis ({data})"
            )
        if model > 1:
            E = self.dataset.num_entities()
            if E % model != 0:
                raise ValueError(
                    f"num_entities={E} must be divisible by the model mesh "
                    f"axis ({model}) for row-sharded entity tables "
                    "(pad the vocabulary or adjust parallel.model)"
                )

    def _epoch_permutation(self, n: int) -> np.ndarray:
        return self._np_rng.permutation(n)

    def _scan_data_triples(self) -> Dict[str, np.ndarray]:
        """Standard scan data: the flat triple array (device-resident after
        the first epoch; shuffling happens inside the compiled epoch)."""
        return {
            "triples_flat": self.triples.astype(np.int32),
            "__size__": np.int64(self.num_examples),
        }

    def _pad_batch(self, arr: np.ndarray, size: int) -> np.ndarray:
        """Pad the leading axis to ``size`` by repeating the last row."""
        if len(arr) == size:
            return arr
        pad = np.repeat(arr[-1:], size - len(arr), axis=0)
        return np.concatenate([arr, pad], axis=0)


def _best_index(values: List[float], metric_max: bool) -> int:
    from kge_tpu.utils.metric import Metric

    return Metric(metric_max).best_index(values)


def _split_key(key):
    k1, k2 = jax.random.split(key)
    return k1, k2


def _make_valid_job(config: Config, dataset: Dataset, parent: TrainingJob):
    from kge_tpu.job.eval import EvaluationJob

    valid_conf = config.clone()
    valid_conf.set("job.type", "eval")
    if config.get("valid.split") != "":
        valid_conf.set("eval.split", config.get("valid.split"))
    valid_conf.set("eval.trace_level", config.get("valid.trace_level"))
    return EvaluationJob.create(
        valid_conf, dataset, parent_job=parent, model=parent.model
    )
