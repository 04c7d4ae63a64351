"""KvsAll training (reference kge/job/train_KvsAll.py).

Examples are the unique (s,p), (p,o) (and optionally (s,o)) queries of the
training split; each is scored against the full candidate vocabulary with a
multi-hot label row. Labels arrive as CSR coordinate lists from the KvsAll
index and are densified on-device with a fixed-size padded scatter (bucketed
to limit recompilation).

Design note: the reference mixes query types inside a batch and processes
each type's subset with dynamic shapes (train_KvsAll.py:271-295); here each
batch is homogeneous in query type, which keeps every device shape static.
Epoch-level semantics (set of examples, loss normalization) are unchanged.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.job.job import Job
from kge_tpu.job.train import TrainingJob
from kge_tpu.models import Ctx

S, P, O = 0, 1, 2

_QUERY_TYPES = ["sp_", "s_o", "_po"]


def _bucket(n: int, quantum: int = 256) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


class TrainingJobKvsAll(TrainingJob):
    def __init__(self, config, dataset, parent_job=None, model=None,
                 forward_only=False):
        super().__init__(config, dataset, parent_job, model=model,
                         forward_only=forward_only)
        self.label_smoothing = config.check_range(
            "KvsAll.label_smoothing", float("-inf"), 1.0, max_inclusive=False
        )
        if self.label_smoothing < 0:
            if config.get("job.auto_correct"):
                config.log(
                    "Setting KvsAll.label_smoothing to 0, "
                    f"was set to {self.label_smoothing}."
                )
                self.label_smoothing = 0
            else:
                raise Exception(
                    "Label_smoothing was set to {}, "
                    "should be at least 0.".format(self.label_smoothing)
                )
        elif self.label_smoothing > 0 and self.label_smoothing <= (
            1.0 / dataset.num_entities()
        ):
            if config.get("job.auto_correct"):
                # just to be sure it's used correctly
                self.label_smoothing = 1.0 / dataset.num_entities()
                config.log(
                    "Setting KvsAll.label_smoothing to 1/num_entities = {}, "
                    "was set to {}.".format(
                        1.0 / dataset.num_entities(), self.label_smoothing
                    )
                )
            else:
                raise Exception(
                    "Label_smoothing was set to {}, "
                    "should be at least {}.".format(
                        self.label_smoothing, 1.0 / dataset.num_entities()
                    )
                )

        self.config.log("Initializing KvsAll training job...")
        if self.__class__ == TrainingJobKvsAll:
            for f in Job.job_created_hooks:
                f(self)

    @property
    def type_str(self):
        return "KvsAll"

    def _prepare_data(self):
        self.query_indexes = {}
        self.query_types: List[str] = []
        for qtype in _QUERY_TYPES:
            if self.config.get(f"KvsAll.query_types.{qtype}"):
                self.query_types.append(qtype)
                key = {"sp_": "sp", "s_o": "so", "_po": "po"}[qtype]
                value = {"sp_": "o", "s_o": "p", "_po": "s"}[qtype]
                self.query_indexes[qtype] = self.dataset.index(
                    f"{self.train_split}_{key}_to_{value}"
                )
        if not self.query_types:
            raise ValueError("KvsAll requires at least one enabled query type")
        self.num_examples = sum(
            len(self.query_indexes[t]) for t in self.query_types
        )

    def _vocab_size(self, qtype: str) -> int:
        return (
            self.dataset.num_relations() if qtype == "s_o"
            else self.dataset.num_entities()
        )

    def _batches(self):
        # one stream of (type, query-row) examples, shuffled per type, with
        # homogeneous batches interleaved in random order
        bs = self.batch_size
        chunks = []
        for qtype in self.query_types:
            index = self.query_indexes[qtype]
            perm = self._epoch_permutation(len(index))
            for start in range(0, len(index), bs):
                chunks.append((qtype, perm[start : start + bs]))
        order = self._np_rng.permutation(len(chunks))
        for ci in order:
            qtype, rows = chunks[ci]
            index = self.query_indexes[qtype]
            true_size = len(rows)
            keys = index.keys()[rows].astype(np.int64)  # [b, 2]
            keys = self._pad_batch(keys, bs)
            # label coordinates for the batch (query-row, value)
            counts = index._values_offset[rows + 1] - index._values_offset[rows]
            total = int(counts.sum())
            cap = _bucket(total)
            label_rows = np.full(cap, bs, dtype=np.int64)  # bs = dropped
            label_cols = np.zeros(cap, dtype=np.int64)
            qrows = np.repeat(np.arange(true_size), counts)
            starts = index._values_offset[rows]
            cum = np.concatenate([[0], np.cumsum(counts)])
            flat = np.arange(total)
            value_idx = starts[qrows] + (flat - cum[qrows])
            label_rows[:total] = qrows
            label_cols[:total] = index._values[value_idx]
            yield {
                "qtype": qtype,
                "queries": keys,
                "label_rows": label_rows,
                "label_cols": label_cols,
                "mask": np.concatenate(
                    [np.ones(true_size, np.float32),
                     np.zeros(bs - true_size, np.float32)]
                ),
                "true_size": true_size,
            }

    def _loss_for_batch(self, params, batch, rng):
        # only used via _loss_for_qtype closures (see _build_step_fn)
        raise NotImplementedError

    def _loss_for_qtype(self, qtype, params, batch, rng):
        queries = batch["queries"]
        mask = batch["mask"]
        batch_size = batch.get("__denom__", jnp.sum(mask))
        ctx = Ctx(train=True, rng=rng, stats={})
        vocab = self._vocab_size(qtype)
        bs = queries.shape[0]

        if qtype == "sp_":
            scores = self.model.score_sp(params, queries[:, 0], queries[:, 1],
                                         ctx=ctx.fold(1))
        elif qtype == "_po":
            scores = self.model.score_po(params, queries[:, 0], queries[:, 1],
                                         ctx=ctx.fold(1))
        else:
            scores = self.model.score_so(params, queries[:, 0], queries[:, 1],
                                         ctx=ctx.fold(1))

        # densify the multi-hot labels; padded coords carry row index bs and
        # are dropped by the scatter. Under subbatching the coordinate rows
        # refer to the full batch and are localized via __row_offset__.
        offset = batch.get("__row_offset__", 0)
        rows_raw = batch["label_rows"] - offset
        valid = (rows_raw >= 0) & (rows_raw < bs)
        rows = jnp.where(valid, rows_raw, bs)
        labels = jnp.zeros((bs + 1, vocab), dtype=scores.dtype)
        labels = labels.at[rows, batch["label_cols"]].set(1.0, mode="drop")
        labels = labels[:bs]

        if self.label_smoothing > 0 and qtype != "s_o":
            labels = (1.0 - self.label_smoothing) * labels + (
                1.0 / self.dataset.num_entities()
            )

        per_row = jax.vmap(
            lambda sc, lb: self.loss(sc[None, :], lb[None, :])
        )(scores.astype(jnp.float32), labels.astype(jnp.float32))
        loss_value = jnp.sum(per_row * mask) / batch_size
        return loss_value, {"stats": ctx.stats}

    def _build_step_fn(self):
        """One compiled step per query type: the scoring path is part of the
        trace, so each query type gets its own jit cache entry."""
        import functools

        self._steps = {}
        self._raw_steps = {}
        for qtype in self.query_types:
            self._steps[qtype] = self._make_step_fns(
                functools.partial(self._loss_for_qtype, qtype)
            )
            self._raw_steps[qtype] = self._raw_step

    # -- scanned epoch ----------------------------------------------------------

    def _scan_data(self):
        """Marker enabling the scanned path; the actual stacking happens per
        epoch in ``_dispatch_epoch_scanned`` because the label coordinates
        depend on the epoch shuffle."""
        return {"__size__": self.num_examples, "__kvsall__": 1}

    def _stack_epoch_batches(self):
        """Group this epoch's homogeneous batches by query type and stack
        them into [nb, ...] arrays with one global coordinate cap per type."""
        per: Dict[str, List[Dict]] = {}
        for batch in self._batches():
            per.setdefault(batch["qtype"], []).append(batch)
        stacks = {}
        if not hasattr(self, "_scan_caps"):
            self._scan_caps = {}
        for qtype, bl in per.items():
            nb = len(bl)
            bs = self.batch_size
            # sticky cap: pad to the largest coordinate count seen so far
            # (bucketed) so repeated epochs hit the same compiled shapes
            cap = max(
                _bucket(max(len(b["label_rows"]) for b in bl), 2048),
                self._scan_caps.get(qtype, 0),
            )
            self._scan_caps[qtype] = cap
            queries = np.stack([b["queries"] for b in bl]).astype(np.int32)
            masks = np.stack([b["mask"] for b in bl])
            rows = np.full((nb, cap), bs, dtype=np.int32)
            cols = np.zeros((nb, cap), dtype=np.int32)
            for i, b in enumerate(bl):
                rows[i, : len(b["label_rows"])] = b["label_rows"]
                cols[i, : len(b["label_cols"])] = b["label_cols"]
            stacks[qtype] = dict(
                queries=queries, mask=masks, label_rows=rows, label_cols=cols,
            )
        return stacks

    def _dispatch_epoch_scanned(self, data):
        """One jitted lax.scan per query type over its stacked batches;
        optimizer state chains on device across the per-type scans, and the
        per-batch scalars of all types come back in one deferred fetch."""
        import time as _time

        epoch_start = _time.time()
        prepare_start = _time.time()
        stacks = self._stack_epoch_batches()
        prepare_time = _time.time() - prepare_start

        if not hasattr(self, "_jitted_qtype_scans"):
            self._jitted_qtype_scans = {}
        for qtype in stacks:
            if qtype not in self._jitted_qtype_scans:
                raw_step = self._raw_steps[qtype]

                def scan_fn(params, opt_state, st, keys, lr, _raw=raw_step):
                    def body(carry, xs):
                        params, opt_state = carry
                        batch, key = xs
                        params, opt_state, cost, aux = _raw(
                            params, opt_state, batch, key, lr
                        )
                        ys = (
                            cost, aux["avg_loss"],
                            dict(aux.get("penalties", {})),
                        )
                        return (params, opt_state), ys

                    (params, opt_state), ys = jax.lax.scan(
                        body, (params, opt_state),
                        ({k: v for k, v in st.items()}, keys),
                    )
                    return params, opt_state, ys

                self._jitted_qtype_scans[qtype] = jax.jit(
                    scan_fn, donate_argnums=(0, 1)
                )

        from kge_tpu.job.train import _split_key

        lr = self._current_lrs()
        params, opt_state = self.model_params, self.opt_state
        ys_list = []
        nb_total = 0
        for qtype, st in stacks.items():
            nb = st["queries"].shape[0]
            nb_total += nb
            key, self._root_key = _split_key(self._root_key)
            keys = jax.random.split(key, nb)
            params, opt_state, ys = self._jitted_qtype_scans[qtype](
                params, opt_state, st, keys, lr
            )
            ys_list.append(ys)
        self.model_params, self.opt_state = params, opt_state

        costs = jnp.concatenate([y[0] for y in ys_list])
        losses = jnp.concatenate([y[1] for y in ys_list])
        pen_keys = ys_list[0][2].keys()
        penalties = {
            k: jnp.concatenate([y[2][k] for y in ys_list]) for k in pen_keys
        }
        meta = dict(
            epoch_start=epoch_start, prepare_time=prepare_time,
            nb=nb_total, size=self.num_examples, epoch=self.epoch,
        )
        return (costs, losses, penalties), meta

    def _step_variant(self, batch):
        return batch["qtype"]

    def _get_step_fn(self, variant):
        return self._steps[variant][0]

    def _get_loss_fn(self, variant):
        return self._steps[variant][1]
