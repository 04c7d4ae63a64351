"""Filtered entity-ranking evaluation (reference kge/job/eval_entity_ranking.py).

For each test triple (s,p,o), all (s,p,?) and (?,p,o) completions are scored
chunk-by-chunk over the entity range; ranks count strictly-greater scores
excluding ties (isclose with configurable tolerances), known positives are
filtered by pushing their scores to -inf, and final ranks follow the
configured tie policy. Metrics (MRR, Hits@k, mean rank — raw, filtered and
filtered-with-test, plus head/tail, relation-type, and frequency drill-downs)
are computed from per-example ranks.

TPU design: one jitted chunk kernel (static chunk size, traced chunk offset)
computes scores, the consistency diff against the precomputed true scores,
and the (rank, tie) increments for all three rankings at once. Filter labels
arrive as padded coordinate lists (bucketed) and are scattered on device.
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.eval import EvaluationJob
from kge_tpu.job.job import Job

S, P, O = 0, 1, 2


def _bucket(n: int, quantum: int = 1024) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def hist_all(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    """Batch-wide rank histogram; also head/tail histograms when enabled
    (reference eval_entity_ranking.py:665-687)."""
    num_entities = job.dataset.num_entities()
    if "all" not in hists:
        hists["all"] = np.zeros(num_entities, dtype=np.float64)
    np.add.at(hists["all"], s_ranks, 1)
    np.add.at(hists["all"], o_ranks, 1)
    if job.head_and_tail:
        for key, ranks in (("head", s_ranks), ("tail", o_ranks)):
            if key not in hists:
                hists[key] = np.zeros(num_entities, dtype=np.float64)
            np.add.at(hists[key], ranks, 1)


def hist_per_relation_type(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    for rel_type, rels in job.dataset.index("relation_types").items():
        mask = np.isin(p, list(rels))
        key = rel_type
        if key not in hists:
            hists[key] = np.zeros(job.dataset.num_entities(), dtype=np.float64)
        np.add.at(hists[key], s_ranks[mask], 1)
        np.add.at(hists[key], o_ranks[mask], 1)
        if job.head_and_tail:
            for side, ranks in (("head", s_ranks), ("tail", o_ranks)):
                skey = f"{rel_type}_{side}"
                if skey not in hists:
                    hists[skey] = np.zeros(
                        job.dataset.num_entities(), dtype=np.float64
                    )
                np.add.at(hists[skey], ranks[mask], 1)


def hist_per_frequency_percentile(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    percentiles = job.dataset.index("frequency_percentiles")
    for arg, ranks, idx in (
        ("subject", s_ranks, s), ("relation", s_ranks, p),
        ("object", o_ranks, o),
    ):
        for percentile, members in percentiles[arg].items():
            key = f"{arg}_{percentile}"
            if key not in hists:
                hists[key] = np.zeros(job.dataset.num_entities(), dtype=np.float64)
            mask = np.isin(idx, list(members))
            np.add.at(hists[key], ranks[mask], 1)


class EntityRankingJob(EvaluationJob):
    def __init__(self, config: Config, dataset: Dataset, parent_job, model):
        super().__init__(config, dataset, parent_job, model)
        self.config.check(
            "entity_ranking.tie_handling.type",
            ["rounded_mean_rank", "best_rank", "worst_rank"],
        )
        self.tie_handling = config.get("entity_ranking.tie_handling.type")
        self.tie_atol = float(config.get("entity_ranking.tie_handling.atol"))
        self.tie_rtol = float(config.get("entity_ranking.tie_handling.rtol"))
        self.filter_with_test = config.get("entity_ranking.filter_with_test")
        self.filter_splits = list(config.get("entity_ranking.filter_splits"))
        if self.eval_split not in self.filter_splits:
            self.filter_splits.append(self.eval_split)
        # drop k's beyond the vocabulary (reference eval_entity_ranking.py:31-37)
        max_k = min(
            self.dataset.num_entities(),
            max(config.get("entity_ranking.hits_at_k_s")),
        )
        self.hits_at_k_s = [
            k for k in config.get("entity_ranking.hits_at_k_s") if k <= max_k
        ]
        self.head_and_tail = config.get("entity_ranking.metrics_per.head_and_tail")

        self.hist_hooks = [hist_all]
        if config.get("entity_ranking.metrics_per.relation_type"):
            self.hist_hooks.append(hist_per_relation_type)
        if config.get("entity_ranking.metrics_per.argument_frequency"):
            self.hist_hooks.append(hist_per_frequency_percentile)

        if self.__class__ == EntityRankingJob:
            for f in Job.job_created_hooks:
                f(self)

    def _prepare(self):
        super()._prepare()
        self.triples = self.dataset.split(self.eval_split)
        for split in self.filter_splits:
            self.dataset.index(f"{split}_sp_to_o")
            self.dataset.index(f"{split}_po_to_s")
        if "test" not in self.filter_splits and self.filter_with_test:
            self.dataset.index("test_sp_to_o")
            self.dataset.index("test_po_to_s")
        if self.config.get("entity_ranking.chunk_size") > -1:
            self.chunk_size = self.config.get("entity_ranking.chunk_size")
        else:
            self.chunk_size = self.dataset.num_entities()
        self.model.prepare_job(self)
        self._chunk_fn = jax.jit(
            partial(self._chunk_kernel), static_argnames=("num_coords",)
        )
        self._true_fn = jax.jit(self._true_scores_kernel)

    # -- label coords ----------------------------------------------------------

    def _label_coords(self, batch: np.ndarray, splits: List[str]):
        """(row, col) coords of known positives over [0, 2E): sp labels in
        [0, E), po labels in [E, 2E)."""
        E = self.dataset.num_entities()
        rows_all, cols_all = [], []
        for split in splits:
            sp = self.dataset.index(f"{split}_sp_to_o")
            po = self.dataset.index(f"{split}_po_to_s")
            r, v = sp.get_all_coords(batch[:, S], batch[:, P])
            rows_all.append(r)
            cols_all.append(v.astype(np.int64))
            r, v = po.get_all_coords(batch[:, P], batch[:, O])
            rows_all.append(r)
            cols_all.append(v.astype(np.int64) + E)
        rows = np.concatenate(rows_all)
        cols = np.concatenate(cols_all)
        return rows, cols

    @staticmethod
    def _pad_coords(rows, cols, n_drop_row):
        cap = _bucket(len(rows))
        out_r = np.full(cap, n_drop_row, dtype=np.int64)
        out_c = np.zeros(cap, dtype=np.int64)
        out_r[: len(rows)] = rows
        out_c[: len(cols)] = cols
        return out_r, out_c

    # -- device kernels --------------------------------------------------------

    def _true_scores_kernel(self, params, s, p, o):
        """True scores via the sp_/_po scoring path for float consistency with
        the ranking matrix (reference eval_entity_ranking.py:186-203)."""
        n = s.shape[0]
        o_true = self.model.score_sp(params, s, p, o)[jnp.arange(n), jnp.arange(n)]
        s_true = self.model.score_po(params, p, o, s)[jnp.arange(n), jnp.arange(n)]
        return o_true, s_true

    def _chunk_kernel(self, params, s, p, o, o_true, s_true, chunk_start,
                      coords, num_coords):
        """Score one entity chunk and return (rank, tie) increments for the
        raw / filtered / filtered-with-test rankings plus consistency diffs.

        ``coords`` maps ranking name -> (rows, cols) padded label coords over
        [0, 2E); ``num_coords`` is the static padded length bucket (part of
        the jit key).
        """
        n = s.shape[0]
        E = self.dataset.num_entities()
        c = self.chunk_size
        entity_subset = chunk_start + jnp.arange(c)
        valid_col = (entity_subset < E)

        scores = self.model.score_sp_po(params, s, p, o, entity_subset)
        scores_sp = scores[:, :c]
        scores_po = scores[:, c:]
        # mask out-of-range padding columns of the last chunk
        neg_inf = jnp.array(-jnp.inf, scores.dtype)
        scores_sp = jnp.where(valid_col[None, :], scores_sp, neg_inf)
        scores_po = jnp.where(valid_col[None, :], scores_po, neg_inf)

        # consistency check data: |chunk score at true position - true score|
        o_in = (o >= chunk_start) & (o < chunk_start + c) & (o < E)
        s_in = (s >= chunk_start) & (s < chunk_start + c) & (s < E)
        o_pos = jnp.clip(o - chunk_start, 0, c - 1)
        s_pos = jnp.clip(s - chunk_start, 0, c - 1)
        rows = jnp.arange(n)
        diff_o = jnp.where(
            o_in, jnp.abs(scores_sp[rows, o_pos] - o_true), 0.0
        )
        diff_s = jnp.where(
            s_in, jnp.abs(scores_po[rows, s_pos] - s_true), 0.0
        )
        ref_o = jnp.where(o_in, jnp.abs(o_true), 0.0)
        ref_s = jnp.where(s_in, jnp.abs(s_true), 0.0)
        max_diff = jnp.maximum(
            jnp.max(diff_o - (self.tie_atol + self.tie_rtol * ref_o)),
            jnp.max(diff_s - (self.tie_atol + self.tie_rtol * ref_s)),
        )

        results = {}
        for ranking, (lab_rows, lab_cols) in coords.items():
            if lab_rows is not None:
                # densify the label chunk: [n, 2c]; cols outside the chunk or
                # padded rows are dropped
                col_sp = lab_cols - chunk_start
                in_sp = (lab_cols >= chunk_start) & (lab_cols < chunk_start + c)
                col_po = lab_cols - E - chunk_start + c
                in_po = (lab_cols >= E + chunk_start) & (lab_cols < E + chunk_start + c)
                col = jnp.where(in_sp, col_sp, jnp.where(in_po, col_po, 0))
                keep = in_sp | in_po
                r = jnp.where(keep, lab_rows, n)  # row n = dropped
                labels = jnp.zeros((n + 1, 2 * c), dtype=scores.dtype)
                labels = labels.at[r, col].set(1.0, mode="drop")
                labels = labels[:n]
                # never filter the current example itself
                labels = labels.at[rows, o_pos].set(
                    jnp.where(o_in, 0.0, labels[rows, o_pos])
                )
                labels = labels.at[rows, s_pos + c].set(
                    jnp.where(s_in, 0.0, labels[rows, s_pos + c])
                )
                sp = jnp.where(labels[:, :c] > 0, neg_inf, scores_sp)
                po = jnp.where(labels[:, c:] > 0, neg_inf, scores_po)
            else:
                sp, po = scores_sp, scores_po
            o_rank, o_ties = self._ranks_and_ties(sp, o_true)
            s_rank, s_ties = self._ranks_and_ties(po, s_true)
            results[ranking] = (s_rank, s_ties, o_rank, o_ties)
            # subsequent rankings build on the filtered scores
            scores_sp, scores_po = sp, po
        return results, max_diff

    def _ranks_and_ties(self, scores, true_scores):
        """#strictly-greater (excluding ties) and #ties per row
        (reference eval_entity_ranking.py:598-618)."""
        scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
        true = jnp.where(jnp.isnan(true_scores), -jnp.inf, true_scores)[:, None]
        finite = jnp.isfinite(scores) | jnp.isfinite(true)
        is_close = (
            jnp.abs(scores - true) <= self.tie_atol + self.tie_rtol * jnp.abs(true)
        )
        # -inf vs -inf compares close in torch.isclose; replicate
        both_neg_inf = jnp.isneginf(scores) & jnp.isneginf(true)
        is_close = jnp.where(both_neg_inf, True, is_close & finite)
        is_greater = scores > true
        num_ties = jnp.sum(is_close, axis=1)
        rank = jnp.sum(is_greater & ~is_close, axis=1)
        return rank, num_ties

    def _final_rank(self, rank, num_ties):
        if self.tie_handling == "rounded_mean_rank":
            return rank + num_ties // 2
        elif self.tie_handling == "best_rank":
            return rank
        elif self.tie_handling == "worst_rank":
            return rank + num_ties - 1
        raise NotImplementedError

    # -- evaluation loop -------------------------------------------------------

    def _evaluate(self) -> Dict[str, Any]:
        if not self._is_prepared:
            self._prepare()
            self._is_prepared = True
        epoch_start = time.time()
        params = self.model_params
        E = self.dataset.num_entities()
        filter_with_test = (
            "test" not in self.filter_splits and self.filter_with_test
        )
        rankings = (
            ["_raw", "_filt", "_filt_test"] if filter_with_test
            else ["_raw", "_filt"]
        )

        self.current_trace["epoch"] = dict(
            type="entity_ranking", scope="epoch", split=self.eval_split,
            filter_splits=self.filter_splits, epoch=self.epoch,
            batches=math.ceil(len(self.triples) / self.batch_size),
            size=len(self.triples),
        )
        for f in self.pre_epoch_hooks:
            f(self)

        hists: Dict[str, Dict[str, np.ndarray]] = {
            r[1:] or "raw": {} for r in rankings
        }
        num_chunks = math.ceil(E / self.chunk_size)
        consistency_violated = False

        for batch_number in range(0, len(self.triples), self.batch_size):
            batch = self.triples[batch_number : batch_number + self.batch_size]
            n_true = len(batch)
            padded = np.concatenate(
                [batch, np.repeat(batch[-1:], self.batch_size - n_true, axis=0)]
            ) if n_true < self.batch_size else batch
            padded = padded.astype(np.int64)

            self.current_trace["batch"] = dict(
                type="entity_ranking", scope="batch", split=self.eval_split,
                epoch=self.epoch, batch=batch_number // self.batch_size,
                size=n_true,
            )
            for f in self.pre_batch_hooks:
                f(self)

            # label coords per ranking
            rows_f, cols_f = self._label_coords(padded, self.filter_splits)
            coords_np = {"_raw": (None, None)}
            coords_np["_filt"] = self._pad_coords(
                rows_f, cols_f, self.batch_size
            )
            if filter_with_test:
                rows_t, cols_t = self._label_coords(padded, ["test"])
                coords_np["_filt_test"] = self._pad_coords(
                    rows_t, cols_t, self.batch_size
                )

            s = jnp.asarray(padded[:, S])
            p = jnp.asarray(padded[:, P])
            o = jnp.asarray(padded[:, O])
            o_true, s_true = self._true_fn(params, s, p, o)

            acc = {
                r: [np.zeros(self.batch_size, np.int64) for _ in range(4)]
                for r in rankings
            }
            num_coords = tuple(
                len(coords_np[r][0]) if coords_np[r][0] is not None else 0
                for r in rankings
            )
            coords_dev = {
                r: (
                    (jnp.asarray(coords_np[r][0]), jnp.asarray(coords_np[r][1]))
                    if coords_np[r][0] is not None else (None, None)
                )
                for r in rankings
            }
            for chunk_number in range(num_chunks):
                chunk_start = self.chunk_size * chunk_number
                results, max_diff = self._chunk_fn(
                    params, s, p, o, o_true, s_true,
                    jnp.asarray(chunk_start), coords_dev,
                    num_coords=num_coords,
                )
                if float(max_diff) > 0:
                    msg = (
                        "Error in tie-handling: spo and sp_/_po scores differ "
                        "beyond the configured tolerances "
                        f"(max excess {float(max_diff):.3e})."
                    )
                    if self.config.get("entity_ranking.tie_handling.warn_only"):
                        if not consistency_violated:
                            self.config.log("WARNING: " + msg)
                            consistency_violated = True
                    else:
                        raise ValueError(msg)
                for r in rankings:
                    for i in range(4):
                        acc[r][i] += np.asarray(results[r][i])

            # final ranks (1-based for metrics)
            batch_ranks = {}
            for r in rankings:
                s_rank = self._final_rank(acc[r][0], acc[r][1])[:n_true]
                o_rank = self._final_rank(acc[r][2], acc[r][3])[:n_true]
                batch_ranks[r] = (s_rank, o_rank)

            # update histograms via hooks
            for r in rankings:
                key = r[1:] or "raw"
                s_rank, o_rank = batch_ranks[r]
                for f in self.hist_hooks:
                    f(
                        hists[key], batch[:, S], batch[:, P], batch[:, O],
                        s_rank, o_rank, self,
                    )

            # optional per-example trace
            if self.config.get("eval.trace_level") == "example":
                self._trace_examples(batch, batch_ranks, rankings)

            if "batch" in self.current_trace and self.current_trace["batch"]:
                for f in self.post_batch_hooks:
                    f(self)
                self.current_trace["batch"] = None

        # compute metrics
        metrics: Dict[str, Any] = {}
        suffix_of = {"_raw": "", "_filt": "_filtered", "_filt_test": "_filtered_with_test"}
        for r in rankings:
            suffix = suffix_of[r]
            key = r[1:] or "raw"
            for hist_key, hist in hists[key].items():
                hs = "" if hist_key == "all" else "_" + hist_key
                metrics.update(
                    self._compute_metrics(hist, suffix=suffix + hs)
                )

        epoch_time = time.time() - epoch_start
        self.current_trace["epoch"].update(
            dict(epoch_time=epoch_time, event="eval_completed", **metrics)
        )
        for f in self.post_epoch_hooks:
            f(self)
        trace_entry = dict(self.current_trace["epoch"])
        self.current_trace["epoch"] = None
        return trace_entry

    def _trace_examples(self, batch, batch_ranks, rankings):
        for i in range(len(batch)):
            entry = dict(
                type="entity_ranking", scope="example", split=self.eval_split,
                epoch=self.epoch,
                s=int(batch[i, S]), p=int(batch[i, P]), o=int(batch[i, O]),
            )
            for r in rankings:
                suffix = {"_raw": "", "_filt": "_filtered",
                          "_filt_test": "_filtered_with_test"}[r]
                entry[f"rank_s{suffix}"] = int(batch_ranks[r][0][i]) + 1
                entry[f"rank_o{suffix}"] = int(batch_ranks[r][1][i]) + 1
            self.config.trace(**entry)

    def _compute_metrics(self, rank_hist: np.ndarray, suffix="") -> Dict[str, Any]:
        """MRR / Hits@k / mean rank from a rank histogram
        (reference eval_entity_ranking.py:620-648). Histogram index is the
        0-based rank; metrics use 1-based ranks."""
        metrics = {}
        n = float(np.sum(rank_hist))
        ranks = np.arange(1, len(rank_hist) + 1, dtype=np.float64)
        metrics["mean_rank" + suffix] = (
            float(np.sum(rank_hist * ranks) / n) if n > 0 else 0.0
        )
        metrics["mean_reciprocal_rank" + suffix] = (
            float(np.sum(rank_hist / ranks) / n) if n > 0 else 0.0
        )
        max_k = max(self.hits_at_k_s)
        hits = (
            np.cumsum(rank_hist[:max_k]) / n if n > 0 else np.zeros(max_k)
        )
        for k in self.hits_at_k_s:
            metrics[f"hits_at_{k}{suffix}"] = float(hits[k - 1])
        return metrics
