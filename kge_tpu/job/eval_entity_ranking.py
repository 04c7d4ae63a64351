"""Filtered entity-ranking evaluation (reference kge/job/eval_entity_ranking.py).

For each test triple (s,p,o), all (s,p,?) and (?,p,o) completions are scored
chunk-by-chunk over the entity range; ranks count strictly-greater scores
excluding ties (isclose with configurable tolerances), known positives are
filtered out, and final ranks follow the configured tie policy. Metrics (MRR,
Hits@k, mean rank — raw, filtered and filtered-with-test, plus head/tail,
relation-type, and frequency drill-downs) are computed from per-example ranks.

TPU design (differs from the reference's dense label matrices,
eval_entity_ranking.py:489-569): one jitted batch kernel scores all entity
chunks with a ``lax.fori_loop``, computes raw (rank, tie) counts from the
score matrix, and *subtracts* the contribution of known positives via a
coordinate gather — known positives per row are few, so gathering their
scores and segment-summing their (greater, close) counts replaces the
batch×|E| label scatter entirely. The whole epoch runs as one jitted
``lax.scan`` over stacked batches — a single device dispatch and a single
device→host fetch per evaluation.
"""

from __future__ import annotations

import math
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.eval import EvaluationJob
from kge_tpu.job.job import Job
from kge_tpu.ops.pick import picked_scores, picked_scores_grouped

S, P, O = 0, 1, 2


def _bucket(n: int, quantum: int = 1024) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def hist_all(hists, s, p, o, s_ranks, o_ranks, job, **kwargs):
    """Batch-wide rank histogram; also head/tail histograms when enabled
    (reference eval_entity_ranking.py:665-687)."""
    num_entities = job.dataset.num_entities()
    if "all" not in hists:
        hists["all"] = np.zeros(num_entities, dtype=np.float64)
    # bincount beats np.add.at ~10x at epoch-sized rank arrays
    hists["all"] += np.bincount(s_ranks, minlength=num_entities)
    hists["all"] += np.bincount(o_ranks, minlength=num_entities)
    if job.head_and_tail:
        for key, ranks in (("head", s_ranks), ("tail", o_ranks)):
            if key not in hists:
                hists[key] = np.zeros(num_entities, dtype=np.float64)
            hists[key] += np.bincount(ranks, minlength=num_entities)


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
    """Subject buckets collect subject ranks, object buckets object ranks,
    and relation buckets BOTH rank sides (reference
    eval_entity_ranking.py:714-740)."""
    percentiles = job.dataset.index("frequency_percentiles")
    for arg, ranks, idx in (
        ("subject", s_ranks, s),
        ("relation", s_ranks, p),
        ("relation", o_ranks, p),
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
        # one jitted scan over all batches of the epoch: a single device
        # dispatch and a single device->host fetch per evaluation
        self._scan_fn = jax.jit(self._eval_scan_kernel)

    # -- label coords ----------------------------------------------------------

    def _label_coords(
        self, batch: np.ndarray, splits: List[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(row, col) coords of known positives over [0, 2E): sp labels in
        [0, E), po labels in [E, 2E). The triple's own answer is excluded
        (the reference instead zeroes it in the dense label matrix,
        eval_entity_ranking.py:282-290) and duplicates across splits are
        dropped (idempotent in the reference's scatter; required for the
        subtraction design)."""
        E = self.dataset.num_entities()
        rows_all, cols_all = [], []
        for split in splits:
            sp = self.dataset.index(f"{split}_sp_to_o")
            po = self.dataset.index(f"{split}_po_to_s")
            r, v = sp.get_all_coords(batch[:, S], batch[:, P])
            keep = v != batch[r, O].astype(v.dtype)
            rows_all.append(r[keep])
            cols_all.append(v[keep].astype(np.int64))
            r, v = po.get_all_coords(batch[:, P], batch[:, O])
            keep = v != batch[r, S].astype(v.dtype)
            rows_all.append(r[keep])
            cols_all.append(v[keep].astype(np.int64) + E)
        rows = np.concatenate(rows_all)
        cols = np.concatenate(cols_all)
        packed = rows * (2 * E) + cols
        packed = np.unique(packed)
        return packed // (2 * E), packed % (2 * E)

    # -- device kernel ---------------------------------------------------------

    def _close_greater(self, scores, true):
        """Tie (isclose) and strictly-greater masks with the reference's
        NaN/-inf conventions (eval_entity_ranking.py:598-618)."""
        scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
        true = jnp.where(jnp.isnan(true), -jnp.inf, true)
        finite = jnp.isfinite(scores) | jnp.isfinite(true)
        is_close = (
            jnp.abs(scores - true) <= self.tie_atol + self.tie_rtol * jnp.abs(true)
        )
        both_neg_inf = jnp.isneginf(scores) & jnp.isneginf(true)
        is_close = jnp.where(both_neg_inf, True, is_close & finite)
        is_greater = (scores > true) & ~is_close
        return is_close, is_greater

    def _eval_scan_kernel(self, params, triples_all, coords_all):
        """lax.scan of ``_rank_batch`` over stacked batches [B, n, 3] with
        per-ranking stacked label coords [B, cap]."""

        def body(carry, xs):
            results, max_diff = self._rank_batch(
                params,
                xs["triples"][:, S], xs["triples"][:, P], xs["triples"][:, O],
                {r: tuple(v) for r, v in xs["coords"].items()},
            )
            return carry, (results, max_diff)

        _, ys = jax.lax.scan(
            body, None, {"triples": triples_all, "coords": coords_all}
        )
        return ys

    def _rank_batch_grouped(self, params, s, p, o, coords):
        """Single-chunk ranking on the natively-grouped [n, G, 128] score
        layout (factorizing scorers). The flat path pays one full
        score-matrix pass per consumer (raw counts; the pick's pad +
        [n, V] -> [n, G, 128] retile) — at eval shapes the matrices are
        the whole traffic budget, so scoring straight into the grouped
        layout and fusing every consumer over it is the win: raw tie/rank
        counts and the true-position consistency extraction read S3 once
        (the consistency pick is an elementwise one-hot reduce, NOT a
        batched K=1 dot — 1024 tiny batched matmuls measured slower than
        the whole remaining kernel), and filtered-label values come from
        the grouped one-hot pick. True scores are the spo-path triple
        scores for both directions, matching the reference
        (eval_entity_ranking.py:186-203). Returns None when the scorer
        doesn't factorize or any ranking uses the flat coordinate
        layout."""
        E = self.dataset.num_entities()
        if getattr(self.model, "_ring_mesh", None) is not None:
            # model-axis sharding: score_sp/score_po route through the
            # explicit ppermute-ring schedule (vocab-axis scaling); the
            # grouped path's embed_all would all-gather the sharded table
            return None
        for r, v in coords.items():
            if r != "_filt_union" and len(v) != 1:
                return None
        triples = jnp.stack([s, p, o], axis=1)
        multi = self.model.score_all_grouped_multi(params, triples, (0, 2))
        if multi is None:
            return None
        pos_o, sp3 = multi[2]   # o-candidates (sp_ direction)
        pos_s, po3 = multi[0]   # s-candidates (_po direction; differs from
                                # pos_o for reciprocal models, which score
                                # the s direction with relation p + |R|)
        n, G = sp3.shape[0], sp3.shape[1]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 128), 1)
        lidx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 128), 2)
        flat = gidx * 128 + lidx
        col_valid = flat < E

        def side(S3, ids):
            # true score = the matrix's own entry at the true position
            # (extracted by an elementwise one-hot reduce): ranking is then
            # self-consistent whatever the matmul precision class — the
            # true position ties with itself exactly, like the reference's
            # scores[:, o] = o_score replacement
            onehot = (flat == ids[:, None, None]).astype(S3.dtype)
            mat = jnp.sum(S3 * onehot, axis=(1, 2))
            close, greater = self._close_greater(S3, mat[:, None, None])
            g_cnt = jnp.sum(greater & col_valid, axis=(1, 2)).astype(jnp.int32)
            c_cnt = jnp.sum(close & col_valid, axis=(1, 2)).astype(jnp.int32)
            return g_cnt, c_cnt, mat

        go, co, mat_o = side(sp3, o)
        gs, cs, mat_s = side(po3, s)
        # consistency: the spo scoring path vs the many-targets matmul path
        # (on TPU the default-precision matmul rounds inputs to bf16, so
        # this can exceed the f32-scale tie tolerances; warn_only governs)
        max_diff = jnp.maximum(
            jnp.max(jnp.abs(mat_o - pos_o)
                    - (self.tie_atol + self.tie_rtol * jnp.abs(pos_o))),
            jnp.max(jnp.abs(mat_s - pos_s)
                    - (self.tie_atol + self.tie_rtol * jnp.abs(pos_s))),
        ).astype(jnp.float32)
        results = {"_raw": (gs, cs, go, co)}
        raw = results["_raw"]

        def pick_masks(cols3):
            """One grouped pick per coordinate set; returns the
            (greater, close, is_sp) masks shared by its rankings."""
            is_sp3 = cols3 < E
            local3 = jnp.where(is_sp3, cols3, cols3 - E)
            valid3 = cols3 < 2 * E
            l3 = jnp.clip(local3, 0, E - 1)
            vals = jnp.where(
                is_sp3,
                picked_scores_grouped(sp3, l3),
                picked_scores_grouped(po3, l3),
            )
            true3 = jnp.where(is_sp3, mat_o[:, None], mat_s[:, None])
            close, greater = self._close_greater(vals, true3)
            return greater & valid3, close & valid3, is_sp3

        def counts(greater, close, is_sp3, keep=None):
            if keep is not None:
                greater &= keep
                close &= keep
            return tuple(
                jnp.maximum(raw[i] - jnp.sum(m, axis=1), 0)
                for i, m in enumerate((
                    greater & ~is_sp3, close & ~is_sp3,
                    greater & is_sp3, close & is_sp3,
                ))
            )

        for r, v in coords.items():
            if r == "_filt_union":
                cols3, infilt3 = v
                g3, c3, is3 = pick_masks(cols3)
                results["_filt"] = counts(g3, c3, is3, keep=infilt3 != 0)
                results["_filt_test"] = counts(g3, c3, is3)
            else:
                results[r] = counts(*pick_masks(v[0]))
        return results, max_diff

    def _rank_batch(self, params, s, p, o, coords):
        """Rank one batch: raw (rank, tie) counts from chunked full-vocabulary
        scores, minus gathered per-positive counts for each filtered ranking.

        ``coords`` maps ranking name -> (rows, cols) padded label coords over
        [0, 2E) (rows == n marks padding). Returns per-ranking
        (s_rank, s_ties, o_rank, o_ties) plus the consistency excess.
        """
        n = s.shape[0]
        E = self.dataset.num_entities()
        c = self.chunk_size
        num_chunks = (E + c - 1) // c
        rows_n = jnp.arange(n)

        if num_chunks == 1 and c >= E:
            grouped = self._rank_batch_grouped(params, s, p, o, coords)
            if grouped is not None:
                return grouped


        # true scores via the sp_/_po scoring path for float consistency with
        # the ranking matrix (reference eval_entity_ranking.py:186-203)
        o_true = self.model.score_sp(params, s, p, o)[rows_n, rows_n]
        s_true = self.model.score_po(params, p, o, s)[rows_n, rows_n]

        rankings = ["_raw"]
        for r in coords:
            if r == "_filt_union":
                rankings += ["_filt", "_filt_test"]
            else:
                rankings.append(r)

        def chunk_body(chunk_number, carry):
            acc, max_diff = carry
            chunk_start = chunk_number * c
            entity_subset = chunk_start + jnp.arange(c)
            valid_col = entity_subset < E

            if num_chunks == 1 and c == E:
                # full-vocabulary chunk: score the directions separately
                # (score_sp_po's [n, 2E] concat is a pure copy) and skip
                # the all-true column masking
                scores_sp = self.model.score_sp(params, s, p)
                scores_po = self.model.score_po(params, p, o)
            else:
                scores = self.model.score_sp_po(params, s, p, o, entity_subset)
                neg_inf = jnp.array(-jnp.inf, scores.dtype)
                scores_sp = jnp.where(
                    valid_col[None, :], scores[:, :c], neg_inf
                )
                scores_po = jnp.where(
                    valid_col[None, :], scores[:, c:], neg_inf
                )

            # consistency data: |chunk score at true position - true score|
            o_in = (o >= chunk_start) & (o < chunk_start + c)
            s_in = (s >= chunk_start) & (s < chunk_start + c)
            o_pos = jnp.clip(o - chunk_start, 0, c - 1)
            s_pos = jnp.clip(s - chunk_start, 0, c - 1)
            diff_o = jnp.where(
                o_in, jnp.abs(scores_sp[rows_n, o_pos] - o_true), 0.0
            )
            diff_s = jnp.where(
                s_in, jnp.abs(scores_po[rows_n, s_pos] - s_true), 0.0
            )
            ref_o = jnp.where(o_in, jnp.abs(o_true), 0.0)
            ref_s = jnp.where(s_in, jnp.abs(s_true), 0.0)
            max_diff = jnp.maximum(
                max_diff,
                jnp.maximum(
                    jnp.max(diff_o - (self.tie_atol + self.tie_rtol * ref_o)),
                    jnp.max(diff_s - (self.tie_atol + self.tie_rtol * ref_s)),
                ),
            )

            # raw counts over the chunk
            close_o, greater_o = self._close_greater(scores_sp, o_true[:, None])
            close_s, greater_s = self._close_greater(scores_po, s_true[:, None])
            out = dict(acc)
            raw = acc["_raw"]
            out["_raw"] = (
                raw[0] + jnp.sum(greater_s, axis=1),
                raw[1] + jnp.sum(close_s, axis=1),
                raw[2] + jnp.sum(greater_o, axis=1),
                raw[3] + jnp.sum(close_o, axis=1),
            )

            # filtered rankings: subtract gathered positive contributions
            def perrow_masks(cols3):
                """(greater, close, is_sp) masks for per-row label columns
                [n, kmax] in this chunk window: one bit-exact one-hot pick
                per side (no scalar gathers, no segment scatters — XLA's
                TPU gather/scatter at ~26 ns/element was 56% of eval
                device time), no [n, 2c] concat copy."""
                is_sp3 = cols3 < E
                local3 = jnp.where(
                    is_sp3, cols3 - chunk_start, cols3 - E - chunk_start
                )
                valid3 = (local3 >= 0) & (local3 < c) & (cols3 < 2 * E)
                l3 = jnp.clip(local3, 0, c - 1)
                vals = jnp.where(
                    is_sp3,
                    picked_scores(scores_sp, l3),
                    picked_scores(scores_po, l3),
                )
                true3 = jnp.where(is_sp3, o_true[:, None], s_true[:, None])
                close, greater = self._close_greater(vals, true3)
                return greater & valid3, close & valid3, is_sp3

            def perrow_update(rk, greater, close, is_sp3, keep=None):
                if keep is not None:
                    greater &= keep
                    close &= keep
                sub = acc[rk]
                out[rk] = tuple(
                    sub[i] + jnp.sum(m.astype(jnp.int32), axis=1)
                    for i, m in enumerate((
                        greater & ~is_sp3, close & ~is_sp3,
                        greater & is_sp3, close & is_sp3,
                    ))
                )

            for ranking in coords:
                if ranking == "_filt_union":
                    # one pick over the _filt_test coords; the membership
                    # mask splits the counts into both rankings
                    cols3, infilt3 = coords[ranking]
                    g3, c3, is3 = perrow_masks(cols3)
                    perrow_update("_filt", g3, c3, is3, keep=infilt3 != 0)
                    perrow_update("_filt_test", g3, c3, is3)
                    continue
                if len(coords[ranking]) == 1:
                    (cols3,) = coords[ranking]  # [n, kmax], sentinel 2E
                    perrow_update(ranking, *perrow_masks(cols3))
                    continue
                lab_rows, lab_cols = coords[ranking]
                is_sp = lab_cols < E
                local = jnp.where(
                    is_sp, lab_cols - chunk_start, lab_cols - E - chunk_start
                )
                in_window = (local >= 0) & (local < c)
                valid = in_window & (lab_rows < n)
                r_cl = jnp.clip(lab_rows, 0, n - 1)
                l_cl = jnp.clip(local, 0, c - 1)
                vals = jnp.where(
                    is_sp, scores_sp[r_cl, l_cl], scores_po[r_cl, l_cl]
                )
                true = jnp.where(is_sp, o_true[r_cl], s_true[r_cl])
                close, greater = self._close_greater(vals, true)
                close &= valid
                greater &= valid

                def seg(mask, side):
                    m = (mask & (is_sp == (side == "o"))).astype(jnp.int32)
                    return jnp.zeros(n, jnp.int32).at[r_cl].add(
                        jnp.where(valid, m, 0)
                    )

                sub = acc[ranking]
                out[ranking] = (
                    sub[0] + seg(greater, "s"),
                    sub[1] + seg(close, "s"),
                    sub[2] + seg(greater, "o"),
                    sub[3] + seg(close, "o"),
                )
            return out, max_diff

        zeros = lambda: tuple(jnp.zeros(n, jnp.int32) for _ in range(4))
        acc0 = {r: zeros() for r in rankings}
        carry0 = (acc0, jnp.array(-jnp.inf, jnp.float32))
        if num_chunks == 1:
            # common case (chunk_size covers the vocabulary): inline the
            # body — no loop machinery to compile or schedule around
            acc, max_diff = chunk_body(0, carry0)
        else:
            acc, max_diff = jax.lax.fori_loop(0, num_chunks, chunk_body, carry0)

        # final counts: filtered = raw - subtracted positives
        results = {}
        raw = acc["_raw"]
        for ranking in rankings:
            if ranking == "_raw":
                results[ranking] = raw
            else:
                sub = acc[ranking]
                results[ranking] = tuple(
                    jnp.maximum(raw[i] - sub[i], 0) for i in range(4)
                )
        return results, max_diff

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
        filter_with_test = (
            "test" not in self.filter_splits and self.filter_with_test
        )
        rankings = (
            ["_raw", "_filt", "_filt_test"] if filter_with_test
            else ["_raw", "_filt"]
        )

        num_batches = math.ceil(len(self.triples) / self.batch_size)
        self.current_trace["epoch"] = dict(
            type="entity_ranking", scope="epoch", split=self.eval_split,
            filter_splits=self.filter_splits, epoch=self.epoch,
            batches=num_batches, size=len(self.triples),
        )
        for f in self.pre_epoch_hooks:
            f(self)

        hists: Dict[str, Dict[str, np.ndarray]] = {
            r[1:] or "raw": {} for r in rankings
        }

        # host pass: pad every batch, build its label coords. The eval data
        # (triples, filter labels) is static for the job, so the collated
        # arrays are built once and reused across validation epochs — the
        # CSR label lookups dominate eval wall time otherwise (measured
        # ~25x the device time of the whole ranking program). Per-batch
        # hooks/tracing see the batches only on the building pass.
        cached = getattr(self, "_collate_cache", None)
        if cached is not None:
            batches, triples_all, coords_all = cached
            return self._evaluate_device(
                params, batches, triples_all, coords_all, rankings, hists,
                filter_with_test, epoch_start,
            )
        batches, coords_lists = [], {"_filt": []}
        if filter_with_test:
            coords_lists["_filt_test"] = []
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

            coords_lists["_filt"].append(
                self._label_coords(padded, self.filter_splits)
            )
            if filter_with_test:
                # _filt_test filters the union of filter_splits and test
                # (the reference applies test labels on top of the already
                # filtered scores, eval_entity_ranking.py:277-313)
                coords_lists["_filt_test"].append(
                    self._label_coords(padded, self.filter_splits + ["test"])
                )
            batches.append((batch, n_true, padded))

            if "batch" in self.current_trace and self.current_trace["batch"]:
                for f in self.post_batch_hooks:
                    f(self)
                self.current_trace["batch"] = None

        # stack to [B, ...] with one global coordinate cap per ranking.
        # Two device layouts (identical values, see _rank_batch):
        # - "perrow": [B, n, kmax] per-row column lists consumed by the
        #   bit-exact one-hot pick — no scalar gathers/scatters on TPU.
        #   Used when the per-row label maximum keeps the padded layout
        #   small (uniform-ish label counts).
        # - "flat": (rows, cols) coordinate pairs — compact under row skew
        #   (some queries hold thousands of answers); scalar element
        #   access per coordinate.
        triples_all = np.stack([padded for _, _, padded in batches]).astype(
            np.int32
        )
        E = self.dataset.num_entities()
        coords_all = {}
        union = None
        if filter_with_test:
            # _filt's coords are a subset of _filt_test's: one pick over
            # the union plus a membership mask serves both rankings
            union = self._perrow_union_layout(
                coords_lists["_filt"], coords_lists["_filt_test"], E
            )
        if union is not None:
            coords_all["_filt_union"] = union
            coords_lists = {}
        for r, lst in coords_lists.items():
            perrow = self._perrow_layout(lst, E)
            if perrow is not None:
                coords_all[r] = (perrow,)
                continue
            cap = _bucket(max(len(rows) for rows, _ in lst))
            rows_all = np.full((len(lst), cap), self.batch_size, dtype=np.int32)
            cols_all = np.zeros((len(lst), cap), dtype=np.int32)
            for i, (rows, cols) in enumerate(lst):
                rows_all[i, : len(rows)] = rows
                cols_all[i, : len(cols)] = cols
            coords_all[r] = (rows_all, cols_all)
        # ship once: the collate is reused across validation epochs
        coords_all = {
            r: tuple(jax.device_put(a) for a in v)
            for r, v in coords_all.items()
        }
        triples_all = jax.device_put(triples_all)
        if not self.pre_batch_hooks and not self.post_batch_hooks:
            self._collate_cache = (batches, triples_all, coords_all)
        return self._evaluate_device(
            params, batches, triples_all, coords_all, rankings, hists,
            filter_with_test, epoch_start,
        )

    # cap on the padded [B, n, kmax] per-row layout (entries); above this
    # the flat coordinate layout is smaller/faster
    _PERROW_BUDGET = 64 << 20

    def _perrow_positions(self, lst):
        """Per-batch CSR packing of flat (rows, cols) coords into per-row
        slots: yields (i, sorted_rows, sorted_cols, slot_positions), with
        the shared kmax (bucketed), or None when row skew exceeds the
        per-row budget."""
        n = self.batch_size
        kmax = 0
        for rows, _ in lst:
            if len(rows):
                kmax = max(kmax, int(np.bincount(rows, minlength=n).max()))
        kmax = max(_bucket(kmax, 32), 32)
        if len(lst) * n * kmax > self._PERROW_BUDGET:
            return None, kmax

        def packed():
            for i, (rows, cols) in enumerate(lst):
                if not len(rows):
                    continue
                order = np.argsort(rows, kind="stable")
                r_s, c_s = rows[order], cols[order]
                starts = np.concatenate(
                    [[0], np.cumsum(np.bincount(r_s, minlength=n))]
                )
                pos = np.arange(len(r_s)) - starts[r_s]
                yield i, r_s, c_s, pos

        return packed, kmax

    def _perrow_union_layout(self, filt_lst, test_lst, E):
        """(cols3, in_filt3) per-row layout of the _filt_test coords with a
        membership mask marking which also belong to _filt, or None when
        the per-row budget is exceeded."""
        n = self.batch_size
        packed, kmax = self._perrow_positions(test_lst)
        if packed is None:
            return None
        cols3 = np.full((len(test_lst), n, kmax), 2 * E, dtype=np.int32)
        infilt3 = np.zeros((len(test_lst), n, kmax), dtype=np.int32)
        for i, r_s, c_s, pos in packed():
            f_rows, f_cols = filt_lst[i]
            member = np.isin(
                r_s.astype(np.int64) * (2 * E) + c_s,
                f_rows.astype(np.int64) * (2 * E) + f_cols,
            )
            cols3[i, r_s, pos] = c_s
            infilt3[i, r_s, pos] = member
        return cols3, infilt3

    def _perrow_layout(self, lst, E):
        """[B, n, kmax] per-row label columns (sentinel 2E pads), or None
        when row skew makes the padded layout bigger than the budget."""
        n = self.batch_size
        packed, kmax = self._perrow_positions(lst)
        if packed is None:
            return None
        out = np.full((len(lst), n, kmax), 2 * E, dtype=np.int32)
        for i, r_s, c_s, pos in packed():
            out[i, r_s, pos] = c_s
        return out

    def _evaluate_device(self, params, batches, triples_all, coords_all,
                         rankings, hists, filter_with_test, epoch_start):
        """Device pass over pre-collated batches + metric assembly."""
        # single device dispatch + single fetch for the whole epoch
        results_all, max_diff_all = jax.device_get(
            self._scan_fn(params, jnp.asarray(triples_all), coords_all)
        )

        consistency_violated = False
        # ranks for all batches vectorized host-side (the hist hooks are
        # pure accumulators, so one concatenated call per ranking replaces
        # the per-batch python loop — measured ~10 ms of eval wall)
        trace_examples = self.config.get("eval.trace_level") == "example"
        cat_ranks = {}
        for r in rankings:
            res = [np.asarray(x) for x in results_all[r]]  # each [B, n]
            s_rank_all = self._final_rank(res[0], res[1])
            o_rank_all = self._final_rank(res[2], res[3])
            cat_ranks[r] = (s_rank_all, o_rank_all)

        max_diff = float(np.max(max_diff_all))
        if max_diff > 0:
            msg = (
                "Error in tie-handling: spo and sp_/_po scores differ "
                "beyond the configured tolerances "
                f"(max excess {max_diff:.3e})."
            )
            if self.config.get("entity_ranking.tie_handling.warn_only"):
                if not consistency_violated:
                    self.config.log("WARNING: " + msg)
                    consistency_violated = True
            else:
                raise ValueError(msg)

        s_cat = np.concatenate([b[:n_true, S] for b, n_true, _ in batches])
        p_cat = np.concatenate([b[:n_true, P] for b, n_true, _ in batches])
        o_cat = np.concatenate([b[:n_true, O] for b, n_true, _ in batches])
        for r in rankings:
            key = r[1:] or "raw"
            s_rank_all, o_rank_all = cat_ranks[r]
            s_ranks = np.concatenate([
                s_rank_all[i][:n_true] for i, (_, n_true, _) in enumerate(batches)
            ])
            o_ranks = np.concatenate([
                o_rank_all[i][:n_true] for i, (_, n_true, _) in enumerate(batches)
            ])
            for f in self.hist_hooks:
                f(hists[key], s_cat, p_cat, o_cat, s_ranks, o_ranks, self)

        if trace_examples:
            for i, (batch, n_true, _) in enumerate(batches):
                batch_ranks = {
                    r: (cat_ranks[r][0][i][:n_true], cat_ranks[r][1][i][:n_true])
                    for r in rankings
                }
                self._trace_examples(batch, batch_ranks, rankings)

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
