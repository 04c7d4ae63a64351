"""Negative-sampling training (reference kge/job/train_negative_sampling.py).

Per slot with num_samples > 0: scores = [positive score | negative scores],
labels = column 0, loss summed per slot and divided by batch size. Negatives
are drawn host-side by the sampler (fixed shapes, see ops/sampler.py);
scoring runs inside the jitted step using the configured implementation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.job import Job
from kge_tpu.job.train import TrainingJob
from kge_tpu.models import Ctx
from kge_tpu.ops.pick import picked_scores, picked_scores_grouped
from kge_tpu.ops.sampler import SLOT_STR, KgeSampler

S, P, O = 0, 1, 2


class TrainingJobNegativeSampling(TrainingJob):
    def __init__(self, config, dataset, parent_job=None, model=None,
                 forward_only=False):
        super().__init__(config, dataset, parent_job, model=model,
                         forward_only=forward_only)
        self._sampler = KgeSampler.create(config, "negative_sampling", dataset)
        self._sampler.seed(self._rng_seed ^ 0x7A11)
        self.type_str_value = "negative_sampling"
        # test hook: exercise the grouped-score pick path off-TPU
        self._force_grouped_all = False

        if self.__class__ == TrainingJobNegativeSampling:
            for f in Job.job_created_hooks:
                f(self)

    @property
    def type_str(self):
        return "negative_sampling"

    def _prepare_data(self):
        """Resolve the "auto" implementation heuristic
        (reference train_negative_sampling.py:35-45)."""
        self.config.log(
            "Preparing negative sampling training job with "
            "'{}' scoring function ...".format(
                self.config.get("negative_sampling.implementation")
            )
        )
        implementation = self.config.get("negative_sampling.implementation")
        if implementation == "auto":
            # Measured auto ladder (v5e, ComplEx d=512, batch 8192, 128
            # negatives, FB15k-237 shapes):
            #   pool    4.2M triples/s  (exact per-row marginals; rows of a
            #                            batch correlate through the shared
            #                            candidate pool — see the
            #                            "implementation" doc in
            #                            config-default.yaml)
            #   all     1.05M           (fully independent rows, grouped
            #                            matmul + gather-free picks; ~95%
            #                            of MXU peak — the exact-semantics
            #                            ceiling)
            #   batch   reference-dedup semantics via size-bounded
            #           jnp.unique (sampler.py:307-344 parity); shared-
            #           negatives default
            #   triple  0.25M           (per-row gathers; the only choice
            #                            when candidates must be filtered
            #                            host-side)
            # auto prefers pool where its requirements hold (no filtering,
            # on-device sampling allowed), then all under a score-matrix
            # memory gate, then triple.
            if self._sampler.shared:
                implementation = "batch"
            else:
                vocab = max(
                    (int(self._sampler.vocabulary_size[slot])
                     for slot in (S, O)
                     if self._sampler.num_samples[slot] > 0),
                    default=self.dataset.num_entities(),
                )
                # "all" reads the whole table each step, which rules out the
                # row-sparse/fused paths — don't auto-select it when the
                # config demands those.
                wants_rows_only = (
                    self.config.get("train.sparse_embedding_update") == "always"
                    or self.config.get("negative_sampling.fused_scoring")
                    == "always"
                )
                # a step holds one forward score matrix plus its backward
                # cotangent per active entity slot — size the whole step,
                # not a single matrix, against the budget
                active_entity_slots = sum(
                    1 for slot in (S, O) if self._sampler.num_samples[slot] > 0
                ) or 1
                score_matrix_bytes = (
                    4 * self.batch_size * vocab * active_entity_slots * 2
                )
                pool_ok = (
                    not self._sampler.filter_positives.any()
                    and self.config.get("negative_sampling.on_device")
                    != "never"
                    and not self.config.get("negative_sampling.auto_exact")
                )
                if pool_ok:
                    implementation = "pool"
                elif score_matrix_bytes <= (1 << 31) and not wants_rows_only:
                    implementation = "all"
                else:
                    implementation = "triple"
            self.config.set(
                "negative_sampling.implementation", implementation, log=True
            )
        self._implementation = self.config.check(
            "negative_sampling.implementation",
            ["triple", "batch", "all", "pool"],
        )
        self._pool_factor = int(self.config.get("negative_sampling.pool_factor"))
        if self._implementation == "pool":
            if self._sampler.shared:
                raise ValueError(
                    "negative_sampling.implementation=pool replaces per-row "
                    "sampling; it cannot be combined with shared negatives"
                )
            if self._sampler.filter_positives.any():
                raise ValueError(
                    "negative_sampling.implementation=pool draws candidates "
                    "on-device and cannot filter positives; use "
                    "implementation triple/all with filtering"
                )
            if self._pool_factor < 1:
                raise ValueError("negative_sampling.pool_factor must be >= 1")
        self.triples = self.dataset.split(self.train_split)
        self.num_examples = len(self.triples)
        self._active_slots = [
            slot for slot in (S, P, O) if self._sampler.num_samples[slot] > 0
        ]

        # on-device sampling fast path (negatives drawn inside the jitted
        # step): available when no filtering is configured
        fused = self.config.check(
            "negative_sampling.fused_scoring", ["auto", "always", "never"]
        )
        # measured on v5e (shared ComplEx d=512 and triple RotatE d=1024,
        # FB15k-237 shapes): with per-row negative scoring (score_spo_neg)
        # the unfused step already gathers each slot once, and the localized
        # mini-table (batch rows incl. duplicates) holds more rows than the
        # whole table at these vocabulary sizes — fused lost ~8% (shared)
        # and ~2x (triple). It remains the right shape for the row-sparse
        # update path (huge vocabularies), which localizes internally.
        self._fused = fused == "always" and self._fused_eligible()
        if fused == "always" and not self._fused:
            raise ValueError(
                "negative_sampling.fused_scoring=always requires lookup "
                "embedders, implementation != 'all', and a model without "
                "internal id arithmetic (no reciprocal wrapper)"
            )
        if self._fused:
            self.config.log("Using fused (localized single-gather) scoring")

        on_device = self.config.check(
            "negative_sampling.on_device", ["auto", "always", "never"]
        )
        filtering = bool(self._sampler.filter_positives.any())
        if on_device == "always" and filtering:
            raise ValueError(
                "negative_sampling.on_device=always is incompatible with "
                "filtering (positives lookup is host-side)"
            )
        self._on_device = (
            on_device == "always" or (on_device == "auto" and not filtering)
        )
        if self._on_device:
            self.config.log("Drawing negative samples on-device")
            if self.config.get("negative_sampling.sampling_type") == "frequency":
                import jax.numpy as jnp_

                self._device_cdf = {
                    slot: jnp_.asarray(self._sampler._cdf[slot])
                    for slot in self._active_slots
                }
            else:
                self._device_cdf = None

    def _scan_data(self):
        # scanning requires on-device sampling (no host arrays per batch)
        if not self._on_device:
            return None
        # "batch" with non-shared negatives scores an [n, n*num] matrix;
        # its scanned epoch costs ~15x more compile time (190s vs 14s) for
        # equal throughput — dispatch batch-by-batch on TPU. ("all" used to
        # be excluded too when the per-row score extraction dominated
        # either way; with the gather-free grouped pick the scanned epoch
        # removes ~1.5 ms/batch of dispatch idle — keep it scanned.)
        if (
            not self._sampler.shared
            and self._implementation == "batch"
            and jax.default_backend() == "tpu"
        ):
            return None
        return self._scan_data_triples()

    def _batches(self):
        perm = self._epoch_permutation(self.num_examples)
        bs = self.batch_size
        for start in range(0, self.num_examples, bs):
            idx = perm[start : start + bs]
            true_size = len(idx)
            triples = self.triples[idx].astype(np.int32)
            triples_padded = self._pad_batch(triples, bs)
            batch: Dict[str, np.ndarray] = {
                "triples": triples_padded,
                "mask": np.concatenate(
                    [np.ones(true_size, np.float32),
                     np.zeros(bs - true_size, np.float32)]
                ),
                "true_size": true_size,
            }
            if not self._on_device:
                for slot in self._active_slots:
                    neg = self._sampler.sample(
                        triples_padded.astype(np.int64), slot
                    )
                    if neg.kind == "plain":
                        batch[f"neg_samples_{slot}"] = neg.samples
                    else:
                        batch[f"neg_unique_{slot}"] = neg.unique_samples
                        batch[f"neg_gather_{slot}"] = neg.gather_map
            yield batch

    def _draw_negatives_on_device(self, triples, slot, rng):
        """In-jit negative sampling (uniform or frequency-based, optionally
        shared): returns entries for the batch dict mirroring the host
        sampler's fixed-shape products."""
        num = int(self._sampler.num_samples[slot])
        n = triples.shape[0]
        vocab = int(self._sampler.vocabulary_size[slot])

        def draw(key, shape):
            if self._device_cdf is not None:
                u = jax.random.uniform(key, shape)
                return jnp.searchsorted(self._device_cdf[slot], u).astype(
                    jnp.int32
                )
            return jax.random.randint(key, shape, 0, vocab, dtype=jnp.int32)

        if self._implementation == "pool" and not self._sampler.shared:
            # Group-structured pool: P = num * pool_factor iid candidates;
            # each row independently picks one slot per group of
            # pool_factor. Chosen slots are distinct by construction and
            # the pool is iid, so every row's num negatives are exactly
            # iid draws from the sampling distribution (rows correlate
            # only through the shared pool). Scoring then needs one
            # [n, P] matmul plus an m-way select — no per-row gather,
            # which XLA serializes on TPU.
            kp, kr = jax.random.split(rng)
            pool = draw(kp, (num * self._pool_factor,))
            sel = jax.random.randint(
                kr, (n, num), 0, self._pool_factor, dtype=jnp.int32
            )
            return {f"neg_pool_{slot}": pool, f"neg_sel_{slot}": sel}

        if not self._sampler.shared:
            return {f"neg_samples_{slot}": draw(rng, (n, num))}

        # shared: one sample row for the whole batch (with-replacement; the
        # reference's WOR+upsampling construction is distributionally the
        # same, sampler.py:596-658). For shared_type=default, one spare is
        # drawn and each row's own positive (first match) is replaced by it.
        # The replacement is expressed as an elementwise substitution of the
        # spare score column — NOT a per-row column gather, which hits the
        # TPU cross-lane-gather slow path.
        sample = draw(rng, (num + 1,))
        out = {f"neg_unique_{slot}": sample}
        if self._sampler.shared_type == "default":
            pos = triples[:, slot]
            matches = sample[None, :num] == pos[:, None]
            has_match = matches.any(axis=1)
            first = jnp.argmax(matches, axis=1)
            out[f"neg_first_{slot}"] = first
            out[f"neg_hasmatch_{slot}"] = has_match
        return out

    def _score_negatives(self, params, triples, slot, batch, ctx: Ctx):
        """Score the negatives of one slot -> [n, num] (in-jit; static
        implementation choice, reference sampler.py:263-356)."""
        num = int(self._sampler.num_samples[slot])
        n = triples.shape[0]
        if f"neg_pool_{slot}" in batch:
            # pool implementation: score the pool once, then each row
            # selects its slot within every group of pool_factor columns
            # (an elementwise one-hot contraction — no cross-lane gather)
            pool = batch[f"neg_pool_{slot}"]
            sel = batch[f"neg_sel_{slot}"]
            if getattr(
                getattr(self.model, "_scorer", None),
                "pairwise_many_targets", False,
            ):
                # distance models: the [n, P] matmul form is a pairwise
                # reduction; gather candidates from the pool mini-table
                # and score per row instead
                return self.model.score_spo_neg_pooled(
                    params, triples, pool, sel, self._pool_factor, slot, ctx
                )
            return self._neg_from_pool_scores(
                self._score_targets(params, triples, slot, pool, ctx),
                batch, slot, num,
            )
        if f"neg_unique_{slot}" in batch:
            # shared negatives: score against the padded unique targets
            targets = batch[f"neg_unique_{slot}"]
            all_scores = self._score_targets(params, triples, slot, targets, ctx)
            return self._neg_from_unique_scores(all_scores, batch, slot, num)
        samples = batch[f"neg_samples_{slot}"]
        if self._implementation == "triple":
            # per-row scoring: kept slots embedded once per row, only the
            # corrupted slot gathers n*num table rows
            return self.model.score_spo_neg(params, triples, samples, slot, ctx)
        elif self._implementation == "all":
            if jax.default_backend() == "tpu" or self._force_grouped_all:
                # grouped layout: the all-candidates matmul emits scores
                # directly in the [n, G, 128] tiling the pick consumes
                grouped = self.model.score_slot_all_grouped(
                    params, triples, slot, ctx
                )
                if grouped is not None:
                    return picked_scores_grouped(grouped, samples)
            all_scores = self._score_targets(params, triples, slot, None, ctx)
            return picked_scores(all_scores, samples)
        else:
            # batch: score against the DISTINCT targets occurring in the
            # batch, then pick each row's own columns — the reference's
            # dedup semantics (kge/util/sampler.py:307-344) under static
            # shapes via size-bounded jnp.unique (the unique count is
            # capped by min(n*num, vocab); padding slots repeat target 0,
            # whose scores are computed but never picked)
            flat = samples.reshape(-1)
            if batch.get("__localized__"):
                # localized (mini-table) batches: sample ids are already
                # distinct arange positions, and the id space is the
                # mini-table, not the vocabulary — dedup is an identity
                all_scores = self._score_targets(
                    params, triples, slot, flat, ctx
                )
                cols = jnp.arange(n * num).reshape(n, num)
                return picked_scores(all_scores, cols)
            vocab = int(self._sampler.vocabulary_size[slot])
            uniq, inv = jnp.unique(
                flat, size=min(flat.shape[0], vocab), fill_value=0,
                return_inverse=True,
            )
            all_scores = self._score_targets(params, triples, slot, uniq, ctx)
            return picked_scores(all_scores, inv.reshape(n, num))

    def _grouped_multi_eligible(self) -> bool:
        """The embed-once grouped path draws embedding dropout once per
        slot instead of once per scoring call; engage it only when no
        embedder dropout is configured (per-call-draw parity otherwise)."""
        if not (jax.default_backend() == "tpu" or self._force_grouped_all):
            return False
        if getattr(self, "_grouped_multi_ok", None) is None:
            self._grouped_multi_ok = all(
                getattr(emb, "dropout", 0.0) == 0.0
                for emb in (
                    self.model._entity_embedder, self.model._relation_embedder
                )
            )
        return self._grouped_multi_ok

    def _neg_from_pool_scores(self, pool_scores, batch, slot, num):
        """[n, num] negatives from the [n, num*pool_factor] pool score
        matrix: each row selects its slot within every group of
        pool_factor columns (elementwise one-hot contraction)."""
        n = pool_scores.shape[0]
        sel = batch[f"neg_sel_{slot}"]
        pool_scores = pool_scores.reshape(n, num, self._pool_factor)
        one_hot = jax.nn.one_hot(
            sel, self._pool_factor, dtype=pool_scores.dtype
        )
        return jnp.sum(pool_scores * one_hot, axis=2)

    def _neg_from_unique_scores(self, all_scores, batch, slot, num):
        """[n, num] negative scores from the [n, num(+spares)] unique-target
        score matrix: on-device shared default substitutes the spare column
        for each row's own positive (elementwise, no lane gather); the
        host sampler's WOR construction provides an explicit gather map."""
        if f"neg_first_{slot}" in batch:
            neg = all_scores[:, :num]
            spare = all_scores[:, num]
            first = batch[f"neg_first_{slot}"]
            has_match = batch[f"neg_hasmatch_{slot}"]
            cols = jnp.arange(num)[None, :]
            replace = (cols == first[:, None]) & has_match[:, None]
            return jnp.where(replace, spare[:, None], neg)
        if f"neg_gather_{slot}" in batch:
            return picked_scores(all_scores, batch[f"neg_gather_{slot}"])
        return all_scores[:, :num]

    def _score_targets(self, params, triples, slot, targets, ctx: Ctx):
        if slot == S:
            return self.model.score_po(
                params, triples[:, P], triples[:, O], targets, ctx
            )
        elif slot == P:
            return self.model.score_so(
                params, triples[:, S], triples[:, O], targets, ctx
            )
        else:
            return self.model.score_sp(
                params, triples[:, S], triples[:, P], targets, ctx
            )

    def _fused_eligible(self) -> bool:
        """The fused path rewrites each batch to "localized" ids over
        mini-tables gathered once (_localize_batch): autodiff then emits a
        single table-sized scatter-add per table instead of one per
        embed() call — the dominant HBM traffic of a step. Exact for any
        optimizer/penalty/dropout (penalties run on the dense tables in the
        step builder; dropout draws depend only on rng and shape)."""
        from kge_tpu.models.base import LookupEmbedder

        if self._implementation == "all":
            return False  # full-vocabulary scoring reads the whole table
        if not getattr(self.model, "supports_localized_batches", True):
            return False
        for emb in (self.model._entity_embedder, self.model._relation_embedder):
            if type(emb) is not LookupEmbedder:
                return False
        params = self.model_params
        return (
            isinstance(params, dict)
            and "entity_embedder" in params
            and "relation_embedder" in params
            and "embeddings" in params["entity_embedder"]
            and "embeddings" in params["relation_embedder"]
        )

    def _loss_for_batch(self, params, batch, rng, _localized=False):
        if self._fused and not _localized:
            batch, ent_ids, rel_ids = self._localize_batch(
                batch, batch["triples"], rng
            )
            params = dict(params)
            params["entity_embedder"] = {
                **params["entity_embedder"],
                "embeddings": params["entity_embedder"]["embeddings"][ent_ids],
            }
            params["relation_embedder"] = {
                **params["relation_embedder"],
                "embeddings": params["relation_embedder"]["embeddings"][rel_ids],
            }
            _localized = True
        triples = batch["triples"]
        mask = batch["mask"]
        batch_size = batch.get("__denom__", jnp.sum(mask))
        ctx = Ctx(train=True, rng=rng, stats={})
        if self._on_device and not _localized:
            batch = dict(batch)
            for slot in self._active_slots:
                if (
                    f"neg_unique_{slot}" in batch
                    or f"neg_samples_{slot}" in batch
                    or f"neg_pool_{slot}" in batch
                ):
                    continue  # pre-drawn (sparse-update step)
                batch.update(
                    self._draw_negatives_on_device(
                        triples, slot, jax.random.fold_in(rng, 1000 + slot)
                    )
                )
        total = 0.0
        aux = {}
        grouped_multi = None
        multi_shared = False
        if self._grouped_multi_eligible():
            if self._implementation == "all" and all(
                f"neg_samples_{slot}" in batch for slot in self._active_slots
            ):
                # embed-once fast path: positives and every slot's grouped
                # all-candidate scores from one embedding of the batch rows
                grouped_multi = self.model.score_all_grouped_multi(
                    params, triples, self._active_slots, ctx.fold(7)
                )
            elif self._sampler.shared and all(
                f"neg_unique_{slot}" in batch for slot in self._active_slots
            ):
                # shared negatives: same embed-once trick with the unique
                # sample rows as targets (the scatter-adds of repeated
                # embeds were ~46% of this step's device time; measured
                # 2.36M -> 4.45M triples/s on v5e at the headline shapes)
                grouped_multi = self.model.score_all_grouped_multi(
                    params, triples, self._active_slots, ctx.fold(7),
                    targets={
                        slot: batch[f"neg_unique_{slot}"]
                        for slot in self._active_slots
                    },
                )
                multi_shared = grouped_multi is not None
            elif self._implementation == "pool" and all(
                f"neg_pool_{slot}" in batch for slot in self._active_slots
            ):
                # pooled negatives: targets are the per-slot candidate pools
                grouped_multi = self.model.score_all_grouped_multi(
                    params, triples, self._active_slots, ctx.fold(7),
                    targets={
                        slot: batch[f"neg_pool_{slot}"]
                        for slot in self._active_slots
                    },
                )
                multi_shared = grouped_multi is not None
        for i, slot in enumerate(self._active_slots):
            sctx = ctx.fold(100 + slot)
            if multi_shared:
                pos_flat, all_scores = grouped_multi[slot]
                pos = pos_flat.reshape(-1, 1)
                num = int(self._sampler.num_samples[slot])
                if f"neg_pool_{slot}" in batch:
                    neg = self._neg_from_pool_scores(all_scores, batch, slot, num)
                else:
                    neg = self._neg_from_unique_scores(
                        all_scores, batch, slot, num
                    )
            elif grouped_multi is not None:
                pos_flat, S3 = grouped_multi[slot]
                pos = pos_flat.reshape(-1, 1)
                neg = picked_scores_grouped(
                    S3, batch[f"neg_samples_{slot}"]
                )
            else:
                pos = self.model.score_spo(
                    params, triples[:, S], triples[:, P], triples[:, O],
                    direction=SLOT_STR[slot], ctx=sctx.fold(1),
                ).reshape(-1, 1)
                neg = self._score_negatives(
                    params, triples, slot, batch, sctx.fold(2)
                )
            scores = jnp.concatenate([pos, neg], axis=1)
            labels = jnp.zeros(scores.shape[0], dtype=jnp.int32)
            # mask padded rows by neutralizing their scores (0 loss rows would
            # still contribute for some losses, so weight per-row)
            per_row = self._per_row_loss(scores, labels)
            loss_value = jnp.sum(per_row * mask) / batch_size
            total = total + loss_value
            aux[f"avg_loss_{SLOT_STR[slot]}"] = loss_value
        aux["stats"] = ctx.stats
        return total, aux

    # -- batch localization (shared by the fused and sparse-update paths) --------

    def _localize_batch(self, batch, triples, rng):
        """Pre-draw negatives, collect the global row ids the batch touches
        (in a fixed order), and rewrite the batch to mini-table positions.
        Returns (local_batch, ent_ids, rel_ids); gathering the tables at
        those ids yields mini-tables the rewritten batch indexes exactly."""
        n = triples.shape[0]
        batch = dict(batch)
        if self._on_device:
            for slot in self._active_slots:
                if (
                    f"neg_unique_{slot}" in batch
                    or f"neg_samples_{slot}" in batch
                    or f"neg_pool_{slot}" in batch
                ):
                    continue  # drawn by the caller / host sampler
                batch.update(
                    self._draw_negatives_on_device(
                        triples, slot, jax.random.fold_in(rng, 1000 + slot)
                    )
                )
        ent_ids = [triples[:, S], triples[:, O]]
        rel_ids = [triples[:, P]]
        local_triples = [
            jnp.arange(n, dtype=triples.dtype),        # s -> [0, n)
            jnp.arange(n, dtype=triples.dtype),        # p -> [0, n) (rel)
            n + jnp.arange(n, dtype=triples.dtype),    # o -> [n, 2n)
        ]
        ent_off, rel_off = 2 * n, n
        for slot in self._active_slots:
            is_rel = slot == P
            ids, off = (rel_ids, rel_off) if is_rel else (ent_ids, ent_off)
            ukey, skey = f"neg_unique_{slot}", f"neg_samples_{slot}"
            pkey = f"neg_pool_{slot}"
            if pkey in batch:
                # pool candidates localize like a shared unique list; the
                # per-row slot selection (neg_sel) is pool-relative and
                # needs no rewrite
                arr = batch[pkey]
                ids.append(arr)
                batch[pkey] = off + jnp.arange(arr.shape[0], dtype=arr.dtype)
                off += arr.shape[0]
            elif ukey in batch:
                arr = batch[ukey]
                ids.append(arr)
                batch[ukey] = off + jnp.arange(arr.shape[0], dtype=arr.dtype)
                off += arr.shape[0]
            elif skey in batch:
                arr = batch[skey]
                ids.append(arr.reshape(-1))
                batch[skey] = off + jnp.arange(
                    arr.size, dtype=arr.dtype
                ).reshape(arr.shape)
                off += arr.size
            if is_rel:
                rel_off = off
            else:
                ent_off = off
        batch["triples"] = jnp.stack(local_triples, axis=1)
        batch["__localized__"] = True  # ids are mini-table positions now
        return (
            batch,
            jnp.concatenate([a.reshape(-1) for a in ent_ids]),
            jnp.concatenate([a.reshape(-1) for a in rel_ids]),
        )

    # -- sparse embedding update -------------------------------------------------

    def _sparse_update_eligible(self) -> bool:
        """Row-sparse table updates are exact when: the optimizer rule has
        zero-gradient fixed points (Adagrad/plain SGD, no weight decay), no
        penalty term touches whole tables, tables are not re-normalized
        after each step, and scoring never consumes the full vocabulary
        (implementation != "all"). In "auto" mode the path activates when
        the vocabulary is much larger than the rows a batch touches — that
        is where dense updates dominate the step (e.g. Wikidata5M-scale)."""
        mode = self.config.check(
            "train.sparse_embedding_update", ["auto", "never", "always"]
        )
        if mode == "never" or self.is_forward_only:
            return False
        if self._implementation == "all":
            return False
        if self._subbatch_size > 0:
            return False
        # models with scorer parameters (ConvE, Transformer, TransH) may
        # collect batch-norm stats or dense scorer grads; keep those on the
        # standard step
        if self.model_params.get("scorer"):
            return False
        # models with internal id arithmetic (reciprocal wrapper) cannot
        # consume localized batches
        if not getattr(self.model, "supports_localized_batches", True):
            return False
        params = self.model_params
        if not (
            isinstance(params, dict)
            and "entity_embedder" in params
            and "relation_embedder" in params
            and "embeddings" in params["entity_embedder"]
            and "embeddings" in params["relation_embedder"]
        ):
            return False
        from kge_tpu.models.base import LookupEmbedder

        for emb in (self.model._entity_embedder, self.model._relation_embedder):
            if type(emb) is not LookupEmbedder:
                return False
            if emb.normalize_p > 0:
                return False
        # whole-table penalties (unweighted lp/n3) make gradients dense
        dummy = {"triples": jnp.zeros((2, 3), jnp.int32),
                 "mask": jnp.ones(2, jnp.float32)}
        if self.model.penalty(params, batch=dummy, epoch=1):
            return False
        self._ent_leaf = self.optimizer.leaf_index(
            params, "entity_embedder", "embeddings"
        )
        self._rel_leaf = self.optimizer.leaf_index(
            params, "relation_embedder", "embeddings"
        )
        if self._ent_leaf is None or self._rel_leaf is None:
            return False
        # every table leaf needs either the pure row path (zero-gradient
        # rows are fixed points: Adagrad/plain SGD) or the fused
        # dense-semantics kernel (any rule: Adam, weight decay, ...)
        for leaf in (self._ent_leaf, self._rel_leaf):
            if not (
                self.optimizer.supports_sparse_rows(leaf)
                or self.optimizer.supports_fused_rows(leaf)
            ):
                return False
        if mode == "always":
            return True
        # auto: worthwhile when the batch touches <= 1/8 of the entity table
        rows_per_batch = 2 * self.batch_size
        for slot in self._active_slots:
            num = int(self._sampler.num_samples[slot])
            if self._sampler.shared:
                rows_per_batch += num + 1
            elif self._implementation == "pool":
                rows_per_batch += num * self._pool_factor
            else:
                rows_per_batch += self.batch_size * num
        return self.dataset.num_entities() >= 8 * rows_per_batch

    def _build_step_fn(self):
        super()._build_step_fn()
        self._sparse_update = self._sparse_update_eligible()
        if not self._sparse_update:
            return
        fused_leaves = [
            leaf for leaf in (self._ent_leaf, self._rel_leaf)
            if not self.optimizer.supports_sparse_rows(leaf)
        ]
        self.config.log(
            "Using row-sparse embedding updates "
            + ("(fused dense-semantics kernel)" if fused_leaves
               else "(exact for this optimizer)")
        )
        self._raw_step = self._make_sparse_step()
        donate = (0, 1) if not self.is_forward_only else ()
        self._jitted_step = jax.jit(self._raw_step, donate_argnums=donate)

    def _make_sparse_step(self):
        """Train step that never materializes table-sized gradients: the
        loss is computed on gathered "mini-tables" whose rows are exactly
        the ones the batch touches (positions are static, so the batch's
        indexes localize to arange offsets), and the optimizer applies
        exact row-sparse updates to the real tables."""
        def loss_fn(ent_rows, rel_rows, params_stub, batch, rng):
            params = dict(params_stub)
            params["entity_embedder"] = {
                **params_stub["entity_embedder"], "embeddings": ent_rows
            }
            params["relation_embedder"] = {
                **params_stub["relation_embedder"], "embeddings": rel_rows
            }
            loss_value, aux = self._loss_for_batch(
                params, batch, rng, _localized=True
            )
            aux = dict(aux)
            aux["avg_loss"] = loss_value
            aux["penalties"] = {}
            aux.pop("stats", None)
            return loss_value, aux

        def train_step(params, opt_state, batch, rng, lr):
            triples = batch["triples"]
            local_batch, ent_ids, rel_ids = self._localize_batch(
                batch, triples, rng
            )
            ent_rows = params["entity_embedder"]["embeddings"][ent_ids]
            rel_rows = params["relation_embedder"]["embeddings"][rel_ids]
            # zero-size stubs so no table-shaped cotangent exists anywhere
            stub = dict(params)
            stub["entity_embedder"] = {
                **params["entity_embedder"],
                "embeddings": jnp.zeros(
                    (0,) + params["entity_embedder"]["embeddings"].shape[1:],
                    params["entity_embedder"]["embeddings"].dtype,
                ),
            }
            stub["relation_embedder"] = {
                **params["relation_embedder"],
                "embeddings": jnp.zeros(
                    (0,) + params["relation_embedder"]["embeddings"].shape[1:],
                    params["relation_embedder"]["embeddings"].dtype,
                ),
            }
            (cost, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True
            )(ent_rows, rel_rows, stub, local_batch, rng)
            g_ent_rows, g_rel_rows, g_stub = grads
            new_params, new_opt_state = (
                self.optimizer.update_with_sparse_leaves(
                    g_stub, opt_state, params, lr,
                    sparse={
                        self._ent_leaf: (ent_ids, g_ent_rows),
                        self._rel_leaf: (rel_ids, g_rel_rows),
                    },
                )
            )
            new_params = self.model.postprocess_params(new_params)
            return new_params, new_opt_state, cost, aux

        return train_step

    def _per_row_loss(self, scores, labels):
        """Row-wise loss so padded rows can be masked out; sums over columns
        within a row (consistent with the reference's sum convention).
        Scores are upcast to float32 (bf16 compute mode)."""
        scores = scores.astype(jnp.float32)
        return jax.vmap(
            lambda sc, lb: self.loss(sc[None, :], lb[None])
        )(scores, labels)
