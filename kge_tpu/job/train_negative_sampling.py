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
            max_nr_of_negs = max(int(n) for n in self._sampler.num_samples)
            if self._sampler.shared:
                implementation = "batch"
            elif max_nr_of_negs <= 30:
                implementation = "triple"
            else:
                implementation = "batch"
            self.config.set(
                "negative_sampling.implementation", implementation, log=True
            )
        self._implementation = self.config.check(
            "negative_sampling.implementation", ["triple", "batch", "all"]
        )
        self.triples = self.dataset.split(self.train_split)
        self.num_examples = len(self.triples)
        self._active_slots = [
            slot for slot in (S, P, O) if self._sampler.num_samples[slot] > 0
        ]

        # on-device sampling fast path (negatives drawn inside the jitted
        # step): available when no filtering is configured
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
        if f"neg_unique_{slot}" in batch:
            # shared negatives: score against the padded unique targets
            targets = batch[f"neg_unique_{slot}"]
            all_scores = self._score_targets(params, triples, slot, targets, ctx)
            if f"neg_first_{slot}" in batch:
                # on-device shared default: substitute the spare column for
                # each row's own positive (elementwise, no lane gather)
                neg = all_scores[:, :num]
                spare = all_scores[:, num]
                first = batch[f"neg_first_{slot}"]
                has_match = batch[f"neg_hasmatch_{slot}"]
                cols = jnp.arange(num)[None, :]
                replace = (cols == first[:, None]) & has_match[:, None]
                return jnp.where(replace, spare[:, None], neg)
            if f"neg_gather_{slot}" in batch:
                gather = batch[f"neg_gather_{slot}"]
                return jnp.take_along_axis(all_scores, gather, axis=1)
            return all_scores[:, :num]
        samples = batch[f"neg_samples_{slot}"]
        if self._implementation == "triple":
            cols = [triples[:, 0:1], triples[:, 1:2], triples[:, 2:3]]
            cols[slot] = samples
            flat = [
                jnp.broadcast_to(c, (n, num)).reshape(-1) if c.shape[1] == 1
                else c.reshape(-1)
                for c in cols
            ]
            scores = self.model.score_spo(
                params, flat[0], flat[1], flat[2],
                direction=SLOT_STR[slot], ctx=ctx,
            )
            return scores.reshape(n, num)
        elif self._implementation == "all":
            all_scores = self._score_targets(params, triples, slot, None, ctx)
            return jnp.take_along_axis(all_scores, samples, axis=1)
        else:  # batch: score against all samples occurring in the batch
            targets = samples.reshape(-1)
            all_scores = self._score_targets(params, triples, slot, targets, ctx)
            cols = jnp.arange(n * num).reshape(n, num)
            return jnp.take_along_axis(all_scores, cols, axis=1)

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

    def _loss_for_batch(self, params, batch, rng):
        triples = batch["triples"]
        mask = batch["mask"]
        batch_size = batch.get("__denom__", jnp.sum(mask))
        ctx = Ctx(train=True, rng=rng, stats={})
        if self._on_device:
            batch = dict(batch)
            for slot in self._active_slots:
                batch.update(
                    self._draw_negatives_on_device(
                        triples, slot, jax.random.fold_in(rng, 1000 + slot)
                    )
                )
        total = 0.0
        aux = {}
        for i, slot in enumerate(self._active_slots):
            sctx = ctx.fold(100 + slot)
            pos = self.model.score_spo(
                params, triples[:, S], triples[:, P], triples[:, O],
                direction=SLOT_STR[slot], ctx=sctx.fold(1),
            ).reshape(-1, 1)
            neg = self._score_negatives(params, triples, slot, batch, sctx.fold(2))
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

    def _per_row_loss(self, scores, labels):
        """Row-wise loss so padded rows can be masked out; sums over columns
        within a row (consistent with the reference's sum convention).
        Scores are upcast to float32 (bf16 compute mode)."""
        scores = scores.astype(jnp.float32)
        return jax.vmap(
            lambda sc, lb: self.loss(sc[None, :], lb[None])
        )(scores, labels)
