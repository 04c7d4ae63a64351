"""1vsAll training (reference kge/job/train_1vsAll.py).

Each triple is scored against all subject- and all object-corruptions; the
loss is cross entropy against the true index in both directions. On TPU this
is two [batch, |E|] matmuls per step — the ideal MXU shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from kge_tpu.job.job import Job
from kge_tpu.job.train import TrainingJob
from kge_tpu.models import Ctx

S, P, O = 0, 1, 2


class TrainingJob1vsAll(TrainingJob):
    def __init__(self, config, dataset, parent_job=None, model=None,
                 forward_only=False):
        super().__init__(config, dataset, parent_job, model=model,
                         forward_only=forward_only)
        self.config.log("Initializing 1vsAll training job...")
        if self.__class__ == TrainingJob1vsAll:
            for f in Job.job_created_hooks:
                f(self)

    @property
    def type_str(self):
        return "1vsAll"

    def _prepare_data(self):
        self.triples = self.dataset.split(self.train_split)
        self.num_examples = len(self.triples)

    def _scan_data(self):
        return self._scan_data_triples()

    def _batches(self):
        perm = self._epoch_permutation(self.num_examples)
        bs = self.batch_size
        for start in range(0, self.num_examples, bs):
            idx = perm[start : start + bs]
            true_size = len(idx)
            triples = self._pad_batch(self.triples[idx].astype(np.int64), bs)
            yield {
                "triples": triples,
                "mask": np.concatenate(
                    [np.ones(true_size, np.float32),
                     np.zeros(bs - true_size, np.float32)]
                ),
                "true_size": true_size,
            }

    def _loss_for_batch(self, params, batch, rng):
        triples = batch["triples"]
        mask = batch["mask"]
        batch_size = batch.get("__denom__", jnp.sum(mask))
        ctx = Ctx(train=True, rng=rng, stats={})

        # object direction: score (s, p, ?) against all entities
        sp_scores = self.model.score_sp(
            params, triples[:, S], triples[:, P], ctx=ctx.fold(1)
        )
        loss_o = self._row_ce(sp_scores, triples[:, O], mask) / batch_size

        # subject direction: score (?, p, o) against all entities
        po_scores = self.model.score_po(
            params, triples[:, P], triples[:, O], ctx=ctx.fold(2)
        )
        loss_s = self._row_ce(po_scores, triples[:, S], mask) / batch_size

        aux = {
            "avg_loss_o": loss_o,
            "avg_loss_s": loss_s,
            "stats": ctx.stats,
        }
        return loss_o + loss_s, aux

    def _row_ce(self, scores, labels, mask):
        import jax

        per_row = jax.vmap(
            lambda sc, lb: self.loss(sc[None, :], lb[None])
        )(scores.astype(jnp.float32), labels)
        return jnp.sum(per_row * mask)
