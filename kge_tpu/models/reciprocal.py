"""Reciprocal relations meta-model.

Wraps a base model trained with 2*|R| relations: (s,p,?) queries use relation
p, (?,p,o) queries are answered as (o, p+|R|, ?) queries on the reciprocal
relation (reference kge/model/reciprocal_relations_model.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models.base import Ctx, EVAL_CTX, KgeModel, Params


class ReciprocalRelationsModel(KgeModel):
    # score_spo/score_po add |R| to the passed relation ids
    # (reciprocal_relations_model.py:85-91); localized (mini-table) batches
    # would make that arithmetic index garbage.
    supports_localized_batches = False

    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)

        # base model sees a dataset with twice the relations
        alt_dataset = dataset.shallow_copy()
        alt_dataset._num_relations = dataset.num_relations() * 2
        alt_dataset._meta = dataset._meta.copy()
        if "relation_ids" in dataset._meta:
            ids = list(dataset.relation_ids())
            alt_dataset._meta["relation_ids"] = ids + [
                rid + "_reciprocal" for rid in ids
            ]
        base_model = KgeModel.create(
            config=config,
            dataset=alt_dataset,
            configuration_key=self.configuration_key + ".base_model",
            init_for_load_only=init_for_load_only,
        )
        super().__init__(
            config=config,
            dataset=dataset,
            scorer=base_model.get_scorer(),
            create_embedders=False,
            init_for_load_only=init_for_load_only,
        )
        self._base_model = base_model
        self._entity_embedder = base_model.get_s_embedder()
        self._relation_embedder = base_model.get_p_embedder()

    def init_params(self, rng):
        return self._base_model.init_params(rng)

    def postprocess_params(self, params):
        return self._base_model.postprocess_params(params)

    def prepare_job(self, job, **kwargs):
        self._base_model.prepare_job(job, **kwargs)

    def penalty(self, params: Params, batch=None, **kwargs):
        """Base penalty; with weighted relation regularization, additionally
        penalize the reciprocal relation rows touched by the batch
        (reference reciprocal_relations_model.py:58-72)."""
        result = self._base_model.penalty(params, batch=batch, **kwargs)
        is_weighted = self.get_p_embedder().get_option("regularize_args.weighted")
        regularize = getattr(self.get_p_embedder(), "regularize", "")
        regularize_weight = self.get_p_embedder().get_option("regularize_weight")
        if is_weighted and regularize != "" and regularize_weight != 0.0 \
                and batch is not None and "triples" in batch:
            reciprocal_indexes = batch["triples"][:, 1] + self.dataset.num_relations()
            mask = batch.get("mask")
            num_rows = jnp.sum(mask) if mask is not None else None
            result += self.get_p_embedder().penalty(
                params["relation_embedder"], indexes=reciprocal_indexes,
                indexes_weight=mask, num_index_rows=num_rows, **kwargs
            )
        return result

    def score_spo(self, params, s, p, o, direction=None, ctx: Ctx = EVAL_CTX):
        if direction == "o":
            return self._base_model.score_spo(params, s, p, o, "o", ctx)
        elif direction == "s":
            return self._base_model.score_spo(
                params, o, p + self.dataset.num_relations(), s, "o", ctx
            )
        raise ValueError(
            "The reciprocal relations model cannot compute undirected spo scores."
        )

    def score_spo_neg(self, params, triples, samples, slot, ctx: Ctx = EVAL_CTX):
        import jax.numpy as jnp

        if slot == 2:  # corrupt o: base model direct
            return self._base_model.score_spo_neg(params, triples, samples, 2, ctx)
        elif slot == 0:  # corrupt s: (sample, p, o) = base (o, p+|R|, sample)
            swapped = jnp.stack(
                [triples[:, 2], triples[:, 1] + self.dataset.num_relations(),
                 triples[:, 0]], axis=1,
            )
            return self._base_model.score_spo_neg(params, swapped, samples, 2, ctx)
        raise ValueError(
            "The reciprocal relations model cannot score relations."
        )

    def score_all_grouped_multi(self, params, triples, slots,
                                ctx: Ctx = EVAL_CTX, targets=None):
        """Each slot maps to a direction-specific base query: o-corruption
        scores (s, p, ?) directly, s-corruption scores (o, p+|R|, ?); the
        per-slot positives differ accordingly (direction semantics of
        score_spo)."""
        out = {}
        for slot in slots:
            slot_targets = (
                None if targets is None or targets.get(slot) is None
                else {2: targets[slot]}
            )
            if slot == 2:
                sub = self._base_model.score_all_grouped_multi(
                    params, triples, [2], ctx.fold(20), targets=slot_targets
                )
            elif slot == 0:
                swapped = jnp.stack(
                    [triples[:, 2],
                     triples[:, 1] + self.dataset.num_relations(),
                     triples[:, 0]], axis=1,
                )
                sub = self._base_model.score_all_grouped_multi(
                    params, swapped, [2], ctx.fold(21), targets=slot_targets
                )
            else:
                return None
            if sub is None:
                return None
            out[slot] = sub[2]
        return out

    def score_slot_all_grouped(self, params, triples, slot, ctx: Ctx = EVAL_CTX):
        if slot == 2:
            return self._base_model.score_slot_all_grouped(params, triples, 2, ctx)
        if slot == 0:
            swapped = jnp.stack(
                [triples[:, 2], triples[:, 1] + self.dataset.num_relations(),
                 triples[:, 0]], axis=1,
            )
            return self._base_model.score_slot_all_grouped(params, swapped, 2, ctx)
        return None

    def score_sp(self, params, s, p, o=None, ctx: Ctx = EVAL_CTX):
        return self._base_model.score_sp(params, s, p, o, ctx)

    def score_po(self, params, p, o, s=None, ctx: Ctx = EVAL_CTX):
        return self._base_model.score_sp(
            params, o, p + self.dataset.num_relations(), s, ctx
        )

    def score_so(self, params, s, o, p=None, ctx: Ctx = EVAL_CTX):
        raise ValueError("The reciprocal relations model cannot score relations.")

    def score_sp_po(self, params, s, p, o, entity_subset=None,
                    ctx: Ctx = EVAL_CTX):
        p_inv = p + self.dataset.num_relations()
        sp_scores = self._base_model.score_sp(params, s, p, entity_subset, ctx.fold(1))
        po_scores = self._base_model.score_sp(
            params, o, p_inv, entity_subset, ctx.fold(2)
        )
        return jnp.concatenate([sp_scores, po_scores], axis=1)
