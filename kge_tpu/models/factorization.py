"""Factorization-family scorers: DistMult, ComplEx, RESCAL, CP, SimplE,
RelationalTucker3.

All combines reduce to one fused elementwise + matmul per query batch, which
XLA maps directly onto the MXU. Scoring semantics match the reference
(kge/model/{distmult,complex,rescal,cp,simple,relational_tucker3}.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models.base import Ctx, KgeModel, Params, RelationalScorer


def _neg_dot(query, candidates):
    """[n, k] scores: per-row dot of a query [n, d] with that row's k
    candidate embeddings [n, k, d]. One contraction — no [n*k, d]
    materialization (the generic fallback's broadcast, base.py:243, OOMs
    at FB15k-237 scale: 8192*128 rows)."""
    return jnp.einsum("nkd,nd->nk", candidates, query)


class DistMultScorer(RelationalScorer):
    """score = sum(s * p * o) (reference distmult.py:13-25)."""

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = s_emb.shape[0] if combine == "s_o" else p_emb.shape[0]
        if combine == "spo":
            out = jnp.sum(s_emb * p_emb * o_emb, axis=1)
        elif combine == "sp_":
            out = (s_emb * p_emb) @ o_emb.T
        elif combine == "_po":
            out = (o_emb * p_emb) @ s_emb.T
        elif combine == "s_o":
            out = (s_emb * o_emb) @ p_emb.T
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 0:
            return _neg_dot(o_emb * p_emb, s_emb)
        if slot == 1:
            return _neg_dot(s_emb * o_emb, p_emb)
        return _neg_dot(s_emb * p_emb, o_emb)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 0:
            return o_emb * p_emb, None
        if slot == 1:
            return s_emb * o_emb, None
        return s_emb * p_emb, None


class DistMult(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(
            config=config, dataset=dataset, scorer=DistMultScorer,
            configuration_key=configuration_key,
            init_for_load_only=init_for_load_only,
        )


class ComplExScorer(RelationalScorer):
    """score = Re(<s, p, conj(o)>) over complex embeddings stored [re | im].

    Every combine is expressed as one elementwise product followed by a
    single matmul (the "block trick" of the reference complex.py:18-44).
    """

    @staticmethod
    def _split(emb):
        return jnp.split(emb, 2, axis=1)

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = s_emb.shape[0] if combine == "s_o" else p_emb.shape[0]
        s_re, s_im = self._split(s_emb)
        p_re, p_im = self._split(p_emb)
        o_re, o_im = self._split(o_emb)

        if combine == "spo":
            out = jnp.sum(
                (s_re * p_re - s_im * p_im) * o_re
                + (s_re * p_im + s_im * p_re) * o_im,
                axis=1,
            )
        elif combine == "sp_":
            # u = s*p (complex); score(o) = u_re . o_re + u_im . o_im
            u_re = s_re * p_re - s_im * p_im
            u_im = s_re * p_im + s_im * p_re
            out = jnp.concatenate([u_re, u_im], axis=1) @ o_emb.T
        elif combine == "_po":
            # w = p*conj(o); score(s) = s_re . w_re - s_im . w_im
            w_re = p_re * o_re + p_im * o_im
            w_im = p_im * o_re - p_re * o_im
            out = jnp.concatenate([w_re, -w_im], axis=1) @ s_emb.T
        elif combine == "s_o":
            # score(p) = p_re . (s_re*o_re + s_im*o_im) + p_im . (s_re*o_im - s_im*o_re)
            v_re = s_re * o_re + s_im * o_im
            v_im = s_re * o_im - s_im * o_re
            out = jnp.concatenate([v_re, v_im], axis=1) @ p_emb.T
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # the slot-specific complex query (same algebra as sp_/_po/s_o)
        # dotted against each row's candidates in one contraction
        if slot == 0:
            p_re, p_im = self._split(p_emb)
            o_re, o_im = self._split(o_emb)
            w_re = p_re * o_re + p_im * o_im
            w_im = p_im * o_re - p_re * o_im
            return _neg_dot(jnp.concatenate([w_re, -w_im], axis=1), s_emb)
        if slot == 1:
            s_re, s_im = self._split(s_emb)
            o_re, o_im = self._split(o_emb)
            v_re = s_re * o_re + s_im * o_im
            v_im = s_re * o_im - s_im * o_re
            return _neg_dot(jnp.concatenate([v_re, v_im], axis=1), p_emb)
        s_re, s_im = self._split(s_emb)
        p_re, p_im = self._split(p_emb)
        u_re = s_re * p_re - s_im * p_im
        u_im = s_re * p_im + s_im * p_re
        return _neg_dot(jnp.concatenate([u_re, u_im], axis=1), o_emb)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 0:
            p_re, p_im = self._split(p_emb)
            o_re, o_im = self._split(o_emb)
            w_re = p_re * o_re + p_im * o_im
            w_im = p_im * o_re - p_re * o_im
            return jnp.concatenate([w_re, -w_im], axis=1), None
        if slot == 1:
            s_re, s_im = self._split(s_emb)
            o_re, o_im = self._split(o_emb)
            v_re = s_re * o_re + s_im * o_im
            v_im = s_re * o_im - s_im * o_re
            return jnp.concatenate([v_re, v_im], axis=1), None
        s_re, s_im = self._split(s_emb)
        p_re, p_im = self._split(p_emb)
        u_re = s_re * p_re - s_im * p_im
        u_im = s_re * p_im + s_im * p_re
        return jnp.concatenate([u_re, u_im], axis=1), None


class ComplEx(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(
            config=config, dataset=dataset, scorer=ComplExScorer,
            configuration_key=configuration_key,
            init_for_load_only=init_for_load_only,
        )


class RescalScorer(RelationalScorer):
    """score = s^T M_p o with M_p the d x d reshape of the relation embedding
    (reference rescal.py:23-50)."""

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = s_emb.shape[0] if combine == "s_o" else p_emb.shape[0]
        ent_dim = s_emb.shape[1]
        p_mix = p_emb.reshape(-1, ent_dim, ent_dim)

        if combine == "spo":
            out = jnp.einsum("nd,nde,ne->n", s_emb, p_mix, o_emb)
        elif combine == "sp_":
            out = jnp.einsum("nd,nde->ne", s_emb, p_mix) @ o_emb.T
        elif combine == "_po":
            out = jnp.einsum("nde,ne->nd", p_mix, o_emb) @ s_emb.T
        elif combine == "s_o":
            # score(p) = vec(s o^T) . vec(M_p) with M_p row-major [d, e]
            pairwise = jnp.einsum("nd,ne->nde", s_emb, o_emb).reshape(n, -1)
            out = pairwise @ p_emb.T
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        ent_dim = (o_emb if slot == 0 else s_emb).shape[-1]
        if slot == 1:
            pairwise = jnp.einsum("nd,ne->nde", s_emb, o_emb)
            return _neg_dot(pairwise.reshape(s_emb.shape[0], -1), p_emb)
        p_mix = p_emb.reshape(-1, ent_dim, ent_dim)
        if slot == 0:
            return _neg_dot(jnp.einsum("nde,ne->nd", p_mix, o_emb), s_emb)
        return _neg_dot(jnp.einsum("nd,nde->ne", s_emb, p_mix), o_emb)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 1:
            pairwise = jnp.einsum("nd,ne->nde", s_emb, o_emb)
            return pairwise.reshape(s_emb.shape[0], -1), None
        ent_dim = (o_emb if slot == 0 else s_emb).shape[-1]
        p_mix = p_emb.reshape(-1, ent_dim, ent_dim)
        if slot == 0:
            return jnp.einsum("nde,ne->nd", p_mix, o_emb), None
        return jnp.einsum("nd,nde->ne", s_emb, p_mix), None


def _set_relation_dim_to_square(config: Config, model_self) -> None:
    """relation_embedder.dim = entity_dim^2 (reference rescal.py:81-95)."""
    rel_key = model_self.configuration_key + ".relation_embedder"
    dim = config.get_default(rel_key + ".dim")
    if dim < 0:
        ent_dim = config.get_default(
            model_self.configuration_key + ".entity_embedder.dim"
        )
        config.set(rel_key + ".dim", ent_dim ** 2, create=True, log=True)


class Rescal(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        _set_relation_dim_to_square(config, self)
        super().__init__(
            config=config, dataset=dataset, scorer=RescalScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )


class CPScorer(RelationalScorer):
    """Canonical Polyadic: subject uses the first half of the entity
    embedding, object the second half (reference cp.py:15-28)."""

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        half = s_emb.shape[1] // 2
        s_h = s_emb[:, :half]
        o_t = o_emb[:, half:]

        if combine == "spo":
            out = jnp.sum(s_h * p_emb * o_t, axis=1)
        elif combine == "sp_":
            out = (s_h * p_emb) @ o_t.T
        elif combine == "_po":
            out = (o_t * p_emb) @ s_h.T
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        half = (o_emb if slot == 0 else s_emb).shape[-1] // 2
        if slot == 0:
            return _neg_dot(o_emb[:, half:] * p_emb, s_emb[:, :, :half])
        if slot == 1:
            return _neg_dot(s_emb[:, :half] * o_emb[:, half:], p_emb)
        return _neg_dot(s_emb[:, :half] * p_emb, o_emb[:, :, half:])

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 0:
            half = o_emb.shape[-1] // 2
            return o_emb[:, half:] * p_emb, lambda t: t[:, : t.shape[-1] // 2]
        if slot == 1:
            half = s_emb.shape[-1] // 2
            return s_emb[:, :half] * o_emb[:, half:], None
        half = s_emb.shape[-1] // 2
        return s_emb[:, :half] * p_emb, lambda t: t[:, t.shape[-1] // 2:]


class CP(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError(
                "CP requires embeddings of even dimensionality (got {})".format(
                    self.get_option("entity_embedder.dim")
                )
            )
        if self.get_option("relation_embedder.dim") < 0:
            self.set_option(
                "relation_embedder.dim",
                self.get_option("entity_embedder.dim") // 2,
                log=True,
            )
        super().__init__(
            config=config, dataset=dataset, scorer=CPScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )


class SimplEScorer(RelationalScorer):
    """Average of forward and backward CP scores (reference simple.py:13-33)."""

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        s_h, s_t = jnp.split(s_emb, 2, axis=1)
        p_fwd, p_bwd = jnp.split(p_emb, 2, axis=1)
        o_h, o_t = jnp.split(o_emb, 2, axis=1)

        if combine == "spo":
            out1 = jnp.sum(s_h * p_fwd * o_t, axis=1)
            out2 = jnp.sum(s_t * p_bwd * o_h, axis=1)
        elif combine == "sp_":
            out1 = (s_h * p_fwd) @ o_t.T
            out2 = (s_t * p_bwd) @ o_h.T
        elif combine == "_po":
            out1 = (o_t * p_fwd) @ s_h.T
            out2 = (o_h * p_bwd) @ s_t.T
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return ((out1 + out2) / 2.0).reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # query laid out as [head-half | tail-half] to match the
        # candidate embedding layout, pre-divided by 2
        if slot == 0:
            p_fwd, p_bwd = jnp.split(p_emb, 2, axis=1)
            o_h, o_t = jnp.split(o_emb, 2, axis=1)
            q = jnp.concatenate([p_fwd * o_t, p_bwd * o_h], axis=1)
            return _neg_dot(q / 2.0, s_emb)
        if slot == 1:
            s_h, s_t = jnp.split(s_emb, 2, axis=1)
            o_h, o_t = jnp.split(o_emb, 2, axis=1)
            q = jnp.concatenate([s_h * o_t, s_t * o_h], axis=1)
            return _neg_dot(q / 2.0, p_emb)
        s_h, s_t = jnp.split(s_emb, 2, axis=1)
        p_fwd, p_bwd = jnp.split(p_emb, 2, axis=1)
        q = jnp.concatenate([s_t * p_bwd, s_h * p_fwd], axis=1)
        return _neg_dot(q / 2.0, o_emb)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 0:
            p_fwd, p_bwd = jnp.split(p_emb, 2, axis=1)
            o_h, o_t = jnp.split(o_emb, 2, axis=1)
            q = jnp.concatenate([p_fwd * o_t, p_bwd * o_h], axis=1)
            return q / 2.0, None
        if slot == 1:
            s_h, s_t = jnp.split(s_emb, 2, axis=1)
            o_h, o_t = jnp.split(o_emb, 2, axis=1)
            q = jnp.concatenate([s_h * o_t, s_t * o_h], axis=1)
            return q / 2.0, None
        s_h, s_t = jnp.split(s_emb, 2, axis=1)
        p_fwd, p_bwd = jnp.split(p_emb, 2, axis=1)
        q = jnp.concatenate([s_t * p_bwd, s_h * p_fwd], axis=1)
        return q / 2.0, None


class SimplE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError(
                "SimplE requires embeddings of even dimensionality (got {})".format(
                    self.get_option("entity_embedder.dim")
                )
            )
        super().__init__(
            config=config, dataset=dataset, scorer=SimplEScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )


class RelationalTucker3(KgeModel):
    """RESCAL scoring with a Tucker3 relation embedder: the mixing matrix is
    the projection of a low-dimensional relation embedding (reference
    relational_tucker3.py)."""

    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        ent_dim = config.get_default(
            self.configuration_key + ".entity_embedder.dim"
        )
        config.set(
            self.configuration_key + ".relation_embedder.dim",
            ent_dim ** 2,
            create=True,
            log=True,
        )
        super().__init__(
            config=config, dataset=dataset, scorer=RescalScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
