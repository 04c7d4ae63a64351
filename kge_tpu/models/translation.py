"""Translation-family scorers: TransE, TransH, RotatE.

Scoring semantics match the reference (kge/model/{transe,transh,rotate}.py).
Pairwise (sp_/_po) forms are computed as broadcasted [n, m, d] differences
reduced over d; XLA fuses the reduction so the full intermediate is not
materialized in HBM, and entity-ranking evaluation additionally chunks over m
(the reference instead warns about OOM, rotate.py:9-12).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models.base import Ctx, KgeModel, Params, RelationalScorer


def _p_norm(x: jax.Array, p: float, axis: int) -> jax.Array:
    """L_p norm over ``axis`` for non-negative-safe inputs."""
    if p == 1.0:
        return jnp.sum(jnp.abs(x), axis=axis)
    elif p == 2.0:
        # epsilon keeps the gradient finite at 0 (norm is not differentiable
        # there; torch returns 0 gradient, this is numerically equivalent)
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-30)
    else:
        return jnp.sum(jnp.abs(x) ** p, axis=axis) ** (1.0 / p)


def _p_norm_nonneg(x: jax.Array, p: float, axis: int) -> jax.Array:
    """L_p norm when entries of x are already non-negative."""
    if p == 1.0:
        return jnp.sum(x, axis=axis)
    elif p == 2.0:
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-30)
    else:
        return jnp.sum(x ** p, axis=axis) ** (1.0 / p)


class TransEScorer(RelationalScorer):
    """score = -||s + p - o||_l (reference transe.py:16-36)."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        if combine == "spo":
            out = -_p_norm(s_emb + p_emb - o_emb, self._norm, axis=1)
        elif combine == "sp_":
            # [n, 1, d] - [1, m, d], reduced over d
            diff = (s_emb + p_emb)[:, None, :] - o_emb[None, :, :]
            out = -_p_norm(diff, self._norm, axis=2)
        elif combine == "_po":
            diff = (o_emb - p_emb)[:, None, :] - s_emb[None, :, :]
            out = -_p_norm(diff, self._norm, axis=2)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class TransE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(
            config=config, dataset=dataset, scorer=TransEScorer,
            configuration_key=configuration_key,
            init_for_load_only=init_for_load_only,
        )

    def prepare_job(self, job, **kwargs):
        """Force negative-sampling scoring to the "triple" implementation:
        TransE has no efficient many-targets form (reference transe.py:57-68)."""
        super().prepare_job(job, **kwargs)
        from kge_tpu.job.train_negative_sampling import TrainingJobNegativeSampling

        if isinstance(job, TrainingJobNegativeSampling):
            impl = self.config.get("negative_sampling.implementation")
            if impl == "auto":
                self.config.set("negative_sampling.implementation", "triple", log=True)


class TransHScorer(RelationalScorer):
    """TransE on relation hyperplanes: entities are projected onto the
    hyperplane with normal w_p before translation (reference transh.py:16-81).
    The relation embedding stores [translation | normal] concatenated.
    """

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    @staticmethod
    def _transfer(ent_emb, norm_vec):
        norm_vec = norm_vec / jnp.maximum(
            jnp.linalg.norm(norm_vec, axis=-1, keepdims=True), 1e-12
        )
        return ent_emb - jnp.sum(ent_emb * norm_vec, axis=-1, keepdims=True) * norm_vec

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        rel_emb, norm_vec = jnp.split(p_emb, 2, axis=1)
        if combine == "spo":
            diff = (
                self._transfer(s_emb, norm_vec) + rel_emb
                - self._transfer(o_emb, norm_vec)
            )
            out = -_p_norm(diff, self._norm, axis=1)
        elif combine == "sp_":
            # each candidate object must be projected per relation: [n, m, d]
            s_proj = self._transfer(s_emb, norm_vec) + rel_emb  # [n, d]
            o_proj = self._transfer(o_emb[None, :, :], norm_vec[:, None, :])  # [n, m, d]
            out = -_p_norm(s_proj[:, None, :] - o_proj, self._norm, axis=2)
        elif combine == "_po":
            o_proj = self._transfer(o_emb, norm_vec) - rel_emb  # [n, d]
            s_proj = self._transfer(s_emb[None, :, :], norm_vec[:, None, :])  # [n, m, d]
            out = -_p_norm(o_proj[:, None, :] - s_proj, self._norm, axis=2)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class TransH(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        rel_key = self.configuration_key + ".relation_embedder"
        if config.get_default(rel_key + ".dim") < 0:
            ent_dim = config.get_default(
                self.configuration_key + ".entity_embedder.dim"
            )
            config.set(rel_key + ".dim", ent_dim * 2, create=True, log=True)
        super().__init__(
            config=config, dataset=dataset, scorer=TransHScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        self.soft_constraint_weight = float(self.get_option("C"))

    def penalty(self, params, batch=None, **kwargs):
        """Soft constraints of the TransH paper: entity norms <= 1 and
        translation orthogonal to the hyperplane normal (transh.py:108-144)."""
        result = super().penalty(params, batch=batch, **kwargs)
        if self.soft_constraint_weight > 0.0:
            ent = params["entity_embedder"]["embeddings"]
            p_ent = jnp.sum(jax.nn.relu(jnp.sum(ent * ent, axis=1) - 1.0))

            rel_all = params["relation_embedder"]["embeddings"]
            rel_emb, norm_vec = jnp.split(rel_all, 2, axis=1)
            eps = 1e-6  # guards against division blow-up for small norms
            ratio = jnp.sum(rel_emb * norm_vec, axis=-1) / (
                jnp.linalg.norm(rel_emb, axis=1) + eps
            )
            p_rel = jnp.sum(jax.nn.relu(ratio ** 2 - eps ** 2))
            result = result + [
                ("transh.soft_constraints_ent", self.soft_constraint_weight * p_ent),
                ("transh.soft_constraints_rel", self.soft_constraint_weight * p_rel),
            ]
        return result


class RotatEScorer(RelationalScorer):
    """Relations are phase vectors rotating complex entity embeddings;
    score = -||abs(s*r - o)||_l (reference rotate.py:20-70)."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))

    @staticmethod
    def _hadamard(a_re, a_im, b_re, b_im):
        return a_re * b_re - a_im * b_im, a_re * b_im + a_im * b_re

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        s_re, s_im = jnp.split(s_emb, 2, axis=1)
        o_re, o_im = jnp.split(o_emb, 2, axis=1)
        p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)

        if combine == "spo":
            sp_re, sp_im = self._hadamard(s_re, s_im, p_re, p_im)
            d_re, d_im = sp_re - o_re, sp_im - o_im
            mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
            out = -_p_norm_nonneg(mod, self._norm, axis=1)
        elif combine == "sp_":
            sp_re, sp_im = self._hadamard(s_re, s_im, p_re, p_im)  # [n, d/2]
            d_re = sp_re[:, None, :] - o_re[None, :, :]  # [n, m, d/2]
            d_im = sp_im[:, None, :] - o_im[None, :, :]
            mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
            out = -_p_norm_nonneg(mod, self._norm, axis=2)
        elif combine == "_po":
            # || s*p - o || = || s - conj(p)*o || for unit rotations
            po_re, po_im = self._hadamard(p_re, -p_im, o_re, o_im)  # [n, d/2]
            d_re = po_re[:, None, :] - s_re[None, :, :]
            d_im = po_im[:, None, :] - s_im[None, :, :]
            mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
            out = -_p_norm_nonneg(mod, self._norm, axis=2)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)


class RotatE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        if self.get_option("entity_embedder.dim") % 2 != 0:
            raise ValueError(
                "RotatE requires embeddings of even dimensionality (got {})".format(
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
            config=config, dataset=dataset, scorer=RotatEScorer,
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        self._normalize_phases = self.get_option("normalize_phases")
        if (
            self._normalize_phases
            and self.get_option("relation_embedder.type") != "lookup_embedder"
        ):
            raise ValueError(
                "RotatE supports normalize_phases=True only with a lookup "
                "relation embedder; got "
                f"{self.get_option('relation_embedder.type')}"
            )

    def postprocess_params(self, params):
        """Renormalize relation phases into [-pi, pi) after every batch; the
        rotation (and hence all scores) is unchanged (rotate.py:104-125)."""
        params = super().postprocess_params(params)
        if self._normalize_phases:
            phases = params["relation_embedder"]["embeddings"]
            phases = jnp.mod(phases + math.pi, 2.0 * math.pi) - math.pi
            params = {
                **params,
                "relation_embedder": {
                    **params["relation_embedder"],
                    "embeddings": phases,
                },
            }
        return params
