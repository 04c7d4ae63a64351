"""Translation-family scorers: TransE, TransH, RotatE.

Scoring semantics match the reference (kge/model/{transe,transh,rotate}.py).
Pairwise (sp_/_po) forms are broadcasted [n, chunk, d] differences reduced
over d, computed under ``lax.map`` over target chunks so the intermediate is
bounded (~128MB) no matter how XLA schedules the fusion — the reference
instead materializes [n, m, d] and warns about OOM (rotate.py:9-12).
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


# cap on the broadcasted [n, chunk, d] pairwise intermediate (f32 elements);
# 32M elements = 128 MB
_PAIRWISE_BUDGET_ELEMS = 1 << 25


def _l2_expanded(query: jax.Array, targets: jax.Array) -> jax.Array:
    """-||query_i - target_j||_2 for all pairs via the matmul expansion
    ||q-t||^2 = ||q||^2 + ||t||^2 - 2 q.t — one MXU matmul instead of the
    [n, m, d] pairwise VPU reduction (the reference's cdist does the same
    in its mm mode). Clamped at 0 against cancellation; the epsilon keeps
    the gradient finite at 0 exactly like the direct-norm path."""
    cross = query @ targets.T
    q2 = jnp.sum(query * query, axis=1, keepdims=True)
    t2 = jnp.sum(targets * targets, axis=1)[None, :]
    sq = jnp.maximum(q2 + t2 - 2.0 * cross, 0.0)
    return -jnp.sqrt(sq + 1e-30)


def _l2_factorization(q: jax.Array):
    """(query, target_map, score_map) expressing -||q - c||_2 as an
    epilogued dot product with AUGMENTED embeddings:

        [2q | -1 | -||q||^2] . [c | ||c||^2 | 1] = -||q - c||^2

    so L2 distance scorers ride every factorized fast path (grouped
    full-vocabulary scoring + gather-free picks, embed-once multi-slot
    scoring, the ppermute-ring model-sharded schedule). The sqrt epilogue
    is elementwise and fuses into the matmul consumer."""
    n = q.shape[0]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    query = jnp.concatenate(
        [2.0 * q, -jnp.ones((n, 1), q.dtype), -q2], axis=1
    )

    def target_map(t):
        t2 = jnp.sum(t * t, axis=1, keepdims=True)
        return jnp.concatenate(
            [t, t2, jnp.ones((t.shape[0], 1), t.dtype)], axis=1
        )

    def score_map(dot):
        return -jnp.sqrt(jnp.maximum(-dot, 0.0) + 1e-30)

    return query, target_map, score_map


def _l2_expanded_neg(query: jax.Array, cand: jax.Array) -> jax.Array:
    """-||query_i - cand_ij||_2 for per-row candidates [n, k, d]: batched
    contraction instead of materializing the [n, k, d] diff chain."""
    cross = jnp.einsum("nd,nkd->nk", query, cand)
    q2 = jnp.sum(query * query, axis=1, keepdims=True)
    c2 = jnp.sum(cand * cand, axis=2)
    sq = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)
    return -jnp.sqrt(sq + 1e-30)


def _map_over_targets(score_chunk, targets: jax.Array, n: int) -> jax.Array:
    """Apply ``score_chunk(chunk_targets) -> [n, chunk]`` over row-chunks of
    ``targets`` [m, d], sequentially via ``lax.map``, and concatenate to
    [n, m]. Keeps the pairwise intermediate HBM-bounded for any m."""
    m, d = targets.shape
    chunk = max(128, _PAIRWISE_BUDGET_ELEMS // max(1, n * d))
    if m <= chunk:
        return score_chunk(targets)
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m
    padded = jnp.pad(targets, ((0, pad), (0, 0)))
    # rematerialize per chunk: without it the map's backward stores every
    # chunk's [n, chunk, d] residuals simultaneously — the full pairwise
    # tensor the chunking exists to avoid
    out = jax.lax.map(jax.checkpoint(score_chunk),
                      padded.reshape(nchunks, chunk, d))
    return jnp.moveaxis(out, 0, 1).reshape(n, nchunks * chunk)[:, :m]


class TransEScorer(RelationalScorer):
    """score = -||s + p - o||_l (reference transe.py:16-36).

    For l_norm=2 every many-targets form is one MXU matmul via the L2
    expansion (``_l2_expanded``); other norms are chunked [n, c, d] VPU
    reductions."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))
        # L2's many-targets forms ARE matmuls; other norms are pairwise
        # VPU reductions (callers route those away from matmul-shaped
        # scoring paths)
        self.pairwise_many_targets = self._norm != 2.0

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        n = p_emb.shape[0]
        if combine == "spo":
            out = -_p_norm(s_emb + p_emb - o_emb, self._norm, axis=1)
        elif combine == "sp_":
            query = s_emb + p_emb
            if self._norm == 2.0:
                out = _l2_expanded(query, o_emb)
            else:
                def chunk_scores(o_chunk):
                    # [n, 1, d] - [1, c, d], reduced over d
                    diff = query[:, None, :] - o_chunk[None, :, :]
                    return -_p_norm(diff, self._norm, axis=2)

                out = _map_over_targets(chunk_scores, o_emb, n)
        elif combine == "_po":
            query = o_emb - p_emb
            if self._norm == 2.0:
                out = _l2_expanded(query, s_emb)
            else:
                def chunk_scores(s_chunk):
                    diff = query[:, None, :] - s_chunk[None, :, :]
                    return -_p_norm(diff, self._norm, axis=2)

                out = _map_over_targets(chunk_scores, s_emb, n)
        elif combine == "s_o" and self._norm == 2.0:
            # rows are the (s, o) pairs here — n (= p count) would scramble
            # the reshape
            return _l2_expanded(o_emb - s_emb, p_emb)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # every slot reduces to -||q_row - candidate||: one fused broadcast
        # subtract + norm over [n, k, d] (no [n*k, d] materialization)
        if slot == 0:
            query, cand = o_emb - p_emb, s_emb
        elif slot == 1:
            query, cand = o_emb - s_emb, p_emb
        else:
            query, cand = s_emb + p_emb, o_emb
        if self._norm == 2.0:
            return _l2_expanded_neg(query, cand)
        return -_p_norm(query[:, None, :] - cand, self._norm, axis=2)

    def pooled_kernel_queries(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # -||s+p-o||_1 is -||q - c||_1 with q from the kept slots for every
        # corrupted slot (including relations: q = o - s)
        if self._norm != 1.0:
            return None
        if slot == 0:
            q = o_emb - p_emb
        elif slot == 1:
            q = o_emb - s_emb
        else:
            q = s_emb + p_emb
        return "l1", (q,)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if self._norm != 2.0:
            return None
        if slot == 0:
            q = o_emb - p_emb
        elif slot == 1:
            q = o_emb - s_emb
        else:
            q = s_emb + p_emb
        return _l2_factorization(q)


class TransE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        super().__init__(
            config=config, dataset=dataset, scorer=TransEScorer,
            configuration_key=configuration_key,
            init_for_load_only=init_for_load_only,
        )

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        _force_triple_negatives(self, job)


def _force_triple_negatives(model, job):
    """Resolve negative_sampling.implementation=auto away from the
    matmul-shaped choices for PAIRWISE distance scorers (L1/Lp): their
    many-targets (sp_/_po) forms are chunked VPU reductions, so
    "all"/"batch" costs x(vocab/num) more work for nothing (the reference
    forces triple for TransE, transe.py:57-68; RotatE warns about the
    many-targets memory instead, rotate.py:9-12). Preference order:
    "pool" when its requirements hold (no filtering, non-shared — the
    fused pooled kernel / select path is ~4x "triple" on TPU), else
    "triple". L2 scorers factorize onto the MXU and keep the standard
    auto heuristic."""
    from kge_tpu.job.train_negative_sampling import TrainingJobNegativeSampling

    config = model.config
    if not isinstance(job, TrainingJobNegativeSampling):
        return
    if not getattr(model.get_scorer(), "pairwise_many_targets", False):
        return
    if config.get("negative_sampling.implementation") == "auto":
        filtering = any(
            config.get(f"negative_sampling.filtering.{s}") for s in "spo"
        )
        shared = config.get("negative_sampling.shared")
        on_device_ok = config.get("negative_sampling.on_device") != "never"
        pool_ok = (
            not filtering and not shared and on_device_ok
            and not config.get("negative_sampling.auto_exact")
        )
        config.set(
            "negative_sampling.implementation",
            "pool" if pool_ok else "triple", log=True,
        )


class TransHScorer(RelationalScorer):
    """TransE on relation hyperplanes: entities are projected onto the
    hyperplane with normal w_p before translation (reference transh.py:16-81).
    The relation embedding stores [translation | normal] concatenated.
    """

    pairwise_many_targets = True  # sp_/_po are VPU reductions, not matmuls

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
            # each candidate object must be projected per relation
            s_proj = self._transfer(s_emb, norm_vec) + rel_emb  # [n, d]

            def chunk_scores(o_chunk):
                o_proj = self._transfer(
                    o_chunk[None, :, :], norm_vec[:, None, :]
                )  # [n, c, d]
                return -_p_norm(s_proj[:, None, :] - o_proj, self._norm, axis=2)

            out = _map_over_targets(chunk_scores, o_emb, n)
        elif combine == "_po":
            o_proj = self._transfer(o_emb, norm_vec) - rel_emb  # [n, d]

            def chunk_scores(s_chunk):
                s_proj = self._transfer(
                    s_chunk[None, :, :], norm_vec[:, None, :]
                )  # [n, c, d]
                return -_p_norm(o_proj[:, None, :] - s_proj, self._norm, axis=2)

            out = _map_over_targets(chunk_scores, s_emb, n)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 1:
            # per-candidate hyperplanes: project both kept entities under
            # each candidate relation's normal
            rel3, w3 = jnp.split(p_emb, 2, axis=2)          # [n, k, d]
            diff = (
                self._transfer(s_emb[:, None, :], w3) + rel3
                - self._transfer(o_emb[:, None, :], w3)
            )
            return -_p_norm(diff, self._norm, axis=2)
        rel_emb, norm_vec = jnp.split(p_emb, 2, axis=1)
        if slot == 0:
            query = self._transfer(o_emb, norm_vec) - rel_emb
            cand = self._transfer(s_emb, norm_vec[:, None, :])
        else:
            query = self._transfer(s_emb, norm_vec) + rel_emb
            cand = self._transfer(o_emb, norm_vec[:, None, :])
        return -_p_norm(query[:, None, :] - cand, self._norm, axis=2)


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

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        _force_triple_negatives(self, job)

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
    score = -||abs(s*r - o)||_l (reference rotate.py:20-70).

    For l_norm=2 the many-targets forms are MXU matmuls: the L2 norm over
    complex moduli equals the plain L2 norm of the concatenated [re | im]
    vector (the entity table's storage layout), so the expansion
    ``_l2_expanded`` applies directly."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self._norm = float(self.get_option("l_norm"))
        self.pairwise_many_targets = self._norm != 2.0

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
            if self._norm == 2.0:
                out = _l2_expanded(
                    jnp.concatenate([sp_re, sp_im], axis=1), o_emb
                )
            else:
                def chunk_scores(o_chunk):
                    oc_re, oc_im = jnp.split(o_chunk, 2, axis=1)
                    d_re = sp_re[:, None, :] - oc_re[None, :, :]  # [n, c, d/2]
                    d_im = sp_im[:, None, :] - oc_im[None, :, :]
                    mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
                    return -_p_norm_nonneg(mod, self._norm, axis=2)

                out = _map_over_targets(chunk_scores, o_emb, n)
        elif combine == "_po":
            # || s*p - o || = || s - conj(p)*o || for unit rotations
            po_re, po_im = self._hadamard(p_re, -p_im, o_re, o_im)  # [n, d/2]
            if self._norm == 2.0:
                out = _l2_expanded(
                    jnp.concatenate([po_re, po_im], axis=1), s_emb
                )
            else:
                def chunk_scores(s_chunk):
                    sc_re, sc_im = jnp.split(s_chunk, 2, axis=1)
                    d_re = po_re[:, None, :] - sc_re[None, :, :]
                    d_im = po_im[:, None, :] - sc_im[None, :, :]
                    mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
                    return -_p_norm_nonneg(mod, self._norm, axis=2)

                out = _map_over_targets(chunk_scores, s_emb, n)
        else:
            return super().score_emb(params, s_emb, p_emb, o_emb, combine, ctx)
        return out.reshape(n, -1)

    def score_emb_neg(self, params, s_emb, p_emb, o_emb, slot, ctx):
        if slot == 1:
            s_re, s_im = jnp.split(s_emb, 2, axis=1)
            o_re, o_im = jnp.split(o_emb, 2, axis=1)
            p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)  # [n, k, d/2]
            sp_re, sp_im = self._hadamard(
                s_re[:, None, :], s_im[:, None, :], p_re, p_im
            )
            d_re, d_im = sp_re - o_re[:, None, :], sp_im - o_im[:, None, :]
        else:
            p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)
            if slot == 0:
                o_re, o_im = jnp.split(o_emb, 2, axis=1)
                q_re, q_im = self._hadamard(p_re, -p_im, o_re, o_im)
                c_re, c_im = jnp.split(s_emb, 2, axis=2)
            else:
                s_re, s_im = jnp.split(s_emb, 2, axis=1)
                q_re, q_im = self._hadamard(s_re, s_im, p_re, p_im)
                c_re, c_im = jnp.split(o_emb, 2, axis=2)
            d_re = q_re[:, None, :] - c_re
            d_im = q_im[:, None, :] - c_im
        mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
        return -_p_norm_nonneg(mod, self._norm, axis=2)

    def pooled_kernel_queries(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # -sum_j |q_j - c_j| over complex dims: q = s*r (slot o) or
        # conj(r)*o (slot s). Relation corruptions multiply the candidate
        # into s — not a plain difference — so they keep the XLA path.
        if self._norm != 1.0 or slot == 1:
            return None
        p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)
        if slot == 0:
            o_re, o_im = jnp.split(o_emb, 2, axis=1)
            q_re, q_im = self._hadamard(p_re, -p_im, o_re, o_im)
        else:
            s_re, s_im = jnp.split(s_emb, 2, axis=1)
            q_re, q_im = self._hadamard(s_re, s_im, p_re, p_im)
        return "cmod", (q_re, q_im)

    def factorize_slot(self, params, s_emb, p_emb, o_emb, slot, ctx):
        # L2 over complex moduli == plain L2 of the [re | im] storage
        # layout; relation corruptions rotate the candidate into s (not a
        # difference), so slot 1 doesn't factorize
        if self._norm != 2.0 or slot == 1:
            return None
        p_re, p_im = jnp.cos(p_emb), jnp.sin(p_emb)
        if slot == 0:
            o_re, o_im = jnp.split(o_emb, 2, axis=1)
            q_re, q_im = self._hadamard(p_re, -p_im, o_re, o_im)
        else:
            s_re, s_im = jnp.split(s_emb, 2, axis=1)
            q_re, q_im = self._hadamard(s_re, s_im, p_re, p_im)
        return _l2_factorization(jnp.concatenate([q_re, q_im], axis=1))


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

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        _force_triple_negatives(self, job)

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
