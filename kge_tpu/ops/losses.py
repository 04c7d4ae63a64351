"""Training losses.

Pure-jnp re-implementations with the exact semantics of the reference
(kge/util/loss.py): sum-reduction convention (losses are never averaged by
batch size here — callers divide), labels either a [n, m] 0/1 matrix or a
[n] vector of positive-column indexes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from kge_tpu.config import Config


def _labels_as_matrix(scores: jax.Array, labels: jax.Array) -> jax.Array:
    if labels.ndim == 2:
        return labels.astype(scores.dtype)
    # one-hot (iota compare) instead of a row-indexed scatter: scatters with
    # per-row column indexes hit the serialized TPU gather/scatter path,
    # especially under vmap (the per-row loss wrapper)
    return jax.nn.one_hot(labels, scores.shape[1], dtype=scores.dtype)


def _pick_columns(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values[arange(n), idx] as a one-hot contraction (no per-row gather)."""
    return jnp.sum(
        values * jax.nn.one_hot(idx, values.shape[1], dtype=values.dtype),
        axis=1,
    )


def _bce_with_logits(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise binary cross entropy on logits (stable formulation)."""
    return jnp.maximum(scores, 0) - scores * labels + jnp.log1p(
        jnp.exp(-jnp.abs(scores))
    )


class KgeLoss:
    """Factory + base; instances are callables (scores, labels) -> scalar."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config

    @staticmethod
    def create(config: Config) -> "KgeLoss":
        config.check(
            "train.loss",
            ["bce", "bce_mean", "bce_self_adversarial", "margin_ranking",
             "ce", "kl", "soft_margin", "se"],
        )
        loss = config.get("train.loss")
        if loss in ("bce", "bce_mean", "bce_self_adversarial"):
            offset = config.get("train.loss_arg")
            if math.isnan(offset):
                offset = 0.0
                config.set("train.loss_arg", offset, log=True)
            if loss == "bce":
                return BCEWithLogitsKgeLoss(config, offset=offset)
            elif loss == "bce_mean":
                return BCEWithLogitsKgeLoss(config, offset=offset, bce_type="mean")
            else:
                try:
                    temperature = float(
                        config.get("user.bce_self_adversarial_temperature")
                    )
                except KeyError:
                    temperature = 1.0
                config.log(f"Using adversarial temperature {temperature}")
                return BCEWithLogitsKgeLoss(
                    config, offset=offset, bce_type="self_adversarial",
                    temperature=temperature,
                )
        elif loss in ("kl", "ce"):
            return KLDivWithSoftmaxKgeLoss(config)
        elif loss == "margin_ranking":
            margin = config.get("train.loss_arg")
            if math.isnan(margin):
                margin = 1.0
                config.set("train.loss_arg", margin, log=True)
            return MarginRankingKgeLoss(config, margin=margin)
        elif loss == "soft_margin":
            return SoftMarginKgeLoss(config)
        elif loss == "se":
            return SEKgeLoss(config)
        raise ValueError(f"invalid value train.loss={loss}")

    def __call__(self, scores, labels, **kwargs):
        raise NotImplementedError


class BCEWithLogitsKgeLoss(KgeLoss):
    """bce: summed elementwise BCE. bce_mean: positives + mean-of-negatives,
    halved. bce_self_adversarial: negatives weighted by a detached softmax
    over their scores (loss.py:138-190). The latter two assume the positive
    is in column 0 when labels are given as indexes or a one-hot matrix."""

    def __init__(self, config, offset=0.0, bce_type=None, temperature=1.0):
        super().__init__(config)
        self._bce_type = bce_type
        self._offset = offset
        self._temperature = temperature

    def __call__(self, scores, labels, **kwargs):
        labels_matrix = _labels_as_matrix(scores, labels)
        if self._offset != 0.0:
            scores = scores + self._offset
        losses = _bce_with_logits(scores, labels_matrix)
        if self._bce_type is None:
            return jnp.sum(losses)
        # positive column indexes
        if labels.ndim == 1:
            pos_idx = labels
        else:
            pos_idx = jnp.argmax(labels_matrix, axis=1)
        n, m = scores.shape
        losses_pos = _pick_columns(losses, pos_idx)
        if self._bce_type == "mean":
            losses_neg = jnp.sum(losses, axis=1) - losses_pos
            return (
                jnp.sum(losses_pos) + jnp.sum(losses_neg) / (m - 1)
            ) / 2.0
        elif self._bce_type == "self_adversarial":
            neg_mask = 1.0 - labels_matrix
            # softmax over negative scores only (detached)
            neg_scores = jax.lax.stop_gradient(scores) * self._temperature
            neg_scores = jnp.where(neg_mask > 0, neg_scores, -jnp.inf)
            weights = jax.nn.softmax(neg_scores, axis=1)
            losses_neg = jnp.sum(weights * losses * neg_mask, axis=1)
            return (jnp.sum(losses_pos) + jnp.sum(losses_neg)) / 2.0
        raise NotImplementedError


class KLDivWithSoftmaxKgeLoss(KgeLoss):
    """kl: cross entropy for index labels; KL divergence between the model
    softmax and the L1-normalized label matrix otherwise (loss.py:192-213)."""

    def __call__(self, scores, labels, **kwargs):
        if labels.ndim == 1:
            # CE with sum reduction
            logz = jax.nn.logsumexp(scores, axis=1)
            picked = _pick_columns(scores, labels)
            return jnp.sum(logz - picked)
        else:
            labels = labels.astype(scores.dtype)
            # guard for all-zero label rows (padded batch rows); 1e-30 stays
            # normal in float32 (1e-38 would flush to zero on some backends)
            norm = jnp.maximum(jnp.sum(labels, axis=1, keepdims=True), 1e-30)
            target = labels / norm
            log_probs = jax.nn.log_softmax(scores, axis=1)
            # torch KLDivLoss(sum): sum target * (log target - log_probs),
            # with 0 * log 0 := 0
            tlogt = jnp.where(target > 0, target * jnp.log(target), 0.0)
            return jnp.sum(tlogt - target * log_probs)


class SoftMarginKgeLoss(KgeLoss):
    """log(1 + exp(-y * score)) with y in {-1, 1}, summed (loss.py:216-224)."""

    def __call__(self, scores, labels, **kwargs):
        labels = _labels_as_matrix(scores, labels) * 2 - 1
        return jnp.sum(jnp.log1p(jnp.exp(-labels * scores)))


class MarginRankingKgeLoss(KgeLoss):
    """max(0, margin - pos + neg) summed over (positive, negative) pairs.

    Pairs each positive with its following negatives; requires negative
    sampling training with the fixed [pos | negs] column layout
    (loss.py:227-264). Assumes every row has its positive in column 0.
    """

    def __init__(self, config, margin: float):
        super().__init__(config)
        self._margin = margin
        self._train_type = config.get("train.type")
        if "negative_sampling" not in self._train_type:
            raise NotImplementedError(
                "margin ranking is only supported for negative_sampling training"
            )

    def __call__(self, scores, labels, **kwargs):
        # scores: [n, 1 + num_negatives], positives in column 0
        pos = scores[:, :1]
        neg = scores[:, 1:]
        return jnp.sum(jax.nn.relu(self._margin - pos + neg))


class SEKgeLoss(KgeLoss):
    """Squared error against 0/1 labels, summed (loss.py:267-274)."""

    def __call__(self, scores, labels, **kwargs):
        labels = _labels_as_matrix(scores, labels)
        return jnp.sum((scores - labels) ** 2)
