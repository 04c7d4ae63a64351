"""Neural scorers: ConvE and the Transformer ("no context" HittER) model.

Both only support (s, p, ?) queries and are meant to be wrapped in the
reciprocal relations model (reference kge/model/{conve,transformer}.py).
Parameters (conv kernels, projections, encoder weights) live in the
``scorer`` branch of the model param pytree; batch-norm running statistics
are non-trainable entries updated through the ``Ctx.stats`` collector.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.models.base import (
    Ctx,
    KgeModel,
    Params,
    RelationalScorer,
    _dropout,
    make_initializer,
)


def _batch_norm(x, mean_key, var_key, params, ctx: Ctx, axes, eps=1e-5,
                momentum=0.1):
    """Batch norm without affine params, torch running-stats semantics:
    train mode normalizes by (biased) batch statistics and writes
    EMA-updated running stats into ctx.stats; eval mode uses running stats.
    """
    if ctx.train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        if ctx.stats is not None:
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * n / max(n - 1, 1)
            ctx.stats[mean_key] = (
                (1 - momentum) * params[mean_key] + momentum * mean
            )
            ctx.stats[var_key] = (
                (1 - momentum) * params[var_key] + momentum * unbiased
            )
    else:
        mean = params[mean_key]
        var = params[var_key]
    shape = [1] * x.ndim
    for i in range(x.ndim):
        if i not in axes:
            shape[i] = x.shape[i]
    return (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)


class ConvEScorer(RelationalScorer):
    """2D-convolution scorer (reference conve.py:9-103).

    The last embedding component acts as a per-entity bias; s and p
    embeddings (sans bias) are reshaped to 2D maps, stacked vertically,
    convolved with 32 filters, batch-normed, projected back to the embedding
    dimension, and dotted with the object embedding.
    """

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self.emb_dim = self.get_option("entity_embedder.dim") - 1
        aspect_ratio = self.get_option("2D_aspect_ratio")
        self.emb_height = math.sqrt(self.emb_dim / aspect_ratio)
        self.emb_width = self.emb_height * aspect_ratio
        rounded_height = math.ceil(self.emb_height)
        if self.get_option("round_dim") and rounded_height != self.emb_height:
            self.emb_height = rounded_height
            self.emb_width = self.emb_height * aspect_ratio
            self.emb_dim = int(self.emb_height * self.emb_width)
            self.set_option("entity_embedder.dim", self.emb_dim + 1, log=True)
            self.set_option("relation_embedder.dim", self.emb_dim + 1, log=True)
            config.log(
                "Rounded embedding dimension up to {} to match aspect ratio".format(
                    self.emb_dim
                )
            )
        elif self.emb_dim % self.emb_height or self.emb_dim % self.emb_width:
            raise ValueError(
                "Embedding dimension {} incompatible with aspect ratio {}; "
                "set {}.round_dim=true or adapt the dimension".format(
                    self.emb_dim, aspect_ratio, self.configuration_key
                )
            )
        self.emb_height = int(self.emb_height)
        self.emb_width = int(self.emb_width)
        self.filter_size = int(self.get_option("filter_size"))
        self.stride = int(self.get_option("stride"))
        self.padding = int(self.get_option("padding"))
        self.feature_map_dropout = float(self.get_option("feature_map_dropout"))
        self.projection_dropout = float(self.get_option("projection_dropout"))
        self.convolution_bias = bool(self.get_option("convolution_bias"))
        self.out_channels = 32
        self.conv_output_height = (
            (self.emb_height * 2) - self.filter_size + 2 * self.padding
        ) // self.stride + 1
        self.conv_output_width = (
            self.emb_width - self.filter_size + 2 * self.padding
        ) // self.stride + 1
        self.flat_size = int(
            self.out_channels * self.conv_output_height * self.conv_output_width
        )

    def init_params(self, rng: jax.Array) -> Params:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        # torch Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)) for
        # weights, uniform(+-1/sqrt(fan_in)) for biases
        conv_shape = (self.out_channels, 1, self.filter_size, self.filter_size)
        conv_fan_in = self.filter_size * self.filter_size
        conv_bound = 1.0 / math.sqrt(conv_fan_in)
        kaiming = make_initializer("kaiming_uniform_", {"a": math.sqrt(5.0)})
        params = {
            "conv_w": kaiming(k1, conv_shape),
            "proj_w": kaiming(k2, (self.emb_dim, self.flat_size)),
            "proj_b": jax.random.uniform(
                k4, (self.emb_dim,),
                minval=-1.0 / math.sqrt(self.flat_size),
                maxval=1.0 / math.sqrt(self.flat_size),
            ),
            "bn1_mean": jnp.zeros((self.out_channels,)),
            "bn1_var": jnp.ones((self.out_channels,)),
            "bn2_mean": jnp.zeros((self.emb_dim,)),
            "bn2_var": jnp.ones((self.emb_dim,)),
        }
        if self.convolution_bias:
            params["conv_b"] = jax.random.uniform(
                k3, (self.out_channels,), minval=-conv_bound, maxval=conv_bound
            )
        return params

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        if combine not in ("sp_", "spo"):
            raise ValueError(
                f'combine "{combine}" not supported by the ConvE scorer'
            )
        batch_size = p_emb.shape[0]
        s_2d = s_emb[:, 1:].reshape(-1, self.emb_height, self.emb_width, 1)
        p_2d = p_emb[:, 1:].reshape(-1, self.emb_height, self.emb_width, 1)
        stacked = jnp.concatenate([s_2d, p_2d], axis=1)  # NHWC
        out = jax.lax.conv_general_dilated(
            stacked,
            params["conv_w"].transpose(2, 3, 1, 0),  # OIHW -> HWIO
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.convolution_bias:
            out = out + params["conv_b"]
        out = _batch_norm(out, "bn1_mean", "bn1_var", params, ctx, axes=(0, 1, 2))
        out = jax.nn.relu(out)
        out = _dropout(out, self.feature_map_dropout, ctx.fold(1))
        # match torch NCHW flattening order: [N, C, H, W] -> [N, C*H*W]
        out = out.transpose(0, 3, 1, 2).reshape(batch_size, -1)
        out = out @ params["proj_w"].T + params["proj_b"]
        out = _dropout(out, self.projection_dropout, ctx.fold(2))
        out = _batch_norm(out, "bn2_mean", "bn2_var", params, ctx, axes=(0,))
        out = jax.nn.relu(out)
        if combine == "sp_":
            out = out @ o_emb[:, 1:].T
        else:
            out = jnp.sum(out * o_emb[:, 1:], axis=-1)
        out = out + o_emb[:, 0]
        return out.reshape(batch_size, -1)


class ConvE(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        # an extra embedding component holds the per-entity bias
        # (reference conve.py:115-135 adds/undoes the same +1)
        self.set_option(
            "entity_embedder.dim", self.get_option("entity_embedder.dim") + 1
        )
        self.set_option(
            "relation_embedder.dim", self.get_option("relation_embedder.dim") + 1
        )
        super().__init__(
            config=config, dataset=dataset,
            scorer=ConvEScorer(config, dataset, self.configuration_key),
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )
        self.set_option(
            "entity_embedder.dim", self.get_option("entity_embedder.dim") - 1
        )
        self.set_option(
            "relation_embedder.dim", self.get_option("relation_embedder.dim") - 1
        )

    def score_spo(self, params, s, p, o, direction=None, ctx=Ctx()):
        if direction == "o":
            return super().score_spo(params, s, p, o, direction, ctx)
        raise ValueError("ConvE can only score objects")

    def score_spo_neg(self, params, triples, samples, slot, ctx=Ctx()):
        if slot == 2:
            return super().score_spo_neg(params, triples, samples, slot, ctx)
        raise ValueError("ConvE can only score objects")


class TransformerScorer(RelationalScorer):
    """3-token transformer encoder: [CLS, s+type_s, p+type_p] -> CLS' . o
    (reference transformer.py:10-105, the HittER "no context" model)."""

    def __init__(self, config, dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)
        self.emb_dim = self.get_option("entity_embedder.dim")
        self.nhead = int(self.get_option("encoder.nhead"))
        self.dim_ff = int(self.get_option("encoder.dim_feedforward"))
        self.num_layers = int(self.get_option("encoder.num_layers"))
        self.dropout = float(self.get_option("encoder.dropout"))
        if self.dropout < 0.0:
            if config.get("job.auto_correct"):
                config.log(
                    f"Setting {configuration_key}.encoder.dropout to 0., was "
                    f"{self.dropout}"
                )
                self.dropout = 0.0
        self.activation = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[
            self.get_option("encoder.activation")
        ]
        if self.emb_dim % self.nhead != 0:
            raise ValueError("emb_dim must be divisible by encoder.nhead")

    def init_params(self, rng: jax.Array) -> Params:
        init = self.initializer()
        d, ff = self.emb_dim, self.dim_ff
        keys = jax.random.split(rng, 3 + self.num_layers * 4)
        params: Params = {
            "cls": init(keys[0], (d,)),
            "sub_type": init(keys[1], (d,)),
            "rel_type": init(keys[2], (d,)),
            "layers": [],
        }
        for i in range(self.num_layers):
            k = keys[3 + i * 4 : 3 + (i + 1) * 4]
            params["layers"].append(
                {
                    # in_proj packs q,k,v as in torch MultiheadAttention
                    "in_proj_w": init(k[0], (3 * d, d)),
                    "in_proj_b": jnp.zeros((3 * d,)),
                    "out_proj_w": init(k[1], (d, d)),
                    "out_proj_b": jnp.zeros((d,)),
                    "linear1_w": init(k[2], (ff, d)),
                    "linear1_b": jnp.zeros((ff,)),
                    "linear2_w": init(k[3], (d, ff)),
                    "linear2_b": jnp.zeros((d,)),
                    "norm1_scale": jnp.ones((d,)),
                    "norm1_bias": jnp.zeros((d,)),
                    "norm2_scale": jnp.ones((d,)),
                    "norm2_bias": jnp.zeros((d,)),
                }
            )
        return params

    @staticmethod
    def _layer_norm(x, scale, bias, eps=1e-5):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + eps) * scale + bias

    def _attention(self, lp, x, ctx: Ctx):
        """Multi-head self-attention over [n, T, d] (T = 3 tokens)."""
        n, T, d = x.shape
        h = self.nhead
        hd = d // h
        qkv = x @ lp["in_proj_w"].T + lp["in_proj_b"]  # [n, T, 3d]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, T, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, T, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, T, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = _dropout(weights, self.dropout, ctx.fold(1))
        out = jnp.einsum("nhqk,nhkd->nhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, T, d)
        return out @ lp["out_proj_w"].T + lp["out_proj_b"]

    def _encoder_layer(self, lp, x, ctx: Ctx):
        """Post-norm encoder layer (torch.nn.TransformerEncoderLayer default)."""
        attn = self._attention(lp, x, ctx.fold(1))
        x = self._layer_norm(
            x + _dropout(attn, self.dropout, ctx.fold(2)),
            lp["norm1_scale"], lp["norm1_bias"],
        )
        ff = self.activation(x @ lp["linear1_w"].T + lp["linear1_b"])
        ff = _dropout(ff, self.dropout, ctx.fold(3))
        ff = ff @ lp["linear2_w"].T + lp["linear2_b"]
        x = self._layer_norm(
            x + _dropout(ff, self.dropout, ctx.fold(4)),
            lp["norm2_scale"], lp["norm2_bias"],
        )
        return x

    def score_emb(self, params, s_emb, p_emb, o_emb, combine, ctx):
        if combine not in ("sp_", "spo"):
            raise ValueError(
                f'combine "{combine}" not supported by the Transformer scorer'
            )
        n = s_emb.shape[0]
        x = jnp.stack(
            [
                jnp.broadcast_to(params["cls"], (n, self.emb_dim)),
                s_emb + params["sub_type"],
                p_emb + params["rel_type"],
            ],
            axis=1,
        )  # [n, 3, d]
        for i, lp in enumerate(params["layers"]):
            x = self._encoder_layer(lp, x, ctx.fold(10 + i))
        out = x[:, 0, :]  # transformed CLS token
        if combine == "sp_":
            out = out @ o_emb.T
        else:
            out = jnp.sum(out * o_emb, axis=-1)
        return out.reshape(n, -1)


class Transformer(KgeModel):
    def __init__(self, config, dataset, configuration_key=None,
                 init_for_load_only=False):
        self._init_configuration(config, configuration_key)
        super().__init__(
            config=config, dataset=dataset,
            scorer=TransformerScorer(config, dataset, self.configuration_key),
            configuration_key=self.configuration_key,
            init_for_load_only=init_for_load_only,
        )

    def score_spo(self, params, s, p, o, direction=None, ctx=Ctx()):
        if direction == "o":
            return super().score_spo(params, s, p, o, direction, ctx)
        raise ValueError("Transformer can only score objects")

    def score_spo_neg(self, params, triples, samples, slot, ctx=Ctx()):
        if slot == 2:
            return super().score_spo_neg(params, triples, samples, slot, ctx)
        raise ValueError("Transformer can only score objects")
