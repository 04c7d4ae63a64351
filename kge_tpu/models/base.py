"""Functional model core: embedders, scorers, and the KGE model API.

TPU-first re-design of the reference model layer (kge/model/kge_model.py).
Models here are *static* objects (configuration, shapes, scoring math) whose
parameters live in a separate pytree of jax arrays that flows through pure
functions — so entire training steps jit-compile end-to-end and parameters
can be sharded over a device mesh. The public scoring API mirrors the
reference (score_spo/score_sp/score_po/score_so/score_sp_po with combine
semantics "spo"/"sp_"/"_po"/"s_o", kge_model.py:122-213,663-789) with an
explicit ``params`` first argument and a ``Ctx`` carrying train-mode state.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu import misc
from kge_tpu.config import Config, Configurable
from kge_tpu.dataset import Dataset

S, P, O = 0, 1, 2

Params = Dict[str, Any]


class Ctx(NamedTuple):
    """Per-call context: train mode (enables dropout), the dropout rng, and an
    optional ``stats`` collector dict into which stateful layers (batch norm)
    write their updated running statistics during tracing; the training step
    merges collected stats back into the parameter pytree outside the gradient
    computation."""

    train: bool = False
    rng: Optional[jax.Array] = None
    stats: Optional[dict] = None

    def fold(self, tag: int) -> "Ctx":
        if self.rng is None:
            return self
        return Ctx(self.train, jax.random.fold_in(self.rng, tag), self.stats)


EVAL_CTX = Ctx(False, None)


# -- initializer dispatch ------------------------------------------------------


def _fans(shape) -> Tuple[int, int]:
    """fan_in/fan_out with torch.nn.init conventions ([out, in] 2D layout)."""
    if len(shape) < 2:
        fan = int(np.prod(shape))
        return fan, fan
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def make_initializer(initialize: str, initialize_args: Dict[str, Any]):
    """Map a torch.nn.init-style name + args to a jax init fn(rng, shape).

    Supports the names used by the reference configs (normal_, uniform_,
    xavier_uniform_, xavier_normal_, constant_, ones_, zeros_); the automatic
    ``a = -b`` rule for uniform_ is applied by the caller (see
    ``Initializer.from_options``).
    """
    args = dict(initialize_args or {})
    args.pop("+++", None)

    if initialize == "normal_":
        mean = float(args.get("mean", 0.0))
        std = float(args.get("std", 1.0))
        return lambda rng, shape, dtype=jnp.float32: (
            mean + std * jax.random.normal(rng, shape, dtype)
        )
    elif initialize == "uniform_":
        a = float(args.get("a", 0.0))
        b = float(args.get("b", 1.0))
        return lambda rng, shape, dtype=jnp.float32: jax.random.uniform(
            rng, shape, dtype, minval=a, maxval=b
        )
    elif initialize == "xavier_uniform_":
        gain = float(args.get("gain", 1.0))

        def init(rng, shape, dtype=jnp.float32):
            fan_in, fan_out = _fans(shape)
            bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
            return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)

        return init
    elif initialize == "xavier_normal_":
        gain = float(args.get("gain", 1.0))

        def init(rng, shape, dtype=jnp.float32):
            fan_in, fan_out = _fans(shape)
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(rng, shape, dtype)

        return init
    elif initialize == "kaiming_uniform_":
        a = float(args.get("a", 0.0))

        def init(rng, shape, dtype=jnp.float32):
            fan_in, _ = _fans(shape)
            gain = math.sqrt(2.0 / (1 + a ** 2))
            bound = gain * math.sqrt(3.0 / fan_in)
            return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)

        return init
    elif initialize == "constant_":
        val = float(args.get("val", 0.0))
        return lambda rng, shape, dtype=jnp.float32: jnp.full(shape, val, dtype)
    elif initialize == "ones_":
        return lambda rng, shape, dtype=jnp.float32: jnp.ones(shape, dtype)
    elif initialize == "zeros_":
        return lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    else:
        raise ValueError(f"invalid initializer: {initialize}")


class KgeBase(Configurable):
    """Base for models, scorers, and embedders: config + dataset + init."""

    def __init__(self, config: Config, dataset: Dataset, configuration_key=None):
        Configurable.__init__(self, config, configuration_key)
        self.dataset = dataset
        self.meta: Dict[str, Any] = dict()

    def initializer(
        self, config: Config = None, configuration_key: str = None
    ) -> Callable:
        """Build the initializer configured under ``initialize``/``initialize_args``.

        Follows the reference dispatch (kge_model.py:54-80): if
        ``initialize_args.<initializer-name>`` exists, its options are used,
        otherwise all of ``initialize_args``; ``a = -b`` is derived for
        uniform_ when ``a`` is absent.
        """
        if config is None:
            config = self.config
        if configuration_key is None:
            configuration_key = self.configuration_key
        configurable = Configurable(config, configuration_key)
        initialize = configurable.get_option("initialize")
        try:
            initialize_args = configurable.get_option("initialize_args." + initialize)
        except KeyError:
            initialize_args = configurable.get_option("initialize_args")
        if isinstance(initialize_args, dict):
            initialize_args = {
                k: v for k, v in initialize_args.items() if k != "+++"
            }
        else:
            initialize_args = {}
        if initialize == "uniform_" and "a" not in initialize_args:
            if "b" not in initialize_args:
                initialize_args["b"] = 1.0
            initialize_args["a"] = -initialize_args["b"]
        return make_initializer(initialize, initialize_args)

    def penalty(self, params: Params, **kwargs) -> List[Tuple[str, jax.Array]]:
        """Additional penalty terms added to the loss (name, value) pairs."""
        return []

    def prepare_job(self, job, **kwargs):
        """Register model-specific hooks on a job."""


def _dropout(x: jax.Array, rate: float, ctx: Ctx) -> jax.Array:
    """Inverted dropout matching torch.nn.Dropout semantics."""
    if not ctx.train or rate <= 0.0 or ctx.rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# -- scorers -------------------------------------------------------------------


class RelationalScorer(KgeBase):
    """Scores (s, p, o) embedding combinations.

    ``score_emb(params, s, p, o, combine, ctx)``:

    - combine="spo": s, p, o are [n, d*]; result [n, 1]
    - combine="sp_": s, p are [n, d*], o is [m, d*]; result [n, m]
    - combine="_po": p, o are [n, d*], s is [m, d*]; result [n, m]
    - combine="s_o": s, o are [n, d*], p is [m, d*]; result [n, m]

    The generic fallback materializes all pairs and delegates to the "spo"
    form (reference kge_model.py:150-213); concrete scorers override the
    combines they can fuse into matmuls.
    """

    def __init__(self, config: Config, dataset: Dataset, configuration_key=None):
        super().__init__(config, dataset, configuration_key)

    def init_params(self, rng: jax.Array) -> Params:
        """Scorer-owned parameters (most scorers have none)."""
        return {}

    def score_emb_spo(
        self, params: Params, s_emb, p_emb, o_emb, ctx: Ctx
    ) -> jax.Array:
        return self.score_emb(params, s_emb, p_emb, o_emb, "spo", ctx).reshape(-1)

    def score_emb(
        self, params: Params, s_emb, p_emb, o_emb, combine: str, ctx: Ctx
    ) -> jax.Array:
        n = p_emb.shape[0]
        if combine == "spo":
            out = self.score_emb_spo(params, s_emb, p_emb, o_emb, ctx)
        elif combine == "sp_":
            m = o_emb.shape[0]
            s_all = jnp.repeat(s_emb, m, axis=0)
            p_all = jnp.repeat(p_emb, m, axis=0)
            o_all = jnp.tile(o_emb, (n, 1))
            out = self.score_emb_spo(params, s_all, p_all, o_all, ctx)
        elif combine == "_po":
            m = s_emb.shape[0]
            s_all = jnp.tile(s_emb, (n, 1))
            p_all = jnp.repeat(p_emb, m, axis=0)
            o_all = jnp.repeat(o_emb, m, axis=0)
            out = self.score_emb_spo(params, s_all, p_all, o_all, ctx)
        elif combine == "s_o":
            n = s_emb.shape[0]
            m = p_emb.shape[0]
            s_all = jnp.repeat(s_emb, m, axis=0)
            p_all = jnp.tile(p_emb, (n, 1))
            o_all = jnp.repeat(o_emb, m, axis=0)
            out = self.score_emb_spo(params, s_all, p_all, o_all, ctx)
        else:
            raise ValueError(f'cannot handle combine="{combine}"')
        return out.reshape(n, -1)

    def factorize_slot(
        self, params: Params, s_emb, p_emb, o_emb, slot: int, ctx: Ctx
    ):
        """Optional (query, target_map[, score_map]) factorization of slot
        scoring.

        For scorers whose score against candidates c of ``slot`` is
        ``score_map(query . target_map(c_emb))`` (one dot product plus an
        optional elementwise epilogue), returns the per-row query [n, d']
        built from the two kept slots (whose embeddings are given; the
        corrupted slot's entry is None), a candidate-embedding map
        (None = identity), and optionally the elementwise epilogue applied
        to the contraction (absent/None = identity — the bilinear models).
        Callers can then score against a whole vocabulary with one
        dot_general in any output layout — e.g. the grouped
        [n, ceil(V/128), 128] layout that feeds the gather-free per-row
        pick (ops/pick.py); the epilogue fuses into the matmul consumer.
        L2 distance scorers factorize via augmented embeddings
        (||q-c||^2 = ||q||^2 + ||c||^2 - 2 q.c packed into one dot) with a
        sqrt epilogue. None (default) when the scorer doesn't factorize
        (ConvE, Transformer, L1/Lp distance forms)."""
        return None

    def pooled_kernel_queries(
        self, params: Params, s_emb, p_emb, o_emb, slot: int, ctx: Ctx
    ):
        """Optional (kind, queries) spec for the fused pooled-distance
        kernel (ops/dist_pool.py).

        Distance scorers whose per-candidate score is a pure elementwise
        distance ``-||q - c||`` return the kernel kind ("l1" or "cmod")
        and the per-row query array(s) built from the two kept slots; the
        pooled scoring path then runs the fused Pallas kernel instead of
        materializing [n, k, d] candidates. None (default): no kernel
        form for this scorer/slot/norm."""
        return None

    def score_emb_neg(
        self, params: Params, s_emb, p_emb, o_emb, slot: int, ctx: Ctx
    ) -> jax.Array:
        """Score each row against its own k candidates in the corrupted
        ``slot`` (0=s, 1=p, 2=o): that slot's embeddings are [n, k, d*], the
        other two are [n, d*]; result [n, k]. The fallback broadcasts the
        row embeddings over k and delegates to the "spo" form — broadcasts
        are free under XLA fusion, so only the corrupted slot pays a
        per-candidate embedding gather (unlike materializing n*k corrupted
        triples, which gathers all three slots n*k times)."""
        emb3 = (s_emb, p_emb, o_emb)[slot]
        n, k = emb3.shape[0], emb3.shape[1]

        def expand(e):
            return jnp.broadcast_to(
                e[:, None, :], (n, k, e.shape[-1])
            ).reshape(n * k, -1)

        flat = [None, None, None]
        for i, e in enumerate((s_emb, p_emb, o_emb)):
            flat[i] = emb3.reshape(n * k, -1) if i == slot else expand(e)
        return self.score_emb_spo(params, flat[0], flat[1], flat[2], ctx).reshape(n, k)


# -- embedders -----------------------------------------------------------------


class KgeEmbedder(KgeBase):
    """Embeds a fixed vocabulary of objects (entities or relations).

    Functional analogue of the reference KgeEmbedder (kge_model.py:216-351):
    ``init_params(rng)`` builds the parameter pytree; ``embed(params, idx,
    ctx)`` / ``embed_all(params, ctx)`` are pure and jit-traceable.
    """

    def __init__(
        self,
        config: Config,
        dataset: Dataset,
        configuration_key: str,
        vocab_size: int,
        init_for_load_only=False,
    ):
        super().__init__(config, dataset, configuration_key)
        self.vocab_size = vocab_size
        embedder_type = self.get_option("type")
        # verify the type points at an importable yaml
        if not config.exists(f"{embedder_type}.class_name"):
            config._import(embedder_type)
        self.embedder_type = embedder_type
        # TPU dtype policy (parallel.{param,compute}_dtype): parameters are
        # stored in param_dtype; embeddings are cast to compute_dtype before
        # scoring so the matmuls run at the MXU's native bf16 rate when
        # requested. Losses upcast to float32 (ops/losses.py).
        self.param_dtype = jnp.dtype(config.get("parallel.param_dtype"))
        self.compute_dtype = jnp.dtype(config.get("parallel.compute_dtype"))

    @staticmethod
    def create(
        config: Config,
        dataset: Dataset,
        configuration_key: str,
        vocab_size: int,
        init_for_load_only=False,
    ) -> "KgeEmbedder":
        """Factory: resolve ``<configuration_key>.type`` to a class and build it."""
        embedder_type = config.get_default(configuration_key + ".type")
        if not config.exists(f"{embedder_type}.class_name"):
            config._import(embedder_type)
        class_name = config.get(embedder_type + ".class_name")
        return misc.init_from(
            class_name,
            config.get("modules"),
            config=config,
            dataset=dataset,
            configuration_key=configuration_key,
            vocab_size=vocab_size,
            init_for_load_only=init_for_load_only,
        )

    @property
    def dim(self) -> int:
        raise NotImplementedError

    def init_params(self, rng: jax.Array) -> Params:
        raise NotImplementedError

    def embed(self, params: Params, indexes: jax.Array, ctx: Ctx) -> jax.Array:
        """Embeddings of the given vocabulary indexes, [n, dim]."""
        raise NotImplementedError

    def embed_all(self, params: Params, ctx: Ctx) -> jax.Array:
        """Embeddings of all vocabulary members, [vocab_size, dim]."""
        raise NotImplementedError

    def postprocess_params(self, params: Params) -> Params:
        """Post-batch parameter transform (e.g. L_p renormalization)."""
        return params

    def init_pretrained(self, params: Params, pretrained_embedder, pretrained_params,
                        self_ids: List[str], pretrained_ids: List[str],
                        ensure_all: bool = False) -> Params:
        """Overwrite rows whose external ids appear in a pretrained embedder."""
        self_arr = np.array(self_ids)
        pre_arr = np.array(pretrained_ids)
        common, self_ind, pre_ind = np.intersect1d(
            self_arr, pre_arr, return_indices=True
        )
        if ensure_all and len(common) != len(self_arr):
            raise ValueError(
                "pretrained embedder does not cover all ids "
                f"({len(common)} of {len(self_arr)})"
            )
        rows = pretrained_embedder.embed(
            pretrained_params, jnp.asarray(pre_ind), EVAL_CTX
        )
        new = dict(params)
        new["embeddings"] = params["embeddings"].at[jnp.asarray(self_ind)].set(rows)
        return new


class LookupEmbedder(KgeEmbedder):
    """Dense embedding table with dropout, normalization, and lp/n3 penalty.

    Matches the reference LookupEmbedder (kge/model/embedder/
    lookup_embedder.py): params = {"embeddings": [vocab, dim]}. The gradient
    of a lookup is a scatter-add computed by XLA; optimizer semantics stay
    dense (as the reference's default) for parity.
    """

    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )
        self.normalize_p = float(self.get_option("normalize.p"))
        self.space = self.check_option("space", ["euclidean", "complex"])
        if self.space == "complex":
            self.regularize = self.check_option("regularize", ["", "lp", "n3"])
        else:
            self.regularize = self.check_option("regularize", ["", "lp"])
        self._dim = int(self.get_option("dim"))
        round_to = self.get_option("round_dim_to")
        if len(round_to) > 0:
            self._dim = misc.round_to_points(round_to, self._dim)
        dropout = float(self.get_option("dropout"))
        if dropout < 0:
            if config.get("job.auto_correct"):
                config.log(
                    f"Setting {configuration_key}.dropout to 0., was {dropout}"
                )
                dropout = 0.0
        self.dropout = dropout

    @property
    def dim(self) -> int:
        return self._dim

    def init_params(self, rng: jax.Array) -> Params:
        init = self.initializer()
        table = init(rng, (self.vocab_size, self._dim))
        if self.normalize_p > 0:
            table = self._normalize(table)
        return {"embeddings": table.astype(self.param_dtype)}

    def _normalize(self, table: jax.Array) -> jax.Array:
        norm = jnp.linalg.norm(table, ord=self.normalize_p, axis=-1, keepdims=True)
        return table / jnp.maximum(norm, 1e-12)

    def postprocess_params(self, params: Params) -> Params:
        if self.normalize_p > 0:
            return {**params, "embeddings": self._normalize(params["embeddings"])}
        return params

    def embed(self, params: Params, indexes, ctx: Ctx) -> jax.Array:
        from kge_tpu.ops import pallas_ops

        emb = pallas_ops.embedding_gather(params["embeddings"], indexes)
        return _dropout(emb.astype(self.compute_dtype), self.dropout, ctx)

    def embed_all(self, params: Params, ctx: Ctx) -> jax.Array:
        emb = params["embeddings"].astype(self.compute_dtype)
        return _dropout(emb, self.dropout, ctx)

    def _abs_complex(self, parameters: jax.Array) -> jax.Array:
        re, im = jnp.split(parameters, 2, axis=1)
        # epsilon inside the sqrt keeps the gradient finite at exactly 0
        return jnp.sqrt(re ** 2 + im ** 2 + 1e-14)

    def penalty(self, params: Params, indexes=None, indexes_weight=None,
                num_index_rows=None, **kwargs):
        """lp / n3 penalty, optionally weighted by batch index frequency.

        Weighted form follows lookup_embedder.py:149-173 exactly, but without
        a dynamic-shape ``unique``: summing ``emb[idx]**p`` over all (possibly
        repeated) indexes equals summing ``emb_u**p * count_u`` over unique
        indexes, so the computation stays static-shaped under jit.
        ``indexes_weight`` (matching indexes' leading shape) zeroes padded
        rows; ``num_index_rows`` overrides the denominator (the true number
        of index rows when the batch is padded).
        """
        result = []
        weight = float(self.get_option("regularize_weight"))
        if self.regularize == "" or weight == 0.0:
            return result
        if self.regularize == "n3":
            p = 3
        else:
            p = self.get_option("regularize_args.p") if self.has_option(
                "regularize_args.p"
            ) else 2
        p = float(p)
        name = f"{self.configuration_key}.L{int(p) if p == int(p) else p}_penalty"
        if not self.get_option("regularize_args.weighted"):
            parameters = params["embeddings"]
            if self.regularize == "n3" and self.space == "complex":
                parameters = self._abs_complex(parameters)
                value = weight / p * jnp.sum(parameters ** p)
            else:
                value = weight / p * jnp.sum(jnp.abs(parameters) ** p)
            result.append((name, value))
        else:
            if indexes is None:
                raise ValueError("weighted regularization requires batch indexes")
            idx = jnp.asarray(indexes)
            if num_index_rows is None:
                num_index_rows = idx.shape[0]
            flat = idx.reshape(-1)
            parameters = params["embeddings"][flat]
            if self.regularize == "n3" and self.space == "complex":
                parameters = self._abs_complex(parameters)
            elif p % 2 == 1 and self.regularize != "n3":
                parameters = jnp.abs(parameters)
            contrib = jnp.sum(parameters ** p, axis=-1)  # [len(flat)]
            if indexes_weight is not None:
                w = jnp.broadcast_to(
                    jnp.asarray(indexes_weight).reshape(idx.shape[0], -1)[:, :1],
                    idx.shape,
                ).reshape(-1)
                contrib = contrib * w
            value = weight / p * jnp.sum(contrib) / num_index_rows
            result.append((name, value))
        return result


class ProjectionEmbedder(KgeEmbedder):
    """Base embedder followed by a bias-free linear projection.

    params = {"base": <base params>, "projection": [dim_out, dim_in]}
    (reference kge/model/embedder/projection_embedder.py).
    """

    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )
        self.base_embedder = KgeEmbedder.create(
            config, dataset, configuration_key + ".base_embedder", vocab_size,
            init_for_load_only,
        )
        self._dim = int(self.get_option("dim"))
        if self._dim < 0:
            self._dim = self.base_embedder.dim
            self.set_option("dim", self._dim, log=True)
        self.regularize = self.check_option("regularize", ["", "lp"])
        self.dropout = float(self.get_option("dropout"))

    @property
    def dim(self) -> int:
        return self._dim

    def init_params(self, rng: jax.Array) -> Params:
        rng_base, rng_proj = jax.random.split(rng)
        init = self.initializer()
        return {
            "base": self.base_embedder.init_params(rng_base),
            "projection": init(rng_proj, (self._dim, self.base_embedder.dim)),
        }

    def _project(self, emb: jax.Array, params: Params, ctx: Ctx) -> jax.Array:
        out = emb @ params["projection"].T
        return _dropout(out, self.dropout, ctx)

    def embed(self, params: Params, indexes, ctx: Ctx) -> jax.Array:
        return self._project(
            self.base_embedder.embed(params["base"], indexes, ctx.fold(1)),
            params, ctx.fold(2),
        )

    def embed_all(self, params: Params, ctx: Ctx) -> jax.Array:
        return self._project(
            self.base_embedder.embed_all(params["base"], ctx.fold(1)),
            params, ctx.fold(2),
        )

    def postprocess_params(self, params: Params) -> Params:
        return {**params, "base": self.base_embedder.postprocess_params(params["base"])}

    def penalty(self, params: Params, indexes=None, **kwargs):
        result = self.base_embedder.penalty(params["base"], indexes=indexes, **kwargs)
        weight = float(self.get_option("regularize_weight"))
        if self.regularize == "" or weight == 0.0:
            return result
        p = float(self.get_option("regularize_args.p"))
        result.append(
            (
                f"{self.configuration_key}.L{int(p) if p == int(p) else p}_penalty",
                weight * jnp.sum(jnp.abs(params["projection"]) ** p),
            )
        )
        return result


class Tucker3RelationEmbedder(ProjectionEmbedder):
    """ProjectionEmbedder with dim fixed to entity_dim^2 (Tucker core).

    Reference: kge/model/embedder/tucker3_relation_embedder.py.
    """

    def __init__(self, config, dataset, configuration_key, vocab_size,
                 init_for_load_only=False):
        # dim is set by the model (RelationalTucker3) before creation; when
        # unset, derive from the sibling entity embedder
        dim = config.get_default(configuration_key + ".dim")
        if dim < 0:
            ent_key = configuration_key.replace("relation_embedder", "entity_embedder")
            ent_dim = config.get_default(ent_key + ".dim")
            config.set(configuration_key + ".dim", ent_dim ** 2, create=True)
        super().__init__(
            config, dataset, configuration_key, vocab_size, init_for_load_only
        )


# -- model ---------------------------------------------------------------------


class KgeModel(KgeBase):
    """A KGE model: entity/relation embedders + relational scorer.

    Subjects and objects share one entity embedder (as in the reference,
    kge_model.py:651-655). All scoring functions are pure in ``params``.
    """

    def __init__(
        self,
        config: Config,
        dataset: Dataset,
        scorer: Union[RelationalScorer, type],
        create_embedders: bool = True,
        configuration_key=None,
        init_for_load_only=False,
    ):
        super().__init__(config, dataset, configuration_key)

        self._entity_embedder: Optional[KgeEmbedder] = None
        self._relation_embedder: Optional[KgeEmbedder] = None
        if create_embedders:
            self._entity_embedder = KgeEmbedder.create(
                config, dataset, self.configuration_key + ".entity_embedder",
                dataset.num_entities(), init_for_load_only=init_for_load_only,
            )
            self._relation_embedder = KgeEmbedder.create(
                config, dataset, self.configuration_key + ".relation_embedder",
                dataset.num_relations(), init_for_load_only=init_for_load_only,
            )

        if type(scorer) == type:
            self._scorer: RelationalScorer = scorer(
                config=config, dataset=dataset,
                configuration_key=self.configuration_key,
            )
        else:
            self._scorer = scorer

    def _init_configuration(self, config: Config, configuration_key):
        """Also resolve the model name; an unset configuration_key becomes the
        model name (reference kge_model.py:461-470), so subclasses may call
        this before ``super().__init__`` to read their options."""
        Configurable._init_configuration(self, config, configuration_key)
        if not hasattr(self, "model") or not getattr(self, "model", None):
            if self.configuration_key:
                self.model: str = config.get(self.configuration_key + ".type")
            else:
                self.model = config.get("model")
                self.configuration_key = self.model

    # -- factories ------------------------------------------------------------

    @staticmethod
    def create(
        config: Config,
        dataset: Dataset,
        configuration_key: Optional[str] = None,
        init_for_load_only=False,
    ) -> "KgeModel":
        """Factory: resolve the configured model name to a class and build it."""
        if configuration_key is not None:
            model_name = config.get(configuration_key + ".type")
        else:
            model_name = config.get("model")
        config._import(model_name)
        class_name = config.get(model_name + ".class_name")
        model = misc.init_from(
            class_name,
            config.get("modules"),
            config=config,
            dataset=dataset,
            configuration_key=configuration_key,
            init_for_load_only=init_for_load_only,
        )
        return model

    @staticmethod
    def create_default(
        model: Optional[str] = None,
        dataset: Optional[Union[Dataset, str]] = None,
        options: Dict[str, Any] = {},
        folder: Optional[str] = None,
    ) -> "KgeModel":
        """Create a model along with a default config and dataset."""
        import tempfile

        config = Config.from_options(options)
        if model is not None:
            config.load_options({"model": model})
        if isinstance(dataset, str):
            config.set("dataset.name", dataset)
        if folder is None:
            folder = tempfile.mkdtemp(prefix="kge-")
        config.folder = folder
        config.init_folder()
        if not isinstance(dataset, Dataset):
            dataset = Dataset.create(config)
        return KgeModel.create(config, dataset)

    @staticmethod
    def create_from(
        checkpoint: Dict,
        dataset: Optional[Dataset] = None,
        use_tmp_log_folder: bool = True,
        new_config: Config = None,
    ) -> Tuple["KgeModel", Params]:
        """Load model + params from a checkpoint created by this framework."""
        import tempfile

        config = Config.create_from(checkpoint)
        if new_config:
            config.load_config(new_config)
        if use_tmp_log_folder:
            config.log_folder = tempfile.mkdtemp(prefix="kge-")
        dataset = Dataset.create_from(checkpoint, config, dataset, preload_data=False)
        model = KgeModel.create(config, dataset, init_for_load_only=True)
        params = jax.tree_util.tree_map(jnp.asarray, checkpoint["model"][0])
        model.meta = checkpoint["model"][1] if len(checkpoint["model"]) > 1 else {}
        return model, params

    # -- parameters -----------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Params:
        rng_e, rng_r, rng_s = jax.random.split(rng, 3)
        params = {
            "entity_embedder": self._entity_embedder.init_params(rng_e),
            "relation_embedder": self._relation_embedder.init_params(rng_r),
        }
        scorer_params = self._scorer.init_params(rng_s)
        if scorer_params:
            params["scorer"] = scorer_params
        params = self._apply_pretrained(params)
        return params

    def _apply_pretrained(self, params: Params) -> Params:
        """Initialize embeddings from a packaged model when configured
        (``<embedder>.pretrain.model_filename``, reference
        kge_model.py:399-450): rows are matched by external id."""

        def pretrain_file(which: str) -> str:
            key = f"{which}.pretrain.model_filename"
            try:
                return Configurable(
                    self.config, self.configuration_key
                ).get_option(key)
            except KeyError:
                return ""

        ent_file = pretrain_file("entity_embedder")
        rel_file = pretrain_file("relation_embedder")
        if not ent_file and not rel_file:
            return params
        from kge_tpu.utils.io import load_checkpoint

        cache: Dict[str, Any] = {}

        def load(filename):
            if filename not in cache:
                self.config.log(
                    f"Initializing embeddings from {filename}"
                )
                checkpoint = load_checkpoint(filename)
                cache[filename] = KgeModel.create_from(checkpoint)
            return cache[filename]

        if ent_file:
            pre_model, pre_params = load(ent_file)
            ensure = Configurable(
                self.config, self.configuration_key
            ).get_option("entity_embedder.pretrain.ensure_all")
            params["entity_embedder"] = self._entity_embedder.init_pretrained(
                params["entity_embedder"],
                pre_model.get_s_embedder(),
                pre_params["entity_embedder"],
                self.dataset.entity_ids(),
                pre_model.dataset.entity_ids(),
                ensure_all=ensure,
            )
        if rel_file:
            pre_model, pre_params = load(rel_file)
            ensure = Configurable(
                self.config, self.configuration_key
            ).get_option("relation_embedder.pretrain.ensure_all")
            params["relation_embedder"] = self._relation_embedder.init_pretrained(
                params["relation_embedder"],
                pre_model.get_p_embedder(),
                pre_params["relation_embedder"],
                self.dataset.relation_ids(),
                pre_model.dataset.relation_ids(),
                ensure_all=ensure,
            )
        return params

    def postprocess_params(self, params: Params) -> Params:
        """Post-batch transforms (embedding renorm etc.), pure and jittable."""
        out = dict(params)
        out["entity_embedder"] = self._entity_embedder.postprocess_params(
            params["entity_embedder"]
        )
        out["relation_embedder"] = self._relation_embedder.postprocess_params(
            params["relation_embedder"]
        )
        return out

    #: Whether scoring functions index tables only with the ids they are
    #: passed (no internal id arithmetic). When True, a training job may
    #: rewrite a batch to "localized" ids over a gathered mini-table (one
    #: gather / one scatter per table per step). The reciprocal wrapper
    #: computes p + |R| internally and must opt out.
    supports_localized_batches: bool = True

    def num_parameters(self, params: Params) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))

    # -- embedder access -------------------------------------------------------

    def get_s_embedder(self) -> KgeEmbedder:
        return self._entity_embedder

    def get_o_embedder(self) -> KgeEmbedder:
        return self._entity_embedder

    def get_p_embedder(self) -> KgeEmbedder:
        return self._relation_embedder

    def get_scorer(self) -> RelationalScorer:
        return self._scorer

    def _scorer_params(self, params: Params) -> Params:
        return params.get("scorer", {})

    # -- penalty ---------------------------------------------------------------

    def penalty(self, params: Params, batch: Optional[Dict] = None, **kwargs):
        """Penalty terms of scorer + embedders.

        Entity penalties are doubled when the embedder is shared and
        unweighted, or computed over the concatenated (s, o) index matrix when
        weighted (reference kge_model.py:603-649).
        """
        result = list(self._scorer.penalty(self._scorer_params(params), **kwargs))
        if batch is not None and "triples" in batch:
            triples = batch["triples"]
            mask = batch.get("mask")
            if mask is not None:
                num_rows = jnp.sum(mask)
            else:
                num_rows = triples.shape[0]
            result += self.get_p_embedder().penalty(
                params["relation_embedder"], indexes=triples[:, P],
                indexes_weight=mask, num_index_rows=num_rows, **kwargs
            )
            weighted = self.get_s_embedder().get_option("regularize_args.weighted")
            if weighted:
                entity_indexes = jnp.stack(
                    [triples[:, S], triples[:, O]], axis=1
                )
                result += self.get_s_embedder().penalty(
                    params["entity_embedder"], indexes=entity_indexes,
                    indexes_weight=mask, num_index_rows=num_rows, **kwargs
                )
            else:
                ent = self.get_s_embedder().penalty(
                    params["entity_embedder"], indexes=None, **kwargs
                )
                result += [(name, 2 * value) for name, value in ent]
        else:
            result += self.get_p_embedder().penalty(
                params["relation_embedder"], **kwargs
            )
            ent = self.get_s_embedder().penalty(params["entity_embedder"], **kwargs)
            result += [(name, 2 * value) for name, value in ent]
        return result

    # -- scoring API -----------------------------------------------------------

    def score_spo(self, params: Params, s, p, o, direction=None,
                  ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Scores of the n triples (s_i, p_i, o_i); returns [n]."""
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx.fold(1))
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx.fold(2))
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx.fold(3))
        return self._scorer.score_emb(
            self._scorer_params(params), s_emb, p_emb, o_emb, "spo", ctx.fold(4)
        ).reshape(-1)

    def score_spo_neg(self, params: Params, triples, samples, slot: int,
                      ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Scores of each triple against its per-row candidate replacements
        of ``slot``: samples is [n, k] -> result [n, k]. Embeds the two kept
        slots once per row; only the candidates gather n*k table rows (the
        corrupted-triples formulation re-gathers every slot n*k times —
        3x the HBM gather traffic, the dominant cost of "triple"-implemented
        negative sampling on TPU)."""
        n, k = samples.shape
        embedders = (
            self.get_s_embedder(), self.get_p_embedder(), self.get_o_embedder()
        )
        tables = ("entity_embedder", "relation_embedder", "entity_embedder")
        embs = []
        for i in range(3):
            ids = samples.reshape(-1) if i == slot else triples[:, i]
            e = embedders[i].embed(params[tables[i]], ids, ctx.fold(1 + i))
            embs.append(e.reshape(n, k, -1) if i == slot else e)
        return self._scorer.score_emb_neg(
            self._scorer_params(params), embs[0], embs[1], embs[2], slot,
            ctx.fold(4),
        )

    def score_spo_neg_pooled(self, params: Params, triples, pool, sel,
                             pool_factor: int, slot: int,
                             ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Pool-implementation scoring for scorers whose many-targets forms
        are pairwise reductions (distance models): embed the pool once as a
        mini-table and materialize each row's selected candidates via a
        ``pool_factor``-way one-hot select over the pool's group axis —
        NOT a row gather. An [n, k] row gather from even a VMEM-sized
        mini-table materializes the [n, k, d] candidate tensor through HBM
        (~26 ms/step at d=128 FB15k-237 shapes, the entire step budget);
        the one-hot select is a ``pool_factor``-term fma chain XLA fuses
        straight into the distance reduction, so candidates never hit HBM
        (measured 0.31M -> >1M triples/s for TransE-L1 margin).
        Scoring itself runs via ``score_emb_neg``."""
        n = triples.shape[0]
        k = sel.shape[1]
        embedders = (
            self.get_s_embedder(), self.get_p_embedder(), self.get_o_embedder()
        )
        tables = ("entity_embedder", "relation_embedder", "entity_embedder")
        pool_emb = embedders[slot].embed(
            params[tables[slot]], pool, ctx.fold(5)
        )
        # [k, pool_factor, d] grouped pool; cand[i, j] = pool3[j, sel[i, j]]
        pool3 = pool_emb.reshape(k, pool_factor, -1)
        sel_oh = jax.nn.one_hot(sel, pool_factor, dtype=pool_emb.dtype)
        kept = [
            None if i == slot else embedders[i].embed(
                params[tables[i]], triples[:, i], ctx.fold(1 + i)
            )
            for i in range(3)
        ]
        sparams = self._scorer_params(params)
        sctx = ctx.fold(4)

        mode = self.config.get_default("negative_sampling.pooled_kernel")
        if mode == "always" or (mode == "auto"
                                and jax.default_backend() == "tpu"):
            spec = self._scorer.pooled_kernel_queries(
                sparams, kept[0], kept[1], kept[2], slot, sctx
            )
            if spec is not None:
                kind, queries = spec
                # measured on v5e (FB15k-237 shapes, 128 negatives, F=8):
                # the kernel wins everywhere except TransE-style l1 at
                # d<=128, where XLA's einsum-select path is ~6% ahead
                # (1.31M vs 1.23M t/s); TransE d=512 0.26M->0.42M, RotatE
                # d=1024 selfadv 0.09M->0.20M t/s
                small_l1 = kind == "l1" and queries[0].shape[-1] <= 128
                if mode == "always" or not small_l1:
                    from kge_tpu.ops.dist_pool import pooled_dist_scores

                    pools = (
                        (pool_emb,) if kind == "l1"
                        else tuple(jnp.split(pool_emb, 2, axis=1))
                    )
                    return pooled_dist_scores(
                        queries, pools, sel, pool_factor, kind
                    )

        def score_fn(pool3, sel_oh, *kept_embs):
            # HIGHEST keeps the select exact (default MXU precision would
            # round the candidates to bf16); the contraction is tiny
            cand = jnp.einsum(
                "njf,jfd->njd", sel_oh, pool3,
                precision=jax.lax.Precision.HIGHEST,
            )
            embs = [
                cand if i == slot else kept_embs[i] for i in range(3)
            ]
            return self._scorer.score_emb_neg(
                sparams, embs[0], embs[1], embs[2], slot, sctx
            )

        return score_fn(pool3, sel_oh, *kept)

    def score_sp(self, params: Params, s, p, o=None, ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Scores of (s_i, p_i, *) against all (or the given) objects; [n, m]."""
        if o is None:
            ring = self._ring_score(params, s, p, 2, ctx)
            if ring is not None:
                return ring
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx.fold(1))
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx.fold(2))
        if o is None:
            o_emb = self.get_o_embedder().embed_all(params["entity_embedder"], ctx.fold(3))
        else:
            o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx.fold(3))
        return self._scorer.score_emb(
            self._scorer_params(params), s_emb, p_emb, o_emb, "sp_", ctx.fold(4)
        )

    def score_po(self, params: Params, p, o, s=None, ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Scores of (*, p_i, o_i) against all (or the given) subjects; [n, m]."""
        if s is None:
            ring = self._ring_score(params, o, p, 0, ctx)
            if ring is not None:
                return ring
        if s is None:
            s_emb = self.get_s_embedder().embed_all(params["entity_embedder"], ctx.fold(1))
        else:
            s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx.fold(1))
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx.fold(2))
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx.fold(3))
        return self._scorer.score_emb(
            self._scorer_params(params), s_emb, p_emb, o_emb, "_po", ctx.fold(4)
        )

    def _ring_score(self, params: Params, ent_ids, rel_ids, slot: int,
                    ctx: Ctx):
        """Model-sharded full-vocabulary scoring via the explicit
        ppermute-ring schedule (parallel/ring.py), or None when not
        engaged (no model-axis sharding, parallel.ring_scoring=never,
        non-lookup embedders, embedding dropout in train mode, scorer
        params, or a non-factorizing scorer)."""
        mesh = getattr(self, "_ring_mesh", None)
        if mesh is None:
            return None
        if self.config.check(
            "parallel.ring_scoring", ["auto", "never"]
        ) == "never":
            return None
        ent_embedder = self.get_s_embedder()
        rel_embedder = self.get_p_embedder()
        if type(ent_embedder) is not LookupEmbedder:
            return None
        if ctx.train and (
            ent_embedder.dropout > 0 or rel_embedder.dropout > 0
        ):
            # the ring bypasses embed(); keep per-call dropout semantics
            return None
        sparams = self._scorer_params(params)
        if sparams:
            return None  # scorer params don't flow through shard_map here
        table = params["entity_embedder"]["embeddings"]
        if table.shape[0] % mesh.shape["model"] != 0:
            return None
        cdtype = ent_embedder.compute_dtype
        rel_emb = rel_embedder.embed(
            params["relation_embedder"], rel_ids, ctx.fold(2)
        )
        # probe the (static) factorization: query builder + target map
        dummy_e = jnp.zeros((1, table.shape[-1]), cdtype)
        dummy_r = jnp.zeros((1, rel_emb.shape[-1]), rel_emb.dtype)
        args = (dummy_e, dummy_r, None) if slot == 2 else (None, dummy_r, dummy_e)
        fac = self._scorer.factorize_slot({}, *args, slot, ctx.fold(4))
        if fac is None:
            return None
        tmap = fac[1]
        smap = fac[2] if len(fac) > 2 else None

        scorer = self._scorer

        def make_query(rows, rel):
            rows = rows.astype(cdtype)
            a = (rows, rel, None) if slot == 2 else (None, rel, rows)
            return scorer.factorize_slot({}, *a, slot, ctx.fold(4))[0]

        def map_targets(tbl):
            t = tbl.astype(cdtype)
            return tmap(t) if tmap is not None else t

        from kge_tpu.parallel.ring import ring_all_scores

        out = ring_all_scores(
            mesh, table, jnp.asarray(ent_ids), rel_emb, make_query,
            map_targets,
        )
        return out if smap is None else smap(out)

    def score_so(self, params: Params, s, o, p=None, ctx: Ctx = EVAL_CTX) -> jax.Array:
        """Scores of (s_i, *, o_i) against all (or the given) relations; [n, m]."""
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx.fold(1))
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx.fold(2))
        if p is None:
            p_emb = self.get_p_embedder().embed_all(params["relation_embedder"], ctx.fold(3))
        else:
            p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx.fold(3))
        return self._scorer.score_emb(
            self._scorer_params(params), s_emb, p_emb, o_emb, "s_o", ctx.fold(4)
        )

    def score_sp_po(self, params: Params, s, p, o, entity_subset=None,
                    ctx: Ctx = EVAL_CTX) -> jax.Array:
        """[score_sp(s,p,E) | score_po(p,o,E)] concatenated; [n, 2m].

        Used by chunked entity-ranking evaluation
        (reference kge_model.py:749-789).
        """
        if entity_subset is None:
            sp_ring = self._ring_score(params, s, p, 2, ctx.fold(5))
            po_ring = self._ring_score(params, o, p, 0, ctx.fold(6))
            if sp_ring is not None and po_ring is not None:
                return jnp.concatenate([sp_ring, po_ring], axis=1)
        s_emb = self.get_s_embedder().embed(params["entity_embedder"], s, ctx.fold(1))
        p_emb = self.get_p_embedder().embed(params["relation_embedder"], p, ctx.fold(2))
        o_emb = self.get_o_embedder().embed(params["entity_embedder"], o, ctx.fold(3))
        if entity_subset is not None:
            all_entities = self.get_s_embedder().embed(
                params["entity_embedder"], entity_subset, ctx.fold(4)
            )
        else:
            all_entities = self.get_s_embedder().embed_all(
                params["entity_embedder"], ctx.fold(4)
            )
        sp_scores = self._scorer.score_emb(
            self._scorer_params(params), s_emb, p_emb, all_entities, "sp_", ctx.fold(5)
        )
        po_scores = self._scorer.score_emb(
            self._scorer_params(params), all_entities, p_emb, o_emb, "_po", ctx.fold(6)
        )
        return jnp.concatenate([sp_scores, po_scores], axis=1)

    def score_slot_all_grouped(self, params: Params, triples, slot: int,
                               ctx: Ctx = EVAL_CTX):
        """Scores of every row against ALL candidates of ``slot``, in the
        grouped layout [n, ceil(V/128), 128] (vocab zero-padded to a
        multiple of 128).

        Same values as score_po/score_so/score_sp with targets=None, but
        the score matrix is produced NATIVELY in the tiled layout that the
        gather-free per-row pick (ops/pick.py) consumes — a [n, V] →
        [n, G, 128] reshape is a physical retile on TPU (the sublane dim
        changes), measured ~1.7 ms/step at FB15k-237 exact-NegSamp shapes.
        Returns None when the scorer has no query/target factorization;
        callers fall back to the flat path."""
        embedders = (
            self.get_s_embedder(), self.get_p_embedder(), self.get_o_embedder()
        )
        tables = ("entity_embedder", "relation_embedder", "entity_embedder")
        embs = [None, None, None]
        for i in range(3):
            if i != slot:
                embs[i] = embedders[i].embed(
                    params[tables[i]], triples[:, i], ctx.fold(1 + i)
                )
        fac = self._scorer.factorize_slot(
            self._scorer_params(params), embs[0], embs[1], embs[2], slot,
            ctx.fold(4),
        )
        if fac is None:
            return None
        q, target_map = fac[0], fac[1]
        score_map = fac[2] if len(fac) > 2 else None
        t = embedders[slot].embed_all(params[tables[slot]], ctx.fold(3))
        if target_map is not None:
            t = target_map(t)
        num = t.shape[0]
        padded = -(-num // 128) * 128
        if padded != num:
            t = jnp.pad(t, ((0, padded - num), (0, 0)))
        t3 = t.reshape(padded // 128, 128, t.shape[-1])
        out = jax.lax.dot_general(q, t3, (((1,), (2,)), ((), ())))
        return out if score_map is None else score_map(out)

    def score_all_grouped_multi(self, params: Params, triples, slots,
                                ctx: Ctx = EVAL_CTX, targets=None):
        """{slot: (pos [n], scores)} for several corrupted slots,
        embedding each triple slot ONCE.

        Without ``targets`` the per-slot scores cover the whole vocabulary
        in the grouped [n, G, 128] layout (see score_slot_all_grouped);
        with ``targets`` (a {slot: [m] id array} dict, e.g. the shared
        negative-sample rows) they are flat [n, m] matrices against those
        candidates.

        The per-slot path (score_spo + a scoring call per slot) embeds
        the batch rows up to 10 times; every embed's backward is a
        separate XLA scatter-add into the dense table gradient (measured
        1.85 ms/batch exact / ~46% of the shared NegSamp step at
        FB15k-237 shapes — scatters don't CSE the way the forward
        gathers do). Here s/p/o are embedded once and positives + all
        per-slot queries derive from the shared arrays, leaving one
        scatter per table slot. Embedding dropout is drawn once per slot
        (not once per scoring call) — callers gate on dropout being off
        to keep per-call-draw parity with the flat path. Returns None
        when the scorer doesn't factorize."""
        embedders = (
            self.get_s_embedder(), self.get_p_embedder(), self.get_o_embedder()
        )
        tables = ("entity_embedder", "relation_embedder", "entity_embedder")
        sparams = self._scorer_params(params)
        embs = [
            embedders[i].embed(params[tables[i]], triples[:, i], ctx.fold(1 + i))
            for i in range(3)
        ]
        pos = self._scorer.score_emb_spo(
            sparams, embs[0], embs[1], embs[2], ctx.fold(4)
        )
        out = {}
        for slot in slots:
            kept = [e if i != slot else None for i, e in enumerate(embs)]
            fac = self._scorer.factorize_slot(
                sparams, kept[0], kept[1], kept[2], slot, ctx.fold(5 + slot)
            )
            if fac is None:
                return None
            q, target_map = fac[0], fac[1]
            score_map = fac[2] if len(fac) > 2 else None
            slot_targets = None if targets is None else targets.get(slot)
            if slot_targets is not None:
                t = embedders[slot].embed(
                    params[tables[slot]], slot_targets, ctx.fold(8 + slot)
                )
                if target_map is not None:
                    t = target_map(t)
                dot = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())))
                out[slot] = (
                    pos, dot if score_map is None else score_map(dot),
                )
                continue
            t = embedders[slot].embed_all(
                params[tables[slot]], ctx.fold(8 + slot)
            )
            if target_map is not None:
                t = target_map(t)
            num = t.shape[0]
            padded = -(-num // 128) * 128
            if padded != num:
                t = jnp.pad(t, ((0, padded - num), (0, 0)))
            t3 = t.reshape(padded // 128, 128, t.shape[-1])
            dot = jax.lax.dot_general(q, t3, (((1,), (2,)), ((), ())))
            out[slot] = (pos, dot if score_map is None else score_map(dot))
        return out

    def prepare_job(self, job, **kwargs):
        super().prepare_job(job, **kwargs)
        self._entity_embedder.prepare_job(job, **kwargs)
        self._relation_embedder.prepare_job(job, **kwargs)
        device_ctx = getattr(job, "device_ctx", None)
        if (
            device_ctx is not None
            and device_ctx.active
            and device_ctx.mesh.shape.get("model", 1) > 1
        ):
            self._ring_mesh = device_ctx.mesh
