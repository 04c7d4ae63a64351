"""Optimizers and learning-rate schedulers.

Functional re-implementations with torch.optim semantics (the reference
delegates to torch, kge/util/optimizer.py): Adagrad, Adam, AdamW, SGD,
RMSprop, Adadelta, Adamax — including regex-defined parameter groups with
per-group hyperparameters (optimizer.py:9-95) and the torch lr_scheduler
family driven from the epoch loop (optimizer.py:98-159).

The optimizer is a static object; its state is a pytree aligned with the
parameters, and ``update`` is pure/jittable. Learning-rate scale factors are
passed in as a traced vector (one entry per parameter group), so warmup and
schedulers never trigger recompilation.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kge_tpu.config import Config

Params = Any


# -- torch-style parameter naming ---------------------------------------------

_KEY_RENAMES = {
    "entity_embedder": "_entity_embedder",
    "relation_embedder": "_relation_embedder",
    "base_model": "_base_model",
    "scorer": "_scorer",
    "base": "_base_embedder",
}


def parameter_name(path: Tuple) -> str:
    """Torch-compatible dotted name for a param-pytree path, so that regex
    parameter groups written for the reference keep matching (e.g.
    ``.*_relation_embedder.*``)."""
    parts: List[str] = []
    for p in path:
        if hasattr(p, "key"):
            key = p.key
        elif hasattr(p, "idx"):
            key = str(p.idx)
        else:
            key = str(p)
        if key == "embeddings":
            parts.append("_embeddings.weight")
        elif key == "projection":
            parts.append("_projection.weight")
        else:
            parts.append(_KEY_RENAMES.get(key, key))
    return ".".join(parts)


def parameter_names(params: Params) -> List[str]:
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    return [parameter_name(path) for path, _ in paths]


# -- per-leaf optimizer rules --------------------------------------------------

# every rule: init(param, args) -> state-dict of arrays;
#             update(grad, state, param, lr, step, args) -> (delta, new_state)
# `delta` is the value to *add* to the parameter.


def _pow_const(base: float, t):
    """base ** t for a constant base and traced exponent, as exp(t ln b):
    Mosaic (the fused row-update kernel, pallas_ops.fused_sorted_update)
    lowers exp but not powf with a non-constant exponent. ~1 ulp from
    powf — inside every optimizer's loose (1 - beta^t) bias term."""
    import math

    return jnp.exp(t * math.log(base))


def _wd(grad, param, args):
    wd = args.get("weight_decay", 0.0)
    if wd:
        return grad + wd * param
    return grad


def _adagrad_init(param, args):
    iv = args.get("initial_accumulator_value", 0.0)
    return {"sum": jnp.full_like(param, iv)}


def _adagrad_update(grad, state, param, lr, step, args):
    eps = args.get("eps", 1e-10)
    lr_decay = args.get("lr_decay", 0.0)
    grad = _wd(grad, param, args)
    clr = lr / (1 + step * lr_decay)
    new_sum = state["sum"] + grad * grad
    delta = -clr * grad / (jnp.sqrt(new_sum) + eps)
    return delta, {"sum": new_sum}


def _adam_init(param, args):
    return {"m": jnp.zeros_like(param), "v": jnp.zeros_like(param)}


def _adam_update(grad, state, param, lr, step, args, decoupled=False):
    b1, b2 = args.get("betas", (0.9, 0.999))
    eps = args.get("eps", 1e-8)
    wd = args.get("weight_decay", 0.0)
    if not decoupled:
        grad = _wd(grad, param, args)
    m = b1 * state["m"] + (1 - b1) * grad
    v = b2 * state["v"] + (1 - b2) * grad * grad
    t = step + 1
    m_hat = m / (1 - _pow_const(b1, t))
    v_hat = v / (1 - _pow_const(b2, t))
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
    if decoupled and wd:
        delta = delta - lr * wd * param
    return delta, {"m": m, "v": v}


def _adamax_init(param, args):
    return {"m": jnp.zeros_like(param), "u": jnp.zeros_like(param)}


def _adamax_update(grad, state, param, lr, step, args):
    b1, b2 = args.get("betas", (0.9, 0.999))
    eps = args.get("eps", 1e-8)
    grad = _wd(grad, param, args)
    m = b1 * state["m"] + (1 - b1) * grad
    u = jnp.maximum(b2 * state["u"], jnp.abs(grad) + eps)
    t = step + 1
    delta = -lr / (1 - _pow_const(b1, t)) * m / u
    return delta, {"m": m, "u": u}


def _sgd_init(param, args):
    if args.get("momentum", 0.0):
        return {"momentum": jnp.zeros_like(param)}
    return {}


def _sgd_update(grad, state, param, lr, step, args):
    momentum = args.get("momentum", 0.0)
    dampening = args.get("dampening", 0.0)
    nesterov = args.get("nesterov", False)
    grad = _wd(grad, param, args)
    if momentum:
        buf = jnp.where(
            step == 0, grad, momentum * state["momentum"] + (1 - dampening) * grad
        )
        d = grad + momentum * buf if nesterov else buf
        return -lr * d, {"momentum": buf}
    return -lr * grad, {}


def _rmsprop_init(param, args):
    state = {"sq": jnp.zeros_like(param)}
    if args.get("momentum", 0.0):
        state["momentum"] = jnp.zeros_like(param)
    if args.get("centered", False):
        state["avg"] = jnp.zeros_like(param)
    return state


def _rmsprop_update(grad, state, param, lr, step, args):
    alpha = args.get("alpha", 0.99)
    eps = args.get("eps", 1e-8)
    momentum = args.get("momentum", 0.0)
    centered = args.get("centered", False)
    grad = _wd(grad, param, args)
    sq = alpha * state["sq"] + (1 - alpha) * grad * grad
    new_state = {"sq": sq}
    if centered:
        avg = alpha * state["avg"] + (1 - alpha) * grad
        denom = jnp.sqrt(sq - avg * avg + eps)
        new_state["avg"] = avg
    else:
        denom = jnp.sqrt(sq) + eps
    if momentum:
        buf = momentum * state["momentum"] + grad / denom
        new_state["momentum"] = buf
        return -lr * buf, new_state
    return -lr * grad / denom, new_state


def _adadelta_init(param, args):
    return {"sq": jnp.zeros_like(param), "acc": jnp.zeros_like(param)}


def _adadelta_update(grad, state, param, lr, step, args):
    rho = args.get("rho", 0.9)
    eps = args.get("eps", 1e-6)
    grad = _wd(grad, param, args)
    sq = rho * state["sq"] + (1 - rho) * grad * grad
    delta = jnp.sqrt(state["acc"] + eps) / jnp.sqrt(sq + eps) * grad
    acc = rho * state["acc"] + (1 - rho) * delta * delta
    return -lr * delta, {"sq": sq, "acc": acc}


_RULES = {
    "adagrad": (_adagrad_init, _adagrad_update, 0.01),
    "adam": (_adam_init, lambda *a: _adam_update(*a, decoupled=False), 1e-3),
    "adamw": (_adam_init, lambda *a: _adam_update(*a, decoupled=True), 1e-3),
    "adamax": (_adamax_init, _adamax_update, 2e-3),
    "sgd": (_sgd_init, _sgd_update, None),  # torch SGD requires lr
    "rmsprop": (_rmsprop_init, _rmsprop_update, 1e-2),
    "adadelta": (_adadelta_init, _adadelta_update, 1.0),
}


class ParameterGroup:
    def __init__(self, name: str, opt_type: str, args: Dict[str, Any]):
        self.name = name
        self.opt_type = opt_type.lower()
        if self.opt_type not in _RULES:
            raise ValueError(f"unsupported optimizer type: {opt_type}")
        self.args = dict(args)
        self.args.pop("+++", None)
        lr = self.args.pop("lr", None)
        default_lr = _RULES[self.opt_type][2]
        if lr is None:
            if default_lr is None:
                raise ValueError(f"optimizer {opt_type} requires args.lr")
            lr = default_lr
        self.base_lr = float(lr)
        # torch-style betas may arrive as a list from yaml
        if "betas" in self.args:
            self.args["betas"] = tuple(self.args["betas"])


class KgeOptimizer:
    """Parameter-grouped optimizer over a param pytree.

    Groups are defined by ``train.optimizer.<group>.regex`` partitioning the
    torch-style parameter names; the ``default`` group takes the rest.
    Overlapping regexes are an error (reference optimizer.py:48-72).
    """

    def __init__(self, config: Config, params: Params):
        opt_cfg = config.get("train.optimizer")
        groups: List[ParameterGroup] = []
        regexes: List[Optional[str]] = []
        for name, spec in opt_cfg.items():
            if name in ("+++",):
                continue
            if name == "default":
                continue
            if "regex" not in spec:
                raise ValueError(
                    f"optimizer group {name} misses a regex key"
                )
            opt_type = spec.get("type", opt_cfg["default"].get("type", "Adagrad"))
            args = dict(opt_cfg["default"].get("args", {}))
            args.update(spec.get("args", {}))
            groups.append(ParameterGroup(name, opt_type, args))
            regexes.append(spec["regex"])
        default_spec = opt_cfg.get("default", {"type": "Adagrad", "args": {}})
        groups.append(
            ParameterGroup(
                "default", default_spec.get("type", "Adagrad"),
                default_spec.get("args", {}),
            )
        )
        regexes.append(None)
        self.groups = groups

        # assign each parameter leaf to exactly one group
        paths = jax.tree_util.tree_flatten_with_path(params)[0]
        names = [parameter_name(path) for path, _ in paths]
        labels: List[int] = []
        for n in names:
            matched = [
                i for i, rgx in enumerate(regexes)
                if rgx is not None and re.search(rgx, n)
            ]
            if len(matched) > 1:
                raise ValueError(
                    f"parameter {n} matched by multiple optimizer groups: "
                    f"{[groups[i].name for i in matched]}"
                )
            labels.append(matched[0] if matched else len(groups) - 1)
        for i, g in enumerate(groups[:-1]):
            if i not in labels:
                raise ValueError(
                    f"optimizer group {g.name} (regex {regexes[i]}) matched "
                    "no parameters"
                )
        self._labels = labels
        self._treedef = jax.tree_util.tree_structure(params)
        self.parameter_names_list = names

    @staticmethod
    def create(config: Config, params: Params) -> "KgeOptimizer":
        return KgeOptimizer(config, params)

    @property
    def num_groups(self) -> int:
        return len(self.groups)

    def base_lrs(self) -> np.ndarray:
        return np.array([g.base_lr for g in self.groups], dtype=np.float32)

    def init(self, params: Params):
        leaves = jax.tree_util.tree_leaves(params)
        states = []
        for leaf, label in zip(leaves, self._labels):
            g = self.groups[label]
            init_fn = _RULES[g.opt_type][0]
            states.append(init_fn(leaf, g.args))
        return {"leaves": states, "step": jnp.zeros((), jnp.int32)}

    def update(self, grads: Params, opt_state, params: Params, lr: jax.Array):
        """Apply one optimizer step.

        ``lr`` is a vector of per-group learning rates (base lr x warmup x
        scheduler factor), traced so it can change without recompilation.
        Returns (new_params, new_opt_state).
        """
        grad_leaves = jax.tree_util.tree_leaves(grads)
        param_leaves = jax.tree_util.tree_leaves(params)
        step = opt_state["step"]
        new_params = []
        new_states = []
        for g_leaf, p_leaf, s_leaf, label in zip(
            grad_leaves, param_leaves, opt_state["leaves"], self._labels
        ):
            grp = self.groups[label]
            update_fn = _RULES[grp.opt_type][1]
            delta, new_s = update_fn(
                g_leaf, s_leaf, p_leaf, lr[label], step, grp.args
            )
            new_params.append(p_leaf + delta)
            new_states.append(new_s)
        return (
            jax.tree_util.tree_unflatten(self._treedef, new_params),
            {"leaves": new_states, "step": step + 1},
        )


    # -- sparse row updates ------------------------------------------------------

    def leaf_index(self, params: Params, *path_keys: str) -> Optional[int]:
        """Flattened-leaf index of params[path_keys[0]][path_keys[1]]..., or
        None when absent."""
        paths = jax.tree_util.tree_flatten_with_path(params)[0]
        want = list(path_keys)
        for i, (path, _) in enumerate(paths):
            keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
            if keys == want:
                return i
        return None

    def supports_sparse_rows(self, leaf_index: int) -> bool:
        """True when the leaf's rule is exact under row-sparse application:
        rows with zero gradient are fixed points (Adagrad without weight
        decay; SGD without momentum/weight decay)."""
        grp = self.groups[self._labels[leaf_index]]
        args = grp.args
        if args.get("weight_decay", 0.0):
            return False
        if grp.opt_type == "adagrad":
            return True
        if grp.opt_type == "sgd" and not args.get("momentum", 0.0):
            return True
        return False

    def supports_fused_rows(self, leaf_index: int) -> bool:
        """True when the leaf can take a one-pass dense-semantics update
        from row gradients (ops/pallas_ops.fused_sorted_update): any table
        rule with param-shaped state — Adam's moment decay, weight decay
        etc. are applied to untouched rows via a zero gradient tile,
        exactly as in the dense step. Complements supports_sparse_rows,
        which requires zero-gradient rows to be fixed points."""
        return self.groups[self._labels[leaf_index]].opt_type in _RULES

    def fused_row_update(self, leaf_index: int, param_leaf, state_leaf,
                         rows, row_grads, lr, step):
        """Dense-semantics optimizer step of one leaf from row gradients,
        without materializing the dense gradient: per table tile, the
        tile's gradient is accumulated from the sorted updates by one-hot
        MXU matmuls and the elementwise rule runs on the param/state tiles
        in the same VMEM round trip (fused_sorted_update). Returns
        (new_param_leaf, new_state_leaf)."""
        from kge_tpu.ops.pallas_ops import fused_sorted_update

        grp = self.groups[self._labels[leaf_index]]
        update_fn = _RULES[grp.opt_type][1]
        keys = sorted(state_leaf.keys())
        states = tuple(state_leaf[k] for k in keys)
        args = grp.args

        def rule(g, param, state_tuple, lr_, step_):
            st = dict(zip(keys, state_tuple))
            delta, new_state = update_fn(g, st, param, lr_, step_, args)
            return param + delta, tuple(new_state[k] for k in keys)

        new_param, new_states = fused_sorted_update(
            rows, row_grads, param_leaf, states, lr, step, rule
        )
        return new_param, dict(zip(keys, new_states))

    def sparse_row_update(self, leaf_index: int, param_leaf, state_leaf,
                          rows, row_grads, lr, step):
        """Update only the given (possibly duplicate) rows of one leaf;
        exact equivalent of the dense rule for eligible optimizers.

        Duplicate rows are combined by a sorted segment sum; every position
        of a segment writes the identical updated value, so the final
        scatter-set is deterministic. Returns (new_param_leaf,
        new_state_leaf).
        """
        grp = self.groups[self._labels[leaf_index]]
        args = grp.args
        order = jnp.argsort(rows)
        rs = rows[order]
        gs = row_grads[order]
        first = jnp.concatenate(
            [jnp.ones(1, bool), rs[1:] != rs[:-1]]
        )
        seg = jnp.cumsum(first) - 1
        gsum = jax.ops.segment_sum(
            gs, seg, num_segments=rs.shape[0], indices_are_sorted=True
        )
        g = gsum[seg]  # per-position combined gradient of its row

        from kge_tpu.ops.pallas_ops import rows_set

        clr = lr / (1 + step * args.get("lr_decay", 0.0))
        if grp.opt_type == "adagrad":
            eps = args.get("eps", 1e-10)
            srows = state_leaf["sum"][rs] + g * g
            prows = param_leaf[rs] - clr * g / (jnp.sqrt(srows) + eps)
            new_state = {"sum": rows_set(state_leaf["sum"], rs, srows)}
        elif grp.opt_type == "sgd":
            prows = param_leaf[rs] - clr * g
            new_state = state_leaf
        else:  # pragma: no cover - guarded by supports_sparse_rows
            raise NotImplementedError(grp.opt_type)
        new_param = rows_set(param_leaf, rs, prows)
        return new_param, new_state

    def update_with_sparse_leaves(self, grads, opt_state, params, lr,
                                  sparse: Dict[int, Tuple]):
        """Like ``update`` but leaves in ``sparse`` (leaf index -> (rows,
        row_grads)) receive a row-sparse update; their entry in ``grads``
        is ignored (pass any placeholder)."""
        grad_leaves = jax.tree_util.tree_leaves(grads)
        param_leaves = jax.tree_util.tree_leaves(params)
        step = opt_state["step"]
        new_params = []
        new_states = []
        for i, (g_leaf, p_leaf, s_leaf, label) in enumerate(zip(
            grad_leaves, param_leaves, opt_state["leaves"], self._labels
        )):
            grp = self.groups[label]
            if i in sparse:
                rows, row_grads = sparse[i]
                if self.supports_sparse_rows(i):
                    p_new, s_new = self.sparse_row_update(
                        i, p_leaf, s_leaf, rows, row_grads, lr[label], step
                    )
                else:
                    p_new, s_new = self.fused_row_update(
                        i, p_leaf, s_leaf, rows, row_grads, lr[label], step
                    )
                new_params.append(p_new)
                new_states.append(s_new)
                continue
            update_fn = _RULES[grp.opt_type][1]
            delta, new_s = update_fn(
                g_leaf, s_leaf, p_leaf, lr[label], step, grp.args
            )
            new_params.append(p_leaf + delta)
            new_states.append(new_s)
        return (
            jax.tree_util.tree_unflatten(self._treedef, new_params),
            {"leaves": new_states, "step": step + 1},
        )


class KgeLRScheduler:
    """Learning-rate scheduling with torch.optim.lr_scheduler semantics.

    Maintains a scalar multiplicative factor applied to all groups' base
    learning rates. Metric-based scheduling (ReduceLROnPlateau) is stepped
    only after validation epochs (reference optimizer.py:125-159).
    """

    def __init__(self, config: Config):
        self.config = config
        name = config.get("train.lr_scheduler")
        args = dict(config.get("train.lr_scheduler_args"))
        args.pop("+++", None)
        self._name = name
        self._args = args
        self._metric_based = name == "ReduceLROnPlateau"
        self._factor = 1.0
        self._epoch = 0
        # ReduceLROnPlateau state
        self._best = None
        self._num_bad_epochs = 0
        self._cooldown_counter = 0
        if name == "ReduceLROnPlateau":
            if "mode" not in args:
                mode = "max" if config.get("valid.metric_max") else "min"
                args["mode"] = mode
                config.log(
                    f"Setting ReduceLROnPlateau mode to {mode} from valid.metric_max"
                )
            if config.get("valid.every") <= 0:
                raise ValueError(
                    "metric-based lr scheduling requires validation "
                    "(valid.every > 0)"
                )
        elif name and name not in (
            "StepLR", "MultiStepLR", "ExponentialLR", "CosineAnnealingLR",
            "ConstantLR", "LinearLR",
        ):
            raise ValueError(f"unsupported lr scheduler: {name}")

    @property
    def metric_based(self) -> bool:
        return self._metric_based

    @property
    def factor(self) -> float:
        return self._factor

    def step(self, metric: Optional[float] = None):
        if not self._name:
            return
        self._epoch += 1
        a = self._args
        if self._name == "StepLR":
            if self._epoch % int(a.get("step_size", 1)) == 0:
                self._factor *= a.get("gamma", 0.1)
        elif self._name == "MultiStepLR":
            if self._epoch in set(a.get("milestones", [])):
                self._factor *= a.get("gamma", 0.1)
        elif self._name == "ExponentialLR":
            self._factor *= a.get("gamma", 1.0)
        elif self._name == "CosineAnnealingLR":
            t_max = a.get("T_max", 10)
            eta_min = a.get("eta_min", 0.0)
            self._factor = (
                eta_min + (1.0 - eta_min)
                * (1 + math.cos(math.pi * min(self._epoch, t_max) / t_max)) / 2
            )
        elif self._name == "ConstantLR":
            f = a.get("factor", 1.0 / 3)
            total = a.get("total_iters", 5)
            self._factor = f if self._epoch < total else 1.0
        elif self._name == "LinearLR":
            start = a.get("start_factor", 1.0 / 3)
            end = a.get("end_factor", 1.0)
            total = a.get("total_iters", 5)
            t = min(self._epoch, total)
            self._factor = start + (end - start) * t / total
        elif self._name == "ReduceLROnPlateau":
            if metric is None:
                return
            mode = a.get("mode", "max")
            threshold = a.get("threshold", 1e-4)
            threshold_mode = a.get("threshold_mode", "rel")
            patience = a.get("patience", 10)
            cooldown = a.get("cooldown", 0)
            factor = a.get("factor", 0.1)
            min_lr = a.get("min_lr", 0.0)

            def better(current, best):
                if threshold_mode == "rel":
                    eps = best * threshold if mode == "max" else -best * threshold
                    return current > best + eps if mode == "max" else \
                        current < best - best * threshold
                eps = threshold
                return current > best + eps if mode == "max" else \
                    current < best - eps

            if self._best is None or better(metric, self._best):
                self._best = metric
                self._num_bad_epochs = 0
            elif self._cooldown_counter > 0:
                self._cooldown_counter -= 1
                self._num_bad_epochs = 0
            else:
                self._num_bad_epochs += 1
                if self._num_bad_epochs > patience:
                    self._factor = max(self._factor * factor, min_lr)
                    self._cooldown_counter = cooldown
                    self._num_bad_epochs = 0
                    self.config.log(
                        f"Reduced learning-rate factor to {self._factor}"
                    )

    def state_dict(self) -> Dict[str, Any]:
        return {
            "factor": self._factor,
            "epoch": self._epoch,
            "best": self._best,
            "num_bad_epochs": self._num_bad_epochs,
            "cooldown_counter": self._cooldown_counter,
        }

    def load_state_dict(self, state: Dict[str, Any]):
        if not state:
            return
        self._factor = state.get("factor", 1.0)
        self._epoch = state.get("epoch", 0)
        self._best = state.get("best")
        self._num_bad_epochs = state.get("num_bad_epochs", 0)
        self._cooldown_counter = state.get("cooldown_counter", 0)
