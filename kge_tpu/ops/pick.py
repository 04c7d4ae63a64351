"""Per-row column extraction from a score matrix, TPU-fast.

``picked_scores(S, idx)`` computes ``S[b, idx[b, k]]`` — the op behind
exact per-row negative sampling (score against all entities, then extract
each row's sampled columns; reference kge/util/sampler.py:263-356 reaches
the same values through torch gathers).

XLA lowers ``take_along_axis`` on TPU to a near-serial per-index gather
(~26 ns/element; ~60 ms for 8192x128 picks — the wall that capped exact
per-row NegSamp at ~134k triples/s). Here the pick is reformulated as a
two-level one-hot contraction that never gathers:

    g, l = idx // 128, idx % 128           (group, lane)
    U[b,q,:] = sum_g onehot(g)[b,q,g] * S[b,g*128:(g+1)*128]   (MXU matmul)
    out[b,q] = sum_l U[b,q,l] * onehot(l)[b,q,l]               (VPU reduce)

Each output element is a sum with exactly one nonzero term whose factor is
1.0, so the extraction is BIT-EXACT in any dtype (one-hots are kept in
bfloat16 — exact — to halve their HBM traffic). The backward pass is a
custom VJP emitting the dense cotangent dS with one batched matmul instead
of XLA's serialized scatter. Cost is ~B*K*V one-hot MACs on the MXU —
measured 4.4x faster end-to-end than take_along_axis at FB15k-237 shapes
(8192x128 picks from [8192, 14541]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def picked_scores(S: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take_along_axis(S, idx, axis=1)`` (bit-exact), TPU-fast.

    S: [n, V] scores; idx: [n, K] int columns in [0, V). Returns [n, K] in
    S.dtype. On CPU (hardware gather is fast there) delegates to
    take_along_axis so tests exercise identical semantics.
    """
    if _backend() != "tpu":
        return jnp.take_along_axis(S, idx, axis=1)
    return _onehot_pick(S, idx)


def picked_scores_grouped(S3: jax.Array, idx: jax.Array) -> jax.Array:
    """``S3[b, idx[b,k] // 128, idx[b,k] % 128]`` — the pick for score
    matrices produced natively in the grouped [n, G, 128] layout
    (KgeModel.score_slot_all_grouped), skipping the [n, V] retile both
    here and in the producing matmul. Bit-exact like ``picked_scores``."""
    return _onehot_pick_grouped(S3, idx)


@jax.custom_vjp
def _onehot_pick_grouped(S3, idx):
    return _onehot_pick_grouped_fwd(S3, idx)[0]


def _onehot_pick_grouped_fwd(S3, idx):
    Gh, P = _split_idx(idx, S3.shape[1])
    U = jax.lax.dot_general(
        Gh, S3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=S3.dtype,
    )  # [n, K, 128]
    out = jnp.sum(U * P, axis=2).astype(S3.dtype)
    return out, (idx, S3.shape[1])


def _onehot_pick_grouped_bwd(res, dout):
    idx, G = res
    Gh, P = _split_idx(idx, G)
    W = Gh * dout[:, :, None]
    dS3 = jax.lax.dot_general(
        W, P, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dout.dtype,
    )  # [n, G, 128]
    return dS3, None


_onehot_pick_grouped.defvjp(_onehot_pick_grouped_fwd, _onehot_pick_grouped_bwd)


@jax.custom_vjp
def _onehot_pick(S, idx):
    return _onehot_pick_fwd(S, idx)[0]


def _split_idx(idx, G):
    idx = idx.astype(jnp.int32)
    g = idx // 128
    lane = idx - g * 128
    Gh = jax.nn.one_hot(g, G, dtype=jnp.bfloat16)     # [n, K, G]
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)  # [n, K, 128]
    return Gh, P


def _onehot_pick_fwd(S, idx):
    n, V = S.shape
    VP = ((V + 127) // 128) * 128
    G = VP // 128
    if VP != V:
        S3 = jnp.pad(S, ((0, 0), (0, VP - V))).reshape(n, G, 128)
    else:
        S3 = S.reshape(n, G, 128)
    Gh, P = _split_idx(idx, G)
    # U[b,q,l] = S[b, g_q*128 + l]: one-hot row-select on the MXU; exact
    # because exactly one product per output is nonzero with factor 1.0
    U = jax.lax.dot_general(
        Gh, S3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=S.dtype,
    )  # [n, K, 128]
    out = jnp.sum(U * P, axis=2).astype(S.dtype)
    return out, (idx, n, V)


def _onehot_pick_bwd(res, dout):
    idx, n, V = res
    VP = ((V + 127) // 128) * 128
    G = VP // 128
    Gh, P = _split_idx(idx, G)
    # dS[b, g_q*128 + l_q] += dout[b, q]; duplicates accumulate in the
    # matmul (f32), matching take_along_axis's scatter-add cotangent
    W = Gh * dout[:, :, None].astype(dout.dtype)  # [n, K, G]
    dS3 = jax.lax.dot_general(
        W, P, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dout.dtype,
    )  # [n, G, 128]
    dS = dS3.reshape(n, VP)
    if VP != V:
        dS = dS[:, :V]
    return dS, None


_onehot_pick.defvjp(_onehot_pick_fwd, _onehot_pick_bwd)
