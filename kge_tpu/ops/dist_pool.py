"""Fused Pallas kernels for pooled distance-model negative scoring.

Distance-family scorers (TransE, RotatE — reference kge/model/transe.py:16-36,
rotate.py:20-70) reduce ``score = -||q - c||`` elementwise over the embedding
dim: there is no matmul combine, so the [n, k, d] candidate/diff tensors are
pure VPU work. Under XLA the chain materializes several [n, k, d] tensors
through HBM (candidate select output, backward cotangents, sign/inverse
factors — ~2 GB each at d=1024 FB15k-237 shapes; measured 70%+ of the train
step). These kernels keep the whole chain in VMEM: per (row-tile, dim-tile)
grid step they rebuild the candidates from the pool with an F-way one-hot
select, form the diffs, and accumulate the score reduction — HBM traffic is
just q [n, d], the pool [K*F, d], sel [n, K] and scores [n, K]. The custom
backward recomputes the same chain fused with both gradient contractions
(dq over the negatives axis, dpool over the batch axis).

Two score kinds:

- ``l1``:   score[i, j] = -sum_d |q[i, d] - c[i, j, d]|           (TransE L1)
- ``cmod``: score[i, j] = -sum_d sqrt(dre^2 + dim^2 + 1e-30)      (RotatE L1)

where ``c[i, j] = pool[sel[i, j] * K + j]`` (pool in f-major layout, see
``pooled_dist_scores``). L2 variants don't need kernels: they factorize onto
the MXU via the augmented-embedding trick (models/base.py factorize_slot).

Kernels run under ``interpret=True`` off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

_EPS = 1e-30


from kge_tpu.ops.kernel_utils import interpret as _interpret
from kge_tpu.ops.kernel_utils import pad_to as _pad_to


# ---------------------------------------------------------------- forward


def _select_cand(sel3, pool_ref, scratch, F: int, K: int, dtype):
    """Accumulate the [tn, K, dt] candidates into ``scratch`` via a
    statically-unrolled F-way one-hot accumulation. ``sel3`` is the
    [tn, K, 1] selection (hoisted by the caller so the lane->sublane
    relayout of the 2D sel block happens once per grid step, not once per
    pool slot). Writing through the scratch ref keeps ONE buffer live (a
    pure-value unrolled sum makes the Mosaic scheduler hold every term and
    blows the 16 MB scoped-vmem limit at useful tile sizes; a fori_loop
    fits but serializes ~2x slower)."""
    scratch[:] = (sel3 == 0).astype(dtype) * pool_ref[0:K, :][None, :, :]
    for f in range(1, F):
        scratch[:] += (
            (sel3 == f).astype(dtype)
            * pool_ref[f * K:(f + 1) * K, :][None, :, :]
        )
    return scratch[:]


def _fwd_kernel(sel_ref, *refs, npairs: int, F: int, K: int):
    """Grid (n_tiles, d_tiles), d innermost. refs = q*npairs, pool*npairs,
    out, scratch*npairs. Accumulates -sum_d dist into out across d steps."""
    from jax.experimental import pallas as pl

    qs = refs[:npairs]
    pools = refs[npairs:2 * npairs]
    out_ref = refs[2 * npairs]
    scratches = refs[2 * npairs + 1:]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sel3 = sel_ref[:][:, :, None]  # [tn, K, 1]
    diffs = []
    for p in range(npairs):
        q = qs[p][:]  # [tn, dt]
        c = _select_cand(sel3, pools[p], scratches[p], F, K, q.dtype)
        diffs.append(q[:, None, :] - c)  # [tn, K, dt]
    if npairs == 1:
        dist = jnp.abs(diffs[0])
    else:
        dist = jnp.sqrt(diffs[0] * diffs[0] + diffs[1] * diffs[1] + _EPS)
    out_ref[:] -= jnp.sum(dist, axis=2)


def _bwd_kernel(sel_ref, g_ref, *refs, npairs: int, F: int, K: int):
    """Grid (d_tiles, n_tiles), n innermost. refs = q*npairs, pool*npairs,
    dq*npairs, dpool*npairs, scratch*npairs. dq written per step; dpool
    accumulated over the batch axis. The per-pair factor (g * d(dist)/d(c))
    is staged through the candidate scratch so only one [tn, K, dt] buffer
    per pair is live."""
    from jax.experimental import pallas as pl

    qs = refs[:npairs]
    pools = refs[npairs:2 * npairs]
    dqs = refs[2 * npairs:3 * npairs]
    dpools = refs[3 * npairs:4 * npairs]
    scratches = refs[4 * npairs:]

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for p in range(npairs):
            dpools[p][:] = jnp.zeros_like(dpools[p])

    sel3 = sel_ref[:][:, :, None]  # [tn, K, 1]
    g3 = g_ref[:][:, :, None]
    if npairs == 1:
        c = _select_cand(sel3, pools[0], scratches[0], F, K, g3.dtype)
        # stage factor in the scratch: sign(diff) * g
        scratches[0][:] = jnp.sign(qs[0][:][:, None, :] - c) * g3
    else:
        c0 = _select_cand(sel3, pools[0], scratches[0], F, K, g3.dtype)
        scratches[0][:] = qs[0][:][:, None, :] - c0
        c1 = _select_cand(sel3, pools[1], scratches[1], F, K, g3.dtype)
        scratches[1][:] = qs[1][:][:, None, :] - c1
        d0, d1 = scratches[0][:], scratches[1][:]
        gi = g3 * jax.lax.rsqrt(d0 * d0 + d1 * d1 + _EPS)
        scratches[0][:] = d0 * gi
        scratches[1][:] = d1 * gi
    # score = -dist: dq = -sum_j factor, dc = +factor
    for p in range(npairs):
        factor = scratches[p][:]
        dqs[p][:] = -jnp.sum(factor, axis=1)
        for f in range(F):
            w = (sel3 == f).astype(g3.dtype)
            dpools[p][f * K:(f + 1) * K, :] += jnp.sum(w * factor, axis=0)


def _pool_fmajor(pool: jax.Array, K: int, F: int) -> jax.Array:
    """[K*F, d] j-major (row j*F+f, the sampler's layout) -> [F*K, d]
    f-major (row f*K+j, the kernel's layout)."""
    return pool.reshape(K, F, -1).transpose(1, 0, 2).reshape(F * K, -1)


def _run_fwd(qs, pools_fm, sel, *, F, K, tile_n, tile_d):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npairs = len(qs)
    n, d = qs[0].shape
    grid = (n // tile_n, d // tile_d)
    in_specs = [pl.BlockSpec((tile_n, K), lambda i, t: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((tile_n, tile_d), lambda i, t: (i, t),
                              memory_space=pltpu.VMEM)] * npairs
    in_specs += [pl.BlockSpec((F * K, tile_d), lambda i, t: (0, t),
                              memory_space=pltpu.VMEM)] * npairs
    return pl.pallas_call(
        functools.partial(_fwd_kernel, npairs=npairs, F=F, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, K), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, K), qs[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n, K, tile_d), qs[0].dtype)
        ] * npairs,
        interpret=_interpret(),
    )(sel, *qs, *pools_fm)


def _run_bwd(qs, pools_fm, sel, g, *, F, K, tile_n, tile_d):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npairs = len(qs)
    n, d = qs[0].shape
    grid = (d // tile_d, n // tile_n)
    in_specs = [
        pl.BlockSpec((tile_n, K), lambda t, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, K), lambda t, i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [pl.BlockSpec((tile_n, tile_d), lambda t, i: (i, t),
                              memory_space=pltpu.VMEM)] * npairs
    in_specs += [pl.BlockSpec((F * K, tile_d), lambda t, i: (0, t),
                              memory_space=pltpu.VMEM)] * npairs
    out_specs = [pl.BlockSpec((tile_n, tile_d), lambda t, i: (i, t),
                              memory_space=pltpu.VMEM)] * npairs
    out_specs += [pl.BlockSpec((F * K, tile_d), lambda t, i: (0, t),
                               memory_space=pltpu.VMEM)] * npairs
    out_shape = [jax.ShapeDtypeStruct((n, d), qs[0].dtype)] * npairs
    out_shape += [jax.ShapeDtypeStruct((F * K, d), qs[0].dtype)] * npairs
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, npairs=npairs, F=F, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_n, K, tile_d), qs[0].dtype)
        ] * npairs,
        interpret=_interpret(),
    )(sel, g, *qs, *pools_fm)
    return outs[:npairs], outs[npairs:]


def _tiles(K_pad: int, d_pad: int, n: int, npairs: int, temps: int):
    """Row/dim tile sizes sized so ``temps`` live [tn, K, dt] buffers per
    pair fit the 16 MB scoped-vmem limit with headroom."""
    tile_d = 256 if d_pad % 256 == 0 else 128  # d_pad is a multiple of 128
    budget = (10 << 20) // (temps * npairs * K_pad * tile_d * 4)
    tile_n = max(8, min(n, 1 << max(0, budget.bit_length() - 1)))
    while n % tile_n:
        tile_n //= 2
    return max(8, tile_n), tile_d


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pooled_scores(qs, pool3s, sel, F, kind):
    return _pooled_scores_impl(qs, pool3s, sel, F, kind)


def _pooled_scores_impl(qs, pool3s, sel, F, kind):
    n, d = qs[0].shape
    K = sel.shape[1]
    n_pad, K_pad, d_pad = _pad_to(n, 8), _pad_to(K, 128), _pad_to(d, 128)
    sel_p = jnp.pad(sel, ((0, n_pad - n), (0, K_pad - K)))
    qs_p = [jnp.pad(q, ((0, n_pad - n), (0, d_pad - d))) for q in qs]
    pools_fm = [
        jnp.pad(
            _pool_fmajor(p, K, F).reshape(F, K, -1),
            ((0, 0), (0, K_pad - K), (0, d_pad - d)),
        ).reshape(F * K_pad, d_pad)
        for p in pool3s
    ]
    tile_n, tile_d = _tiles(K_pad, d_pad, n_pad, len(qs), temps=2)
    out = _run_fwd(qs_p, pools_fm, sel_p, F=F, K=K_pad,
                   tile_n=tile_n, tile_d=tile_d)
    return out[:n, :K]


def _pooled_scores_fwd(qs, pool3s, sel, F, kind):
    return _pooled_scores_impl(qs, pool3s, sel, F, kind), (qs, pool3s, sel)


def _pooled_scores_bwd(F, kind, res, g):
    qs, pool3s, sel = res
    n, d = qs[0].shape
    K = sel.shape[1]
    n_pad, K_pad, d_pad = _pad_to(n, 8), _pad_to(K, 128), _pad_to(d, 128)
    sel_p = jnp.pad(sel, ((0, n_pad - n), (0, K_pad - K)))
    g_p = jnp.pad(g, ((0, n_pad - n), (0, K_pad - K)))
    qs_p = [jnp.pad(q, ((0, n_pad - n), (0, d_pad - d))) for q in qs]
    pools_fm = [
        jnp.pad(
            _pool_fmajor(p, K, F).reshape(F, K, -1),
            ((0, 0), (0, K_pad - K), (0, d_pad - d)),
        ).reshape(F * K_pad, d_pad)
        for p in pool3s
    ]
    tile_n, tile_d = _tiles(K_pad, d_pad, n_pad, len(qs), temps=3)
    dqs, dpools = _run_bwd(qs_p, pools_fm, sel_p, g_p, F=F, K=K_pad,
                           tile_n=tile_n, tile_d=tile_d)
    dqs = tuple(dq[:n, :d] for dq in dqs)
    # f-major [F*K_pad, d_pad] -> j-major [K*F, d]
    dpool3s = tuple(
        dp.reshape(F, K_pad, d_pad)[:, :K, :d]
        .transpose(1, 0, 2).reshape(K * F, d)
        for dp in dpools
    )
    return dqs, dpool3s, None


_pooled_scores.defvjp(_pooled_scores_fwd, _pooled_scores_bwd)


def pooled_dist_scores(
    queries: Sequence[jax.Array],
    pool_embs: Sequence[jax.Array],
    sel: jax.Array,
    pool_factor: int,
    kind: str,
) -> jax.Array:
    """Fused pooled distance scores [n, K].

    ``queries``: one [n, d] array (kind "l1") or the (re, im) pair (kind
    "cmod"). ``pool_embs``: matching pool mini-table(s) [K*pool_factor, d]
    in the sampler's j-major layout (row j*pool_factor + f holds candidate
    f of negative slot j). ``sel`` [n, K] int32 picks each row's candidate
    within its group. Differentiable in queries and pool_embs.
    """
    if kind not in ("l1", "cmod"):
        raise ValueError(f"unknown pooled distance kind: {kind}")
    if len(queries) != (1 if kind == "l1" else 2):
        raise ValueError("queries arity does not match kind")
    return _pooled_scores(
        tuple(queries), tuple(pool_embs), sel.astype(jnp.int32),
        int(pool_factor), kind,
    )
