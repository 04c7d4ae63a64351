"""Fused filtered-rank Pallas kernel (SURVEY §7.8): score chunk + tie
count + label extraction without materializing the batch×|E| score matrix.

Entity-ranking eval needs, per query row and direction: how many candidate
scores rank strictly above the pivot, how many tie with it (isclose), and
the scores at the row's filtered-label columns. The XLA path materializes
the [n, E] score matrix in HBM and pays one full-matrix pass per consumer.
This kernel computes a [tn, te] score block on the MXU per grid step
(queries and targets cast to bfloat16, f32 accumulation — the same
precision class as XLA's default-precision matmul, so a pivot computed
outside with bf16-rounded inputs self-ties within the tie tolerances),
applies the optional monotone score epilogue, and accumulates the
greater/close counts and label values in VMEM — HBM traffic is q, the
target table, and [n]-sized outputs.

NaN/-inf conventions match EntityRankingJob._close_greater (reference
kge/job/eval_entity_ranking.py:598-618).

Runs under ``interpret=True`` off-TPU so CPU tests exercise the same code
path (without the bf16 input rounding — interpret mode keeps f32).

STATUS (measured v5e, FB15k-237 eval shapes: n=1024, E=14541, D=1024,
kmax=32): ~39 ms device per direction per 20-batch epoch vs ~40 ms for
the ENTIRE two-direction XLA eval kernel — the multi-pass XLA path's
HBM cost (~6-9 ms) is cheaper than this kernel's per-window VPU work, so
the XLA path remains eval's default and this kernel is NOT wired in
(same outcome as ops/pallas_ops.sorted_scatter_add: real, tested,
outperformed by XLA at the benchmark shapes). Where it should win and
what a future round should wire: vocabularies whose [n, E] score matrix
stresses HBM (Wikidata5M-scale eval) — the kernel's traffic is
independent of E.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

_SENTINEL = jnp.int32(0x7FFFFFF0)


from kge_tpu.ops.kernel_utils import interpret as _interpret
from kge_tpu.ops.kernel_utils import pad_to as _pad_to


def _close_greater(scores, true, atol, rtol):
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    true = jnp.where(jnp.isnan(true), -jnp.inf, true)
    finite = jnp.isfinite(scores) | jnp.isfinite(true)
    is_close = jnp.abs(scores - true) <= atol + rtol * jnp.abs(true)
    both_neg_inf = jnp.isneginf(scores) & jnp.isneginf(true)
    # where(c, True, x) as boolean algebra — Mosaic can't lower a bool
    # select against a python scalar
    is_close = both_neg_inf | (is_close & finite)
    is_greater = (scores > true) & ~is_close
    return is_close, is_greater


def _kernel(q_ref, t_ref, pivot_ref, cols_ref, gcnt_ref, ccnt_ref, vals_ref,
            *, E: int, te: int, atol: float, rtol: float, bf16: bool,
            score_map):
    from jax.experimental import pallas as pl

    t_step = pl.program_id(1)
    col0 = t_step * te

    @pl.when(t_step == 0)
    def _():
        gcnt_ref[:] = jnp.zeros_like(gcnt_ref)
        ccnt_ref[:] = jnp.zeros_like(ccnt_ref)
        vals_ref[:] = jnp.zeros_like(vals_ref)

    q = q_ref[:]
    t = t_ref[:]
    if bf16:
        q = q.astype(jnp.bfloat16)
        t = t.astype(jnp.bfloat16)
    S = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tn, te]
    if score_map is not None:
        S = score_map(S)
    # Everything below works on 128-lane sub-windows with NO size-1
    # trailing dims — [tn, 1] shapes crash this libtpu's Mosaic bounds
    # check. Counts accumulate LANE-PARTIAL sums into [tn, 128] output
    # carriers (the wrapper does the final lane reduction); the pivot
    # arrives as a [tn, 128] carrier with every lane equal. Per-window
    # accumulation through the refs keeps one select temp live
    # (dist_pool.py lesson).
    pivot = pivot_ref[:]  # [tn, 128], all lanes equal
    cols3 = cols_ref[:][:, :, None]  # [tn, kmax, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (pivot.shape[0], 128), 1)
    for j in range(te // 128):
        sub = S[:, j * 128:(j + 1) * 128]       # [tn, 128]
        subflat = col0 + j * 128 + lane
        valid = subflat < E
        close, greater = _close_greater(sub, pivot, atol, rtol)
        gcnt_ref[:] += (greater & valid).astype(jnp.int32)
        ccnt_ref[:] += (close & valid).astype(jnp.int32)
        sel = cols3 == subflat[:, None, :]      # [tn, kmax, 128]
        vals_ref[:] += jnp.sum(jnp.where(sel, sub[:, None, :], 0.0), axis=2)


def fused_rank_counts(
    q: jax.Array,
    targets: jax.Array,
    pivot: jax.Array,
    cols: jax.Array,
    num_valid: int,
    atol: float,
    rtol: float,
    score_map: Optional[Callable] = None,
    bf16: Optional[bool] = None,
):
    """(greater_count [n], close_count [n], label_vals [n, kmax]).

    Scores = score_map(q @ targets.T) restricted to columns < ``num_valid``;
    counts are vs ``pivot`` per row with isclose tie semantics; label_vals
    extracts the scores at ``cols`` (entries >= num_valid are ignored —
    their extracted value lands on masked positions and is 0).
    ``bf16`` (default: on TPU) computes the block matmul with
    bfloat16-rounded inputs and f32 accumulation — XLA's default matmul
    precision class; pass a pivot computed the same way.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if bf16 is None:
        bf16 = not _interpret()
    n, D = q.shape
    Et, Dt = targets.shape
    assert Dt == D
    kmax = cols.shape[1]
    te = 512
    tn = 128
    n_pad = _pad_to(n, tn)
    E_pad = _pad_to(Et, te)
    k_pad = _pad_to(kmax, 32)
    q_p = jnp.pad(q, ((0, n_pad - n), (0, 0)))
    t_p = jnp.pad(targets, ((0, E_pad - Et), (0, 0)))
    piv_p = jnp.broadcast_to(
        jnp.pad(pivot, (0, n_pad - n))[:, None], (n_pad, 128)
    )
    cols_p = jnp.pad(
        cols.astype(jnp.int32), ((0, n_pad - n), (0, k_pad - kmax)),
        constant_values=int(_SENTINEL),
    )
    # out-of-range labels must never match a window column
    cols_p = jnp.where(cols_p < num_valid, cols_p, _SENTINEL)
    grid = (n_pad // tn, E_pad // te)
    out = pl.pallas_call(
        functools.partial(
            _kernel, E=num_valid, te=te, atol=atol, rtol=rtol, bf16=bf16,
            score_map=score_map,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((te, D), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 128), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k_pad), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 128), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 128), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k_pad), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(q_p, t_p, piv_p, cols_p)
    # counts come back lane-partial: finish the reduction here
    return (
        jnp.sum(out[0], axis=1)[:n],
        jnp.sum(out[1], axis=1)[:n],
        out[2][:n, :kmax],
    )
