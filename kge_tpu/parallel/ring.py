"""Explicit ppermute-ring schedule for model-sharded full-vocabulary scoring.

With the entity table row-sharded over the ``model`` mesh axis, scoring a
batch against ALL entities (1vsAll / KvsAll / entity-ranking eval) has two
communication events under GSPMD's default schedule: materializing each
row's query embedding (a masked partial gather + psum over ``model``) and
only then the per-shard score matmul. The queries of every factorizing
scorer are LINEAR in the gathered entity embedding (DistMult s*p, ComplEx
complex product, RESCAL s@M_p, CP/SimplE half products — models/
factorization.py), so the psum can be fused INTO the matmul as a ring:

    every shard m builds the query PART from the rows it owns
    (zeros elsewhere); for M steps, each shard accumulates
    S_local += qpart_arriving @ targets_local^T and forwards the part
    (lax.ppermute) — after M steps S_local = (sum of parts) @ t_local^T,
    the exact local score columns.

The (M-1) ppermutes of a [n, d'] part overlap with the [n, d'] x
[d', V/M] MXU matmuls instead of serializing before them, and total
traffic is half an all-reduce's. Values match the unfused formulation up
to sum reassociation.

On one device (or parallel.model == 1) the ring degenerates to the plain
local matmul and is never engaged.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def ring_all_scores(
    mesh,
    table: jax.Array,
    ids: jax.Array,
    row_ctx: jax.Array,
    make_query: Callable,
    map_targets: Optional[Callable],
):
    """[n, V] scores ``make_query(E[ids], row_ctx) @ map_targets(E)^T``
    with ``table`` row-sharded P('model') and ``ids``/``row_ctx`` sharded
    over 'data', as a compute-overlapped ppermute ring over 'model'.

    ``make_query(rows, row_ctx) -> [n, d']`` MUST be linear in ``rows``
    (the gathered entity embeddings); ``map_targets`` maps candidate
    embeddings (None = identity). Output is sharded P('data', 'model') —
    the same layout GSPMD produces for the unfused formulation.
    """
    from jax.experimental.shard_map import shard_map

    M = mesh.shape["model"]
    V = table.shape[0]
    rows_per = V // M
    perm = [(i, (i + 1) % M) for i in range(M)]

    def local_fn(tbl_loc, ids_loc, ctx_loc):
        m = jax.lax.axis_index("model")
        base = m * rows_per
        loc = ids_loc - base
        ok = (loc >= 0) & (loc < rows_per)
        rows = jnp.where(
            ok[:, None], tbl_loc[jnp.clip(loc, 0, rows_per - 1)], 0
        )
        qpart = make_query(rows, ctx_loc)
        tgt = map_targets(tbl_loc) if map_targets is not None else tbl_loc
        contract = (((1,), (1,)), ((), ()))

        def step(_, carry):
            qp, acc = carry
            qp = jax.lax.ppermute(qp, "model", perm)
            acc = acc + jax.lax.dot_general(qp, tgt, contract)
            return (qp, acc)

        init = (qpart, jax.lax.dot_general(qpart, tgt, contract))
        _, S = jax.lax.fori_loop(0, M - 1, step, init)
        return S

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("model", None), P("data"), P("data", None)),
        out_specs=P("data", "model"),
        check_rep=False,
    )(table, ids, row_ctx)
