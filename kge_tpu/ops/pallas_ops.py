"""Pallas TPU kernels for the embedding hot path.

The one op where XLA is far from speed-of-light in this workload is the
scatter-add that backs every embedding-lookup gradient (the reference hits
the same op through torch.nn.Embedding's backward): XLA's TPU scatter
applies row updates near-serially (~110ns/row measured). The kernel here
reformulates scatter-add as *sorted block-sparse matmuls*: updates are
sorted by row id, each ROW_TILE-row output tile owns a contiguous range of
the sorted updates, and the tile accumulates `one_hot(ids_chunk) @ upd_chunk`
products on the MXU — turning random-access accumulation into dense matmuls
over only the updates that actually touch the tile (SpMM-style, per the
project north star).

``embedding_gather`` wraps a plain gather with a custom VJP whose backward
uses this kernel. It is enabled explicitly by jobs via ``set_gather_mode``
(single-device TPU only — under a sharded mesh the XLA scatter path is used
because pallas calls do not auto-partition).

All kernels have XLA fallbacks and run under ``interpret=True`` off-TPU so
CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ROW_TILE = 512  # output rows per grid step
UPD_TILE = 256  # sorted updates consumed per MXU matmul


def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return "cpu"


_gather_mode = "xla"  # "xla" | "pallas"


def set_gather_mode(mode: str) -> None:
    """Select the embedding-gather implementation ("xla" or "pallas").

    Jobs call this during preparation; "pallas" routes lookup gradients
    through the sorted block-sparse scatter kernel (single-device TPU path).
    """
    global _gather_mode
    assert mode in ("xla", "pallas"), mode
    _gather_mode = mode


def gather_mode() -> str:
    return _gather_mode


from kge_tpu.ops.kernel_utils import pad_to as _pad_to  # noqa: E402


def _scatter_kernel(starts_ref, ids_ref, upd_hbm, out_ref, scratch, sem,
                    *, max_chunks: int, upd_tile: int):
    """One output tile [ROW_TILE, D]: accumulate one-hot matmuls over the
    tile's sorted-update range. Padded/foreign ids never match the tile's
    row range, so no masking is needed beyond the id comparison."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    base_row = t * ROW_TILE
    # align the range start down to the update tile so dynamic slices are
    # provably lane-aligned; extra leading updates belong to earlier row
    # tiles and never match this tile's one-hot comparison
    start = (starts_ref[t] // upd_tile) * upd_tile
    count = starts_ref[t + 1] - start

    out_ref[:] = jnp.zeros_like(out_ref)

    def chunk(ci, _):
        @pl.when(ci * upd_tile < count)
        def _():
            off = pl.multiple_of(start + ci * upd_tile, upd_tile)
            dma = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, upd_tile), :], scratch, sem
            )
            dma.start()
            ids_c = ids_ref[0:1, pl.ds(off, upd_tile)]  # [1, UPD_TILE]
            rows = base_row + jax.lax.broadcasted_iota(
                jnp.int32, (ROW_TILE, upd_tile), 0
            )
            one_hot = (ids_c == rows).astype(jnp.float32)
            dma.wait()
            # manual 3-way bf16 split of the updates (the one-hot factor is
            # exact in bf16): recovers ~f32 precision from 3 MXU passes —
            # Mosaic supports only DEFAULT/HIGHEST dot precisions in-kernel
            x = scratch[:].astype(jnp.float32)
            hi = x.astype(jnp.bfloat16)
            mid_f = x - hi.astype(jnp.float32)
            mid = mid_f.astype(jnp.bfloat16)
            lo = (mid_f - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            oh16 = one_hot.astype(jnp.bfloat16)
            acc = jax.lax.dot(
                oh16, hi, preferred_element_type=jnp.float32
            )
            acc += jax.lax.dot(
                oh16, mid, preferred_element_type=jnp.float32
            )
            acc += jax.lax.dot(
                oh16, lo, preferred_element_type=jnp.float32
            )
            out_ref[:] += acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, max_chunks, chunk, 0, unroll=False)


def sorted_scatter_add(
    ids: jax.Array, upd: jax.Array, num_rows: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Dense [num_rows, D] result of scattering ``upd`` rows at ``ids``.

    Equivalent to ``jnp.zeros((num_rows, D)).at[ids].add(upd)``; implemented
    as sorted block-sparse MXU matmuls (see module docstring).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _backend() != "tpu"

    n, d = upd.shape
    dtype = upd.dtype
    d_pad = _pad_to(d, 128)
    rows_pad = _pad_to(max(num_rows, ROW_TILE), ROW_TILE)
    num_tiles = rows_pad // ROW_TILE
    n_pad = _pad_to(n, UPD_TILE) + UPD_TILE  # slack so dynamic slices stay in-bounds

    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    upd_s = upd[order]
    if d_pad != d:
        upd_s = jnp.pad(upd_s, ((0, 0), (0, d_pad - d)))
    upd_s = jnp.pad(upd_s, ((0, n_pad - n), (0, 0)))
    # pad ids with a sentinel that matches no row tile
    ids_s = jnp.pad(ids_s, (0, n_pad - n), constant_values=rows_pad + 1)

    tile_bounds = (jnp.arange(num_tiles + 1) * ROW_TILE).astype(jnp.int32)
    starts = jnp.searchsorted(ids_s[:n], tile_bounds).astype(jnp.int32)

    max_chunks = -(-n // UPD_TILE) + 1  # +1 for the alignment spill-over

    kernel = functools.partial(
        _scatter_kernel, max_chunks=max_chunks, upd_tile=UPD_TILE
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad), lambda t, starts: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (ROW_TILE, d_pad), lambda t, starts: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((UPD_TILE, d_pad), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, d_pad), dtype),
        interpret=interpret,
    )(starts, ids_s.reshape(1, -1), upd_s)
    return out[:num_rows, :d]


def _xla_scatter_add(ids, upd, num_rows):
    return jnp.zeros((num_rows, upd.shape[1]), upd.dtype).at[ids].add(upd)


# -- in-place row writes --------------------------------------------------------

_NSEM = 16  # DMA semaphore ring


def _rows_set_kernel(ids_ref, table_in, upd_hbm, table_out, sems):
    """Write upd[i] into table_out[ids[i]] via per-row DMAs, table aliased
    in place. A semaphore ring keeps _NSEM copies in flight; duplicate ids
    carrying identical payloads may race benignly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ids_ref.shape[0]

    def body(i, _):
        row = ids_ref[i]

        @pl.when(i >= _NSEM)
        def _():
            pltpu.make_async_copy(
                upd_hbm.at[pl.ds(0, 1), :],
                table_out.at[pl.ds(0, 1), :],
                sems.at[i % _NSEM],
            ).wait()

        pltpu.make_async_copy(
            upd_hbm.at[pl.ds(i, 1), :],
            table_out.at[pl.ds(row, 1), :],
            sems.at[i % _NSEM],
        ).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    def tail(k, _):
        pltpu.make_async_copy(
            upd_hbm.at[pl.ds(0, 1), :],
            table_out.at[pl.ds(0, 1), :],
            sems.at[k % _NSEM],
        ).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(0, n - _NSEM), n, tail, 0)


_rows_set_supported: Optional[bool] = None


def _probe_rows_set(d: int) -> bool:
    """One-time AOT compile probe: some libtpu versions reject 1-row slices
    of tiled HBM memrefs (sublane-alignment), in which case the DMA kernel
    cannot be used on this platform at all."""
    global _rows_set_supported
    if _rows_set_supported is None:
        try:
            jax.jit(
                functools.partial(_rows_set_pallas, interpret=False)
            ).lower(
                jax.ShapeDtypeStruct((16, d), jnp.float32),
                jax.ShapeDtypeStruct((9,), jnp.int32),
                jax.ShapeDtypeStruct((9, d), jnp.float32),
            ).compile()
            _rows_set_supported = True
        except Exception:  # pragma: no cover - depends on libtpu version
            _rows_set_supported = False
    return _rows_set_supported


def rows_set(
    table: jax.Array, ids: jax.Array, rows: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``table.at[ids].set(rows)`` that updates the table IN PLACE via
    per-row DMAs (input/output aliased) instead of XLA's copy-the-operand
    scatter — ~20x faster for small row counts against multi-GB tables.
    Duplicate ids must carry identical rows. Falls back to the XLA scatter
    off-TPU (and on libtpu versions whose Mosaic rejects unaligned
    single-row HBM slices, detected by a one-time compile probe)."""
    if interpret is None:
        interpret = _backend() != "tpu"
    if (
        interpret
        or table.shape[-1] % 128 != 0
        or not _probe_rows_set(int(table.shape[-1]))
    ):
        # the DMA ring is TPU-specific and needs lane-aligned rows; keep
        # CPU/test/unaligned semantics identical via the XLA scatter
        return table.at[ids].set(rows, unique_indices=False)
    return _rows_set_pallas(table, ids, rows, interpret=False)


def _rows_set_pallas(table, ids, rows, *, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ids = ids.astype(jnp.int32)
    return pl.pallas_call(
        _rows_set_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table, rows)


@jax.custom_vjp
def _pallas_gather(table, ids):
    return table[ids]


def _pallas_gather_fwd(table, ids):
    return table[ids], (ids, table.shape[0])


def _pallas_gather_bwd(res, g):
    ids, num_rows = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    d_table = sorted_scatter_add(flat_ids, flat_g, num_rows)
    zeros = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    return d_table, zeros


_pallas_gather.defvjp(_pallas_gather_fwd, _pallas_gather_bwd)


def embedding_gather(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table[ids] whose gradient scatter uses the pallas kernel when the
    gather mode is "pallas" (trace-time decision)."""
    if _gather_mode == "pallas":
        return _pallas_gather(table, ids)
    return table[ids]


# -- fused row-gradient optimizer update ----------------------------------------

FUSED_ROW_TILE = 256  # output rows per grid step (smaller than ROW_TILE so
                      # param + state in/out tiles + scratch fit VMEM)


def _fused_update_kernel(starts_ref, ids_ref, scal_ref, upd_hbm, param_ref,
                         *rest, max_chunks: int, upd_tile: int, nstate: int,
                         rule):
    """One table tile [FUSED_ROW_TILE, D]: accumulate the tile's dense
    gradient from its sorted-update range (one-hot MXU matmuls, zero for
    untouched rows), then apply the elementwise optimizer ``rule`` to the
    param/state tiles in place. Exact dense-step semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    state_refs = rest[:nstate]
    out_param = rest[nstate]
    out_states = rest[nstate + 1 : 2 * nstate + 1]
    g_scratch, upd_scratch, sem = rest[2 * nstate + 1 :]

    t = pl.program_id(0)
    base_row = t * FUSED_ROW_TILE
    start = (starts_ref[t] // upd_tile) * upd_tile
    count = starts_ref[t + 1] - start

    g_scratch[:] = jnp.zeros_like(g_scratch)

    def chunk(ci, _):
        @pl.when(ci * upd_tile < count)
        def _():
            off = pl.multiple_of(start + ci * upd_tile, upd_tile)
            dma = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, upd_tile), :], upd_scratch, sem
            )
            dma.start()
            ids_c = ids_ref[0:1, pl.ds(off, upd_tile)]
            rows = base_row + jax.lax.broadcasted_iota(
                jnp.int32, (FUSED_ROW_TILE, upd_tile), 0
            )
            one_hot = (ids_c == rows).astype(jnp.float32)
            dma.wait()
            # 3-way bf16 split of the updates (one-hot exact in bf16):
            # ~f32 precision from 3 MXU passes (see _scatter_kernel)
            x = upd_scratch[:].astype(jnp.float32)
            hi = x.astype(jnp.bfloat16)
            mid_f = x - hi.astype(jnp.float32)
            mid = mid_f.astype(jnp.bfloat16)
            lo = (mid_f - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            oh16 = one_hot.astype(jnp.bfloat16)
            acc = jax.lax.dot(oh16, hi, preferred_element_type=jnp.float32)
            acc += jax.lax.dot(oh16, mid, preferred_element_type=jnp.float32)
            acc += jax.lax.dot(oh16, lo, preferred_element_type=jnp.float32)
            g_scratch[:] += acc
        return 0

    jax.lax.fori_loop(0, max_chunks, chunk, 0, unroll=False)

    lr = scal_ref[0, 0]
    step = scal_ref[0, 1]
    g = g_scratch[:].astype(param_ref.dtype)
    new_param, new_states = rule(
        g, param_ref[:], tuple(s[:] for s in state_refs), lr, step
    )
    out_param[:] = new_param
    for oref, ns in zip(out_states, new_states):
        oref[:] = ns


def fused_sorted_update(
    ids: jax.Array, upd: jax.Array, param: jax.Array, states, lr, step,
    rule, interpret: Optional[bool] = None,
):
    """One-pass dense-semantics optimizer step from row gradients.

    Semantically identical to::

        g = jnp.zeros_like(param).at[ids].add(upd)
        new_param, new_states = rule(g, param, states, lr, step)

    but never materializes the dense gradient: per table tile, the tile's
    gradient is built from the sorted updates via one-hot MXU matmuls
    (SpMM-style, like ``sorted_scatter_add``) and the elementwise ``rule``
    (any torch-parity optimizer) is applied to the param/state tiles in one
    VMEM round trip — replacing [dense-grad write + read] and a separate
    whole-table optimizer pass. Exact for any elementwise rule because
    untouched tiles receive a zero gradient tile, exactly as in the dense
    step. Falls back to the literal dense formulation off-TPU or for
    lane-unaligned rows.

    ``rule(g, param_tile, state_tiles, lr, step) -> (new_param_tile,
    new_state_tiles)`` must be elementwise (shape-preserving) jnp code.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _backend() != "tpu"
    states = tuple(states)
    n, d = upd.shape
    num_rows = param.shape[0]
    if d % 128 != 0:
        # lane-unaligned rows: literal dense formulation (same semantics)
        g = jnp.zeros_like(param).at[ids].add(upd)
        return rule(g, param, states, lr, step)

    dtype = param.dtype
    num_tiles = -(-num_rows // FUSED_ROW_TILE)
    upd_tile = UPD_TILE
    n_pad = _pad_to(n, upd_tile) + upd_tile

    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    upd_s = upd[order].astype(dtype)
    upd_s = jnp.pad(upd_s, ((0, n_pad - n), (0, 0)))
    ids_s = jnp.pad(
        ids_s, (0, n_pad - n), constant_values=num_tiles * FUSED_ROW_TILE + 1
    )

    tile_bounds = (jnp.arange(num_tiles + 1) * FUSED_ROW_TILE).astype(jnp.int32)
    starts = jnp.searchsorted(ids_s[:n], tile_bounds).astype(jnp.int32)
    scal = jnp.stack(
        [jnp.asarray(lr, jnp.float32),
         jnp.asarray(step, jnp.float32)]
    ).reshape(1, 2)

    max_chunks = -(-n // upd_tile) + 1
    nstate = len(states)
    kernel = functools.partial(
        _fused_update_kernel, max_chunks=max_chunks, upd_tile=upd_tile,
        nstate=nstate, rule=rule,
    )
    tile_spec = pl.BlockSpec(
        (FUSED_ROW_TILE, d), lambda t, starts: (t, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad), lambda t, starts: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2), lambda t, starts: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            tile_spec,
        ] + [tile_spec] * nstate,
        out_specs=[tile_spec] * (1 + nstate),
        scratch_shapes=[
            pltpu.VMEM((FUSED_ROW_TILE, d), jnp.float32),
            pltpu.VMEM((upd_tile, d), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # operand order (aliasing indexes include the scalar prefetch):
    # 0 starts, 1 ids, 2 scalars, 3 upd, 4 param, 5.. states
    aliases = {4: 0}
    for i in range(nstate):
        aliases[5 + i] = 1 + i
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(param.shape, dtype)]
        + [jax.ShapeDtypeStruct(s.shape, s.dtype) for s in states],
        input_output_aliases=aliases,
        interpret=interpret,
    )(starts, ids_s.reshape(1, -1), scal, upd_s, param, *states)
    return out[0], tuple(out[1:])
