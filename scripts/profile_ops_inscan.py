"""Trustworthy per-op timing on the axon remote chip: each op runs inside a
single-dispatch lax.scan of length N with data dependencies, so neither
result caching nor async dispatch can hide its cost. Reported per-iteration
cost has the noop-scan baseline subtracted."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 170  # ~5 epochs of the bench's 34 batches


def t_scan(body, init, n=3):
    import jax

    @jax.jit
    def run(init):
        c, _ = jax.lax.scan(body, init, None, length=N)
        return c

    r = jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / N


def main():
    import jax
    import jax.numpy as jnp

    from kge_tpu.ops import pallas_ops

    E, D, NR = 14541, 1024, 24705
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (E, D), jnp.float32)
    accum = jnp.abs(jax.random.normal(key, (E, D), jnp.float32))
    rows = jax.random.normal(key, (NR, D), jnp.float32)
    ids0 = jax.random.randint(key, (NR,), 0, E, dtype=jnp.int32)
    w = jnp.arange(NR, dtype=jnp.float32) * 1e-6

    def perturb(c):
        # cheap data-dependent id vector so iterations can't be collapsed
        return (ids0 + c.astype(jnp.int32)) % E

    base = t_scan(lambda c, _: (c + 1.0, None), jnp.float32(0))

    def time_op(name, f):
        def body(c, _):
            out = f(perturb(c))
            return c + out, None
        per = t_scan(body, jnp.float32(0)) - base
        print(f"{name:38s} {per*1e3:8.3f} ms")

    time_op("argsort(24705)",
            lambda ids: jnp.dot(jnp.argsort(ids).astype(jnp.float32), w))
    time_op("sort(24705)",
            lambda ids: jnp.dot(jnp.sort(ids).astype(jnp.float32), w))
    time_op("gather 24705x1024",
            lambda ids: table[ids][:, 0].sum())
    time_op("sorted_scatter_add(pallas)",
            lambda ids: pallas_ops.sorted_scatter_add(ids, rows, E)[:, 0].sum())
    time_op("xla scatter-add dense",
            lambda ids: jnp.zeros((E, D), jnp.float32).at[ids].add(rows)[:, 0].sum())
    time_op("xla scatter-add presorted",
            lambda ids: jnp.zeros((E, D), jnp.float32).at[jnp.sort(ids)].add(
                rows, indices_are_sorted=True)[:, 0].sum())
    time_op("dense adagrad-ish (5 arrays rw)",
            lambda ids: (table / jnp.sqrt(accum + 1e-10))[:, 0].sum())
    time_op("matmul 8192x1024x1024",
            lambda ids: (rows[:8192] @ table[:1024])[:, 0].sum())
    time_op("segment_sum sorted rows",
            lambda ids: jax.ops.segment_sum(
                rows, jnp.sort(ids), num_segments=E,
                indices_are_sorted=True)[:, 0].sum())


if __name__ == "__main__":
    main()
