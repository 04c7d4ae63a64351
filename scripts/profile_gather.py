"""Measure primitive op costs with real fetch barriers: row gather,
scatter-add, score matmul, combine — in fp32 and bf16 — to target kernel
work at the true bottleneck. Each op runs inside a scanned loop so dispatch
overhead is amortized exactly like the training epoch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

E, R, D2 = 14541, 237, 1024
B, NEG, NB = 8192, 129, 32


def bench_scan(name, body, make_carry, xs):
    def outer(carry, xs):
        return jax.lax.scan(body, carry, xs)

    fn = jax.jit(outer, donate_argnums=(0,))
    carry, ys = fn(make_carry(), xs)
    _ = float(jnp.sum(ys)) if ys is not None else None
    t0 = time.perf_counter()
    carry, ys = fn(carry, xs)
    _ = float(jnp.sum(ys))
    dt = (time.perf_counter() - t0) / NB
    print(f"{name:36s}{dt*1e3:8.3f} ms/iter")


def main():
    key = jax.random.PRNGKey(0)
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        mk_ent = lambda: jax.random.normal(key, (E, D2), dtype)
        ent2 = mk_ent()
        idx = jax.random.randint(key, (NB, B), 0, E)
        negs = jax.random.randint(key, (NB, NEG), 0, E)
        g = jax.random.normal(key, (NB, B, D2), dtype) if False else None

        # 1) gather B rows
        bench_scan(
            f"gather {B}x{D2} {tag}",
            lambda c, x: (c, jnp.sum(c[x], axis=(0, 1))), mk_ent, idx,
        )
        # 2) gather with sorted indices
        idx_sorted = jnp.sort(idx, axis=1)
        bench_scan(
            f"gather sorted {tag}",
            lambda c, x: (c, jnp.sum(c[x], axis=(0, 1))), mk_ent, idx_sorted,
        )
        # 3) scatter-add B rows into E
        upd = jax.random.normal(key, (B, D2), dtype)
        bench_scan(
            f"scatter-add {B}->{E} {tag}",
            lambda c, x: (c.at[x].add(upd), jnp.zeros((), dtype)), mk_ent, idx,
        )
        # 4) segment-sum via sort (unique-free): sort idx, then scatter
        bench_scan(
            f"scatter-add sorted {tag}",
            lambda c, x: (c.at[x].add(upd), jnp.zeros((), dtype)),
            mk_ent, idx_sorted,
        )
        # 5) score matmul [B,D2]@[D2,NEG]
        te = jax.random.normal(key, (NEG, D2), dtype)
        comb = jax.random.normal(key, (B, D2), dtype)
        bench_scan(
            f"matmul {B}x{D2}x{NEG} {tag}",
            lambda c, x: (c, jnp.sum(c @ te.T)), lambda: comb, jnp.arange(NB),
        )
        # 6) full-vocab matmul [B,D2]@[D2,E] (1vsAll shape, smaller B)
        comb_s = jax.random.normal(key, (512, D2), dtype)
        bench_scan(
            f"matmul 512x{D2}x{E} {tag}",
            lambda c, x: (c, jnp.sum(c @ ent2.T)), lambda: comb_s, jnp.arange(NB),
        )


if __name__ == "__main__":
    main()
