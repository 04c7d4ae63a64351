"""Experiment: count-weighted loss formulation for exact per-row negatives.

Sum-form losses over sampled negatives need only the per-row COUNT of each
vocab column (counts are sufficient statistics of the sample multiset):
    sum_k f(S[b, idx[b,k]]) = sum_v C[b,v] * f(S[b,v])
C is built with one one-hot MXU matmul (exact in bf16: counts <= 256) and
the loss becomes elementwise over [B, V] — no gathers anywhere.

Run on the real chip:  python scripts/exp_exact_counts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_ROOT = os.environ.get("KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

B, V, D, K = 8192, 14541, 512, 128
VP = ((V + 127) // 128) * 128
G = VP // 128


def counts_matrix(idx):
    """[B, VP] sample counts via one one-hot MXU contraction (bf16-exact)."""
    g = idx // 128
    lane = idx % 128
    Gh = jax.nn.one_hot(g, G, dtype=jnp.bfloat16)      # [B, K, G]
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)  # [B, K, 128]
    return jnp.einsum("bqg,bql->bgl", Gh, P).reshape(idx.shape[0], VP)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    kI, kE, kT = jax.random.split(key, 3)
    idx = jax.random.randint(kI, (B, K), 0, V, dtype=jnp.int32)
    E = jax.random.normal(kE, (VP, D), jnp.float32) * 0.1
    R = jax.random.normal(kT, (237, D), jnp.float32) * 0.1
    trip = np.stack(
        [
            np.random.randint(0, V, B),
            np.random.randint(0, 237, B),
            np.random.randint(0, V, B),
        ],
        axis=1,
    ).astype(np.int32)
    trip = jnp.asarray(trip)
    print("backend:", jax.default_backend(), flush=True)

    def step_counts(E, R, trip, idx, dtype, slots):
        C = counts_matrix(idx).astype(jnp.float32)
        Ec = E.astype(dtype)
        Rc = R.astype(dtype)
        total = 0.0
        for _ in range(slots):
            q = Ec[trip[:, 0]] * Rc[trip[:, 1]]
            S = (q @ Ec.T).astype(jnp.float32)  # [B, VP]
            pos = jnp.sum(q * Ec[trip[:, 2]], axis=1).astype(jnp.float32)
            # kl/CE over [pos | multiset of sampled columns]
            m = jnp.maximum(pos, jnp.max(S, axis=1))
            lse = m + jnp.log(
                jnp.exp(pos - m) + jnp.sum(C * jnp.exp(S - m[:, None]), axis=1)
            )
            total = total + jnp.mean(-pos + lse)
        return total

    for slots in (1, 2):
        for dtype in (jnp.float32, jnp.bfloat16):
            f = jax.jit(
                jax.grad(
                    functools.partial(step_counts, dtype=dtype, slots=slots),
                    argnums=(0, 1),
                )
            )
            dt = timeit(f, E, R, trip, idx)
            print(
                f"counts step {jnp.dtype(dtype).name} slots={slots}: "
                f"{dt*1e3:.1f} ms -> {B/dt/1e3:.0f}k triples/s",
                flush=True,
            )

    # isolate: bare all-scores matmul fwd+bwd
    def mm(E, R, trip, dtype):
        Ec = E.astype(dtype)
        q = Ec[trip[:, 0]] * R.astype(dtype)[trip[:, 1]]
        return jnp.sum((q @ Ec.T).astype(jnp.float32) ** 2)

    for dtype in (jnp.float32, jnp.bfloat16):
        f = jax.jit(jax.grad(functools.partial(mm, dtype=dtype), argnums=(0, 1)))
        dt = timeit(f, E, R, trip)
        print(
            f"all-scores matmul fwd+bwd {jnp.dtype(dtype).name}: {dt*1e3:.1f} ms",
            flush=True,
        )

    # isolate: counts build alone
    f = jax.jit(counts_matrix)
    dt = timeit(f, idx)
    print(f"counts build: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
