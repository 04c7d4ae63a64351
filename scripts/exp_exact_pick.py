"""Experiment: per-row negative-score extraction strategies on TPU.

The exact per-row NegSamp path scores all V entities per row (MXU matmul)
and then picks each row's sampled columns. The pick is the wall: XLA's
take_along_axis on [B, V] issues ~1M serialized scalar gathers (~60ms).
Candidate: two-level one-hot contraction — split idx into (group, lane) =
(idx // 128, idx % 128); contract the lane one-hot on the MXU and the group
one-hot on the VPU. All dense ops, no gathers.

Run on the real chip:  python scripts/exp_exact_pick.py
"""

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
VP = ((V + 127) // 128) * 128  # 14592
G = VP // 128


def pick_take_along(S, idx):
    return jnp.take_along_axis(S, idx, axis=1)


def pick_two_level(S, idx):
    """out[b,q] = S[b, idx[b,q]] via two one-hot contractions.

    S is padded to [B, G*128]; lane one-hot contracted on the MXU
    ([G,128] x [128,K] per row), group one-hot contracted elementwise.
    """
    S3 = S.reshape(B, G, 128)
    g = idx // 128
    lane = idx % 128
    P = jax.nn.one_hot(lane, 128, dtype=S.dtype)      # [B, K, 128]
    T = jnp.einsum("bgl,bql->bgq", S3, P)              # MXU
    Gh = jax.nn.one_hot(g, G, dtype=S.dtype)           # [B, K, G]
    return jnp.einsum("bgq,bqg->bq", T, Gh)            # VPU reduce


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    # force a real fetch (block_until_ready unreliable on axon)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    kS, kI, kE, kT = jax.random.split(key, 4)
    S = jax.random.normal(kS, (B, VP), jnp.float32)
    idx = jax.random.randint(kI, (B, K), 0, V, dtype=jnp.int32)

    print("backend:", jax.default_backend(), flush=True)

    # 1. forward pick alone
    for name, fn in (("take_along", pick_take_along), ("two_level", pick_two_level)):
        f = jax.jit(fn)
        dt = timeit(f, S, idx)
        print(f"pick fwd {name}: {dt*1e3:.2f} ms", flush=True)

    # 2. pick fwd+bwd (cotangent to S)
    for name, fn in (("take_along", pick_take_along), ("two_level", pick_two_level)):
        def loss(S, idx, fn=fn):
            return jnp.sum(fn(S, idx) ** 2)

        f = jax.jit(jax.grad(loss))
        dt = timeit(f, S, idx)
        print(f"pick fwd+bwd {name}: {dt*1e3:.2f} ms", flush=True)

    # 3. full exact-step shape: DistMult-style all-scores + pick + loss + grads
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

    def step(E, R, trip, idx, pick, dtype):
        Ec = E.astype(dtype)
        q = Ec[trip[:, 0]] * R.astype(dtype)[trip[:, 1]]
        S = (q @ Ec.T).astype(jnp.float32)        # [B, VP]
        pos = jnp.sum(q * Ec[trip[:, 2]], axis=1).astype(jnp.float32)
        neg = pick(S, idx)
        scores = jnp.concatenate([pos[:, None], neg], axis=1)
        return jnp.mean(
            -scores[:, 0] + jax.scipy.special.logsumexp(scores, axis=1)
        )

    import functools

    for dtype in (jnp.float32, jnp.bfloat16):
        for name, fn in (
            ("take_along", pick_take_along),
            ("two_level", pick_two_level),
        ):
            f = jax.jit(
                jax.grad(
                    functools.partial(step, pick=fn, dtype=dtype), argnums=(0, 1)
                )
            )
            dt = timeit(f, E, R, trip, idx)
            tps = B / dt
            print(
                f"exact step {name} {jnp.dtype(dtype).name}: {dt*1e3:.1f} ms "
                f"-> {tps/1e3:.0f}k triples/s (1 slot)",
                flush=True,
            )


if __name__ == "__main__":
    main()
