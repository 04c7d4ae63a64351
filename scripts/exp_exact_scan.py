"""Steady-state per-step timing via device-chained lax.scan (one dispatch,
one fetch) — the honest measurement on the axon tunnel, and the shape the
real scanned epoch runs in anyway."""

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

B, V, D, K, NR = 8192, 14541, 512, 128, 237
VP = ((V + 127) // 128) * 128
G = VP // 128
STEPS = 20


def counts_matrix(idx):
    g = idx // 128
    lane = idx % 128
    Gh = jax.nn.one_hot(g, G, dtype=jnp.bfloat16)
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)
    return jnp.einsum("bqg,bql->bgl", Gh, P).reshape(idx.shape[0], VP)


def pick_two_level(S, idx):
    S3 = S.reshape(B, G, 128)
    g = idx // 128
    lane = idx % 128
    P = jax.nn.one_hot(lane, 128, dtype=S.dtype)
    T = jnp.einsum("bgl,bql->bgq", S3, P)
    Gh = jax.nn.one_hot(g, G, dtype=S.dtype)
    return jnp.einsum("bgq,bqg->bq", T, Gh)


@jax.custom_vjp
def pick_cvjp(S, idx):
    return _pick_cvjp_fwd(S, idx)[0]


def _pick_cvjp_fwd(S, idx):
    S3 = S.reshape(S.shape[0], G, 128)
    g = (idx // 128).astype(jnp.int32)
    lane = (idx % 128).astype(jnp.int32)
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)
    Gh = jax.nn.one_hot(g, G, dtype=jnp.bfloat16)
    # U[b,q,l] = sum_g Gh * S3  (one batched MXU matmul), then lane select
    U = jax.lax.dot_general(
        Gh, S3.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, K, 128]
    out = jnp.sum(U * P.astype(jnp.float32), axis=2)
    return out, (idx,)


def _pick_cvjp_bwd(res, dout):
    (idx,) = res
    g = (idx // 128).astype(jnp.int32)
    lane = (idx % 128).astype(jnp.int32)
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)
    Gh = jax.nn.one_hot(g, G, dtype=jnp.bfloat16)
    W = Gh * dout[:, :, None].astype(jnp.bfloat16)  # [B, K, G]
    dS3 = jax.lax.dot_general(
        W, P, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, G, 128]
    return dS3.reshape(dout.shape[0], G * 128), None


pick_cvjp.defvjp(_pick_cvjp_fwd, _pick_cvjp_bwd)


def scan_bench(step_fn, init, n=STEPS):
    """Returns per-step seconds: jit(scan) with chained state, one fetch."""
    def body(carry, key):
        return step_fn(carry, key), ()

    f = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks)[0])
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    out = f(init, keys)  # compile + warm
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    out = f(init, keys)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / n


@jax.custom_vjp
def pick3d(S3, idx):
    return _pick3d_fwd(S3, idx)[0]


def _pick3d_fwd(S3, idx):
    g = (idx // 128).astype(jnp.int32)
    lane = (idx % 128).astype(jnp.int32)
    Gh = jax.nn.one_hot(g, S3.shape[1], dtype=jnp.bfloat16)
    U = jax.lax.dot_general(
        Gh, S3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, K, 128]
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)
    out = jnp.sum(U * P, axis=2)
    return out, (idx, S3.shape[1])


def _pick3d_bwd(res, dout):
    idx, G_ = res
    g = (idx // 128).astype(jnp.int32)
    lane = (idx % 128).astype(jnp.int32)
    P = jax.nn.one_hot(lane, 128, dtype=jnp.bfloat16)
    Gh = jax.nn.one_hot(g, G_, dtype=jnp.bfloat16)
    W = Gh * dout[:, :, None].astype(jnp.bfloat16)  # [B, K, G]
    dS3 = jax.lax.dot_general(
        W, P, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16,
    )  # [B, G, 128]
    return dS3, None


pick3d.defvjp(_pick3d_fwd, _pick3d_bwd)


def make_step(mode, dtype, slots):
    def loss_fn(E, R, trip, idx):
        Ec = E.astype(dtype)
        Rc = R.astype(dtype)
        E3 = Ec.reshape(G, 128, D)
        total = 0.0
        if mode == "counts":
            C = counts_matrix(idx).astype(jnp.float32)
        score_t = jnp.bfloat16 if mode in ("pick16", "pick3d") else jnp.float32
        for s in range(slots):
            head = trip[:, 0] if s == 0 else trip[:, 2]
            tail = trip[:, 2] if s == 0 else trip[:, 0]
            q = Ec[head] * Rc[trip[:, 1]]
            if mode == "pick3d":
                S3 = jax.lax.dot_general(
                    q, E3, (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )  # [B, G, 128]
                pos = jnp.sum(q * Ec[tail], axis=1).astype(jnp.float32)
                neg = pick3d(S3, idx).astype(jnp.float32)
                sc = jnp.concatenate([pos[:, None], neg], axis=1)
                total = total + jnp.mean(
                    -sc[:, 0] + jax.scipy.special.logsumexp(sc, axis=1)
                )
                continue
            S = jax.lax.dot_general(
                q, Ec, (((1,), (1,)), ((), ())),
                preferred_element_type=score_t,
            )
            pos = jnp.sum(q * Ec[tail], axis=1).astype(jnp.float32)
            if mode == "counts":
                m = jnp.maximum(pos, jnp.max(S, axis=1))
                lse = m + jnp.log(
                    jnp.exp(pos - m)
                    + jnp.sum(C * jnp.exp(S - m[:, None]), axis=1)
                )
                total = total + jnp.mean(-pos + lse)
            elif mode == "cvjp":
                neg = pick_cvjp(S, idx).astype(jnp.float32)
                sc = jnp.concatenate([pos[:, None], neg], axis=1)
                total = total + jnp.mean(
                    -sc[:, 0] + jax.scipy.special.logsumexp(sc, axis=1)
                )
            else:
                neg = pick_two_level(S, idx).astype(jnp.float32)
                sc = jnp.concatenate([pos[:, None], neg], axis=1)
                total = total + jnp.mean(
                    -sc[:, 0] + jax.scipy.special.logsumexp(sc, axis=1)
                )
        return total

    def step(carry, key):
        E, R = carry
        k1, k2 = jax.random.split(key)
        trip = jax.random.randint(k1, (B, 3), 0, NR, dtype=jnp.int32)
        trip = trip.at[:, 0].set(trip[:, 0] * 61 % V)
        trip = trip.at[:, 2].set(trip[:, 2] * 53 % V)
        idx = jax.random.randint(k2, (B, K), 0, V, dtype=jnp.int32)
        gE, gR = jax.grad(loss_fn, argnums=(0, 1))(E, R, trip, idx)
        return (E - 0.01 * gE, R - 0.01 * gR)

    return step


def main():
    key = jax.random.PRNGKey(0)
    E = jax.random.normal(key, (VP, D), jnp.float32) * 0.1
    R = jax.random.normal(key, (NR, D), jnp.float32) * 0.1
    print("devices:", jax.devices(), flush=True)
    for mode, dtype in (
        ("pick3d", jnp.bfloat16),
        ("pick3d", jnp.float32),
    ):
        for slots in (2,):
            dt = scan_bench(make_step(mode, dtype, slots), (E, R))
            print(
                f"{mode} {jnp.dtype(dtype).name} slots={slots}: "
                f"{dt*1e3:.1f} ms/step -> {B/dt/1e3:.0f}k triples/s",
                flush=True,
            )

    # roofline reference: pure chained matmul
    def mm_step(carry, key):
        E, R = carry
        q = E[:B].astype(jnp.bfloat16)
        S = jax.lax.dot_general(
            q, E.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (E - 1e-9 * jnp.sum(S) * jnp.ones_like(E) * 0, R)

    dt = scan_bench(mm_step, (E, R))
    print(f"pure fwd matmul chained: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
