"""Isolate lax.scan epoch overhead: same ComplEx step, three harnesses —
python loop of donated jit steps, scan with params in carry, scan via
jnp-indexed batches. Finds whether XLA copies the big carry per iteration."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

E, R, D = 14541, 237, 512
B, NEG, NB = 8192, 128, 32


def complex_combine(se, pe):
    d = D
    sr, si = se[:, :d], se[:, d:]
    pr, pi = pe[:, :d], pe[:, d:]
    return jnp.concatenate([sr * pr - si * pi, sr * pi + si * pr], axis=1)


def loss_fn(ent, rel, trip, key):
    s, p, o = trip[:, 0], trip[:, 1], trip[:, 2]
    negs = jax.random.randint(key, (NEG + 1,), 0, E)
    se, pe, oe = ent[s], rel[p], ent[o]
    te = ent[negs]
    total = 0.0
    for slot_t, other in ((oe, se), (se, oe)):
        comb = complex_combine(other, pe)
        pos = jnp.sum(comb * slot_t, axis=1, keepdims=True)
        neg = comb @ te.T
        sc = jnp.concatenate([pos, neg[:, :NEG]], axis=1)
        logz = jax.nn.logsumexp(sc, axis=1)
        total = total + jnp.sum(logz - sc[:, 0]) / B
    return total


def step(ent, rel, g_ent, g_rel, st_ent, st_rel):
    st_ent = st_ent + g_ent * g_ent
    st_rel = st_rel + g_rel * g_rel
    ent = ent - 0.1 * g_ent * jax.lax.rsqrt(st_ent + 1e-10)
    rel = rel - 0.1 * g_rel * jax.lax.rsqrt(st_rel + 1e-10)
    return ent, rel, st_ent, st_rel


def full_step(ent, rel, st_ent, st_rel, trip, key):
    loss, (g_ent, g_rel) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        ent, rel, trip, key
    )
    ent, rel, st_ent, st_rel = step(ent, rel, g_ent, g_rel, st_ent, st_rel)
    return ent, rel, st_ent, st_rel, loss


def main():
    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key, (R, 2 * D), jnp.float32)
    st_ent = jnp.zeros_like(ent)
    st_rel = jnp.zeros_like(rel)
    trips = jax.random.randint(key, (NB, B, 3), 0, 237)

    # 1) python loop of donated jit steps
    jstep = jax.jit(full_step, donate_argnums=(0, 1, 2, 3))
    state = (ent, rel, st_ent, st_rel)
    state_w = jstep(*state, trips[0], key)[:4]
    jax.block_until_ready(state_w)
    t0 = time.perf_counter()
    for i in range(NB):
        out = jstep(*state_w, trips[i], jax.random.fold_in(key, i))
        state_w = out[:4]
    _ = float(jnp.sum(state_w[1]))  # real fetch barrier
    t_loop = (time.perf_counter() - t0) / NB
    print(f"python loop of donated steps: {t_loop*1e3:.3f} ms/batch")

    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key, (R, 2 * D), jnp.float32)
    st_ent = jnp.zeros_like(ent)
    st_rel = jnp.zeros_like(rel)
    # 2) lax.scan with big carry
    def epoch(ent, rel, st_ent, st_rel, trips, key):
        keys = jax.random.split(key, NB)

        def body(carry, xs):
            ent, rel, st_ent, st_rel = carry
            trip, k = xs
            ent, rel, st_ent, st_rel, loss = full_step(
                ent, rel, st_ent, st_rel, trip, k
            )
            return (ent, rel, st_ent, st_rel), loss

        carry, losses = jax.lax.scan(
            body, (ent, rel, st_ent, st_rel), (trips, keys)
        )
        return carry, losses

    jepoch = jax.jit(epoch, donate_argnums=(0, 1, 2, 3))
    state = jepoch(ent, rel, st_ent, st_rel, trips, key)[0]
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, losses = jepoch(*state, trips, key)
    _ = float(jnp.sum(state[1])) + float(jnp.sum(losses))
    t_scan = (time.perf_counter() - t0) / NB
    print(f"lax.scan epoch:               {t_scan*1e3:.3f} ms/batch")

    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key, (R, 2 * D), jnp.float32)
    st_ent = jnp.zeros_like(ent)
    st_rel = jnp.zeros_like(rel)
    # 3) scan with gathered batches (permutation indexing like the framework)
    flat = trips.reshape(NB * B, 3)

    def epoch_gather(ent, rel, st_ent, st_rel, flat, key):
        perm_key, keys_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, NB * B).reshape(NB, B)
        keys = jax.random.split(keys_key, NB)

        def body(carry, xs):
            ent, rel, st_ent, st_rel = carry
            idx, k = xs
            trip = flat[idx]
            ent, rel, st_ent, st_rel, loss = full_step(
                ent, rel, st_ent, st_rel, trip, k
            )
            return (ent, rel, st_ent, st_rel), loss

        carry, losses = jax.lax.scan(
            body, (ent, rel, st_ent, st_rel), (perm, keys)
        )
        return carry, losses

    jepoch2 = jax.jit(epoch_gather, donate_argnums=(0, 1, 2, 3))
    state = jepoch2(ent, rel, st_ent, st_rel, flat, key)[0]
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, losses = jepoch2(*state, flat, key)
    _ = float(jnp.sum(state[1])) + float(jnp.sum(losses))
    t_scan2 = (time.perf_counter() - t0) / NB
    print(f"scan + in-jit permutation:    {t_scan2*1e3:.3f} ms/batch")




def ablate():
    """Forward / +backward / +adagrad inside a scanned epoch, real barriers."""
    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key, (R, 2 * D), jnp.float32)
    st_ent = jnp.zeros_like(ent)
    st_rel = jnp.zeros_like(rel)
    trips = jax.random.randint(key, (NB, B, 3), 0, 237)

    def run(name, body_fn, carry0):
        def epoch(carry, trips, key):
            keys = jax.random.split(key, NB)
            return jax.lax.scan(body_fn, carry, (trips, keys))

        fn = jax.jit(epoch, donate_argnums=(0,))
        carry, losses = fn(carry0, trips, key)
        _ = float(jnp.sum(losses))
        t0 = time.perf_counter()
        carry, losses = fn(carry, trips, key)
        _ = float(jnp.sum(losses))
        dt = (time.perf_counter() - t0) / NB
        print(f"{name:28s}{dt*1e3:8.3f} ms/batch")
        return carry

    def fwd_body(carry, xs):
        ent, rel = carry
        trip, k = xs
        return (ent, rel), loss_fn(ent, rel, trip, k)

    def grad_sgd_body(carry, xs):
        ent, rel = carry
        trip, k = xs
        loss, (g_ent, g_rel) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            ent, rel, trip, k
        )
        return (ent - 0.001 * g_ent, rel - 0.001 * g_rel), loss

    def adagrad_body(carry, xs):
        ent, rel, st_ent, st_rel = carry
        trip, k = xs
        ent, rel, st_ent, st_rel, loss = full_step(
            ent, rel, st_ent, st_rel, trip, k
        )
        return (ent, rel, st_ent, st_rel), loss

    run("forward only", fwd_body, (ent, rel))
    key2 = jax.random.PRNGKey(1)
    ent = jax.random.normal(key2, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key2, (R, 2 * D), jnp.float32)
    run("forward+grad+sgd", grad_sgd_body, (ent, rel))
    ent = jax.random.normal(key2, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key2, (R, 2 * D), jnp.float32)
    run("forward+grad+adagrad", adagrad_body,
        (ent, rel, jnp.zeros_like(ent), jnp.zeros_like(rel)))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ablate":
        ablate()
    else:
        main()
