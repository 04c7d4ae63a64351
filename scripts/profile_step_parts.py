"""Fine-grained bisect of the NegSamp scanned step at bench shapes: build the
step up piece by piece inside a lax.scan (34 batches, like one epoch) and time
each stage on the real chip. Small jits -> fast compiles."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

E, R, D, B, NEG, NB = 14541, 237, 512, 8192, 128, 34


def t_scan(make_body, init, n=3):
    import jax

    body = make_body()

    @jax.jit
    def run(init, keys):
        c, _ = jax.lax.scan(body, init, keys)
        return c

    keys = jax.random.split(jax.random.PRNGKey(1), NB)
    r = jax.block_until_ready(run(init, keys))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.block_until_ready(run(init, keys))
        best = min(best, time.perf_counter() - t0)
    return best / NB


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, D), jnp.float32)
    rel = jax.random.normal(key, (R, D), jnp.float32)
    ent_state = jnp.zeros_like(ent)
    rel_state = jnp.zeros_like(rel)
    triples = jnp.stack([
        jax.random.randint(key, (NB * B,), 0, E),
        jax.random.randint(key, (NB * B,), 0, R),
        jax.random.randint(key, (NB * B,), 0, E),
    ], axis=1).reshape(NB, B, 3)

    d2 = D // 2

    def combine(se, pe):
        sr, si = se[:, :d2], se[:, d2:]
        pr, pi = pe[:, :d2], pe[:, d2:]
        return jnp.concatenate([sr * pr - si * pi, sr * pi + si * pr], axis=1)

    def draw_negs(trip, rng, slot):
        sample = jax.random.randint(rng, (NEG + 1,), 0, E, dtype=jnp.int32)
        pos = trip[:, slot]
        matches = sample[None, :NEG] == pos[:, None]
        has = matches.any(axis=1)
        first = jnp.argmax(matches, axis=1)
        return sample, first, has

    def loss_for(ent, rel, trip, rng, slots=(0, 2), negs=True, match=True):
        total = 0.0
        for slot in slots:
            sample, first, has = draw_negs(
                trip, jax.random.fold_in(rng, slot), slot
            )
            s, p, o = trip[:, 0], trip[:, 1], trip[:, 2]
            se, pe, oe = ent[s], rel[p], ent[o]
            if slot == 0:
                comb = combine(oe, jnp.concatenate(
                    [pe[:, :d2], -pe[:, d2:]], axis=1))
                pos_emb = se
            else:
                comb = combine(se, pe)
                pos_emb = oe
            pos_score = jnp.sum(comb * pos_emb, axis=1, keepdims=True)
            if negs:
                te = ent[sample]
                all_sc = comb @ te.T
                neg = all_sc[:, :NEG]
                if match:
                    spare = all_sc[:, NEG]
                    cols = jnp.arange(NEG)[None, :]
                    rep = (cols == first[:, None]) & has[:, None]
                    neg = jnp.where(rep, spare[:, None], neg)
                sc = jnp.concatenate([pos_score, neg], axis=1)
            else:
                sc = pos_score
            logz = jax.nn.logsumexp(sc, axis=1)
            total = total + jnp.sum(logz - sc[:, 0]) / B
        return total

    def adagrad(p, s, g, lr=0.1):
        s = s + g * g
        return p - lr * g * jax.lax.rsqrt(s + 1e-10), s

    stages = {}

    def body_noop():
        def f(carry, xs):
            ent, es = carry
            return (ent, es), jnp.float32(0)
        return f

    stages["noop"] = (body_noop, (ent, ent_state))

    def body_fwd(slots=(0, 2), negs=True, match=True):
        def make():
            def f(carry, rng):
                ent, es = carry
                trip = triples[0]
                l = loss_for(ent, rel, trip, rng, slots, negs, match)
                return (ent, es), l
            return f
        return make

    stages["fwd 2slot"] = (body_fwd(), (ent, ent_state))

    def body_grad(slots=(0, 2), negs=True, match=True, update=False,
                  wrt_rel=True):
        def make():
            def f(carry, rng):
                ent, es, rel_, rs = carry
                trip = triples[0]
                if wrt_rel:
                    l, grads = jax.value_and_grad(
                        lambda e, r: loss_for(e, r, trip, rng, slots, negs,
                                              match), argnums=(0, 1),
                    )(ent, rel_)
                    ge, gr = grads
                else:
                    l, ge = jax.value_and_grad(
                        lambda e: loss_for(e, rel_, trip, rng, slots, negs,
                                           match))(ent)
                    gr = None
                if update:
                    ent, es = adagrad(ent, es, ge)
                    if gr is not None:
                        rel_, rs = adagrad(rel_, rs, gr)
                else:
                    ent = ent + 0e-9 * ge
                    if gr is not None:
                        rel_ = rel_ + 0e-9 * gr
                return (ent, es, rel_, rs), l
            return f
        return make

    init4 = (ent, ent_state, rel, rel_state)
    stages["grad 1slot nonegs"] = (
        body_grad(slots=(2,), negs=False), init4)
    stages["grad 1slot"] = (body_grad(slots=(2,)), init4)
    stages["grad 2slot nomatch"] = (body_grad(match=False), init4)
    stages["grad 2slot"] = (body_grad(), init4)
    stages["grad 2slot ent-only"] = (body_grad(wrt_rel=False), init4)
    stages["full step"] = (body_grad(update=True), init4)

    for name, (mk, init) in stages.items():
        dt = t_scan(mk, init)
        print(f"{name:24s} {dt*1e3:7.3f} ms/batch")


if __name__ == "__main__":
    main()
