"""Ablate the pooled distance-model (RotatE/TransE) step on the chip:
time isolated pieces (candidate select, forward score, fwd+bwd, optimizer)
via device-chained lax.scan so dispatch overhead is amortized.

Usage: python scripts/exp_dist_ablate.py [--dim 1024] [--batch 4096]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE_ROOT = os.environ.get("KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

E, R = 14541, 237
K, F = 128, 4
STEPS = 20


def timeit(make_fn, label, n, d, reps=3):
    fn, args = make_fn()
    t0 = time.time()
    out = fn(*args)
    val = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x).astype(jnp.float32), out, 0.0
    ))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32), out, 0.0
        ))
        best = min(best, time.time() - t0)
    per_step = best / STEPS
    print(
        f"{label:36s} {per_step*1e3:8.2f} ms/step  "
        f"({n/per_step/1e6:6.2f}M t/s, compile {compile_s:.0f}s, val {val:.3e})",
        flush=True,
    )
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--model", default="rotate")
    args = ap.parse_args()
    n, d = args.batch, args.dim
    P = K * F

    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, d), jnp.float32) * 0.1
    rel = jax.random.normal(key, (R, d // 2 if args.model == "rotate" else d),
                            jnp.float32) * 0.1

    def rotate_neg(q_re, q_im, c_re, c_im):
        d_re = q_re[:, :, None, :] - c_re[:, :, :, :]
        d_im = q_im[:, :, None, :] - c_im
        mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
        return -jnp.sum(mod, axis=3)

    def batch_ids(k):
        ks = jax.random.split(k, 5)
        s = jax.random.randint(ks[0], (n,), 0, E)
        p = jax.random.randint(ks[1], (n,), 0, R)
        o = jax.random.randint(ks[2], (n,), 0, E)
        pool = jax.random.randint(ks[3], (P,), 0, E)
        sel = jax.random.randint(ks[4], (n, K), 0, F)
        return s, p, o, pool, sel

    def score_pooled(ent, rel, s, p, o, pool, sel, slot):
        """RotatE pooled negatives for one slot; returns [n, K]."""
        se, oe, pe = ent[s], ent[o], rel[p]
        p_re, p_im = jnp.cos(pe), jnp.sin(pe)
        pool3 = ent[pool].reshape(K, F, d)
        sel_oh = jax.nn.one_hot(sel, F, dtype=jnp.float32)
        cand = jnp.einsum("njf,jfd->njd", sel_oh, pool3,
                          precision=jax.lax.Precision.HIGHEST)
        c_re, c_im = cand[:, :, :d//2], cand[:, :, d//2:]
        if slot == 2:
            s_re, s_im = se[:, :d//2], se[:, d//2:]
            q_re = s_re * p_re - s_im * p_im
            q_im = s_re * p_im + s_im * p_re
        else:
            o_re, o_im = oe[:, :d//2], oe[:, d//2:]
            q_re = p_re * o_re + p_im * o_im
            q_im = p_re * o_im - p_im * o_re
        d_re = q_re[:, None, :] - c_re
        d_im = q_im[:, None, :] - c_im
        mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
        return -jnp.sum(mod, axis=2)

    def selfadv_loss(pos, neg):
        w = jax.nn.softmax(neg, axis=1)
        return (
            -jnp.sum(jax.nn.log_sigmoid(pos))
            - jnp.sum(w * jax.nn.log_sigmoid(-neg))
        )

    def scan_over(body):
        def make():
            keys = jax.random.split(jax.random.PRNGKey(1), STEPS)

            def wrapped(carry, k):
                return body(carry, k)

            f = jax.jit(
                lambda c, ks: jax.lax.scan(wrapped, c, ks)
            )
            return f, ((ent, rel), keys)
        return make

    # 1. ids + candidate select only
    def sel_only(carry, k):
        ent, rel = carry
        s, p, o, pool, sel = batch_ids(k)
        pool3 = ent[pool].reshape(K, F, d)
        sel_oh = jax.nn.one_hot(sel, F, dtype=jnp.float32)
        cand = jnp.einsum("njf,jfd->njd", sel_oh, pool3,
                          precision=jax.lax.Precision.HIGHEST)
        return (ent, rel), jnp.sum(cand[:, :, 0])

    timeit(scan_over(sel_only), "select-only", n, d)

    # 2. forward scores both slots
    def fwd(carry, k):
        ent, rel = carry
        s, p, o, pool, sel = batch_ids(k)
        out = 0.0
        for slot in (0, 2):
            out = out + jnp.sum(score_pooled(ent, rel, s, p, o, pool, sel, slot))
        return (ent, rel), out

    timeit(scan_over(fwd), "fwd scores (2 slots)", n, d)

    # 3. fwd + loss + bwd (grads into tables)
    def step(carry, k):
        ent, rel = carry
        s, p, o, pool, sel = batch_ids(k)

        def loss_fn(ent, rel):
            se, oe, pe = ent[s], ent[o], rel[p]
            p_re, p_im = jnp.cos(pe), jnp.sin(pe)
            s_re, s_im = se[:, :d//2], se[:, d//2:]
            o_re, o_im = oe[:, :d//2], oe[:, d//2:]
            sp_re = s_re * p_re - s_im * p_im
            sp_im = s_re * p_im + s_im * p_re
            dd_re, dd_im = sp_re - o_re, sp_im - o_im
            pos = -jnp.sum(jnp.sqrt(dd_re**2 + dd_im**2 + 1e-30), axis=1)
            total = 0.0
            for slot in (0, 2):
                neg = score_pooled(ent, rel, s, p, o, pool, sel, slot)
                total = total + selfadv_loss(pos, neg)
            return total / n

        g_ent, g_rel = jax.grad(loss_fn, argnums=(0, 1))(ent, rel)
        new_ent = ent - 0.01 * g_ent
        new_rel = rel - 0.01 * g_rel
        return (new_ent, new_rel), jnp.float32(0)

    timeit(scan_over(step), "full fwd+bwd+sgd", n, d)

    # 4. same with remat on scoring
    def step_remat(carry, k):
        ent, rel = carry
        s, p, o, pool, sel = batch_ids(k)
        scorer = jax.checkpoint(
            lambda ent, rel, slot: score_pooled(ent, rel, s, p, o, pool, sel, slot),
            static_argnums=(2,),
        )

        def loss_fn(ent, rel):
            se, oe, pe = ent[s], ent[o], rel[p]
            p_re, p_im = jnp.cos(pe), jnp.sin(pe)
            s_re, s_im = se[:, :d//2], se[:, d//2:]
            o_re, o_im = oe[:, :d//2], oe[:, d//2:]
            sp_re = s_re * p_re - s_im * p_im
            sp_im = s_re * p_im + s_im * p_re
            dd_re, dd_im = sp_re - o_re, sp_im - o_im
            pos = -jnp.sum(jnp.sqrt(dd_re**2 + dd_im**2 + 1e-30), axis=1)
            total = 0.0
            for slot in (0, 2):
                neg = scorer(ent, rel, slot)
                total = total + selfadv_loss(pos, neg)
            return total / n

        g_ent, g_rel = jax.grad(loss_fn, argnums=(0, 1))(ent, rel)
        return (ent - 0.01 * g_ent, rel - 0.01 * g_rel), jnp.float32(0)

    timeit(scan_over(step_remat), "full step + remat scoring", n, d)


# --- finer backward ablations (run via --fine) ---
def fine(args):
    n, d = args.batch, args.dim
    P = K * F
    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, d), jnp.float32) * 0.1
    rel = jax.random.normal(key, (R, d // 2), jnp.float32) * 0.1

    def batch_ids(k):
        ks = jax.random.split(k, 5)
        return (jax.random.randint(ks[0], (n,), 0, E),
                jax.random.randint(ks[1], (n,), 0, R),
                jax.random.randint(ks[2], (n,), 0, E),
                jax.random.randint(ks[3], (P,), 0, E),
                jax.random.randint(ks[4], (n, K), 0, F))

    def make_loss(stop_cand=False, slots=(0, 2), plain_sum=False,
                  manual=False):
        def loss_fn(ent, rel, ids):
            s, p, o, pool, sel = ids
            se, oe, pe = ent[s], ent[o], rel[p]
            p_re, p_im = jnp.cos(pe), jnp.sin(pe)
            s_re, s_im = se[:, :d//2], se[:, d//2:]
            o_re, o_im = oe[:, :d//2], oe[:, d//2:]
            sp_re = s_re * p_re - s_im * p_im
            sp_im = s_re * p_im + s_im * p_re
            dd_re, dd_im = sp_re - o_re, sp_im - o_im
            pos = -jnp.sum(jnp.sqrt(dd_re**2 + dd_im**2 + 1e-30), axis=1)
            pool3 = ent[pool].reshape(K, F, d)
            if stop_cand:
                pool3 = jax.lax.stop_gradient(pool3)
            sel_oh = jax.nn.one_hot(sel, F, dtype=jnp.float32)
            cand = jnp.einsum("njf,jfd->njd", sel_oh, pool3,
                              precision=jax.lax.Precision.HIGHEST)
            c_re, c_im = cand[:, :, :d//2], cand[:, :, d//2:]
            total = 0.0
            for slot in slots:
                if slot == 2:
                    q_re, q_im = sp_re, sp_im
                else:
                    q_re = p_re * o_re + p_im * o_im
                    q_im = p_re * o_im - p_im * o_re
                if manual:
                    neg = _manual_dist(q_re, q_im, c_re, c_im)
                else:
                    d_re = q_re[:, None, :] - c_re
                    d_im = q_im[:, None, :] - c_im
                    mod = jnp.sqrt(d_re * d_re + d_im * d_im + 1e-30)
                    neg = -jnp.sum(mod, axis=2)
                if plain_sum:
                    total = total + jnp.sum(neg) + jnp.sum(pos)
                else:
                    w = jax.nn.softmax(neg, axis=1)
                    total = (total - jnp.sum(jax.nn.log_sigmoid(pos))
                             - jnp.sum(w * jax.nn.log_sigmoid(-neg)))
            return total / n
        return loss_fn

    @jax.custom_vjp
    def _manual_dist(q_re, q_im, c_re, c_im):
        d_re = q_re[:, None, :] - c_re
        d_im = q_im[:, None, :] - c_im
        return -jnp.sum(jnp.sqrt(d_re*d_re + d_im*d_im + 1e-30), axis=2)

    def _md_fwd(q_re, q_im, c_re, c_im):
        return _manual_dist(q_re, q_im, c_re, c_im), (q_re, q_im, c_re, c_im)

    def _md_bwd(res, g):
        q_re, q_im, c_re, c_im = res
        d_re = q_re[:, None, :] - c_re
        d_im = q_im[:, None, :] - c_im
        inv = jax.lax.rsqrt(d_re*d_re + d_im*d_im + 1e-30)
        u_re = d_re * inv * (-g[:, :, None])
        u_im = d_im * inv * (-g[:, :, None])
        return (jnp.sum(u_re, axis=1), jnp.sum(u_im, axis=1),
                -u_re, -u_im)

    _manual_dist.defvjp(_md_fwd, _md_bwd)

    def run(label, **kw):
        loss_fn = make_loss(**kw)
        keys = jax.random.split(jax.random.PRNGKey(1), STEPS)

        def body(carry, k):
            ent, rel = carry
            ids = batch_ids(k)
            g_ent, g_rel = jax.grad(loss_fn, argnums=(0, 1))(ent, rel, ids)
            return (ent - 0.01 * g_ent, rel - 0.01 * g_rel), jnp.float32(0)

        def make():
            f = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks))
            return f, ((ent, rel), keys)
        timeit(make, label, n, d)

    run("step: full (ref)")
    run("step: stop_grad(cand)", stop_cand=True)
    run("step: one slot", slots=(2,))
    run("step: plain sum loss", plain_sum=True)
    run("step: manual dist vjp", manual=True)


if __name__ == "__main__":
    if "--fine" in sys.argv:
        sys.argv.remove("--fine")
        ap = argparse.ArgumentParser()
        ap.add_argument("--dim", type=int, default=1024)
        ap.add_argument("--batch", type=int, default=4096)
        ap.add_argument("--model", default="rotate")
        fine(ap.parse_known_args()[0])
    else:
        main()
