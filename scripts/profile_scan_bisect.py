"""Bisect the scanned epoch at bench shapes: monkeypatch the raw step to
(noop | loss_only | full) and time run_epoch_group on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))


def run(mode):
    import jax
    import jax.numpy as jnp

    from profile_ablate import build_job

    job = build_job()
    job._prepare()
    job._is_prepared = True
    orig = job._raw_step

    if mode == "noop":
        def raw_step(params, opt_state, batch, rng, lr):
            cost = jnp.sum(batch["triples"][0].astype(jnp.float32))
            aux = {"avg_loss": cost, "penalties": {}}
            return params, opt_state, cost, aux
        job._raw_step = raw_step
    elif mode == "loss_only":
        def raw_step(params, opt_state, batch, rng, lr):
            def f(p):
                l, aux = job._loss_for_batch(p, batch, rng)
                return l, aux
            (cost, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
            # consume grads with a cheap reduction so they are not DCE'd
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            aux = {"avg_loss": cost + 0.0 * gsum, "penalties": {}}
            return params, opt_state, cost, aux
        job._raw_step = raw_step
    elif mode == "fwd_only":
        def raw_step(params, opt_state, batch, rng, lr):
            cost, aux = job._loss_for_batch(params, batch, rng)
            aux = {"avg_loss": cost, "penalties": {}}
            return params, opt_state, cost, aux
        job._raw_step = raw_step

    job.run_epoch_group(5)
    t0 = time.time()
    traces = job.run_epoch_group(5)
    dt = time.time() - t0
    nb = traces[-1]["batches"]
    print(f"{mode:12s} {dt:6.3f}s  {dt/(5*nb)*1e3:7.3f} ms/batch")


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["noop", "fwd_only", "loss_only", "full"]:
        run(mode)
