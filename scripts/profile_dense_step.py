"""Break the dense NegSamp step at bench shapes into: grad (with dense
table cotangents), optimizer update, full step — timed on the real chip."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=30):
    import jax

    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_ablate import build_job

    job = build_job()
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    batch = next(job._batches())
    device_batch = {
        k: jnp.asarray(v) for k, v in batch.items() if k != "true_size"
    }
    rng = jax.random.PRNGKey(0)
    params = job.model_params
    lr = job._current_lrs()

    def loss_grad(params, batch, rng):
        def f(p):
            l, aux = job._loss_for_batch(p, batch, rng)
            return l
        return jax.grad(f)(params)

    jl = jax.jit(loss_grad)
    grads = jax.block_until_ready(jl(params, device_batch, rng))
    t_grad = timeit(jl, params, device_batch, rng)

    upd = jax.jit(lambda g, s, p, lr: job.optimizer.update(g, s, p, lr))
    t_opt = timeit(upd, grads, job.opt_state, params, lr)

    step = jax.jit(job._raw_step)
    t_step = timeit(step, params, job.opt_state, device_batch, rng, lr)

    # raw scatter-add at the same shapes, pallas vs xla
    from kge_tpu.ops import pallas_ops
    E = job.dataset.num_entities()
    d = params["entity_embedder"]["embeddings"].shape[1]
    nrows = 2 * 8192 + 129
    key = jax.random.PRNGKey(1)
    ids = jax.random.randint(key, (nrows,), 0, E)
    rows = jax.random.normal(key, (nrows, d), jnp.float32)
    t_pal = timeit(jax.jit(
        lambda i, r: pallas_ops.sorted_scatter_add(i, r, E)), ids, rows)
    t_xla = timeit(jax.jit(
        lambda i, r: jnp.zeros((E, d), jnp.float32).at[i].add(r)), ids, rows)
    # sort + segment-sum + xla row-set (unique) alternative
    def sortseg(i, r):
        order = jnp.argsort(i)
        i_s, r_s = i[order], r[order]
        uniq, seg = jnp.unique(i_s, return_inverse=True, size=nrows,
                               fill_value=E)
        summed = jax.ops.segment_sum(r_s, seg, num_segments=nrows,
                                     indices_are_sorted=True)
        return uniq, summed
    t_seg = timeit(jax.jit(sortseg), ids, rows)

    print(f"grad (dense cotangent): {t_grad*1e3:8.3f} ms")
    print(f"optimizer dense update: {t_opt*1e3:8.3f} ms")
    print(f"full raw step:          {t_step*1e3:8.3f} ms")
    print(f"scatter_add pallas:     {t_pal*1e3:8.3f} ms")
    print(f"scatter_add xla:        {t_xla*1e3:8.3f} ms")
    print(f"sort+segsum(no write):  {t_seg*1e3:8.3f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    main()
