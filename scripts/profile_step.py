"""Ablation microbenchmark of the NegSamp train step on the real chip:
forward / forward+backward / full step / epoch scan, plus raw-op ceilings
(gather, score matmul, adagrad) for speed-of-light comparison."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

E, R, D = 14541, 237, 512
B, NEG = 8192, 128


def timeit(fn, *args, n=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ent = jax.random.normal(key, (E, 2 * D), jnp.float32)
    rel = jax.random.normal(key, (R, 2 * D), jnp.float32)
    s = jax.random.randint(key, (B,), 0, E)
    p = jax.random.randint(key, (B,), 0, R)
    o = jax.random.randint(key, (B,), 0, E)
    negs = jax.random.randint(key, (NEG + 1,), 0, E)

    def complex_combine(se, pe):
        d = D
        sr, si = se[:, :d], se[:, d:]
        pr, pi = pe[:, :d], pe[:, d:]
        return jnp.concatenate([sr * pr - si * pi, sr * pi + si * pr], axis=1)

    @jax.jit
    def gather_only(ent, s, o):
        return ent[s].sum() + ent[o].sum()

    @jax.jit
    def fwd(ent, rel, s, p, o, negs):
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

    grad_fn = jax.jit(jax.grad(fwd, argnums=(0, 1)))

    @jax.jit
    def adagrad_dense(ent, g, state):
        state = state + g * g
        return ent - 0.1 * g * jax.lax.rsqrt(state + 1e-10), state

    g = jnp.ones_like(ent)
    state = jnp.ones_like(ent)

    print(f"gather 2x{B}x{2*D}:       {timeit(gather_only, ent, s, o)*1e3:.3f} ms")
    print(f"forward (2 slots):      {timeit(fwd, ent, rel, s, p, o, negs)*1e3:.3f} ms")
    print(f"forward+grad:           {timeit(grad_fn, ent, rel, s, p, o, negs)*1e3:.3f} ms")
    print(f"adagrad dense {E}x{2*D}: {timeit(adagrad_dense, ent, g, state)*1e3:.3f} ms")

    # full framework step for comparison
    import tempfile
    from __graft_entry__ import _write_synthetic_dataset
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-prof-"), "prof_fb"),
        num_entities=E, num_relations=R, num_train=B * 4,
    )
    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "prof_fb")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", NEG)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", B)
    config.set("valid.every", 0)
    config.set("complex.entity_embedder.dim", 2 * D, create=True)
    config.set("complex.relation_embedder.dim", 2 * D, create=True)
    dataset = Dataset.create(config, folder=str(folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    t = job.run_epoch()
    job.epoch = 2
    t0 = time.perf_counter()
    t = job.run_epoch()
    dt = time.perf_counter() - t0
    nb = t["batches"]
    print(f"framework epoch:        {dt*1e3:.1f} ms for {nb} batches "
          f"= {dt/nb*1e3:.3f} ms/batch ({B*nb/dt/1e6:.2f}M triples/s)")




def step_only():
    """Time the framework's jitted raw step in isolation (no scan)."""
    import tempfile
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _write_synthetic_dataset
    from kge_tpu import Config, Dataset
    from kge_tpu.job import TrainingJob

    folder = _write_synthetic_dataset(
        os.path.join(tempfile.mkdtemp(prefix="kge-prof-"), "prof_fb"),
        num_entities=E, num_relations=R, num_train=B * 4,
    )
    config = Config(folder=None)
    config.set("console.quiet", True)
    config.load_options({"model": "complex"})
    config.set("dataset.name", "prof_fb")
    config.set("train.type", "negative_sampling")
    config.set("negative_sampling.num_samples.s", NEG)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.shared_type", "default")
    config.set("train.batch_size", B)
    config.set("valid.every", 0)
    config.set("train.epoch_scan", "never")
    config.set("complex.entity_embedder.dim", 2 * D, create=True)
    config.set("complex.relation_embedder.dim", 2 * D, create=True)
    dataset = Dataset.create(config, folder=str(folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    batch = next(job._batches())
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "true_size" and not isinstance(v, str)}
    rng = jax.random.PRNGKey(0)
    step = job._get_step_fn(job._step_variant(batch))
    lr = job._current_lrs()

    params, opt_state = job.model_params, job.opt_state
    # no donation timing loop: reuse same inputs (donation would invalidate)
    import functools
    undonated = jax.jit(step._fun if hasattr(step, "_fun") else None)

    def run(params, opt_state):
        return step(params, opt_state, dev_batch, rng, lr)

    out = run(params, opt_state)
    jax.block_until_ready(out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, cost, aux = run(params, opt_state)
    jax.block_until_ready(cost)
    dt = (time.perf_counter() - t0) / n
    print(f"framework raw step:     {dt*1e3:.3f} ms/batch "
          f"({B/dt/1e6:.2f}M triples/s)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "step":
        step_only()
        sys.exit(0)
    main()
