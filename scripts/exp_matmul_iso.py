"""Isolate the all-scores matmul cost components on TPU."""

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

B, V, D = 8192, 14592, 512


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / iters


key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, D), jnp.bfloat16)
Eb = jax.random.normal(key, (V, D), jnp.bfloat16)
Ef = Eb.astype(jnp.float32)
qf = q.astype(jnp.float32)
trip = jnp.asarray(np.random.randint(0, V, (B, 2)).astype(np.int32))

print("backend:", jax.default_backend(), flush=True)

# 1. pure fwd matmul bf16 -> bf16
f = jax.jit(lambda q, E: q @ E.T)
print(f"fwd matmul bf16->bf16: {timeit(f, q, Eb)*1e3:.2f} ms", flush=True)

# 2. fwd matmul bf16 -> f32 out
f = jax.jit(lambda q, E: jax.lax.dot_general(
    q, E, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
print(f"fwd matmul bf16->f32: {timeit(f, q, Eb)*1e3:.2f} ms", flush=True)

# 3. fwd matmul f32
f = jax.jit(lambda q, E: q @ E.T)
print(f"fwd matmul f32: {timeit(f, qf, Ef)*1e3:.2f} ms", flush=True)

# 4. fwd+bwd matmul bf16 (sum-of-squares loss)
f = jax.jit(jax.grad(lambda q, E: jnp.sum((q @ E.T).astype(jnp.float32) ** 2),
                     argnums=(0, 1)))
print(f"fwd+bwd matmul bf16: {timeit(f, q, Eb)*1e3:.2f} ms", flush=True)

# 5. fwd+bwd with gathered q (the real shape: q rows gathered from E)
def gq(E, trip):
    qq = E[trip[:, 0]] * E[trip[:, 1]]
    return jnp.sum((qq @ E.T).astype(jnp.float32) ** 2)

f = jax.jit(jax.grad(gq))
print(f"fwd+bwd gathered-q bf16: {timeit(f, Eb, trip)*1e3:.2f} ms", flush=True)

f = jax.jit(jax.grad(lambda E, t: gq(E.astype(jnp.bfloat16), t)))
print(f"fwd+bwd gathered-q f32 params->bf16: {timeit(f, Ef, trip)*1e3:.2f} ms",
      flush=True)
