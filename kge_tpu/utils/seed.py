"""PRNG seeding.

Derives per-PRNG seeds from ``random_seed.default`` + the PRNG name (as the
reference does with md5 hashing, kge/util/seed.py) and seeds python/numpy;
the jax seed becomes the root ``jax.random`` key that all on-device
randomness is threaded from.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np

from kge_tpu.config import Config


def _derived_seed(base: int, name: str) -> int:
    h = int(hashlib.md5(name.encode()).hexdigest(), 16)
    return (base + h) % (2 ** 31)


def apply_device_config(config: Config) -> None:
    """Honor ``job.device``: 'cpu' forces the host backend (useful for tests
    and tiny datasets), 'auto' keeps the default JAX platform (TPU when
    present). Also engages the persistent XLA compilation cache
    (``job.compile_cache``) so repeated runs skip recompiles."""
    device = config.get("job.device")
    if device == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized; leave as-is
    if config.get("job.compile_cache"):
        import jax

        cache_dir = os.path.join(
            os.environ.get(
                "KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu")
            ),
            "jax",
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0
            )
        except (RuntimeError, OSError) as e:
            config.log(f"compile cache disabled: {e}", echo=False)


def seed_from_config(config: Config) -> int:
    """Seed host PRNGs; return the seed for the root jax key (or a random one)."""
    default = config.get("random_seed.default")

    def pick(name: str) -> int:
        explicit = config.get(f"random_seed.{name}")
        if explicit >= 0:
            return explicit
        if default >= 0:
            return _derived_seed(default, name)
        return -1

    py_seed = pick("python")
    if py_seed >= 0:
        random.seed(py_seed)
    np_seed = pick("numpy")
    if np_seed >= 0:
        np.random.seed(np_seed)
    jax_seed = pick("jax")
    if jax_seed < 0:
        jax_seed = random.randrange(2 ** 31)
    return jax_seed
