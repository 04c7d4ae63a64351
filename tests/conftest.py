"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on CPU via XLA's host-platform device
emulation (the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the environment may pin JAX_PLATFORMS to a TPU tunnel via sitecustomize;
# the config update below overrides it reliably
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TESTS_DIR = pathlib.Path(__file__).resolve().parent
DATASET_DIR = TESTS_DIR / "data" / "dataset_test"
