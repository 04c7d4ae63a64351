"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax


def pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests exercise the
    same code path)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True
