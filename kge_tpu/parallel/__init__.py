"""Device-mesh parallelism utilities."""

from kge_tpu.parallel.mesh import DeviceCtx

__all__ = ["DeviceCtx"]
