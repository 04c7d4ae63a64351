"""Device-mesh parallelism utilities."""
