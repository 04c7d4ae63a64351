"""Utilities: seeding, io, packaging, dump."""
