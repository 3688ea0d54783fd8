"""Mesh/sharding parallelism utilities."""
