"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
`--xla_force_host_platform_device_count=8` per the project build rules.

Note: this machine's sitecustomize registers an 'axon' TPU platform and sets
jax_platforms='axon,cpu' via jax.config at interpreter boot, which overrides the
JAX_PLATFORMS env var — so we must override jax.config back after importing jax.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
