"""Platform selection override for the CLI entry points.

This machine's sitecustomize registers an 'axon' TPU platform and sets
jax_platforms='axon,cpu' via jax.config at interpreter boot — which OVERRIDES
the JAX_PLATFORMS environment variable. When the TPU relay is unreachable the
backend init hangs, so a plain env var cannot rescue a CLI run. The scripts
call `apply_platform_override()` before first device use: it reads
E3DGE_PLATFORM (e.g. "cpu") and re-applies it through jax.config, which wins
over sitecustomize as long as no backend has been initialized yet.

Usage:  E3DGE_PLATFORM=cpu python scripts/eval.py ...
"""

from __future__ import annotations

import os


def apply_platform_override() -> str | None:
    """Apply E3DGE_PLATFORM to jax.config if set. Returns the platform or None."""
    plat = os.environ.get("E3DGE_PLATFORM")
    if not plat:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # backend already initialized; too late to switch — surface loudly
        raise RuntimeError(
            f"E3DGE_PLATFORM={plat} was set but a JAX backend is already "
            f"initialized on {jax.devices()[0].platform!r}; call "
            "apply_platform_override() before any device use"
        )
    return plat
