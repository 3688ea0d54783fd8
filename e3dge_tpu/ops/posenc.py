"""Sinusoidal positional encoding (NeRF-style) for 3D sample points.

Matches the reference `PosEncoding` (`project/utils/misc_utils.py:148-184`):
frequencies 2^0 .. 2^(N_freqs-1) (log-spaced) with identity passthrough, giving
3 * (2*7 + 1) = 45 output dims for 3D inputs at the default N_freqs=7.
"""

from __future__ import annotations

import jax.numpy as jnp


def pos_encoding(x: jnp.ndarray, n_freqs: int = 7, logscale: bool = True) -> jnp.ndarray:
    """Encode last-axis coordinates: [..., D] -> [..., D * (2*n_freqs + 1)].

    Output ordering is [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] per the
    reference's interleaved funcs loop.
    """
    if logscale:
        freqs = 2.0 ** jnp.linspace(0.0, n_freqs - 1.0, n_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1.0), n_freqs)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)
