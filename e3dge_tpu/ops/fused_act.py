"""Fused bias-add + leaky-ReLU (x sqrt(2) gain).

The reference ships a CUDA kernel for this (`project/models/op/fused_bias_act_kernel.cu`)
because eager PyTorch would materialize intermediates. Under XLA the expression below is
a single fused VPU loop — no custom kernel or autograd is needed; we keep it as a named
op so models read like the reference API (`op/fused_act.py:106-118`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale, bias broadcast over the channel axis.

    Channel axis convention: axis 1 for rank>=3 (NCHW / NCL), last axis for rank<=2 —
    matching the reference's `bias.reshape(1, -1, *([1] * (ndim - 2)))`.
    """
    if bias is not None:
        if x.ndim >= 3:
            shape = (1, -1) + (1,) * (x.ndim - 2)
        else:
            shape = (1,) * (x.ndim - 1) + (-1,)
        x = x + bias.reshape(shape)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """leaky_relu(x) * sqrt(2) (reference `ScaledLeakyReLU`, stylesdf_model.py:251)."""
    return jnp.where(x >= 0, x, x * negative_slope) * SQRT2
