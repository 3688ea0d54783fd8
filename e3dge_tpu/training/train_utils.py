"""Training utilities (reference `project/utils/training_utils.py`).

  mixing_noise          — :32: style-mixing z pairs with probability p
  make_pair_same_noise  — :21-29: id-paired z for cycle training (see also
                          E3DGE.synthetic_sample pair_same_id)
  ema_update            — :40 `accumulate`: EMA of generator params
  make_noise            — fixed per-layer decoder noise buffers
                          (stylesdf_model.py:843-852; randomize_noise=False path)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def mixing_noise(key: jax.Array, batch: int, latent_dim: int, prob: float):
    """Returns [z] or [z1, z2] for style mixing with probability `prob`."""
    k1, k2, kp = jax.random.split(key, 3)
    z1 = jax.random.normal(k1, (batch, latent_dim))
    if float(jax.random.uniform(kp, ())) < prob:
        return [z1, jax.random.normal(k2, (batch, latent_dim))]
    return [z1]


def make_pair_same_noise(key: jax.Array, batch: int, latent_dim: int) -> jnp.ndarray:
    """Identity-paired z: entries (0,1), (2,3), ... share a latent."""
    z = jax.random.normal(key, (batch, latent_dim))
    return jnp.repeat(z[::2], 2, axis=0)


def ema_update(ema_params, params, decay: float = 0.5 ** (32 / 10_000)):
    """accumulate(ema, model, decay): ema = decay*ema + (1-decay)*params."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def make_noise(key: jax.Array, size: int, in_res: int, batch: int = 1):
    """Fixed decoder noise buffers: one [B,1,r,r] per layer, r doubling every two
    layers from in_res (reference Decoder noises, stylesdf_model.py:652-656)."""
    log_size = int(math.log2(size))
    log_in = int(math.log2(in_res))
    num_layers = (log_size - log_in) * 2 + 1
    noises = []
    for layer_idx in range(num_layers):
        res = 2 ** ((layer_idx + 2 * log_in + 1) // 2)
        key, k = jax.random.split(key)
        noises.append(jax.random.normal(k, (batch, 1, res, res)))
    return noises


def warm_start_merge(dst, src):
    """Size-matched partial checkpoint merge (reference --ckpt surgery,
    train_setup.py:144-177 + misc_utils.py:207-213): every leaf of `dst` whose
    counterpart in `src` exists with the same shape is replaced; missing or
    shape-mismatched leaves keep their fresh init (stage 2.1 loads the stage-1
    E0 but keeps fresh E1/netLocal; stage 2.2 adds a fresh fusion block).

    Returns (merged, loaded_count, skipped_count)."""
    counts = [0, 0]  # loaded, skipped

    def rec(d, s):
        if isinstance(d, dict):
            return {
                k: (rec(d[k], s[k]) if isinstance(s, dict) and k in s else d[k])
                for k in d
            }
        if hasattr(s, "shape") and d.shape == s.shape:
            counts[0] += 1
            return jnp.asarray(s)
        counts[1] += 1
        return d

    merged = rec(dst, src)
    return merged, counts[0], counts[1]
