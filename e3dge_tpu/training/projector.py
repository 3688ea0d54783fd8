"""Optimization-based inversion + PTI generator fine-tuning.

Mirrors the reference `Projectors` (`project/trainers/Inversions/projectors.py:29-734`):
W/W+ offset optimization against the mean latent (:86-101 `_init_latent_code`,
wspace optimizes one row broadcast over the W+ rows), linearly-decaying latent
noise `0.03 * randn * (num_steps - step)/num_steps` on BOTH latents (:107-116),
L2 + LPIPS objective on the 256 render plus 0.1x the same on the thumb ("no loss
on thumb leads to shape collapse", :209-222), Adam(first_inv_lr=5e-3) with
StepLR(100, gamma=0.75) (:186-192, options.py:1474-1490), then optional PTI —
fine-tune the generator around the inverted code (max_pti_steps=100,
pti_learning_rate, options.py:1480-1490).

Both loops are jit-compiled python loops over a fixed step count (one trace per
step shape; the per-step program is a single XLA graph).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.render.camera import CameraParams
from e3dge_tpu.training import losses as L


def _latent_noise_scale(step, total_steps, initial=0.03):
    """Reference projector noise schedule: initial * (num_steps - step)/num_steps
    (linear decay, projectors.py:107-116)."""
    return initial * (total_steps - step) / total_steps


def project(
    model: E3DGE,
    variables: dict,
    mean_latents: LatentMeans,
    images: jnp.ndarray,
    camera: CameraParams,
    key: jax.Array,
    steps: int = 300,
    lr: float = 5e-3,
    l2_lambda: float = 1.0,
    lpips_lambda: float = 1.0,
    lpips_fn: Callable | None = None,
    wspace: bool = False,
    thumb_lambda: float = 0.1,
):
    """Optimize W(+) offsets for a batch of images. Returns (latents, losses).

    wspace optimizes a single [B, D] row per net, broadcast over the W+ rows
    (reference `--wspace`); default is full W+ offsets."""
    b = images.shape[0]
    n_rows = (mean_latents.renderer.shape[1], mean_latents.decoder.shape[1])
    if wspace:
        offsets = [
            jnp.zeros((b, mean_latents.renderer.shape[-1])),
            jnp.zeros((b, mean_latents.decoder.shape[-1])),
        ]
    else:
        offsets = [
            jnp.zeros((b,) + mean_latents.renderer.shape[1:]),
            jnp.zeros((b,) + mean_latents.decoder.shape[1:]),
        ]
    # Adam(first_inv_lr) stepped down by StepLR(step_size=100, gamma=0.75)
    # (projectors.py:186-192)
    schedule = optax.exponential_decay(lr, transition_steps=100, decay_rate=0.75, staircase=True)
    tx = optax.adam(schedule)
    opt_state = tx.init(offsets)

    from e3dge_tpu.models.e3dge import adaptive_avg_pool, upsample_nearest

    res = min(model.cfg.decoder.size, images.shape[-1], 256)
    target = adaptive_avg_pool(images, res)

    def expand(off, rows):
        if wspace:
            off = jnp.repeat(off[:, None], rows, axis=1)
        return off

    def loss_fn(offsets, noise_scale, k):
        k1, k2 = jax.random.split(k)
        # noise on BOTH nets' codes (projectors.py:107-116)
        latents = [
            mean_latents.renderer
            + expand(offsets[0] + noise_scale * jax.random.normal(k1, offsets[0].shape), n_rows[0]),
            mean_latents.decoder
            + expand(offsets[1] + noise_scale * jax.random.normal(k2, offsets[1].shape), n_rows[1]),
        ]
        out = model.apply(
            variables, latents, camera, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)}
        )
        pred = adaptive_avg_pool(out["gen_imgs"], res)
        thumb = out["gen_thumb_imgs"]
        thumb = upsample_nearest(thumb, res) if thumb.shape[-1] < res else adaptive_avg_pool(thumb, res)

        def rec(p):
            loss = l2_lambda * L.mse(p, target)
            if lpips_fn is not None:
                loss = loss + lpips_lambda * lpips_fn(p, target)
            return loss

        # thumb supervision at 0.1x — "no loss on thumb leads to shape collapse"
        # (projectors.py:216-222)
        return rec(pred) + thumb_lambda * rec(thumb)

    @jax.jit
    def step_fn(carry, t):
        offsets, opt_state, k = carry
        k, ksub = jax.random.split(k)
        ns = _latent_noise_scale(t, steps)
        loss, grads = jax.value_and_grad(loss_fn)(offsets, ns, ksub)
        updates, opt_state = tx.update(grads, opt_state, offsets)
        offsets = optax.apply_updates(offsets, updates)
        return (offsets, opt_state, k), loss

    carry = (offsets, opt_state, key)
    losses = []
    for t in range(steps):
        carry, loss = step_fn(carry, jnp.asarray(t, jnp.float32))
        losses.append(loss)
    offsets = carry[0]
    latents = [
        mean_latents.renderer + expand(offsets[0], n_rows[0]),
        mean_latents.decoder + expand(offsets[1], n_rows[1]),
    ]
    return latents, jnp.stack(losses)


def pti(
    model: E3DGE,
    variables: dict,
    latents,
    images: jnp.ndarray,
    camera: CameraParams,
    steps: int = 100,
    lr: float = 5e-5,
    lpips_fn: Callable | None = None,
):
    """Pivotal tuning: fine-tune the GENERATOR params around the inverted latents
    (projectors.py PTI branch). Returns updated variables."""
    from e3dge_tpu.models.e3dge import adaptive_avg_pool

    params = variables["params"]
    gen_params = params["generator"]
    rest = {k: v for k, v in params.items() if k != "generator"}
    extra = {k: v for k, v in variables.items() if k != "params"}
    res = min(model.cfg.decoder.size, images.shape[-1])
    target = adaptive_avg_pool(images, res)

    tx = optax.adam(lr)
    opt_state = tx.init(gen_params)

    def loss_fn(gp):
        v = {"params": {**rest, "generator": gp}, **extra}
        out = model.apply(v, latents, camera, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)})
        pred = adaptive_avg_pool(out["gen_imgs"], res)
        loss = L.mse(pred, target)
        if lpips_fn is not None:
            loss = loss + lpips_fn(pred, target)
        return loss

    @jax.jit
    def step_fn(gp, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(gp)
        updates, opt_state = tx.update(grads, opt_state, gp)
        return optax.apply_updates(gp, updates), opt_state, loss

    for _ in range(steps):
        gen_params, opt_state, loss = step_fn(gen_params, opt_state)

    return {"params": {**rest, "generator": gen_params}, **extra}, loss
