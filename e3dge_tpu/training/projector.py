"""Optimization-based inversion + PTI generator fine-tuning.

Mirrors the reference `Projectors` (`project/trainers/Inversions/projectors.py:29-734`):
W/W+ offset optimization against the mean latent with SG2-style decaying latent
noise (:86-127), L2 + LPIPS objective, then optional PTI — fine-tune the generator
around the inverted code (:--PTI, pti_learning_rate 5e-5, max_pti_steps 100).

Both loops are jit-compiled `lax`-style python loops over a fixed step count.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.render.camera import CameraParams
from e3dge_tpu.training import losses as L


def _latent_noise_scale(step, total_steps, initial=0.05, ramp=0.75):
    """StyleGAN2 projector noise schedule: initial * max(0, 1 - t/ramp)^2."""
    t = step / total_steps
    return initial * jnp.maximum(0.0, 1.0 - t / ramp) ** 2


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
):
    """Optimize W+ offsets for a batch of images. Returns (latents, losses)."""
    b = images.shape[0]
    offsets = [
        jnp.zeros((b,) + mean_latents.renderer.shape[1:]),
        jnp.zeros((b,) + mean_latents.decoder.shape[1:]),
    ]
    tx = optax.adam(lr)
    opt_state = tx.init(offsets)

    from e3dge_tpu.models.e3dge import adaptive_avg_pool

    res = min(model.cfg.decoder.size, images.shape[-1])
    target = adaptive_avg_pool(images, res)

    def loss_fn(offsets, noise_scale, k):
        latents = [
            mean_latents.renderer + offsets[0] + noise_scale * jax.random.normal(k, offsets[0].shape),
            mean_latents.decoder + offsets[1],
        ]
        out = model.apply(
            variables, latents, camera, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)}
        )
        pred = adaptive_avg_pool(out["gen_imgs"], res)
        loss = l2_lambda * L.mse(pred, target)
        if lpips_fn is not None:
            loss = loss + lpips_lambda * lpips_fn(pred, target)
        return loss

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
    latents = [mean_latents.renderer + offsets[0], mean_latents.decoder + offsets[1]]
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
