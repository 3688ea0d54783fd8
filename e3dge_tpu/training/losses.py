"""Losses & metrics (L5) — 2D reconstruction, 3D shape supervision, GAN losses.

Mirrors the reference `project/losses/` package:
  calc_2d_rec_loss   — builder.py:130-186 (MSE + LPIPS + ArcFace ID; MAE/PSNR/SSIM
                        metrics)
  calc_shape_rec_loss— builder.py:43-117 (SmoothL1 SDF / surface->0 / normal /
                        eikonal, fg-mask gated by the runner)
  GAN losses         — gan_loss.py:8-86 (softplus logistic, R1, viewpoint smooth-L1,
                        eikonal + minimal-surface regularizers)

LPIPS and ArcFace ID run as JAX networks (training/perceptual.py); PSNR/SSIM are
implemented here (the reference calls kornia).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- primitives


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def smooth_l1(pred, target, beta: float = 1.0):
    """torch F.smooth_l1_loss (criterion3d_rec, builder.py)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def psnr(pred, target, max_val: float = 1.0):
    """kornia.metrics.psnr equivalent; inputs in [0, 1]."""
    m = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(window: int = 11, sigma: float = 1.5):
    x = jnp.arange(window) - window // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _ssim_map(pred, target, max_val: float, window: int, padding: str):
    """SSIM map over NCHW batches: gaussian(sigma=1.5) local stats.

    padding="valid" is the standard scikit/Wang form; padding="same" reflect-pads
    first (kornia filter2d's default border, what the reference metrics see)."""
    k = _gaussian_kernel(window).reshape(window, window, 1, 1)
    c = pred.shape[1]
    k = jnp.tile(k, (1, 1, 1, c))
    if padding == "same":
        p = window // 2
        pad_cfg = ((0, 0), (0, 0), (p, p), (p, p))
        pred = jnp.pad(pred, pad_cfg, mode="reflect")
        target = jnp.pad(target, pad_cfg, mode="reflect")

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=c
        )

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p, mu_t = filt(pred), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    s_p = filt(pred * pred) - mu_p2
    s_t = filt(target * target) - mu_t2
    s_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * s_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (s_p + s_t + c2)
    return num / den


def ssim(pred, target, max_val: float = 1.0, window: int = 11, per_sample: bool = False):
    """Standard mean SSIM (11x1.5 gaussian, valid padding) on [0,1] inputs.
    Reported under *_std keys; the reference-convention metric is ssim_ref."""
    m = _ssim_map(pred, target, max_val, window, "valid")
    if per_sample:
        return jnp.mean(m, axis=(1, 2, 3))
    return jnp.mean(m)


def ssim_ref(pred, target, window: int = 5, per_sample: bool = False):
    """The reference's printed "SSIM": 1 - kornia.losses.ssim_loss(pred, gt, 5)
    evaluated on RAW [-1,1] tensors with kornia's default max_val=1.0
    (builder.py:171,182). kornia's loss is mean((1 - ssim_map)/2) with a
    window-5 sigma-1.5 gaussian and reflect 'same' padding, so the reported
    number is mean((1 + ssim_map)/2) — NOT standard SSIM. This is the
    convention the Table-1 / notebook anchors (e.g. 0.7956) use."""
    m = _ssim_map(pred, target, 1.0, window, "same")
    half = (1.0 + m) / 2.0
    if per_sample:
        return jnp.mean(half, axis=(1, 2, 3))
    return jnp.mean(half)


def mae_ref(pred, target, per_sample: bool = False):
    """The reference's printed "mae": F.l1_loss on RAW [-1,1] tensors
    (builder.py:179) — 2x the [0,1]-range MAE."""
    if per_sample:
        return jnp.mean(jnp.abs(pred - target), axis=(1, 2, 3))
    return l1(pred, target)


# --------------------------------------------------------------- GAN losses


def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real) + softplus(fake) (gan_loss.py)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_penalty(d_apply: Callable, variables, real_imgs: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty: E[||grad_x D(x)||^2] on reals."""

    def score(x):
        return jnp.sum(d_apply(variables, x))

    grad = jax.grad(score)(real_imgs)
    return jnp.sum(grad**2) / real_imgs.shape[0]


def viewpoint_loss(pred_viewpoint, gt_viewpoint):
    """smooth-L1 on (azim, elev) regression (gan_loss.py viewpoint loss)."""
    return smooth_l1(pred_viewpoint, gt_viewpoint)


def eikonal_loss(eikonal_term, sdf=None, beta: float = 100.0):
    """(||grad sdf|| - 1)^2 + minimal-surface exp(-beta*|sdf|) (gan_loss.py:69-80)."""
    eik = jnp.mean((jnp.linalg.norm(eikonal_term, axis=-1) - 1.0) ** 2)
    if sdf is None:
        minimal_surface = jnp.asarray(0.0)
    else:
        minimal_surface = jnp.mean(jnp.exp(-beta * jnp.abs(sdf)))
    return eik, minimal_surface


def hit_prob_consistency_loss(hit_prob_pred, hit_prob_gt):
    """BCE between predicted and (detached) reference hit probabilities
    (reference ConsistencyLoss, losses/geometry_loss.py:21-53, neuRay-style)."""
    p0 = jax.lax.stop_gradient(hit_prob_gt)
    p1 = hit_prob_pred
    bce = -p0 * jnp.log(p1 + 1e-5) - (1.0 - p0) * jnp.log(1.0 - p1 + 1e-5)
    return jnp.mean(jnp.mean(bce, axis=-2))


def depth_consistency_loss(depth_pred, depth_gt, beta: float = 0.05):
    """Smooth-L1 depth consistency (reference DepthLoss, geometry_loss.py:57-80)."""
    return smooth_l1(depth_pred, jax.lax.stop_gradient(depth_gt), beta=beta)


def calculate_adaptive_weight(recon_grads, g_grads, disc_weight_max: float = 1.0):
    """VQGAN-style adaptive discriminator weight (reference gan_loss.py:69-80,
    applied at trainer.py:1249-1262 behind --adaptive_D_loss).

    The caller supplies gradients of the reconstruction loss and the generator-
    adversarial loss w.r.t. the same probe parameters (the reference uses the
    netLocal hourglass last conv weight; jax.vjp replaces torch.autograd.grad).
    Accepts arbitrary pytrees; uses the global L2 norm. Returns
    stop_gradient(clip(|g_rec| / (|g_adv| + 1e-4), 0, max))."""

    def gnorm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))

    w = gnorm(recon_grads) / (gnorm(g_grads) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, disc_weight_max))


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """Zero a loss weight until `threshold` steps (reference gan_loss.py:83-86)."""
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


def path_lengths_from_grads(latent_grads, mean_path_length, decay: float = 0.01):
    """StyleGAN2 path-length regularization (reference gan_loss.py path_regularize).

    The train step computes `latent_grads = d(sum(img * noise/sqrt(HW)))/d(latent)`
    with jax.grad (replacing torch autograd.grad) and passes them here; returns
    (penalty, updated mean path length)."""
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(latent_grads**2, axis=-1), axis=-1) + 1e-12)
    mean_new = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - jax.lax.stop_gradient(mean_new)) ** 2)
    return penalty, jax.lax.stop_gradient(mean_new)


# ------------------------------------------------------- composite criteria


def calc_2d_rec_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    lambdas: dict[str, float],
    lpips_fn: Callable | None = None,
    id_fn: Callable | None = None,
    gt_for_id: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """MSE + LPIPS + ID loss with MAE/PSNR/SSIM metrics (builder.py:130-186).

    Images in [-1, 1]. lpips_fn(pred, gt) -> scalar; id_fn(pred, gt) -> (loss, sim).
    """
    loss_dict = {}
    l2 = mse(pred, gt)
    loss = lambdas.get("l2_lambda", 1.0) * l2
    loss_dict["loss_l2"] = l2

    if lpips_fn is not None and lambdas.get("lpips_lambda", 0.0) > 0:
        lp = lpips_fn(pred, gt)
        loss = loss + lambdas["lpips_lambda"] * lp
        loss_dict["loss_lpips"] = lp

    if id_fn is not None and lambdas.get("id_lambda", 0.0) > 0:
        id_loss, id_sim = id_fn(pred, gt_for_id if gt_for_id is not None else gt)
        loss = loss + lambdas["id_lambda"] * id_loss
        loss_dict["loss_id"] = id_loss
        loss_dict["id_sim"] = id_sim

    # metrics (reported, not optimized). mae/ssim follow the REFERENCE's printed
    # conventions (raw [-1,1] L1; (1+SSIM)/2 window-5, builder.py:171-182) so
    # scores are comparable to the Table-1/notebook anchors; the standard forms
    # are kept under *_std keys.
    pred01 = (pred + 1.0) / 2.0
    gt01 = (gt + 1.0) / 2.0
    loss_dict["mae"] = mae_ref(pred, gt)
    loss_dict["mae_std"] = l1(pred01, gt01)
    loss_dict["psnr"] = psnr(pred01, gt01)
    loss_dict["ssim"] = ssim_ref(pred, gt)
    loss_dict["ssim_std"] = ssim(pred01, gt01)
    loss_dict["loss_2d"] = loss
    return loss, loss_dict


def calc_shape_rec_loss(
    pred_shape: dict[str, Any],
    gt_shape: dict[str, Any],
    lambdas: dict[str, float],
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """3D shape supervision vs frozen-GAN geometry (builder.py:43-117).

    pred/gt dicts carry: uniform_points_sdf (+ valid masks applied upstream),
    surface_sdf (pred only, target 0), surface_eikonal_term, eikonal_term.
    """
    loss_dict = {}
    loss = jnp.asarray(0.0)

    if lambdas.get("shape_uniform_lambda", 0.0) > 0:
        sdf_rec = smooth_l1(
            pred_shape["uniform_points_sdf"].squeeze(), gt_shape["uniform_points_sdf"].squeeze()
        )
        loss_dict["sdf_rec_loss"] = sdf_rec * lambdas["shape_uniform_lambda"]
        loss = loss + loss_dict["sdf_rec_loss"]

    if lambdas.get("shape_surface_lambda", 0.0) > 0 and "surface_sdf" in pred_shape:
        surf = smooth_l1(pred_shape["surface_sdf"], jnp.zeros_like(pred_shape["surface_sdf"]))
        loss_dict["surf_rec_loss"] = surf * lambdas["shape_surface_lambda"]
        loss = loss + loss_dict["surf_rec_loss"]

    if lambdas.get("shape_normal_lambda", 0.0) > 0 and "surface_eikonal_term" in pred_shape:
        norm_rec = smooth_l1(
            pred_shape["surface_eikonal_term"].squeeze(), gt_shape["surface_eikonal_term"].squeeze()
        )
        loss_dict["surface_norm_rec_loss"] = norm_rec * lambdas["shape_normal_lambda"]
        loss = loss + loss_dict["surface_norm_rec_loss"]

    if lambdas.get("eikonal_lambda", 0.0) > 0 and "eikonal_term" in pred_shape:
        eik, _ = eikonal_loss(pred_shape["eikonal_term"])
        loss_dict["eikonal_term"] = eik * lambdas["eikonal_lambda"]
        loss = loss + loss_dict["eikonal_term"]

    loss_dict["loss_shape"] = loss
    return loss, loss_dict
