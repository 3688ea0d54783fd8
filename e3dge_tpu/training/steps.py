"""Training steps for the 3-stage E3DGE recipe.

Mirrors the reference runners (SURVEY.md §2/§3):
  stage 1   — AERunner.synthetic_forward (trainer.py:654-736): E0 on frozen-GAN
              samples with 2D rec + latent-gt + 3D shape supervision.
  stage 2   — E3DGE_2DAlignOnly/Full cycle training
              (e3dge_2dalignonly_runner.py:354-465): id-paired synthetic views,
              odd/even view swap, cross-view reconstruction through the E1 branch,
              aligned-residual L1.
  D step    — _train_discriminator_step (trainer.py:1100-1195): logistic loss + R1 +
              viewpoint regression on the volume D.

All steps are pure (state, batch, rng) -> (state, metrics) functions. Freezing is
expressed by partitioning the param tree: gradients are only taken w.r.t. the
trainable subtree (the frozen generator still backprops *through*, exactly like
torch's requires_grad_(False) plumbing in trainer.py:1568-1680, but no grads are
materialized for it).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans, adaptive_avg_pool
from e3dge_tpu.training import losses as L

STAGE1_TRAINABLE = ("encoder",)
STAGE21_TRAINABLE = ("local", "grid_align")
STAGE22_TRAINABLE = ("local", "grid_align", "fuse_sft_block")


def stage22_trainable(fix_ada: bool = False) -> tuple[str, ...]:
    """Stage-2.2 trainable set; `--fix_ada` freezes the ADA aligner
    (reference e3dge_2dalignonly_runner.py:591, stage2.2.sh sets --fix_ada)."""
    if fix_ada:
        return tuple(k for k in STAGE22_TRAINABLE if k != "grid_align")
    return STAGE22_TRAINABLE


def pose_curriculum(
    steps: Sequence[int] = (0, 10000, 14000, 18000, 22000, 26000),
    lambdas: Sequence[float] = (0.0, 0.15, 0.25, 0.5, 0.75, 1.0),
    fixed_tail: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Progressive pose-range curriculum (reference get_curriculum_pose_lambda,
    utils/data_util.py:193-210; defaults from options.py --progressive_pose_lambda/
    _steps). Returns a jit-compatible piecewise-constant schedule step -> scale.

    Reference quirk, matched by default: the reference's interval loop has an
    off-by-one (`progressive_interval != len(steps)` is always true, so the
    decrement always fires — data_util.py:205-208), making the LAST lambda
    unreachable: for step >= steps[-1] it returns lambdas[-2] (0.75) forever,
    despite options.py:1282's "after the last steps the lambda should be 1".
    The released stage-2 recipes train under this cap
    (stage2.1.sh --progressive_pose_sampling). `fixed_tail=True` restores the
    documented intent (reach lambdas[-1]); golden-pinned against the
    reference's own method in tests/test_golden_oracle.py."""
    edges = jnp.asarray(steps[1:], jnp.int32)
    vals = jnp.asarray(lambdas, jnp.float32)
    max_idx = len(lambdas) - 1 if fixed_tail else len(lambdas) - 2

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.searchsorted(edges, jnp.asarray(step, jnp.int32), side="right")
        return vals[jnp.minimum(idx, max_idx)]

    return schedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any            # trainable subtree
    frozen: Any            # frozen subtree (generator, ...)
    extra: Any             # non-param collections (batch_stats)
    opt_state: Any
    ema: Any = None        # EMA of the trainable subtree (reference accumulate)


def split_params(params: dict, trainable_keys: Sequence[str]):
    trainable = {k: v for k, v in params.items() if k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    return trainable, frozen


def grad_centralization() -> optax.GradientTransformation:
    """Gradient centralization (reference utils/ranger.py GC): subtract the per-
    output-channel mean from conv/linear weight grads (ndim > 1)."""

    def update(updates, state, params=None):
        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


class RefRadamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_ref_radam(
    b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5, threshold: float = 5.0
) -> optax.GradientTransformation:
    """RAdam with the reference Ranger's EXACT step math (utils/ranger.py:140-180).

    Differs from `optax.scale_by_radam` in two ways that matter for trajectory
    parity with the reference encoder optimizer (trainer.py:1707 uses Ranger
    defaults): (1) defaults betas=(0.95, 0.999), eps=1e-5 (ranger.py:38-39);
    (2) eps is added to the UNCORRECTED sqrt(second moment) — the bias
    correction sqrt(1-b2^t) lives in the scalar step size — so
    update = rect/(1-b1^t) * m / (sqrt(v) + eps), while optax adds eps to the
    bias-corrected sqrt(v/(1-b2^t)). Below the N_sma threshold the fallback is
    bias-corrected momentum SGD: update = m / (1-b1^t) (ranger.py:176-180)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RefRadamState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    n_sma_max = 2.0 / (1.0 - b2) - 1.0

    def update(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates)
        t = count.astype(jnp.float32)
        beta2_t = jnp.power(b2, t)
        beta1_t = jnp.power(b1, t)
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t)
            * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma
            * n_sma_max / (n_sma_max - 2.0)
        ) / (1.0 - beta1_t)
        fallback = 1.0 / (1.0 - beta1_t)
        use_rect = n_sma > threshold

        def leaf(m, v):
            rectified = rect * m / (jnp.sqrt(v) + eps)
            return jnp.where(use_rect, rectified, fallback * m)

        new_updates = jax.tree.map(leaf, mu, nu)
        return new_updates, RefRadamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    slow: Any
    count: jnp.ndarray


def lookahead(sync_period: int = 6, slow_step: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (reference utils/ranger.py alpha=0.5, k=6): keeps slow
    params in the optimizer state; every `sync_period` steps the effective update
    pulls the fast params toward the slow EMA and syncs the slow copy."""

    def init(params):
        return LookaheadState(
            slow=jax.tree.map(jnp.asarray, params), count=jnp.zeros([], jnp.int32)
        )

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % sync_period == 0).astype(jnp.float32)

        def leaf_update(u, s, p):
            fast = p + u
            slow_new = s + slow_step * (fast - s)
            return sync * (slow_new - p) + (1.0 - sync) * u

        def leaf_slow(u, s, p):
            fast = p + u
            slow_new = s + slow_step * (fast - s)
            return sync * slow_new + (1.0 - sync) * s

        new_updates = jax.tree.map(leaf_update, updates, state.slow, params)
        new_slow = jax.tree.map(leaf_slow, updates, state.slow, params)
        return new_updates, LookaheadState(slow=new_slow, count=count)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float = 1e-4, name: str = "adam") -> optax.GradientTransformation:
    """Adam (reference default betas (0.9, 0.999)) or Ranger
    (RAdam + gradient centralization + Lookahead, reference utils/ranger.py)."""
    if name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999)
    if name == "ranger":
        # reference-exact chain (utils/ranger.py defaults: betas (0.95, 0.999),
        # eps 1e-5, GC on ndim>1, lookahead alpha=0.5 k=6) — trajectory-golden
        # against the reference's own Ranger in tests/test_golden_oracle.py
        return optax.chain(
            grad_centralization(), scale_by_ref_radam(), optax.scale(-lr), lookahead()
        )
    raise ValueError(name)


def create_train_state(
    variables: dict,
    trainable_keys: Sequence[str],
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    trainable, frozen = split_params(params, trainable_keys)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=trainable,
        frozen=frozen,
        extra=extra,
        opt_state=tx.init(trainable),
        ema=jax.tree.map(jnp.copy, trainable) if ema else None,
    )


def _variables(state: TrainState) -> dict:
    return {"params": {**state.frozen, **state.params}, **state.extra}


def _swap_odd_even(x):
    """Swap entries 0<->1, 2<->3, ... along axis 0 (reference
    _swap_odd_even_index_view, training_utils.py:98-119)."""
    n = x.shape[0]
    idx = jnp.arange(n) + jnp.where(jnp.arange(n) % 2 == 0, 1, -1)
    return jnp.take(x, idx, axis=0)


def swap_tree(tree):
    return jax.tree.map(_swap_odd_even, tree)


def _get_path(tree: dict, path: Sequence[str]):
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree: dict, path: Sequence[str], value):
    """Functionally replace the subtree at `path` in a nested dict."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


# --------------------------------------------------------------------- stage 1


def make_stage1_step(
    model: E3DGE,
    lambdas: dict[str, float],
    tx: optax.GradientTransformation,
    lpips_fn: Callable | None = None,
    id_fn: Callable | None = None,
    pose_scale_schedule: Callable[[jnp.ndarray], jnp.ndarray] = lambda step: jnp.asarray(1.0),
):
    """Stage-1: train E0 against the frozen GAN with pixel + latent + 3D shape sup."""
    batch_size = None  # static per trace

    def loss_fn(trainable, state: TrainState, mean_latents: LatentMeans, rng: jax.Array, bs: int):
        variables = {"params": {**state.frozen, **trainable}, **state.extra}
        k_data, k_noise = jax.random.split(rng)

        batch = model.apply(
            variables,
            k_data,
            bs,
            pose_scale_schedule(state.step),
            method=E3DGE.synthetic_sample,
            rngs={"noise": k_noise},
        )

        out, mutated = model.apply(
            variables,
            batch["images"],
            mean_latents,
            batch["cam_settings"],
            True,  # train (BN batch stats update, synced across 'dp' when present)
            method=E3DGE.image2image_global,
            rngs={"noise": k_noise},
            mutable=["batch_stats"],
        )

        res = min(out["gen_imgs"].shape[-1], 256)
        loss_2d, m2d = L.calc_2d_rec_loss(
            adaptive_avg_pool(out["gen_imgs"], res),
            adaptive_avg_pool(batch["images"], res),
            lambdas,
            lpips_fn=lpips_fn,
            id_fn=id_fn,
        )
        thumb_loss, _ = L.calc_2d_rec_loss(
            out["gen_thumb_imgs"], batch["thumb_images"], {"l2_lambda": lambdas.get("l2_lambda", 1.0)}
        )
        loss = loss_2d + thumb_loss

        # latent-gt: pred renderer W+ rows vs the true sampled w (trainer.py:710-726)
        if lambdas.get("latent_gt_lambda", 0.0) > 0:
            w_gt = batch["latent_gt"][:, None]  # [B, 1, D] broadcasts over rows
            latent_loss = L.mse(out["pred_latents"][0], jnp.broadcast_to(w_gt, out["pred_latents"][0].shape))
            loss = loss + lambdas["latent_gt_lambda"] * latent_loss
            m2d["latent_gt"] = latent_loss

        # 3D shape supervision: re-query the frozen field with PRED latents at the
        # GT sample points (trainer.py:1050-1098)
        pred_w = out["pred_latents"][0]

        def sdf_at(pts):
            return model.apply(variables, pts, pred_w, method=E3DGE.query_sdf)

        pred_shape = {
            "uniform_points_sdf": sdf_at(batch["uniform_pts"]) * batch["uniform_valid"],
            "surface_sdf": sdf_at(batch["xyz"]) * batch["mask"][..., 0, :],
        }
        gt_shape = {"uniform_points_sdf": batch["uniform_sdf"] * batch["uniform_valid"]}
        if lambdas.get("shape_normal_lambda", 0.0) > 0 or lambdas.get("eikonal_lambda", 0.0) > 0:
            grad_fn = jax.grad(lambda p: sdf_at(p).sum())
            pred_eik = grad_fn(batch["near_pts"])
            gt_eik = jax.lax.stop_gradient(
                jax.grad(lambda p: model.apply(variables, p, batch["latent_gt"], method=E3DGE.query_sdf).sum())(
                    batch["near_pts"]
                )
            )
            pred_shape["surface_eikonal_term"] = pred_eik * batch["near_valid"]
            pred_shape["eikonal_term"] = pred_eik
            gt_shape["surface_eikonal_term"] = gt_eik * batch["near_valid"]
        loss_shape, mshape = L.calc_shape_rec_loss(pred_shape, gt_shape, lambdas)
        loss = loss + loss_shape

        metrics = {**m2d, **mshape, "loss": loss, "thumb_rec": thumb_loss}
        return loss, (metrics, mutated)

    def train_step(state: TrainState, mean_latents: LatentMeans, rng: jax.Array, bs: int):
        (_, (metrics, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, mean_latents, rng, bs
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = {**state.extra, **mutated}
        new_state = state._replace(step=state.step + 1, params=params, extra=extra, opt_state=opt_state)
        return new_state, metrics

    return train_step


# --------------------------------------------------------------------- stage 2


def make_cycle_step(
    model: E3DGE,
    lambdas: dict[str, float],
    tx: optax.GradientTransformation,
    lpips_fn: Callable | None = None,
    id_fn: Callable | None = None,
    constrain_fn: Callable | None = None,
    pose_scale_schedule: Callable[[jnp.ndarray], jnp.ndarray] = lambda step: jnp.asarray(1.0),
    use_ref_view_weight: bool = False,
    d_apply: Callable | None = None,
    ema_decay: float = 0.5 ** (32 / 10_000),
    adaptive_d_loss: bool = False,
    adaptive_probe_path: Sequence[str] = ("local",),
    disc_weight_max: float = 1.0,
):
    """Stage-2 cycle training: id-paired views, odd/even swap, cross-view
    reconstruction through the E1 local branch (e3dge_2dalignonly_runner.py:354-465).

    constrain_fn(name, x) -> x optionally applies sharding constraints (e.g. ray-axis
    'sp' sharding) to the main intermediates under a device mesh.

    Stage-2.2 behavioral switches (reference scripts/train/ffhq/stage2.2.sh +
    trainer.py:1233-1268):
      * adv_lambda > 0 with `d_apply(d_params, imgs_256) -> logits` adds the
        non-saturating G loss on the reconstruction (the returned step then takes
        d_params as its 5th argument);
      * use_ref_view_weight enables the occlusion re-integration weighting of the
        3D-projected features (cycle_runner.py:133-161);
      * hit_prob_consistency_lambda / depth_lambda wire the ConsistencyLoss /
        DepthLoss terms (losses/geometry_loss.py — defined in the reference,
        exposed behind options.py:1342-1349 flags) between the local-conditioned
        render and the detached global render at the same view;
      * pose_scale_schedule is the progressive pose curriculum (see
        pose_curriculum());
      * when TrainState.ema is set, the trainable subtree is EMA-accumulated
        (reference utils/training_utils.py:40);
      * adaptive_d_loss scales the adversarial term by the VQGAN adaptive weight
        |grad(recon)| / |grad(adv)| measured at `adaptive_probe_path` in the
        trainable tree (reference trainer.py:1249-1262 probes the netLocal
        hourglass last conv; one extra forward + two narrow vjp pulls per step).
    """
    cst = constrain_fn or (lambda name, x: x)

    def loss_fn(
        trainable,
        state: TrainState,
        mean_latents: LatentMeans,
        rng: jax.Array,
        bs: int,
        d_params,
        d_weight=1.0,
    ):
        variables = {"params": {**state.frozen, **trainable}, **state.extra}
        k_data, k_noise = jax.random.split(rng)

        batch = model.apply(
            variables,
            k_data,
            bs,
            pose_scale_schedule(state.step),
            True,
            method=E3DGE.synthetic_sample,
            rngs={"noise": k_noise},
        )
        batch["images"] = cst("images", batch["images"])
        batch["thumb_images"] = cst("thumb_images", batch["thumb_images"])

        # train=True throughout (the reference keeps every `network` module in
        # train() mode during training, base_runner.py:196-199, only the frozen
        # generator is eval'd): BN uses batch stats, and the decoder takes its
        # training path (s2d_min_res threshold + reshape d2s — the faster
        # backward form; the eval-only d2s_mxu/s2d_min_res_eval branch is for
        # serving). batch_stats updates thread sequentially ref -> que.
        ref_info, mut1 = model.apply(
            variables,
            batch["images"],
            mean_latents,
            batch["cam_settings"],
            train=True,
            method=E3DGE.encode_ref_images,
            rngs={"noise": k_noise},
            mutable=["batch_stats"],
        )

        # swap odd/even: view B becomes the query view for identity A
        que_cam = swap_tree(batch["cam_settings"])
        que_images = swap_tree(batch["images"])
        que_out, mut2 = model.apply(
            {"params": variables["params"], **state.extra, **mut1},
            ref_info,
            que_cam,
            method=E3DGE.que_render_given_ref,
            train=True,
            use_ref_view_weight=use_ref_view_weight,
            rngs={"noise": k_noise},
            mutable=["batch_stats"],
        )
        mutated = {**mut1, **mut2}
        rec = que_out["res_render_out"]
        rec["gen_imgs"] = cst("gen_imgs", rec["gen_imgs"])
        rec["gen_thumb_imgs"] = cst("gen_thumb_imgs", rec["gen_thumb_imgs"])

        res = min(rec["gen_imgs"].shape[-1], 256)
        rec_256 = adaptive_avg_pool(rec["gen_imgs"], res)
        loss_2d, m2d = L.calc_2d_rec_loss(
            rec_256,
            adaptive_avg_pool(que_images, res),
            lambdas,
            lpips_fn=lpips_fn,
            id_fn=id_fn,
        )
        loss = loss_2d

        # adversarial term on the reconstruction (trainer.py:1233-1268; stage2.2.sh
        # sets adv_lambda 0.01 with the full-res D via --enable_G1)
        if d_apply is not None and lambdas.get("adv_lambda", 0.0) > 0:
            fake_pred = d_apply(d_params, rec_256)
            adv = L.g_nonsaturating_loss(fake_pred)
            loss = loss + lambdas["adv_lambda"] * d_weight * adv
            m2d["loss_e_adv"] = adv

        if lambdas.get("supervise_both_gen_imgs", 1.0) > 0:
            thumb_loss, _ = L.calc_2d_rec_loss(
                rec["gen_thumb_imgs"],
                swap_tree(batch["thumb_images"]),
                {"l2_lambda": lambdas.get("l2_lambda", 1.0)},
            )
            loss = loss + thumb_loss
            m2d["thumb_rec"] = thumb_loss

        # aligned residual should match the QUERY view's ground-truth residual
        # (e3dge_2dalignonly_runner.py:427-432)
        if lambdas.get("res_lambda", 0.0) > 0:
            que_res_gt = swap_tree(ref_info["orig_res_gt"])
            res_loss = L.l1(que_out["aligned_res"], que_res_gt)
            loss = loss + lambdas["res_lambda"] * res_loss
            m2d["res_loss"] = res_loss

        # hit-prob / depth consistency between the local-conditioned render and the
        # (detached) global render at the same query view
        if lambdas.get("hit_prob_consistency_lambda", 0.0) > 0:
            hp_loss = L.hit_prob_consistency_loss(
                rec["hit_prob"], que_out["que_info"]["hit_prob"]
            )
            loss = loss + lambdas["hit_prob_consistency_lambda"] * hp_loss
            m2d["hit_prob_consistency"] = hp_loss
        if lambdas.get("depth_lambda", 0.0) > 0:
            d_loss = L.depth_consistency_loss(rec["depth"], que_out["que_info"]["depth"])
            loss = loss + lambdas["depth_lambda"] * d_loss
            m2d["depth_consistency"] = d_loss

        m2d["loss"] = loss
        return loss, (m2d, mutated)

    def train_step(
        state: TrainState, mean_latents: LatentMeans, rng: jax.Array, bs: int, d_params=None
    ):
        d_weight = jnp.asarray(1.0)
        if adaptive_d_loss and d_apply is not None and lambdas.get("adv_lambda", 0.0) > 0:
            # VQGAN adaptive weight: grads of (recon, adv) w.r.t. the probe subtree
            # only — one forward (jax.vjp) + two cotangent pulls, mirroring the
            # reference's two retain_graph autograd.grad calls (trainer.py:1258).
            probe_leaf = _get_path(state.params, adaptive_probe_path)

            def probe(leaf):
                t2 = _set_path(state.params, adaptive_probe_path, leaf)
                _, (m, _mut) = loss_fn(t2, state, mean_latents, rng, bs, d_params, 1.0)
                return m["loss_2d"], m["loss_e_adv"]

            _, vjp_fn = jax.vjp(probe, probe_leaf)
            (g_recon,) = vjp_fn((jnp.asarray(1.0), jnp.asarray(0.0)))
            (g_adv,) = vjp_fn((jnp.asarray(0.0), jnp.asarray(1.0)))
            d_weight = L.calculate_adaptive_weight(g_recon, g_adv, disc_weight_max)

        (_, (metrics, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, mean_latents, rng, bs, d_params, d_weight
        )
        if adaptive_d_loss and d_apply is not None and lambdas.get("adv_lambda", 0.0) > 0:
            metrics["d_weight"] = d_weight
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            from e3dge_tpu.training.train_utils import ema_update

            ema = ema_update(ema, params, ema_decay)
        extra = {**state.extra, **mutated}
        new_state = state._replace(
            step=state.step + 1, params=params, extra=extra, opt_state=opt_state, ema=ema
        )
        return new_state, metrics

    return train_step


# -------------------------------------------------- netLocal 3D pretraining


def netlocal_pretrain_loss(
    pred_surface_sdf: jnp.ndarray,
    pred_uniform_sdf: jnp.ndarray,
    gt_uniform_sdf: jnp.ndarray,
    eikonal: jnp.ndarray | None = None,
    lambdas: dict[str, float] | None = None,
):
    """Stage-1 netLocal 3D-supervised pretraining objective (reference
    HGPIFuGANNet.get_error, HGPIFuGANNet.py:217-309): surface SDF -> 0, uniform-
    point SDF regression, optional eikonal."""
    lambdas = lambdas or {}
    loss = L.l1(pred_surface_sdf, jnp.zeros_like(pred_surface_sdf)) * lambdas.get("surf_sdf_lambda", 1.0)
    loss = loss + L.smooth_l1(pred_uniform_sdf, gt_uniform_sdf) * lambdas.get("uniform_pts_sdf_lambda", 1.0)
    if eikonal is not None and lambdas.get("eikonal_lambda", 0.0) > 0:
        eik, _ = L.eikonal_loss(eikonal)
        loss = loss + lambdas["eikonal_lambda"] * eik
    return loss


# ---------------------------------------------------------------------- D step


def make_volume_d_step(model: E3DGE, lambdas: dict[str, float], tx: optax.GradientTransformation):
    """Volume-D adversarial step with viewpoint regression + R1 (reference
    _train_discriminator_step, non-enable_G1 branch, trainer.py:1165-1186):
    d_gan * discriminator_lambda + r1*0.5*grad_penalty + view_lambda * viewpoint.

    The viewpoint loss supervises the D's pose head on the FAKE thumbs, whose
    ground-truth (azim, elev) are known from the synthetic sampling cameras —
    this is how the head becomes the inference-time pose estimator."""

    def d_apply(variables, imgs):
        gan, _ = model.apply(variables, imgs, method=lambda m, x: m.volume_discriminator(x))
        return gan

    def loss_fn(trainable, state: TrainState, real_thumbs, fake_thumbs, fake_viewpoints):
        variables = {"params": {**state.frozen, **trainable}, **state.extra}
        real_pred, _ = model.apply(variables, real_thumbs, method=lambda m, x: m.volume_discriminator(x))
        fake_pred, fake_vp = model.apply(variables, fake_thumbs, method=lambda m, x: m.volume_discriminator(x))
        d_gan = L.d_logistic_loss(real_pred, fake_pred)
        loss = d_gan * lambdas.get("discriminator_lambda", 1.0)
        vp_loss = L.viewpoint_loss(fake_vp, fake_viewpoints)
        loss = loss + lambdas.get("viewpoint_lambda", 1.0) * vp_loss
        metrics = {
            "d": d_gan,
            "viewpoint": vp_loss,
            "real_score": jnp.mean(real_pred),
            "fake_score": jnp.mean(fake_pred),
        }
        if lambdas.get("r1", 0.0) > 0:
            r1 = L.d_r1_penalty(d_apply, variables, real_thumbs)
            loss = loss + lambdas["r1"] / 2.0 * r1
            metrics["r1"] = r1
        metrics["d_loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, real_thumbs, fake_thumbs, fake_viewpoints):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, real_thumbs, fake_thumbs, fake_viewpoints
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


class DState(NamedTuple):
    """Optimizer state for a standalone discriminator (the reference keeps the
    full-res D as its own network + optimizer, trainer.py:1700-1728)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_d_state(params: Any, tx: optax.GradientTransformation) -> DState:
    return DState(step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params))


def make_full_d_step(
    d_model,
    lambdas: dict[str, float],
    tx: optax.GradientTransformation,
    d_reg_every: int = 16,
):
    """Full-resolution D adversarial step on reconstructions vs real images with
    lazy R1 (reference _train_discriminator_step enable_G1 branch,
    trainer.py:1119-1165: d_gan_loss * discriminator_lambda + r1 * 0.5 * grad_penalty
    * d_reg_every, regularized every `d_reg_every` iters).

    d_model: the flax Discriminator module (models/discriminator.py). Both image
    batches are NCHW in [-1, 1] at the D's input_size; fakes are detached upstream.
    """

    def d_apply(params, imgs):
        return d_model.apply({"params": params}, imgs)

    def gan_loss_fn(params, real_imgs, fake_imgs):
        real_pred = d_apply(params, real_imgs)
        fake_pred = d_apply(params, jax.lax.stop_gradient(fake_imgs))
        d_gan = L.d_logistic_loss(real_pred, fake_pred)
        loss = d_gan * lambdas.get("discriminator_lambda", 1.0)
        metrics = {
            "d": d_gan,
            "real_score": jnp.mean(real_pred),
            "fake_score": jnp.mean(fake_pred),
        }
        return loss, metrics

    def r1_fn(params, real_imgs):
        return L.d_r1_penalty(lambda v, x: d_apply(v["params"], x), {"params": params}, real_imgs)

    def train_step(state: DState, real_imgs, fake_imgs):
        (_, metrics), grads = jax.value_and_grad(gan_loss_fn, has_aux=True)(
            state.params, real_imgs, fake_imgs
        )
        r1 = lambdas.get("r1", 0.0)
        if r1 > 0:
            # lazy R1: full penalty grads only every d_reg_every steps (lax.cond
            # executes one branch; the reference amortizes by scaling by d_reg_every)
            def with_r1(p):
                val, g = jax.value_and_grad(lambda q: r1_fn(q, real_imgs))(p)
                g = jax.tree.map(lambda x: x * (r1 * 0.5 * d_reg_every), g)
                return g, val

            def without_r1(p):
                return jax.tree.map(jnp.zeros_like, p), jnp.asarray(0.0)

            r1_grads, r1_val = jax.lax.cond(
                state.step % d_reg_every == 0, with_r1, without_r1, state.params
            )
            grads = jax.tree.map(jnp.add, grads, r1_grads)
            metrics["r1"] = r1_val
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step, d_apply
