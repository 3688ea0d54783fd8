"""E3DGE — the full inversion pipeline as one flax module.

Composes E0 (FPN encoder) + frozen StyleSDF generator (G0 volume renderer + G1
decoder) + E1 local branch (hourglass filter, pixel-aligned query, ADA aligner, SFT
fusion) + the volume discriminator's viewpoint head as pose estimator.

Method-by-method mirror of the reference runner APIs:
  image2latents       — trainer.py:950-968 + _add_offset2latent (:989-1015)
  image2camsettings   — trainer.py:935-947
  encode_ref_images   — e3dge_full_runner.py:77-183
  que_render_given_ref— e3dge_full_runner.py:185-317
  image2image         — e3dge_2dalignonly_runner.py:303 (encode ref then re-render
                        the same view through the full 2D+3D hybrid fusion path)

Everything is a pure function of (variables, inputs, rng); all methods are reachable
through `module.apply(..., method=...)` and jit/pjit-compatible. Unlike the reference
there is no mutable `im_feat_dict` state — feature maps flow through the dicts.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.align import FuseSftMLP, ResidualAligner
from e3dge_tpu.models.discriminator import VolumeRenderDiscriminator
from e3dge_tpu.models.encoders.fpn import HybridGradualStyleEncoderV2
from e3dge_tpu.models.generator import Generator
from e3dge_tpu.models.pifu.local_net import LocalFeatureNet, points_in_image
from e3dge_tpu.ops import pos_encoding
from e3dge_tpu.render.camera import CameraParams, camera_params_from_angles
from e3dge_tpu.utils.config import E3DGEConfig


class LatentMeans(NamedTuple):
    """W+ mean latents the encoder offsets are added to (train_setup.py:296-308)."""

    renderer: jnp.ndarray  # [1, 9, 256]
    decoder: jnp.ndarray   # [1, 10, 512]


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d for divisible sizes (the only case the pipeline hits).

    Downsampling is two separable averaging matmuls on the MXU rather than the
    reshape-mean form: at 3-channel NCHW the reshape+reduce lowers to a
    pathological minor-dim reduction (r3 train-step xprof: 4.6 ms/step for the
    [4,3,1024,1024] -> 256 pool in image2latents alone). HIGHEST matmul
    precision keeps f32-grade numerics on the f32 image path (the averaging
    matrix is exact; inputs are not bf16-rounded)."""
    b, c, h, w = x.shape
    if h == out:
        return x
    if h > out:
        f = h // out
        P = jnp.asarray(np.kron(np.eye(out), np.full((f, 1), 1.0 / f)), x.dtype)  # [h, out]
        y = jax.lax.dot_general(
            x, P, (((3,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )  # [b, c, h, out] (w contracted)
        y = jax.lax.dot_general(
            y, P, (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )  # [b, c, out_w, out_h]
        return jnp.swapaxes(y, 2, 3)
    f = out // h
    return jnp.repeat(jnp.repeat(x, f, axis=2), f, axis=3)


def upsample_nearest(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest') to (out, out) — used for thumb 64->256
    (e3dge_full_runner.py:114-115 uses torch's default nearest mode)."""
    f = out // x.shape[-1]
    return jnp.repeat(jnp.repeat(x, f, axis=2), f, axis=3)


class E3DGE(nn.Module):
    cfg: E3DGEConfig
    axis_name: str | None = None

    def setup(self):
        c = self.cfg
        self.encoder = HybridGradualStyleEncoderV2(c.encoder, axis_name=self.axis_name, name="encoder")
        self.generator = Generator(c, full_pipeline=c.full_pipeline, name="generator")
        self.volume_discriminator = VolumeRenderDiscriminator(
            init_size=c.renderer.out_im_res, name="volume_discriminator"
        )
        if c.renderer.enable_local_model:
            self.local = LocalFeatureNet(
                c.pifu,
                modulation_width=c.renderer.width,
                local_feats_dim=c.renderer.residual_local_feats_dim,
                variant="bn" if c.pifu.netLocal_type == "HGPIFuNetGANResidual" else "resnetfc",
                axis_name=self.axis_name,
                name="local",
            )
            self.grid_align = ResidualAligner(axis_name=self.axis_name, name="grid_align")
            self.fuse_sft_block = FuseSftMLP(out_ch=c.pifu.hourglass_dim, name="fuse_sft_block")

    @property
    def compute_dtype(self):
        """Conv-stack compute dtype (config `dtype`): activations are cast to this
        at the encoder / hourglass boundaries; the SIREN field, losses, and all
        params stay f32. bfloat16 halves HBM traffic on the conv pyramids."""
        return jnp.dtype(self.cfg.dtype)

    # ------------------------------------------------------------------ latents

    def mean_latent(self, key: jax.Array, n: int = 10000) -> LatentMeans:
        r_mean, d_mean = self.generator.mean_latent(key, n)
        c = self.cfg
        return LatentMeans(
            renderer=jnp.repeat(r_mean[:, None], c.renderer.depth + 1, axis=1),
            decoder=jnp.repeat(d_mean[:, None], c.decoder.n_latent, axis=1),
        )

    def image2latents(self, images: jnp.ndarray, mean_latents: LatentMeans, train: bool = False):
        """E0 forward; offsets + mean latents -> predicted W+ pair."""
        c = self.cfg
        input_imgs = adaptive_avg_pool(images, c.encoder.input_res).astype(self.compute_dtype)
        out = self.encoder(input_imgs, train=train, return_featmap=True)
        off_r, off_d = out["pred_latents"]
        # latents are f32 downstream (they drive the f32 SIREN field)
        pred = [
            mean_latents.renderer + off_r.astype(jnp.float32),
            mean_latents.decoder + off_d.astype(jnp.float32),
        ]
        out["pred_latents"] = pred
        return out

    def image2camsettings(self, images: jnp.ndarray) -> CameraParams:
        """Pose estimation via the volume D viewpoint head.

        Serving runs the D forward in the compute dtype (bf16 under config
        `dtype`); predicted angles return to f32 for the camera matrix math.
        Training D steps call `volume_discriminator` directly with f32 inputs and
        are unaffected (layers follow their input dtype)."""
        c = self.cfg
        thumb = adaptive_avg_pool(images, c.renderer.out_im_res).astype(self.compute_dtype)
        _, locations = self.volume_discriminator(thumb)
        locations = locations.astype(jnp.float32)
        return camera_params_from_angles(
            locations[:, 0], locations[:, 1], c.renderer.out_im_res, c.camera.fov_ang, c.camera.dist_radius
        )

    # ------------------------------------------------------------------ render

    def latent2image(
        self,
        pred_latents,
        camera: CameraParams,
        local_conditions=None,
        renderer_only: bool = False,
        z_vals: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        train: bool = False,
        noise=None,
        return_raw_h: bool = False,
    ) -> dict[str, Any]:
        return self.generator(
            pred_latents,
            camera,
            key=key,
            input_is_latent=True,
            local_conditions=local_conditions,
            renderer_only=renderer_only,
            z_vals=z_vals,
            train=train,
            noise=noise,
            return_raw_h=return_raw_h,
        )

    # ------------------------------------------------------------- E1 hot path

    def encode_ref_images(
        self,
        images: jnp.ndarray,
        mean_latents: LatentMeans,
        camera: CameraParams | None = None,
        train: bool = False,
    ) -> dict[str, Any]:
        """Encode a reference view: latents, pose, global render, residual, and the
        reference-view hourglass feature volume."""
        c = self.cfg
        input_imgs = adaptive_avg_pool(images, c.pifu.load_size)
        encoder_out = self.image2latents(input_imgs, mean_latents, train=train)
        pred_latents = encoder_out["pred_latents"]

        cam = camera if camera is not None else self.image2camsettings(input_imgs)

        # at inference, also keep the SIREN backbone hidden so a same-view E1
        # re-render (image2image) can skip the backbone (render_from_backbone);
        # in training the query view differs, so the cache would be dead weight
        render_out = self.latent2image(
            pred_latents, cam, renderer_only=True, train=train, return_raw_h=not train
        )
        thumb_256 = upsample_nearest(render_out["gen_thumb_imgs"], c.pifu.load_size)
        res_gt = jax.lax.stop_gradient(input_imgs - thumb_256)

        # depth context: [B, H, W, 1, 1] -> [B, 1, 256, 256]
        depth = jnp.transpose(render_out["depth"][..., 0], (0, 3, 1, 2))
        depth_256 = upsample_nearest(depth, c.pifu.load_size)

        dt = self.compute_dtype
        ref_feat = self.local.filter(res_gt.astype(dt), depth_256.astype(dt), train=train)

        return {
            "ref_view_aligned_feat": ref_feat,
            "imgs": input_imgs,
            "cam_settings": cam,
            "orig_res_gt": res_gt,
            "global_render_out": render_out,
            "res_gt": res_gt,
            "encoder_out": encoder_out,
            "pred_latents": pred_latents,
        }

    def que_render_given_ref(
        self,
        ref_info: dict[str, Any],
        que_camera: CameraParams,
        que_info: dict[str, Any] | None = None,
        key: jax.Array | None = None,
        train: bool = False,
        fusion_weight: float = 1.0,
        use_ref_view_weight: bool = False,
        reuse_backbone: bool = False,
        same_view: bool = False,
    ) -> dict[str, Any]:
        """Render a query view conditioned on the reference-view residual features:
        3D-project ref feats + 2D-align query feats + visibility mask + SFT fusion +
        PE -> SIREN tex modulations -> full-pipeline render.

        use_ref_view_weight re-integrates occlusion from the ref view and weights the
        3D-projected features by the hit probability with force-background correction
        (reference cycle_runner.py:133-161; released inference disables it via
        --disable_ref_view_weight).

        same_view declares que_camera == ref camera (image2image serving): the two
        pixel-aligned lookups fuse into one channel-concat gather and the
        visibility query pass is skipped (mask provably all-ones) — bit-exact,
        gather-count win on the TPU serving path."""
        c = self.cfg
        pred_latents = ref_info["pred_latents"]
        ref_calibs = ref_info["cam_settings"].calibs

        # 1. global render at the query view (gives points/depth/thumb)
        if que_info is None:
            que_info = self.latent2image(pred_latents, que_camera, renderer_only=True, key=key, train=train)
        que_pts = que_info["points"]  # [B, H, W, S, 3]
        B, H, W, S, _ = que_pts.shape
        pts_B3N = jnp.transpose(que_pts.reshape(B, -1, 3), (0, 2, 1))

        # 4 (hoisted). ADA 2D alignment at the query view + hourglass filter —
        # computed first so the same-view path can fuse its gather with step 2's
        dt = self.compute_dtype
        que_thumb_256 = upsample_nearest(que_info["gen_thumb_imgs"], c.pifu.load_size)
        aligned_res = self.grid_align(
            jnp.concatenate([ref_info["orig_res_gt"], que_thumb_256], axis=1).astype(dt), train=train
        ).astype(jnp.float32)
        que_depth = jnp.transpose(que_info["depth"][..., 0], (0, 3, 1, 2))
        que_depth_256 = upsample_nearest(que_depth, c.pifu.load_size)
        que_feat = self.local.filter(aligned_res.astype(dt), que_depth_256.astype(dt), train=train)

        # 2. 3D-projected reference features (queried at REF calibs) + 4b. query
        # features at QUE calibs. same_view (image2image serving): que_camera IS
        # the ref camera, so both lookups share identical projection coords ->
        # ONE channel-concat gather (local.query_pair) instead of two row-gather
        # passes. Bit-exact vs the generic path (same indices and lerp weights;
        # pinned by tests/test_pipeline.py).
        if same_view:
            # same_view makes BOTH lookups ray-constant (ref IS the camera that
            # generated the rays — see the non-same-view comment below): one
            # channel-concat gather over the HW sample-0 points, broadcast
            # across S. S-fold less gather work on the serving path.
            pts_ray = jnp.transpose(que_pts[:, :, :, 0, :].reshape(B, -1, 3), (0, 2, 1))
            q = self.local.query_pair(
                ref_info["ref_view_aligned_feat"], que_feat, pts_ray, ref_calibs
            )
            proj = {"in_img": q["in_img"]}  # [B, HW] ray-constant mask
            fa = jnp.transpose(q["feats_a"], (0, 2, 1)).reshape(B, H, W, 1, -1)
            fb = jnp.transpose(q["feats_b"], (0, 2, 1)).reshape(B, H, W, 1, -1)
            feature_3d = jnp.broadcast_to(fa, (B, H, W, S, fa.shape[-1]))
            feature_2d = jnp.broadcast_to(fb, (B, H, W, S, fb.shape[-1]))
        else:
            # ref-side query is genuinely per-point (que points projected into the
            # REF view) — under the bf16 fusion path query_sample_mode="auto"
            # lowers it to the one-hot matmul form (grid_sample_mm): the widest
            # remaining cycle-step band was this gather's scatter-add backward
            proj = self.local.query(ref_info["ref_view_aligned_feat"], pts_B3N, ref_calibs)
            # que-side gather is RAY-CONSTANT: que_pts are o + t*d with o the
            # projection center of que_camera (every caller renders que_info at
            # que_camera), so x/z is independent of t and all S depth samples of
            # a ray hit the ray's own pixel — gather the HW sample-0 points once
            # and broadcast across S. Mathematically identical to the per-point
            # gather (tolerance-pinned, tests/test_pipeline.py); S-fold less
            # gather forward and scatter backward (the cycle step's widest band:
            # ~37 ms/step of the 540 at full scale, r4 xprof).
            pts_ray = jnp.transpose(que_pts[:, :, :, 0, :].reshape(B, -1, 3), (0, 2, 1))
            q2 = self.local.query(que_feat, pts_ray, que_camera.calibs)
            f2 = jnp.transpose(q2["feats"], (0, 2, 1)).reshape(B, H, W, 1, -1)
            feature_2d = jnp.broadcast_to(f2, (B, H, W, S, f2.shape[-1]))
            feature_3d = jnp.transpose(proj["feats"], (0, 2, 1)).reshape(B, H, W, S, -1)

        ref_hit_prob = None
        if use_ref_view_weight:
            renderer = self.generator.renderer
            # the weighting is non-differentiable data in the released recipe (the
            # generator is frozen and E0 is frozen in stage 2, cycle_runner.py:133-161)
            # — stop_gradient lets the occlusion field run the bf16 serving path
            # (occlusion_field_dtype) and skips its backward graph entirely
            sg_pts = jax.lax.stop_gradient(que_pts)
            sg_styles = jax.lax.stop_gradient(ref_info["pred_latents"][0])
            # "texture" mode: trilinear lookup of the ref render's own weight
            # volume (light-field approximation; query_hit_prob_texture) —
            # needs the ref-view render, so it falls back to exact when the
            # caller didn't carry one (e.g. render_multiview's tiled ref_info)
            use_texture = (
                c.renderer.occlusion_mode == "texture"
                and "global_render_out" in ref_info
            )
            if use_texture:
                ref_vol = jax.lax.stop_gradient(
                    ref_info["global_render_out"]["hit_prob"]
                )
                query = lambda p: renderer.query_hit_prob_texture(
                    p, ref_info["cam_settings"], ref_vol
                )
            else:
                query = lambda p: renderer.query_hit_prob(
                    p, ref_info["cam_settings"], sg_styles
                )
            if c.renderer.force_background:
                # re-integrate occlusion for all but the forced-background sample,
                # then put the leftover mass on the last one (cycle_runner.py:139-155)
                hp = query(sg_pts[..., :-1, :])
                last = 1.0 - jnp.sum(hp, axis=-2, keepdims=True)
                ref_hit_prob = jnp.concatenate([hp, last], axis=-2)
            else:
                ref_hit_prob = query(sg_pts)
            in_img = proj["in_img"]
            if in_img.shape[1] == H * W:  # ray-constant mask (same_view)
                in_img_3d = in_img.reshape(B, H, W, 1, 1).astype(feature_3d.dtype)
            else:
                in_img_3d = in_img.reshape(B, H, W, S, 1).astype(feature_3d.dtype)
            ref_hit_prob = ref_hit_prob * in_img_3d
            feature_3d = feature_3d * ref_hit_prob

        # 3. visibility: project query surface xyz into the ref view. same_view:
        # the surface xyz are generated from THIS camera's rays, so each point
        # reprojects exactly to its own pixel center (|ndc| <= 1 - 1/W, strictly
        # in-image) — the mask is identically 1 and the whole xyz query pass
        # (project + H*W-point row gather) is skipped.
        if same_view:
            vis_mask = jnp.ones((B, H, W, S, 1), que_pts.dtype)
        else:
            # bounds test only — skip the wasted [HW, C] feature gather the
            # reference's query does alongside it (points_in_image is
            # bit-identical to query()["in_img"])
            xyz_B3N = jnp.transpose(que_info["xyz"].reshape(B, -1, 3), (0, 2, 1))
            in_img = points_in_image(xyz_B3N, ref_calibs)
            vis_mask = in_img.reshape(B, H, W, 1, 1).astype(que_pts.dtype)
            vis_mask = jnp.repeat(vis_mask, S, axis=-2)

        # 5. SFT fusion of (2D feats + vis mask) into 3D-projected feats, + PE
        fdt = jnp.dtype(c.renderer.field_dtype)
        if fdt != jnp.float32:
            # the whole fusion path feeds the bf16 field — keep the
            # [B,H,W,S,257] tensors in field_dtype (the f32 vis-mask concat
            # otherwise promotes everything back to f32; the fusion MLPs follow
            # their input dtype, align.py). Applies under training too when
            # --field-dtype opts in (the fusion/modulation dots were ~38 ms/step
            # of the r4 cycle step in f32; master params stay f32 — mixed
            # precision by input dtype, models/layers.py design).
            feature_2d = feature_2d.astype(fdt)
            feature_3d = feature_3d.astype(fdt)
            vis_mask = vis_mask.astype(fdt)
        feature_2d = jnp.concatenate([feature_2d, vis_mask], axis=-1)
        fused = self.fuse_sft_block(feature_2d, feature_3d, w=fusion_weight)
        pe = pos_encoding(que_pts, n_freqs=7)
        # tuple = unmaterialized concat: the modulation MLP splits its input
        # matmuls by weight columns (align.ResnetBlockFC), skipping two
        # [B,H,W,S,301] concat materializations
        if fdt != jnp.float32:
            # the modulation MLP also runs in field_dtype
            # (volume_renderer casts its own inputs at the field boundary)
            pe = pe.astype(fdt)
        local_feats = (fused, pe)  # logical [B,H,W,S, 256+45]

        # 6. modulations + final full-pipeline render on the SAME z_vals.
        # reuse_backbone (same-view only, e.g. image2image): the tex-only SFT
        # modulation leaves the SIREN backbone/SDF/weights identical to the pass-1
        # global render, so re-run just the texture head + decoder.
        alpha, beta = self.local.tex_modulations(local_feats)
        if reuse_backbone and "raw_h" in que_info:
            res_render_out = self.generator.render_cached(
                pred_latents, que_info, (alpha, beta)
            )
        else:
            res_render_out = self.latent2image(
                pred_latents,
                que_camera,
                local_conditions=(alpha, beta),
                z_vals=que_info["z_vals"],
                key=key,
                train=train,
            )
        return {
            "res_render_out": res_render_out,
            "aligned_res": aligned_res,
            # [B,H,W,1,1] when the ref lookup was ray-collapsed (same_view),
            # [B,H,W,S,1] for the per-point ref-side gather
            "in_img_mask": proj["in_img"].reshape(B, H, W, -1, 1),
            "que_info": que_info,
            "ref_hit_prob": ref_hit_prob,
        }

    def render_multiview(
        self,
        ref_info: dict[str, Any],
        cameras: CameraParams,
        n_views: int,
        key: jax.Array | None = None,
    ) -> dict[str, Any]:
        """Batched novel-view synthesis: render V views of each of B identities in
        ONE device program (batch axis = B*V). The reference loops views serially
        (trainer.py render_video); batching the view axis keeps the MXU/HBM saturated
        — this is the throughput path for video trajectories.

        cameras holds B*V entries ordered [b0v0, b0v1, ..., b1v0, ...].
        """
        b = ref_info["orig_res_gt"].shape[0]

        def tile(x):
            if x is None or not hasattr(x, "ndim"):
                return x
            return jnp.repeat(x, n_views, axis=0)

        tiled_ref = {
            "ref_view_aligned_feat": tile(ref_info["ref_view_aligned_feat"]),
            "orig_res_gt": tile(ref_info["orig_res_gt"]),
            "pred_latents": [tile(ref_info["pred_latents"][0]), tile(ref_info["pred_latents"][1])],
            "cam_settings": CameraParams(*(tile(f) for f in ref_info["cam_settings"])),
        }
        return self.que_render_given_ref(tiled_ref, cameras, key=key)

    # --------------------------------------------------------------- user APIs

    def image2image(
        self,
        images: jnp.ndarray,
        mean_latents: LatentMeans,
        camera: CameraParams | None = None,
        train: bool = False,
        key: jax.Array | None = None,
    ) -> dict[str, Any]:
        """Invert + reconstruct at the (estimated) input pose through the full
        2D+3D hybrid path — the eval_2dmetrics path."""
        ref_info = self.encode_ref_images(images, mean_latents, camera=camera, train=train)
        out = self.que_render_given_ref(
            ref_info,
            ref_info["cam_settings"],
            que_info=ref_info["global_render_out"],
            key=key,
            train=train,
            reuse_backbone=not train,
            same_view=True,
        )
        out["ref_info"] = ref_info
        return out

    def image2image_global(
        self,
        images: jnp.ndarray,
        mean_latents: LatentMeans,
        camera: CameraParams | None = None,
        train: bool = False,
        key: jax.Array | None = None,
    ) -> dict[str, Any]:
        """Global-only inversion (stage-1 path, no E1): E0 -> G0 -> G1."""
        encoder_out = self.image2latents(images, mean_latents, train=train)
        cam = camera if camera is not None else self.image2camsettings(images)
        render_out = self.latent2image(encoder_out["pred_latents"], cam, key=key, train=train)
        render_out["cam_settings"] = cam
        render_out["pred_latents"] = encoder_out["pred_latents"]
        return render_out

    # ------------------------------------------------- frozen-GAN data sampling

    def query_sdf(self, pts: jnp.ndarray, styles: jnp.ndarray) -> jnp.ndarray:
        """Functional SDF query (for eikonal grads / shape supervision / mesh)."""
        return self.generator.query_sdf(pts, styles)

    def synthetic_sample(
        self,
        key: jax.Array,
        batch_size: int,
        pose_scale: jnp.ndarray | float = 1.0,
        pair_same_id: bool = False,
        renderer_only: bool = False,
    ) -> dict[str, Any]:
        """GAN-as-dataset sampling (reference `DATASETGAN_3D.sample_with_rand_cams`,
        utils/data_util.py:31-260): sample z (id-paired for cycle training), random
        cameras under a progressive pose curriculum (`pose_scale` in [0, 1]), render
        the frozen generator, and collect 3D-supervision samples (near-surface +
        uniform-box SDF queries, volume_renderer.py:945-1003).

        Gradients are stopped — this is data, not a differentiable path.
        """
        c = self.cfg
        kz, ka, ke, kn, ku, kr = jax.random.split(key, 6)
        z = jax.random.normal(kz, (batch_size, c.renderer.style_dim))
        if pair_same_id:
            # make_pair_same_noise (training_utils.py:21-29): odd/even share identity
            z = jnp.repeat(z[::2], 2, axis=0)

        cc = c.camera
        azim = cc.azim_mean + pose_scale * cc.azim_range * jax.random.normal(ka, (batch_size,))
        elev = cc.elev_mean + pose_scale * cc.elev_range * jax.random.normal(ke, (batch_size,))
        cam = camera_params_from_angles(azim, elev, c.renderer.out_im_res, cc.fov_ang, cc.dist_radius)

        render_out = self.generator(
            [z], cam, key=kr, input_is_latent=False, renderer_only=renderer_only,
            field_dtype=c.renderer.sample_field_dtype,
        )
        w = render_out["styles"]  # [B, style_dim] mapped latent (the latent_gt target)

        near_pts, near_sdf, near_valid = self.generator.renderer.sample_near_surface_grid(
            kn, render_out["xyz"], w, stdv=c.renderer.surface_sampling_stdv
        )
        uni_pts, uni_sdf, uni_valid = self.generator.renderer.sample_uniform_grid(
            ku, batch_size, c.renderer.uniform_grid_sampling_num, w
        )

        batch = {
            "images": render_out["gen_imgs"],
            "thumb_images": render_out["gen_thumb_imgs"],
            "cam_settings": cam,
            "latent_gt": w,
            "xyz": render_out["xyz"],
            "depth": render_out["depth"],
            "mask": render_out["mask"],
            "sdf": render_out["sdf"],
            "points": render_out["points"],
            "z_vals": render_out["z_vals"],
            "hit_prob": render_out["hit_prob"],
            "near_pts": near_pts,
            "near_sdf": near_sdf,
            "near_valid": near_valid,
            "uniform_pts": uni_pts,
            "uniform_sdf": uni_sdf,
            "uniform_valid": uni_valid,
        }
        return jax.tree.map(
            lambda t: jax.lax.stop_gradient(t) if isinstance(t, jnp.ndarray) else t, batch
        )

    def __call__(self, images: jnp.ndarray, mean_latents: LatentMeans) -> dict[str, Any]:
        """Init-friendly full pass touching every submodule."""
        if self.is_initializing():
            # materialize the z->w mapping networks (unused by the W+ hot path)
            self.mean_latent(jax.random.key(0), 2)
        if self.cfg.renderer.enable_local_model:
            return self.image2image(images, mean_latents)
        return self.image2image_global(images, mean_latents)
