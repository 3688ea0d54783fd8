"""VolumeFeatureRenderer — the G0 rendering engine (SIREN field + SDF compositing).

Functional equivalent of the reference `VolumeFeatureRenderer`
(`project/utils/volume_renderer.py:636-2043`). One flax module owning the learnable
`sigmoid_beta` and the SIREN field; `__call__` renders a full image batch in one traced
computation:

  rays (render/rays.py) -> z sampling -> SIREN field query over the flattened
  ray-sample axis -> volume integration (render/integrate.py)

TPU-first differences from the reference:
  * no chunk loops (`--chunk`, `_staged_run_network` 50k-point chunks, FiLM row
    sub-batching) — the sample axis is one array axis XLA tiles onto the MXU; wrap the
    field in `jax.checkpoint` via `remat_field=True` when HBM-bound instead.
  * eikonal terms come from `jax.grad` of the pure SDF query (`query_sdf`), not torch
    autograd.grad graph surgery — and are exact to any order.
  * randomness (z jitter, 3D-supervision sampling) uses explicit PRNG keys.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from e3dge_tpu.models.siren import SirenGenerator
from e3dge_tpu.render.camera import CameraParams
from e3dge_tpu.render.integrate import volume_integrate
from e3dge_tpu.render.rays import get_rays, rays_to_points, sample_z_vals
from e3dge_tpu.utils.config import RendererConfig


class VolumeFeatureRenderer(nn.Module):
    cfg: RendererConfig
    camera_dist_radius: float = 0.12

    def setup(self):
        c = self.cfg
        self.network = SirenGenerator(
            depth=c.depth,
            width=c.width,
            style_dim=c.style_dim,
            output_features=c.output_features,
            name="network",
        )
        if c.with_sdf:
            self.sigmoid_beta = self.param("sigmoid_beta", nn.initializers.constant(0.1), (1,))

    # -- field queries -------------------------------------------------------

    def _warp(self, pts: jnp.ndarray) -> jnp.ndarray:
        """UniformBoxWarp: world coords -> [-1, 1] box (volume_renderer.py:23-30,
        sidelength = 2 * dist_radius)."""
        return pts * (1.0 / self.camera_dist_radius)

    def query_raw(
        self,
        pts: jnp.ndarray,
        viewdirs: jnp.ndarray,
        styles: jnp.ndarray,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        """Query the field at world points: concat([rgb, sdf, features]).

        The network sees FLATTENED [B, N, C] tensors: the decoder side of the
        program wants spatial-minor (NCHW) layouts and XLA propagates that
        layout into 5-D [B,H,W,S,C] field tensors, forcing a relayout copy at
        every FiLM dot in the f32 training graph (r3 xprof: ~15 ms/step).
        Merging H,W,S into one axis leaves XLA a single layout choice, with at
        most one boundary reshape at each end.

        cfg.remat_field recomputes the field in the backward pass (jax.checkpoint)
        instead of storing the [B,H,W,S,width+4] activations — HBM for FLOPs."""
        shp = pts.shape

        def flat(t):
            return t.reshape(shp[0], -1, t.shape[-1])

        p, v = flat(self._warp(pts)), flat(viewdirs)
        cond = None if conditions is None else (flat(conditions[0]), flat(conditions[1]))
        if self.cfg.remat_field:
            def f(network, p, v, s, c):
                return network(p, v, s, c)

            out = nn.remat(f)(self.network, p, v, styles, cond)
        else:
            out = self.network(p, v, styles, cond)
        return out.reshape(*shp[:-1], out.shape[-1])

    def query_sdf(self, pts: jnp.ndarray, styles: jnp.ndarray) -> jnp.ndarray:
        """SDF-only query (geo branch), for eikonal grads / mesh extraction /
        3D-supervision sampling."""
        h = self.network.backbone(self._warp(pts), styles)
        return self.network.geo_head(h)

    def _query_fused(self, pts, dirs, styles, conditions):
        """Fused Pallas field query (ops/pallas/siren_kernel.py): all layer weights
        stay VMEM-resident and the whole backbone+heads runs per ray-sample tile —
        one HBM read of inputs, one write of outputs. Inference-only path (the XLA
        formulation serves autodiff)."""
        from e3dge_tpu.ops.pallas.siren_kernel import (
            film_vectors,
            pack_siren_params,
            siren_query_fused,
        )

        c = self.cfg
        params = self.network.variables["params"]
        pack = pack_siren_params(params, depth=c.depth, width=c.width)
        shape = pts.shape  # [B, H, W, S, 3]
        b = shape[0]
        n = int(np.prod(shape[1:-1]))
        pts_flat = self._warp(pts).reshape(b, n, 3)
        dirs_flat = dirs.reshape(b, n, 3)
        if conditions is not None:
            alpha = conditions[0].reshape(b, n, c.width)
            lbeta = conditions[1].reshape(b, n, c.width)
        feats, rgb_sdfs = [], []
        for i in range(b):  # per-item: FiLM vectors are per-style
            s = styles[i] if styles.ndim == 3 else styles[i] if styles.ndim == 2 else styles
            gamma, beta = film_vectors(params, s, depth=c.depth)
            f, rs = siren_query_fused(
                pts_flat[i],
                dirs_flat[i],
                pack,
                gamma,
                beta,
                alpha[i] if conditions is not None else None,
                lbeta[i] if conditions is not None else None,
                depth=c.depth,
                width=c.width,
            )
            feats.append(f)
            rgb_sdfs.append(rs)
        feat = jnp.stack(feats).reshape(*shape[:-1], c.width)
        rgb_sdf = jnp.stack(rgb_sdfs).reshape(*shape[:-1], 8)
        return rgb_sdf[..., :3], rgb_sdf[..., 3:4], feat if c.output_features else None

    # -- rendering -----------------------------------------------------------

    def __call__(
        self,
        camera: CameraParams,
        styles: jnp.ndarray,
        key: jax.Array | None = None,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        train: bool = False,
        no_force_stop: bool = False,
        z_vals: jnp.ndarray | None = None,
        return_raw_h: bool = False,
        field_dtype: str | None = None,
    ) -> dict[str, Any]:
        """Render a batch of views.

        Args:
          camera: CameraParams (poses/focal/near/far/calibs).
          styles: [B, depth+1, style_dim] W+ (or [B, style_dim] broadcast w).
          key: PRNG key for z-jitter (training only).
          conditions: optional per-sample local SFT modulations (alpha, beta), each
            [B, H, W, S, width] — the E1 local-branch injection point.
          train: enables perturbed sampling per cfg.
          z_vals: optional externally-fixed depth samples (cross-view queries).
          return_raw_h: also return the raw SIREN backbone hidden [B, H, W, S, width]
            so a later SAME-view pass can reuse it (render_from_backbone).

        Returns the reference's `sample_batch` dict (volume_renderer.py:1270-1287):
        gen_thumb_imgs [-1,1], features, sdf, mask, xyz, depth, hit_prob (weights),
        points, dists, visibility, rays_o/rays_d/viewdirs, near/far, z_vals.
        """
        c = self.cfg
        res = c.out_im_res
        rays_o, rays_d, viewdirs = get_rays(
            camera.focal, camera.poses, res, static_viewdirs=c.static_viewdirs
        )
        b = rays_o.shape[0]

        if z_vals is None:
            perturb = c.perturb and train
            z_vals = sample_z_vals(
                key,
                jnp.broadcast_to(camera.near.reshape(b, 1, 1), (b, res, res)),
                jnp.broadcast_to(camera.far.reshape(b, 1, 1), (b, res, res)),
                (b, res, res),
                c.n_samples,
                offset_sampling=c.offset_sampling,
                perturb=perturb,
            )
        pts = rays_to_points(rays_o, rays_d, z_vals)  # [B, H, W, S, 3]

        dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
        # field_dtype boundary: the SIREN query runs in bf16 when configured (the
        # field is HBM-pass-bound; see RendererConfig.field_dtype), while ray
        # geometry above and integration below stay f32.
        fdt = jnp.dtype(field_dtype or c.field_dtype)
        q_pts, q_dirs, q_styles = pts.astype(fdt), dirs.astype(fdt), styles.astype(fdt)
        raw_h = None
        if c.fused_inference and not train:
            rgb_raw, sdf, features = self._query_fused(q_pts, q_dirs, q_styles, conditions)
        elif return_raw_h:
            # split query so the backbone hidden is a named output (cache for
            # same-view re-renders — tex modulation does not touch it)
            raw_h = self.network.backbone(self._warp(q_pts), q_styles)
            sdf = self.network.geo_head(raw_h)
            rgb_raw, features = self.network.tex_head(raw_h, q_dirs, q_styles, conditions)
            if not c.output_features:
                features = None
        else:
            raw = self.query_raw(q_pts, q_dirs, q_styles, conditions)
            rgb_raw = raw[..., :3]
            sdf = raw[..., 3:4]
            features = raw[..., 4:] if c.output_features else None
        rgb_raw = rgb_raw.astype(jnp.float32)
        sdf = sdf.astype(jnp.float32)
        if features is not None:
            features = features.astype(jnp.float32)

        out = volume_integrate(
            rgb_raw,
            sdf,
            features,
            z_vals,
            rays_d,
            pts,
            self.sigmoid_beta if c.with_sdf else jnp.asarray(1.0),
            force_background=c.force_background,
            no_force_stop=no_force_stop,
            fg_mask_threshold=c.fg_mask_threshold,
        )

        result = {
            "gen_thumb_imgs": jnp.transpose(out.rgb, (0, 3, 1, 2)),  # NCHW like reference
            "features": None if out.features is None else jnp.transpose(out.features, (0, 3, 1, 2)),
            "sdf": out.sdf,
            "mask": out.mask,
            "xyz": out.xyz,
            "depth": out.depth,
            "hit_prob": out.weights,
            "visibility": out.visibility,
            "points": pts,
            "dists": out.dists,
            "z_vals": z_vals,
            "rays_o": rays_o,
            "rays_d": rays_d,
            "viewdirs": viewdirs,
            "near": camera.near,
            "far": camera.far,
        }
        if raw_h is not None:
            result["raw_h"] = raw_h
        return result

    def render_from_backbone(
        self,
        cached: dict[str, Any],
        styles: jnp.ndarray,
        conditions: tuple[jnp.ndarray, jnp.ndarray] | None,
    ) -> dict[str, Any]:
        """Texture-head-only re-render on a cached backbone hidden — the SAME-view
        E1 re-render shortcut.

        The reference recomputes the whole field for the local-conditioned pass
        (volume_renderer.py:1865-1972); but the released configs modulate only the
        texture branch ((alpha+1)*h + beta before views_linears, :217-220), so the
        backbone hidden, SDF, and therefore the integration weights of a same-view
        pass are bit-identical to the global pass. Re-running just views_linears +
        rgb_linear + the weighted sums skips 8 of the 10 field matmul layers
        (~8 ms/img of the 1024^2 inversion on v5e).

        cached: the pass-1 render dict with `raw_h` (from return_raw_h=True).
        Returns the same dict layout with re-composited thumb/features.
        """
        h = cached["raw_h"]  # stays in field_dtype; tex head follows it
        weights = cached["hit_prob"]  # post-force_background, identical in pass 2
        dirs = jnp.broadcast_to(cached["viewdirs"][..., None, :], h.shape[:-1] + (3,))
        rgb_raw, features = self.network.tex_head(h, dirs, styles.astype(h.dtype), conditions)
        rgb_raw = rgb_raw.astype(jnp.float32)
        features = features.astype(jnp.float32)
        rgb = -1.0 + 2.0 * jnp.sum(weights * jax.nn.sigmoid(rgb_raw), axis=-2)
        out = dict(cached)
        out["gen_thumb_imgs"] = jnp.transpose(rgb, (0, 3, 1, 2))
        if self.cfg.output_features:
            feature_map = jnp.sum(weights * features, axis=-2)
            out["features"] = jnp.transpose(feature_map, (0, 3, 1, 2))
        return out

    # -- occlusion / visibility ------------------------------------------------

    def query_hit_prob(
        self,
        wd_pts: jnp.ndarray,       # [B, H, W, S, 3] query points (world space)
        ref_camera: CameraParams,
        ref_styles: jnp.ndarray,
        return_type: str = "weights",
        n_chunks: int = 16,
    ) -> jnp.ndarray:
        """Occlusion query: re-integrate rays from the REFERENCE camera through every
        query point and lerp the hit-probability (or transmittance) at the point's
        fractional depth-interval index (reference
        `query_hitting_probability_fixed_interval`, volume_renderer.py:1326-1495).

        The reference chunks serially in 64^2-ray batches; here the per-point rays are
        one array axis scanned in `n_chunks` tiles (lax.map) purely to bound HBM — the
        field query inside each tile is a single fused batched program.

        Returns [B, H, W, S, 1] occlusion weights in the query layout.
        """
        assert return_type in ("weights", "visibility")
        c = self.cfg
        B, H, W, S, _ = wd_pts.shape
        N = H * W * S
        S_ray = c.n_samples

        rays_o = ref_camera.poses[:, :, 3]  # [B, 3]
        w2c_R = ref_camera.extrinsics[:, :, :3]
        w2c_t = ref_camera.extrinsics[:, :, 3]
        c2w_R = ref_camera.poses[:, :, :3]

        pts = wd_pts.reshape(B, N, 3)
        # ray dir through each point, normalized to z = -1 in camera space
        p_cam = jnp.einsum("bij,bnj->bni", w2c_R, pts) + w2c_t[:, None]
        rays_d_ref = p_cam / (-p_cam[..., 2:3])
        rays_d_wd = jnp.einsum("bij,bnj->bni", c2w_R, rays_d_ref)  # [B, N, 3]
        d_norm = jnp.linalg.norm(rays_d_wd, axis=-1, keepdims=True)
        # static_viewdirs (released default, base_setup.py:54): the field sees
        # CAMERA-space directions — reference volume_renderer.py:1420-1423. The
        # frame is inert for the RETURNED weights/visibility (they derive from the
        # view-independent SDF channel only; viewdirs feed the unused RGB head),
        # but matching it keeps the query reference-exact end to end.
        # c2w_R is a rotation, so |rays_d_ref| == |rays_d_wd| and d_norm serves both.
        viewdirs = (rays_d_ref if c.static_viewdirs else rays_d_wd) / d_norm

        near = ref_camera.near.reshape(B, 1, 1)
        far = ref_camera.far.reshape(B, 1, 1)
        if c.offset_sampling:
            t_vals = jnp.linspace(0.0, 1.0 - 1.0 / S_ray, S_ray)
        else:
            t_vals = jnp.linspace(0.0, 1.0, S_ray)
        z_vals = near * (1.0 - t_vals)[None, None] + far * t_vals[None, None]  # [B, 1, S_ray]
        z_vals = jnp.broadcast_to(z_vals, (B, N, S_ray))
        interval = (z_vals[..., 1:2] - z_vals[..., 0:1]) * d_norm  # [B, N, 1]

        # fractional interval index of the query point along its own ray
        q0 = rays_o[:, None] + rays_d_wd * z_vals[..., 0:1]
        idx = jnp.linalg.norm(pts - q0, axis=-1, keepdims=True) / interval + 1e-5  # [B, N, 1]
        idx_floor = jnp.clip(jnp.floor(idx), 0, S_ray - 1).astype(jnp.int32)
        idx_ceil = jnp.clip(jnp.ceil(idx), 0, S_ray - 1).astype(jnp.int32)

        chunk = -(-N // n_chunks)
        pad = chunk * n_chunks - N

        def pad_n(x):
            return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

        rays_d_c = pad_n(rays_d_wd).reshape(B, n_chunks, chunk, 3)
        viewdirs_c = pad_n(viewdirs).reshape(B, n_chunks, chunk, 3)
        z_vals_c = pad_n(z_vals).reshape(B, n_chunks, chunk, S_ray)

        # stop-gradient weighting against the frozen field -> serving dtype OK
        # (bf16 + fast_sin when occlusion_field_dtype/field_dtype says so)
        odt = jnp.dtype(c.occlusion_field_dtype or c.field_dtype)
        styles_q = ref_styles.astype(odt)

        def one_chunk(args):
            rd, vd, zv = args  # [B, chunk, 3], [B, chunk, 3], [B, chunk, S_ray]
            q = rays_o[:, None, None] + rd[:, :, None] * zv[..., None]  # [B, chunk, S_ray, 3]
            dirs = jnp.broadcast_to(vd[:, :, None], q.shape)
            raw = self.query_raw(q.astype(odt), dirs.astype(odt), styles_q)
            out = volume_integrate(
                raw[..., :3].astype(jnp.float32),
                raw[..., 3:4].astype(jnp.float32),
                None,
                zv,
                vd,  # normalized viewdirs: dists already scaled by d_norm via interval
                q,
                self.sigmoid_beta,
                force_background=False,
                no_force_stop=True,
                fg_mask_threshold=c.fg_mask_threshold,
            )
            return out.weights if return_type == "weights" else out.visibility  # [B, chunk, S_ray, 1]

        occ = jax.lax.map(one_chunk, (
            jnp.moveaxis(rays_d_c, 1, 0),
            jnp.moveaxis(viewdirs_c, 1, 0),
            jnp.moveaxis(z_vals_c, 1, 0),
        ))  # [n_chunks, B, chunk, S_ray, 1]
        occ = jnp.moveaxis(occ, 0, 1).reshape(B, n_chunks * chunk, S_ray)[:, :N]

        floor_v = jnp.take_along_axis(occ, idx_floor, axis=-1)
        ceil_v = jnp.take_along_axis(occ, idx_ceil, axis=-1)
        w = idx - idx_floor
        out = floor_v + w * (ceil_v - floor_v)
        return out.reshape(B, H, W, S, 1)

    def query_hit_prob_texture(
        self,
        wd_pts: jnp.ndarray,        # [B, H, W, Sq, 3] query points (world space)
        ref_camera: CameraParams,
        ref_hit_prob: jnp.ndarray,  # [B, Hr, Wr, Sr, 1] ref render weight volume
    ) -> jnp.ndarray:
        """Light-field approximation of query_hit_prob: instead of re-integrating a
        full ray through every query point (Sr field evaluations per point — ~24x
        the field work of a render, the cycle step's +178 ms refweight band), sample
        the REFERENCE view's already-computed weight volume trilinearly: bilinear
        over the Hr x Wr ray grid (one channels-last row gather, Sr channels) and
        linear over the canonical depth-interval grid.

        Exact at the ref ray grid; between rays it interpolates the 4 neighbours'
        integrals instead of integrating the exact ray (and ignores train-time
        z-jitter), so it is an APPROXIMATION of the reference semantics
        (volume_renderer.py:1326-1495) — opt-in via RendererConfig.occlusion_mode
        ("texture"); the default "exact" keeps the per-point re-integration. The
        weighting is stop-gradient auxiliary data in the released recipe, so mask
        drift only perturbs a loss weighting, never the reconstruction targets.

        Returns [B, H, W, Sq, 1] occlusion weights in the query layout."""
        from e3dge_tpu.ops.grid_sample import grid_sample

        c = self.cfg
        B, H, W, Sq, _ = wd_pts.shape
        N = H * W * Sq
        Hr, Wr, Sr = ref_hit_prob.shape[1:4]
        pts = wd_pts.reshape(B, N, 3)

        w2c_R = ref_camera.extrinsics[:, :, :3]
        w2c_t = ref_camera.extrinsics[:, :, 3]
        p_cam = jnp.einsum("bij,bnj->bni", w2c_R, pts) + w2c_t[:, None]
        inv_z = 1.0 / (-p_cam[..., 2])
        # get_rays pixel convention: dir_x = (i - res/2)/f at z=-1, i in
        # [0.5, res-0.5]; torch-style ndc u = 2*i/res - 1 = 2*f*x_ndc/res
        f = ref_camera.focal.reshape(B, 1)
        u = 2.0 * f * p_cam[..., 0] * inv_z / Wr
        v = -2.0 * f * p_cam[..., 1] * inv_z / Hr
        grid = jnp.stack([u, v], axis=-1)[:, :, None, :]  # [B, N, 1, 2]

        vol = jnp.transpose(ref_hit_prob[..., 0], (0, 3, 1, 2))  # [B, Sr, Hr, Wr]
        occ = grid_sample(vol, grid)[..., 0]                      # [B, Sr, N]
        occ = jnp.transpose(occ, (0, 2, 1))                       # [B, N, Sr]

        # fractional interval index along the point's own ref ray: the ray
        # parameterization has z = -1 in camera space, so the parameter IS the
        # camera-space depth — idx = (depth - z0) / (z1 - z0) on the canonical grid
        near = ref_camera.near.reshape(B, 1)
        far = ref_camera.far.reshape(B, 1)
        if c.offset_sampling:
            t_vals = jnp.linspace(0.0, 1.0 - 1.0 / Sr, Sr)
        else:
            t_vals = jnp.linspace(0.0, 1.0, Sr)
        z0 = near * (1.0 - t_vals[0]) + far * t_vals[0]
        z1 = near * (1.0 - t_vals[1]) + far * t_vals[1]
        idx = ((-p_cam[..., 2] - z0) / (z1 - z0) + 1e-5)[..., None]  # [B, N, 1]
        idx_floor = jnp.clip(jnp.floor(idx), 0, Sr - 1).astype(jnp.int32)
        idx_ceil = jnp.clip(jnp.ceil(idx), 0, Sr - 1).astype(jnp.int32)
        floor_v = jnp.take_along_axis(occ, idx_floor, axis=-1)
        ceil_v = jnp.take_along_axis(occ, idx_ceil, axis=-1)
        w = jnp.clip(idx - idx_floor, 0.0, 1.0)
        out = floor_v + w * (ceil_v - floor_v)
        return out.reshape(B, H, W, Sq, 1)

    def query_hit_prob_adapted(
        self,
        wd_pts: jnp.ndarray,       # [B, H, W, S, 3] query points (world space)
        ref_camera: CameraParams,
        ref_styles: jnp.ndarray,
        n_chunks: int = 16,
    ) -> jnp.ndarray:
        """Adapted-interval occlusion query (reference
        `query_hitting_probability_adapted_interval`, volume_renderer.py:1497-1621):
        sample S points linearly from the ref-view near plane TO each query point and
        take the LAST sample's hit probability — no interval lerp needed, at the cost
        of per-point z spacing. Dormant in the reference's released configs; kept for
        config parity. Returns [B, H, W, S, 1]."""
        c = self.cfg
        B, H, W, S, _ = wd_pts.shape
        N = H * W * S
        S_ray = c.n_samples

        rays_o = ref_camera.poses[:, :, 3]
        w2c_R = ref_camera.extrinsics[:, :, :3]
        w2c_t = ref_camera.extrinsics[:, :, 3]
        c2w_R = ref_camera.poses[:, :, :3]

        pts = wd_pts.reshape(B, N, 3)
        p_cam = jnp.einsum("bij,bnj->bni", w2c_R, pts) + w2c_t[:, None]
        rays_d_ref = p_cam / (-p_cam[..., 2:3])
        rays_d_wd = jnp.einsum("bij,bnj->bni", c2w_R, rays_d_ref)
        # camera-space viewdirs under static_viewdirs (reference :1572-1575)
        vd_src = rays_d_ref if c.static_viewdirs else rays_d_wd
        viewdirs = vd_src / jnp.linalg.norm(vd_src, axis=-1, keepdims=True)

        near = ref_camera.near.reshape(B, 1, 1)
        near_pts = rays_o[:, None] + rays_d_wd * near  # [B, N, 3]
        t_vals = jnp.linspace(0.0, 1.0, S_ray)  # no offset sampling here (ref :1556)

        chunk = -(-N // n_chunks)
        pad = chunk * n_chunks - N

        def pad_n(x):
            return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

        near_c = pad_n(near_pts).reshape(B, n_chunks, chunk, 3)
        pts_c = pad_n(pts).reshape(B, n_chunks, chunk, 3)
        vd_c = pad_n(viewdirs).reshape(B, n_chunks, chunk, 3)

        odt = jnp.dtype(c.occlusion_field_dtype or c.field_dtype)
        styles_q = ref_styles.astype(odt)

        def one_chunk(args):
            np_, p, vd = args
            # [B, chunk, S_ray, 3]: lerp from near plane to the query point
            q = np_[:, :, None] * (1.0 - t_vals)[None, None, :, None] + p[:, :, None] * t_vals[None, None, :, None]
            zv = jnp.linalg.norm(q - rays_o[:, None, None], axis=-1)  # true arc length
            dirs = jnp.broadcast_to(vd[:, :, None], q.shape)
            raw = self.query_raw(q.astype(odt), dirs.astype(odt), styles_q).astype(jnp.float32)
            out = volume_integrate(
                raw[..., :3], raw[..., 3:4], None, zv, vd, q,
                self.sigmoid_beta, force_background=False, no_force_stop=True,
                fg_mask_threshold=c.fg_mask_threshold,
            )
            return out.weights[..., -1, :]  # hit prob of the query point itself

        hp = jax.lax.map(one_chunk, (
            jnp.moveaxis(near_c, 1, 0), jnp.moveaxis(pts_c, 1, 0), jnp.moveaxis(vd_c, 1, 0),
        ))  # [n_chunks, B, chunk, 1]
        hp = jnp.moveaxis(hp, 0, 1).reshape(B, n_chunks * chunk, 1)[:, :N]
        return hp.reshape(B, H, W, S, 1)

    # -- 3D-supervision sampling (DATASETGAN_3D support) -----------------------

    def sample_uniform_grid(self, key: jax.Array, batch: int, n: int, styles: jnp.ndarray):
        """Uniform box samples + SDF (volume_renderer.py:945-963)."""
        r = self.camera_dist_radius
        pts = jax.random.uniform(key, (batch, n, 3), minval=-r, maxval=r)
        sdf = self.query_sdf(pts, styles)
        return pts, sdf, jnp.ones_like(sdf)

    def sample_near_surface_grid(
        self, key: jax.Array, surface_xyz: jnp.ndarray, styles: jnp.ndarray, stdv: float = 0.03
    ):
        """Gaussian-perturbed surface samples + SDF + in-box validity mask
        (volume_renderer.py:965-1003)."""
        noise = stdv * jax.random.normal(key, surface_xyz.shape)
        pts = surface_xyz + noise  # [B, H, W, 3]
        valid = (jnp.max(jnp.abs(pts), axis=-1, keepdims=True) < self.camera_dist_radius).astype(pts.dtype)
        sdf = self.query_sdf(pts, styles)
        return pts, sdf, valid

    def mlp_init_pass(
        self, key: jax.Array, camera: CameraParams, styles: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Sphere-initialization pass for training the SIREN SDF from scratch
        (reference mlp_init_pass, volume_renderer.py:1833-1863): stratified frustum
        samples; target sdf = ||pts|| - (far - near)/4. Returns (sdf, target).

        Grid subtlety (golden-pinned, test_golden_oracle.py): the reference jitters
        `self.t_vals` with the mids/upper/lower scheme regardless of offset_sampling,
        and under the released --offset_sampling default self.t_vals IS the offset
        grid linspace(0, 1-1/S) — so the base grid follows cfg.offset_sampling while
        the jitter style stays "mids" (this method previously used the stratified
        linspace(0,1) grid unconditionally; parity bug found by the oracle)."""
        c = self.cfg
        res = c.out_im_res
        rays_o, rays_d, viewdirs = get_rays(camera.focal, camera.poses, res)
        b = rays_o.shape[0]
        z_vals = sample_z_vals(
            key,
            jnp.broadcast_to(camera.near.reshape(b, 1, 1), (b, res, res)),
            jnp.broadcast_to(camera.far.reshape(b, 1, 1), (b, res, res)),
            (b, res, res),
            c.n_samples,
            offset_sampling=c.offset_sampling,
            perturb=True,
            jitter="mids",
        )
        pts = rays_to_points(rays_o, rays_d, z_vals)
        sdf = self.query_sdf(pts, styles)[..., 0]
        radius = (camera.far - camera.near).reshape(b, 1, 1, 1) / 4.0
        target = jnp.linalg.norm(jax.lax.stop_gradient(pts), axis=-1) - radius
        return sdf, target

    def render_sdf_grid(self, camera: CameraParams, styles: jnp.ndarray) -> jnp.ndarray:
        """Frustum SDF samples for marching cubes: render at out_im_res x n_samples
        resolution and return the raw [B, H, W, S, 1] SDF volume (mesh path,
        volume_renderer.py:1694-1758 uses a 128^3 surface clone of the renderer)."""
        c = self.cfg
        res = c.out_im_res
        rays_o, rays_d, _ = get_rays(camera.focal, camera.poses, res)
        b = rays_o.shape[0]
        z_vals = sample_z_vals(
            None,
            jnp.broadcast_to(camera.near.reshape(b, 1, 1), (b, res, res)),
            jnp.broadcast_to(camera.far.reshape(b, 1, 1), (b, res, res)),
            (b, res, res),
            c.n_samples,
            offset_sampling=c.offset_sampling,
            perturb=False,
        )
        pts = rays_to_points(rays_o, rays_d, z_vals)
        return self.query_sdf(pts, styles)


def eikonal_term(apply_fn, variables, pts: jnp.ndarray, styles: jnp.ndarray) -> jnp.ndarray:
    """d(sdf)/d(pts) per point (reference get_eikonal_term, volume_renderer.py:796-802).

    Each point's SDF depends only on its own coords, so grad of the summed SDF gives
    the per-point spatial gradient exactly.
    """

    def f(p):
        return apply_fn(variables, p, styles, method=VolumeFeatureRenderer.query_sdf).sum()

    return jax.grad(f)(pts)
