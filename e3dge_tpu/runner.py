"""Runner — train/eval orchestration (L4), the AERunner / E3DGE_Full_Runner
equivalent (reference `project/trainers/trainer.py`, `E3DGE/e3dge_full_runner.py`).

Host-side orchestration around the jitted module methods: validation with
scores.json, novel-view video trajectories, mesh export, editing, toonify, and the
training loop with checkpoint rotation. All device work goes through cached jitted
closures; data-dependent host work (marching cubes, image IO, ffmpeg) stays outside.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.render.camera import CameraParams, camera_params_from_angles
from e3dge_tpu.training import losses as L
from e3dge_tpu.training.data import EvalImageDataset
from e3dge_tpu.utils import editing as editing_utils
from e3dge_tpu.utils import mesh as mesh_utils
from e3dge_tpu.utils.config import E3DGEConfig


class Runner:
    def __init__(
        self,
        cfg: E3DGEConfig,
        variables: dict,
        mean_latents: LatentMeans,
        work_dir: str | Path = "runs/e3dge",
        lpips_fn: Callable | None = None,
        id_fn: Callable | None = None,
    ):
        self.cfg = cfg
        self.model = E3DGE(cfg)
        self.variables = variables
        self.mean_latents = mean_latents
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.lpips_fn = lpips_fn
        self.id_fn = id_fn
        self.boundaries: dict | None = None
        self._jit_cache: dict[tuple, Callable] = {}

    # ------------------------------------------------------------ jit helpers

    def _jitted(self, name: str, fn: Callable, *statics) -> Callable:
        """Cache a jitted closure. Any Python value the closure captures (rather
        than receiving as a traced argument) MUST be part of the cache key —
        pass it in `statics`. jit itself retraces on shape changes, but a stale
        closed-over static would silently reuse the first-call value."""
        key = (name, *statics)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _apply(self, method, *args, **kwargs):
        return self.model.apply(
            self.variables, *args, method=method, rngs={"noise": jax.random.key(0)}, **kwargs
        )

    # -------------------------------------------------------------- inference

    def image2image(self, images: np.ndarray) -> dict[str, Any]:
        """Invert + reconstruct (full E1 path when enabled)."""
        fn = self._jitted(
            "image2image",
            lambda v, x, ml: self.model.apply(
                v,
                x,
                ml,
                method=E3DGE.image2image if self.cfg.renderer.enable_local_model else E3DGE.image2image_global,
                rngs={"noise": jax.random.key(0)},
            ),
        )
        return fn(self.variables, jnp.asarray(images), self.mean_latents)

    def encode_ref(self, images: np.ndarray) -> dict[str, Any]:
        fn = self._jitted(
            "encode_ref",
            lambda v, x, ml: self.model.apply(
                v, x, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(0)}
            ),
        )
        return fn(self.variables, jnp.asarray(images), self.mean_latents)

    def render_view(self, ref_info: dict, camera: CameraParams) -> dict[str, Any]:
        fn = self._jitted(
            "render_view",
            lambda v, r, c: self.model.apply(
                v, r, c, method=E3DGE.que_render_given_ref, rngs={"noise": jax.random.key(0)}
            ),
        )
        return fn(self.variables, ref_info, camera)

    def render_video(self, images: np.ndarray, n_views: int = 8, azim_range: float = 0.3, batched: bool = True):
        """Novel-view trajectory for each input (reference render_video,
        trainer.py:1843-2012): azimuth sweep at the estimated elevation.

        batched=True renders all B*V views in one device program
        (E3DGE.render_multiview); False reproduces the reference's per-view loop.
        """
        from e3dge_tpu.models.e3dge import E3DGE

        ref_info = self.encode_ref(images)
        b = images.shape[0]
        azims = np.linspace(-azim_range, azim_range, n_views)
        if batched:
            elev = np.asarray(ref_info["cam_settings"].viewpoint[:, 1])
            azim_bv = jnp.asarray(np.tile(azims, b))  # [B*V] ordered b0v0..b0vN,b1v0..
            elev_bv = jnp.asarray(np.repeat(elev, n_views))
            cams = camera_params_from_angles(
                azim_bv, elev_bv, self.cfg.renderer.out_im_res, self.cfg.camera.fov_ang, self.cfg.camera.dist_radius
            )
            fn = self._jitted(
                "render_multiview",
                lambda v, r, c: self.model.apply(
                    v, r, c, n_views, method=E3DGE.render_multiview, rngs={"noise": jax.random.key(0)}
                ),
                n_views,
            )
            out = fn(self.variables, ref_info, cams)
            imgs = np.asarray(out["res_render_out"]["gen_imgs"])
            return imgs.reshape(b, n_views, *imgs.shape[1:])
        frames = []
        for azim in azims:
            cam = camera_params_from_angles(
                jnp.full((b,), float(azim)),
                ref_info["cam_settings"].viewpoint[:, 1],
                self.cfg.renderer.out_im_res,
                self.cfg.camera.fov_ang,
                self.cfg.camera.dist_radius,
            )
            out = self.render_view(ref_info, cam)
            frames.append(np.asarray(out["res_render_out"]["gen_imgs"]))
        return np.stack(frames, axis=1)  # [B, V, 3, H, W]

    def render_video_projected_noise(self, images: np.ndarray, n_views: int = 8, azim_range: float = 0.3):
        """Geometry-aware noise projection video (reference --project_noise,
        stylesdf_model.py:423-466): extract the mesh once, attach a fixed per-vertex
        noise texture, and for every view rasterize it into each decoder noise layer
        so the StyleGAN2 noise sticks to the surface instead of flickering.

        Host-side rasterization (native C++) per frame, like the reference's
        pytorch3d depth render (the reference quotes ~20 min/video at 1024)."""
        from e3dge_tpu.models.e3dge import E3DGE
        from e3dge_tpu.training.train_utils import make_noise
        from e3dge_tpu.utils import mesh as mesh_utils

        assert images.shape[0] == 1, "noise projection assumes batch 1 (reference NoiseInjection.project_noise)"
        ref_info = self.encode_ref(images)
        verts, faces = self.latent2surface(ref_info["pred_latents"], ref_info["cam_settings"])[0]
        base_noise = make_noise(jax.random.key(0), self.cfg.decoder.size, self.cfg.decoder.in_res, batch=1)
        vert_noise = None

        render_fn = self._jitted(
            "latent2image_noise",
            lambda v, lat, cam, noise: self.model.apply(
                v, lat, cam, None, False, None, None, False, noise,
                method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)},
            ),
        )

        frames = []
        elev = float(np.asarray(ref_info["cam_settings"].viewpoint[0, 1]))
        for azim in np.linspace(-azim_range, azim_range, n_views):
            cam = camera_params_from_angles(
                jnp.asarray([float(azim)]), jnp.asarray([elev]),
                self.cfg.renderer.out_im_res, self.cfg.camera.fov_ang, self.cfg.camera.dist_radius,
            )
            calib = np.asarray(cam.calibs[0])
            noise_list = []
            for layer_noise in base_noise:
                if len(verts):
                    projected, vert_noise = mesh_utils.project_noise(
                        np.asarray(layer_noise), verts, faces, calib, vert_noise=vert_noise
                    )
                    noise_list.append(jnp.asarray(projected))
                else:
                    noise_list.append(layer_noise)
            out = render_fn(self.variables, ref_info["pred_latents"], cam, tuple(noise_list))
            frames.append(np.asarray(out["gen_imgs"]))
        return np.stack(frames, axis=1)

    def create_trajectory(self, num_frames: int = 250, azim_only: bool = False) -> np.ndarray:
        """Camera trajectory [(azim, elev)] (reference create_trajectory,
        trainer.py:2349-2390): azimuth sweep or ellipsoid sweep over the training
        pose range."""
        t = np.linspace(0.0, 1.0, num_frames)
        cc = self.cfg.camera
        if azim_only:
            azim = 1.5 * cc.azim_range * np.cos(t * np.pi)
            elev = np.zeros_like(azim)
        else:
            azim = cc.azim_range * np.cos(t * 2 * np.pi)
            elev = cc.elev_range / 2 + cc.elev_range / 2 * np.sin(t * 2 * np.pi)
        return np.stack([azim, elev], axis=1).astype(np.float32)

    def render_hdtf(
        self,
        data_root: str | Path,
        max_frames: int = 250,
        batch_size: int = 4,
        trajectory_len: int = 250,
        out_name: str = "HDTF_nvs_video",
    ):
        """HDTF novel-view-synthesis video eval (reference render_HDTF,
        trainer.py:3107-3174): every video frame is inverted and re-rendered from
        the next camera of a looping trajectory. Unlike the reference's chunk=1
        loop, frames are processed in device batches with per-frame cameras (one
        compiled program). Writes frames .npy (+ .mp4 when imageio/ffmpeg exists)."""
        ds = EvalImageDataset(data_root, size=self.cfg.pifu.load_size)
        traj = self.create_trajectory(trajectory_len)
        frames = []
        seen = 0
        for batch in ds.iter_batches(batch_size):
            if seen >= max_frames:
                break
            imgs_np = batch["image"]
            valid = imgs_np.shape[0]
            if valid < batch_size:
                imgs_np = np.concatenate(
                    [imgs_np, np.repeat(imgs_np[-1:], batch_size - valid, axis=0)], axis=0
                )
            idx = (seen + np.arange(batch_size)) % trajectory_len
            cam = camera_params_from_angles(
                jnp.asarray(traj[idx, 0]), jnp.asarray(traj[idx, 1]),
                self.cfg.renderer.out_im_res, self.cfg.camera.fov_ang, self.cfg.camera.dist_radius,
            )
            ref = self.encode_ref(jnp.asarray(imgs_np))
            out = self.render_view(ref, cam)
            imgs = np.asarray(out["res_render_out"]["gen_imgs"])[:valid]
            frames.append(imgs)
            seen += valid
        video = np.concatenate(frames, axis=0)[:max_frames]  # [N, 3, H, W]
        out_dir = self.work_dir / "trajectory_videos"
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / f"{out_name}.npy", video)
        try:
            import imageio

            u8 = ((np.clip(video.transpose(0, 2, 3, 1), -1, 1) + 1) * 127.5).astype(np.uint8)
            imageio.mimwrite(out_dir / f"{out_name}.mp4", u8, fps=25)
        except Exception as e:  # imageio/ffmpeg optional in this image
            print(f"mp4 writer unavailable ({e}); frames saved as .npy")
        return {"num_frames": int(video.shape[0]), "out_dir": str(out_dir)}

    # ---------------------------------------------------------------- editing

    def load_boundaries(self, boundary_dir: str | Path):
        self.boundaries = editing_utils.load_boundaries(boundary_dir)

    def edit_and_render(self, images: np.ndarray, scales: Sequence[float] | Mapping[str, float]):
        """Semantic editing (reference editing_inference path,
        e3dge_full_runner.py:121-142): edit codes, re-render, ADA-align the original
        residual against the *edited* thumb, fuse, decode."""
        assert self.boundaries is not None, "call load_boundaries first"
        ref_info = self.encode_ref(images)
        edited = editing_utils.edit_code(ref_info["pred_latents"], self.boundaries, scales)
        ref_info = dict(ref_info)
        ref_info["pred_latents"] = edited
        # re-render the edited global pass so depths/residual context match the edit
        fn = self._jitted(
            "latent2image_ro",
            lambda v, lat, cam: self.model.apply(
                v, lat, cam, None, True, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)}
            ),
        )
        edit_render = fn(self.variables, edited, ref_info["cam_settings"])
        ref_info["global_render_out"] = edit_render
        out = self.render_view(ref_info, ref_info["cam_settings"])
        return out

    def toonify(self, toon_generator_params: dict):
        """Swap in domain-transferred generator weights (demo_toonify path)."""
        params = editing_utils.toonify_params(self.variables["params"], toon_generator_params)
        self.variables = {**self.variables, "params": params}
        self._jit_cache.clear()

    # ------------------------------------------------------------------- mesh

    def latent2surface(self, pred_latents, camera: CameraParams | None = None):
        """SDF frustum -> cubic grid -> marching tetrahedra -> (verts, faces)
        (reference latent2surface, trainer.py:1374-1480)."""
        b = pred_latents[0].shape[0]
        if camera is None:
            camera = camera_params_from_angles(
                jnp.zeros((b,)), jnp.zeros((b,)), self.cfg.renderer.out_im_res,
                self.cfg.camera.fov_ang, self.cfg.camera.dist_radius,
            )
        fn = self._jitted(
            "sdf_grid",
            lambda v, cam, w: self.model.apply(v, cam, w, method=lambda m, c, s: m.generator.render_sdf_grid(c, s)),
        )
        sdf = fn(self.variables, camera, pred_latents[0])  # [B, H, W, S, 1]
        aligned = mesh_utils.align_volume(sdf)
        meshes = []
        for i in range(b):
            verts, faces = mesh_utils.extract_mesh(np.asarray(aligned[i, ..., 0]))
            meshes.append((verts, faces))
        return meshes

    def render_depth_mesh(
        self,
        images: np.ndarray | None = None,
        ref_info: dict | None = None,
        trajectory_location: Sequence[float] | None = None,
        image_size: int = 512,
        filter_out_bg: bool = True,
    ) -> np.ndarray:
        """Phong-shaded depth-geometry frames [B, H, W] in [0, 1] (reference
        render_depth_mesh, trainer.py:2251-2346): Delaunay depth mesh from the
        surface xyz map, shaded with the reference's light rig (point light (0,0,5),
        ambient 0.1 / diffuse 0.65 / specular 0.2 gray material) and z-buffer
        rasterized by the native C++ rasterizer — replacing the pytorch3d renderer.
        Background (thumb > 0.98, blurred) is composited to 0.5 ambient gray."""
        if ref_info is None:
            ref_info = self.encode_ref(np.asarray(images))
        gro = ref_info["global_render_out"]
        xyz = np.asarray(gro["xyz"])  # [B, H, W, 3]
        b = xyz.shape[0]
        if trajectory_location is None:
            viewpoints = np.asarray(ref_info["cam_settings"].viewpoint, np.float32)
        else:
            viewpoints = np.broadcast_to(
                np.asarray(trajectory_location, np.float32).reshape(1, 2), (b, 2)
            )
        if filter_out_bg:
            thumbs = np.asarray(gro["gen_thumb_imgs"])  # [B, 3, h, w] in [-1, 1]
            bg = (thumbs > 0.98).astype(np.float32).mean(axis=1)  # [B, h, w]
        frames = []
        for i in range(b):
            verts, faces = mesh_utils.xyz2mesh(xyz[i])
            normals = mesh_utils.vertex_normals(verts, faces)
            azim, elev = float(viewpoints[i, 0]), float(viewpoints[i, 1])
            cam_origin = np.array(
                [np.cos(elev) * np.sin(azim), np.sin(elev), np.cos(elev) * np.cos(azim)],
                np.float32,
            )  # dist=1 camera (render/camera.py:60-62)
            intensity = mesh_utils.phong_vertex_intensity(verts, normals, cam_origin)
            cam = camera_params_from_angles(
                jnp.asarray([azim]), jnp.asarray([elev]), image_size,
                self.cfg.camera.fov_ang, self.cfg.camera.dist_radius,
            )
            screen = mesh_utils.project_to_screen(
                verts, np.asarray(cam.calibs[0]), image_size, image_size
            )
            color, dep = mesh_utils.rasterize(screen, faces, intensity, image_size, image_size)
            frame = np.where(dep > 0, color, 0.5)
            if filter_out_bg:
                # nearest-resize the thumb bg mask to image_size, box-blur it, and
                # composite to the 0.5 ambient gray (trainer.py:2281-2288, 2337-2341)
                idx = (np.arange(image_size) * bg.shape[-1] // image_size)
                mask = bg[i][np.ix_(idx, idx)]
                k = max(image_size // 64, 1)
                kern = np.ones(k) / k
                mask = np.apply_along_axis(lambda r: np.convolve(r, kern, mode="same"), 1, mask)
                mask = np.apply_along_axis(lambda c: np.convolve(c, kern, mode="same"), 0, mask)
                frame = frame * (1.0 - mask) + mask * 0.5
            frames.append(frame.astype(np.float32))
        return np.stack(frames, axis=0)

    def evaluate3d(
        self,
        now_folder: str | Path,
        batch_size: int = 2,
        mode: str = "val",
        out_dir: str | Path | None = None,
        score: bool = True,
        max_scan_points: int = 40000,
    ):
        """NoW-style 3D eval (reference evaluate3D, trainer.py:2103-2208): invert each
        benchmark image, extract the mesh, export .obj per image — and, when the NoW
        scan assets are present (scans/<subject>/*.obj + scans_lmks_onlypp/*.pp),
        score point-to-scan distances after rigid alignment (the official
        now_evaluation step the reference defers to, trainer.py:2205-2207),
        reporting mean/median/std in scan units (mm)."""
        from e3dge_tpu.training.eval3d import now_scan_error, parse_picked_points
        from e3dge_tpu.training.now_data import NoWDataset
        from e3dge_tpu.utils.mesh import load_obj_vertices, save_obj

        root = Path(now_folder)
        ds = NoWDataset(root, mode=mode)
        out_dir = Path(out_dir or (self.work_dir / "now_meshes"))
        out_dir.mkdir(parents=True, exist_ok=True)
        n = 0
        all_dists: list[np.ndarray] = []
        scan_cache: dict[str, tuple] = {}
        for batch in ds.iter_batches(batch_size):
            imgs = jnp.asarray(batch["image"])
            ref = self.encode_ref(imgs)
            meshes = self.latent2surface(ref["pred_latents"], ref["cam_settings"])
            for (verts, faces), name, subj in zip(meshes, batch["imagename"], batch["subject"]):
                d = out_dir / subj
                d.mkdir(parents=True, exist_ok=True)
                save_obj(d / f"{name}.obj", verts, faces)
                n += 1
                if not score or len(verts) == 0:
                    continue
                if subj not in scan_cache:
                    scan_objs = sorted((root / "scans" / subj).glob("*.obj"))
                    lms_files = sorted((root / "scans_lmks_onlypp" / subj).glob("*.pp"))
                    scan_pts = load_obj_vertices(scan_objs[0]) if scan_objs else None
                    scan_lms = parse_picked_points(lms_files[0]) if lms_files else None
                    if scan_pts is not None and len(scan_pts) > max_scan_points:
                        step = len(scan_pts) // max_scan_points + 1
                        scan_pts = scan_pts[::step]
                    scan_cache[subj] = (scan_pts, scan_lms)
                scan_pts, scan_lms = scan_cache[subj]
                if scan_pts is None:
                    continue
                dists = now_scan_error(verts, faces, scan_pts, scan_lms=scan_lms)
                all_dists.append(dists[np.isfinite(dists)])
        result = {"num_meshes": n, "out_dir": str(out_dir)}
        if all_dists:
            d = np.concatenate(all_dists)
            result.update(
                mean=float(d.mean()), median=float(np.median(d)), std=float(d.std()),
                num_scored=len(all_dists),
            )
            (out_dir / "now_scores.json").write_text(json.dumps(result, indent=2))
        return result

    # ------------------------------------------------------------- validation

    def _per_image_metrics(self, pred: jnp.ndarray, gt: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """Per-image L2/MAE/PSNR/SSIM (+LPIPS/ID when nets provided) — the six
        reference validation metrics (trainer.py:423-429, builder.py:130-186).
        Per-image so padded eval batches can be masked exactly.

        mae/ssim use the REFERENCE's printed conventions (L1 on raw [-1,1];
        (1+SSIM)/2 window-5 kornia form, builder.py:171-182) so scores.json is
        directly comparable to the Table-1/notebook anchors; standard forms are
        kept under mae_std/ssim_std."""
        pred01 = (pred + 1.0) / 2.0
        gt01 = (gt + 1.0) / 2.0
        axes = (1, 2, 3)
        m = {
            "loss_l2": jnp.mean((pred - gt) ** 2, axis=axes),
            "mae": L.mae_ref(pred, gt, per_sample=True),
            "mae_std": jnp.mean(jnp.abs(pred01 - gt01), axis=axes),
            "psnr": 10.0 * jnp.log10(1.0 / jnp.maximum(jnp.mean((pred01 - gt01) ** 2, axis=axes), 1e-12)),
            "ssim": L.ssim_ref(pred, gt, per_sample=True),
            "ssim_std": L.ssim(pred01, gt01, per_sample=True),
        }
        if self.lpips_fn is not None:
            m["loss_lpips"] = self.lpips_fn(pred, gt, per_sample=True)
        if self.id_fn is not None:
            _, sim = self.id_fn(pred, gt, per_sample=True)
            m["id_sim"] = sim
        return m

    def validation(
        self,
        data_root: str | Path,
        batch_size: int = 4,
        max_images: int | None = None,
        save_panels: bool = False,
    ):
        """eval_2dmetrics path: invert every test image, compute L2/MAE/PSNR/SSIM
        (+LPIPS/ID when nets provided), append scores.json (trainer.py:290-585).
        save_panels writes the reference's comparison panels (GT | thumb rec |
        residual | aligned residual | full rec) under work_dir/images_for_vis.

        The final ragged batch is padded to batch_size (one compiled program per
        shape) and its metrics masked to the valid entries."""
        from e3dge_tpu.models.e3dge import adaptive_avg_pool as _pool
        from e3dge_tpu.utils.image_io import save_panel

        ds = EvalImageDataset(data_root, size=self.cfg.pifu.load_size)
        agg: dict[str, list] = {}
        seen = 0
        t0 = time.perf_counter()
        for bi, batch in enumerate(ds.iter_batches(batch_size)):
            if max_images and seen >= max_images:
                break
            imgs_np = batch["image"]
            valid = imgs_np.shape[0]
            if valid < batch_size:  # pad the ragged final batch to a fixed shape
                pad = np.repeat(imgs_np[-1:], batch_size - valid, axis=0)
                imgs_np = np.concatenate([imgs_np, pad], axis=0)
            imgs = jnp.asarray(imgs_np)
            out = self.image2image(imgs)
            rec = out["res_render_out"] if "res_render_out" in out else out
            if save_panels:
                res = imgs.shape[-1]
                rows = {"gt": np.asarray(imgs), "rec": np.asarray(_pool(rec["gen_imgs"], res))}
                rows["thumb"] = np.asarray(rec["gen_thumb_imgs"])
                if "ref_info" in out:
                    rows["residual"] = np.asarray(out["ref_info"]["orig_res_gt"])
                if "aligned_res" in out:
                    rows["aligned_res"] = np.asarray(out["aligned_res"])
                save_panel(self.work_dir / "images_for_vis" / f"val_{bi:04d}.png", rows)
            pred = rec["gen_imgs"]
            res = min(pred.shape[-1], imgs.shape[-1])
            fn = self._jitted(
                "val_metrics",
                lambda p, g: self._per_image_metrics(_pool(p, res), _pool(g, res)),
                res,  # closed-over static -> part of the cache key
            )
            metrics = fn(pred, imgs)
            for k, v in metrics.items():
                agg.setdefault(k, []).extend(np.asarray(v)[:valid].tolist())
            seen += valid
        scores = {k: float(np.mean(v)) for k, v in agg.items()}
        scores["num_images"] = seen
        scores["sec_per_image"] = (time.perf_counter() - t0) / max(seen, 1)
        path = self.work_dir / "scores.json"
        existing = json.loads(path.read_text()) if path.exists() else []
        existing.append(scores)
        path.write_text(json.dumps(existing, indent=2))
        return scores

    # ------------------------------------------------- optimization inversion

    def project_images(
        self,
        data_root: str | Path,
        steps: int = 300,
        lr: float = 5e-3,
        pti_steps: int = 0,
        wspace: bool = False,
        batch_size: int = 1,
        max_images: int | None = None,
        seed: int = 0,
    ):
        """Optimization inversion over a directory of images (reference
        Projectors.project, projectors.py:129-330): per batch, estimate the
        camera with the pose head, optimize W+ (or W with wspace) offsets
        against the mean latent, optionally PTI-fine-tune the generator, and
        save `projection/<stem>/latent_in.npz` (+ `pti_g` orbax item) plus the
        final reconstruction — the artifacts `validation_from_latents`
        consumes (reference saves latent_in.pt, :160-162,300-330)."""
        from e3dge_tpu.training.projector import project
        from e3dge_tpu.training.projector import pti as run_pti
        from e3dge_tpu.utils.image_io import save_image_grid

        ds = EvalImageDataset(data_root, size=self.cfg.pifu.load_size)
        out_root = self.work_dir / "projection"
        results = []
        seen = 0
        for bi, batch in enumerate(ds.iter_batches(batch_size)):
            if max_images and seen >= max_images:
                break
            imgs = jnp.asarray(batch["image"])
            cam = self._jitted(
                "image2camsettings",
                lambda v, x: self.model.apply(v, x, method=E3DGE.image2camsettings),
            )(self.variables, imgs)
            latents, losses = project(
                self.model, self.variables, self.mean_latents, imgs, cam,
                jax.random.key(seed + bi), steps=steps, lr=lr,
                lpips_fn=self.lpips_fn, wspace=wspace,
            )
            variables = self.variables
            if pti_steps > 0:
                variables, _ = run_pti(
                    self.model, variables, latents, imgs, cam,
                    steps=pti_steps, lpips_fn=self.lpips_fn,
                )
            rec = self._jitted(
                "project_rec",
                lambda v, lat, c: self.model.apply(
                    v, lat, c, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)}
                ),
            )(variables, latents, cam)
            for i, name in enumerate(batch["img_path"]):
                stem = Path(name).stem
                d = out_root / stem
                d.mkdir(parents=True, exist_ok=True)
                np.savez(
                    d / "latent_in.npz",
                    renderer=np.asarray(latents[0][i]),
                    decoder=np.asarray(latents[1][i]),
                    final_loss=float(losses[-1]),
                )
                save_image_grid(d / "rec.png", np.asarray(rec["gen_imgs"][i : i + 1]))
                if pti_steps > 0:
                    import orbax.checkpoint as ocp

                    ckptr = ocp.StandardCheckpointer()
                    ckptr.save(
                        (d / "pti_g").resolve(),
                        jax.tree.map(lambda x: x[...], variables["params"]["generator"]),
                    )
                    ckptr.wait_until_finished()
                results.append({"name": stem, "final_loss": float(losses[-1])})
            seen += imgs.shape[0]
        return results

    def validation_from_latents(
        self,
        data_root: str | Path,
        projection_root: str | Path | None = None,
        batch_size: int = 4,
        max_images: int | None = None,
        use_pti: bool = False,
    ):
        """Validation consuming saved projection latents instead of the encoder
        (the reference's --inference_projection_validation: loads
        `<root>/<stem>/latent_in.pt`, optionally the PTI generator state, and
        renders at the estimated camera, trainer.py:355-379)."""
        proj_root = Path(projection_root) if projection_root else self.work_dir / "projection"
        ds = EvalImageDataset(data_root, size=self.cfg.pifu.load_size)
        agg: dict[str, list] = {}
        seen = 0
        for batch in ds.iter_batches(batch_size):
            if max_images and seen >= max_images:
                break
            keep = [i for i, n in enumerate(batch["img_path"])
                    if (proj_root / Path(n).stem / "latent_in.npz").exists()]
            if not keep:
                continue
            imgs = jnp.asarray(batch["image"][keep])
            lat = [
                np.load(proj_root / Path(batch["img_path"][i]).stem / "latent_in.npz")
                for i in keep
            ]
            latents = [
                jnp.asarray(np.stack([l["renderer"] for l in lat])),
                jnp.asarray(np.stack([l["decoder"] for l in lat])),
            ]
            variables = self.variables
            if use_pti:
                import orbax.checkpoint as ocp

                # per-image PTI generators only work at batch 1 (reference loads
                # one g state per image too, trainer.py:367-373)
                assert len(keep) == 1, "use_pti requires batch_size=1"
                gp = ocp.StandardCheckpointer().restore(
                    (proj_root / Path(batch["img_path"][keep[0]]).stem / "pti_g").resolve(),
                    self.variables["params"]["generator"],
                )
                variables = {
                    "params": {**self.variables["params"], "generator": gp},
                    **{k: v for k, v in self.variables.items() if k != "params"},
                }
            def _render(v, lat, x):
                cam = self.model.apply(v, x, method=E3DGE.image2camsettings)
                return self.model.apply(
                    v, lat, cam, method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)}
                )

            rec = self._jitted("proj_val_render", _render)(variables, latents, imgs)
            pred = rec["gen_imgs"]
            res = min(pred.shape[-1], imgs.shape[-1])
            from e3dge_tpu.models.e3dge import adaptive_avg_pool as _pool

            metrics = self._jitted(
                "proj_val_metrics",
                lambda p, g: self._per_image_metrics(_pool(p, res), _pool(g, res)),
                res,
            )(pred, imgs)
            for k, v in metrics.items():
                agg.setdefault(k, []).extend(np.asarray(v).tolist())
            seen += len(keep)
        scores = {k: float(np.mean(v)) for k, v in agg.items()}
        scores["num_images"] = seen
        scores["projection_validation"] = True
        path = self.work_dir / "scores.json"
        existing = json.loads(path.read_text()) if path.exists() else []
        existing.append(scores)
        path.write_text(json.dumps(existing, indent=2))
        return scores

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(self, state=None, name: str = "latest", d_state=None):
        """Orbax save with the reference's `_old` rotation (base_runner.py:277-284).

        `state` (TrainState) and `d_state` (DState) persist the full training
        state — optimizer moments, step count, EMA — like the reference's
        `<optim>_optimizer` dicts (base_runner.py:252-285). Restoring them needs
        matching templates (see load_checkpoint)."""
        import orbax.checkpoint as ocp

        path = (self.work_dir / f"models_{name}").resolve()
        old = (self.work_dir / f"models_{name}_old").resolve()
        if path.exists():
            if old.exists():
                import shutil

                shutil.rmtree(old)
            path.rename(old)
        ckptr = ocp.StandardCheckpointer()
        # separate items so eval can restore `variables` without knowing the
        # (optax-structured) training-state templates, and vice versa
        ckptr.save(path / "variables", self.variables)
        if state is not None:
            ckptr.save(path / "state", state)
        if d_state is not None:
            ckptr.save(path / "d_state", d_state)
        ckptr.wait_until_finished()

    def load_checkpoint(self, name: str = "latest", state_template=None, d_template=None):
        """Restore variables from `<work_dir>/models_<name>`, or from an explicit
        orbax checkpoint directory when `name` is a path (eval --ckpt pointing at
        another run's work dir).

        With `state_template` (a TrainState of the right structure, e.g. a fresh
        create_train_state result) the saved training state is restored with its
        proper NamedTuple/optax types and returned; same for `d_template`.
        Returns (state, d_state) — entries are None when absent from the ckpt or
        no template was given."""
        import orbax.checkpoint as ocp

        cand = Path(name).expanduser()
        if cand.is_dir():
            path = cand.resolve()
        else:
            path = (self.work_dir / f"models_{name}").resolve()
        ckptr = ocp.StandardCheckpointer()
        state = d_state = None
        if (path / "variables").is_dir():  # current layout: separate items
            self.variables = ckptr.restore(path / "variables", self.variables)
            if state_template is not None and (path / "state").is_dir():
                state = ckptr.restore(path / "state", state_template)
            if d_template is not None and (path / "d_state").is_dir():
                d_state = ckptr.restore(path / "d_state", d_template)
        else:  # legacy layout: one {"variables": ..., ["state"/"d_state": ...]} item
            raw = ckptr.restore(path)  # discover which keys the item holds
            template = {"variables": self.variables}
            if state_template is not None and "state" in raw:
                template["state"] = state_template
            if d_template is not None and "d_state" in raw:
                template["d_state"] = d_template
            for k in raw:  # keys we have no typed template for: keep raw
                template.setdefault(k, raw[k])
            restored = ckptr.restore(path, template) if len(template) > 1 else raw
            self.variables = restored["variables"]
            if state_template is not None:
                state = restored.get("state")
            if d_template is not None:
                d_state = restored.get("d_state")
        self._jit_cache.clear()
        return state, d_state
