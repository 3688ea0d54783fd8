"""End-to-end tests of the E3DGE inversion pipeline (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
from e3dge_tpu.render.camera import camera_params_from_angles
from e3dge_tpu.utils.config import tiny_full_config, tiny_test_config


def _mean_latents(cfg):
    return LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )


@pytest.fixture(scope="module")
def global_pipeline(tiny_test_setup):
    cfg, model, v, ml = tiny_test_setup
    images = jax.random.normal(jax.random.key(0), (2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    return cfg, model, v, images, ml


@pytest.fixture(scope="module")
def full_pipeline(tiny_full_setup):
    cfg, model, v, ml = tiny_full_setup
    images = jax.random.normal(jax.random.key(0), (2, 3, cfg.pifu.load_size, cfg.pifu.load_size))
    return cfg, model, v, images, ml


def test_image2latents_offsets(global_pipeline):
    cfg, model, v, images, ml = global_pipeline
    out = model.apply(v, images, ml, method=E3DGE.image2latents)
    w_r, w_d = out["pred_latents"]
    assert w_r.shape == (2, cfg.renderer.depth + 1, cfg.renderer.style_dim)
    assert w_d.shape == (2, cfg.decoder.n_latent, cfg.decoder.style_dim)
    # nonzero mean latent shifts predictions by exactly that mean
    ml2 = LatentMeans(renderer=ml.renderer + 1.0, decoder=ml.decoder)
    out2 = model.apply(v, images, ml2, method=E3DGE.image2latents)
    np.testing.assert_allclose(np.asarray(out2["pred_latents"][0]), np.asarray(w_r) + 1.0, rtol=1e-5)


def test_image2camsettings(global_pipeline):
    cfg, model, v, images, ml = global_pipeline
    cam = model.apply(v, images, method=E3DGE.image2camsettings)
    assert cam.poses.shape == (2, 3, 4)
    assert cam.calibs.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(cam.near).ravel(), 0.88, rtol=1e-5)


def test_global_inversion(global_pipeline):
    cfg, model, v, images, ml = global_pipeline
    out = model.apply(
        v, images, ml, method=E3DGE.image2image_global, rngs={"noise": jax.random.key(3)}
    )
    assert out["gen_imgs"].shape == (2, 3, cfg.decoder.size, cfg.decoder.size)
    assert out["gen_thumb_imgs"].shape == (2, 3, cfg.renderer.out_im_res, cfg.renderer.out_im_res)


@pytest.mark.slow
def test_full_inversion_and_novel_view(full_pipeline):
    cfg, model, v, images, ml = full_pipeline
    out = model.apply(v, images, ml, method=E3DGE.image2image, rngs={"noise": jax.random.key(3)})
    rec = out["res_render_out"]
    assert rec["gen_imgs"].shape == (2, 3, cfg.decoder.size, cfg.decoder.size)
    assert np.isfinite(np.asarray(rec["gen_imgs"])).all()

    # novel view: re-render the ref encoding from a different camera
    ref_info = model.apply(v, images, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(4)})
    que_cam = camera_params_from_angles(
        jnp.asarray([0.25, -0.25]), jnp.asarray([0.1, 0.0]), cfg.renderer.out_im_res
    )
    nv = model.apply(
        v, ref_info, que_cam, method=E3DGE.que_render_given_ref, rngs={"noise": jax.random.key(5)}
    )
    assert nv["res_render_out"]["gen_imgs"].shape == (2, 3, cfg.decoder.size, cfg.decoder.size)
    assert nv["aligned_res"].shape == (2, 3, cfg.pifu.load_size, cfg.pifu.load_size)
    assert np.isfinite(np.asarray(nv["res_render_out"]["gen_imgs"])).all()


def test_full_inversion_jits(full_pipeline):
    cfg, model, v, images, ml = full_pipeline

    @jax.jit
    def fwd(v, images, ml):
        out = model.apply(v, images, ml, method=E3DGE.image2image, rngs={"noise": jax.random.key(0)})
        return out["res_render_out"]["gen_imgs"]

    img = fwd(v, images, ml)
    assert img.shape == (2, 3, cfg.decoder.size, cfg.decoder.size)


def test_image2image_dp_mesh_matches_single_device(full_pipeline):
    """SERVING scale-out: the full-pipeline inversion jitted over a 2-device dp
    mesh (batch sharded, params replicated) reproduces the single-device
    outputs — the multi-chip serving story is the same GSPMD program as
    training's (parallel/mesh.py), no per-device code."""
    from e3dge_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg, model, v, images, ml = full_pipeline

    def fwd(v, images, ml):
        out = model.apply(v, images, ml, method=E3DGE.image2image, rngs={"noise": jax.random.key(0)})
        return out["res_render_out"]["gen_imgs"]

    want = jax.jit(fwd)(v, images, ml)

    mesh = make_mesh(2)
    v_r, ml_r = replicate(v, mesh), replicate(ml, mesh)
    imgs_s = shard_batch({"x": images}, mesh)["x"]
    got = jax.jit(fwd)(v_r, imgs_s, ml_r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_zero_init_modulations_match_global_render(full_pipeline):
    """At init the SFT modulations are exact no-ops, so the E1-conditioned render must
    equal the unconditioned full-pipeline render (same z_vals, same noise)."""
    cfg, model, v, images, ml = full_pipeline
    ref_info = model.apply(v, images, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(4)})
    out = model.apply(
        v,
        ref_info,
        ref_info["cam_settings"],
        ref_info["global_render_out"],
        method=E3DGE.que_render_given_ref,
        rngs={"noise": jax.random.key(7)},
    )
    plain = model.apply(
        v,
        ref_info["pred_latents"],
        ref_info["cam_settings"],
        None,
        False,
        ref_info["global_render_out"]["z_vals"],
        method=E3DGE.latent2image,
        rngs={"noise": jax.random.key(7)},
    )
    np.testing.assert_allclose(
        np.asarray(out["res_render_out"]["gen_imgs"]), np.asarray(plain["gen_imgs"]), atol=1e-5
    )


def test_pool_helpers():
    from e3dge_tpu.models.e3dge import adaptive_avg_pool, upsample_nearest

    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    down = adaptive_avg_pool(x, 2)
    np.testing.assert_allclose(np.asarray(down[0, 0]), [[2.5, 4.5], [10.5, 12.5]])
    up = upsample_nearest(down, 4)
    assert up.shape == (1, 1, 4, 4)
    np.testing.assert_allclose(np.asarray(up[0, 0, :2, :2]), 2.5)


def test_same_view_fused_query_bit_exact(full_pipeline):
    """same_view=True (image2image serving) — one RAY-COLLAPSED channel-concat
    gather for the ref/query feature lookups + skipped all-ones visibility
    query — must match the generic two-pass path at the same camera. Tolerance
    (not bit) since r4: the fused path gathers at the sample-0 projection while
    the generic ref-side gather projects per point — identical up to fp ulps in
    the x/z division (see test_que_gather_ray_constant)."""
    cfg, model, v, images, ml = full_pipeline
    ref_info = model.apply(
        v, images, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(4)}
    )

    def render(sv):
        return model.apply(
            v,
            ref_info,
            ref_info["cam_settings"],
            que_info=ref_info["global_render_out"],
            same_view=sv,
            method=E3DGE.que_render_given_ref,
            rngs={"noise": jax.random.key(5)},
        )

    fused = render(True)
    generic = render(False)
    np.testing.assert_allclose(
        np.asarray(fused["res_render_out"]["gen_imgs"]),
        np.asarray(generic["res_render_out"]["gen_imgs"]),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused["res_render_out"]["gen_thumb_imgs"]),
        np.asarray(generic["res_render_out"]["gen_thumb_imgs"]),
        atol=5e-4,
    )
    # the skipped visibility mask is provably all-ones at the same view
    assert np.asarray(generic["in_img_mask"]).all()


def test_cached_backbone_rerender_matches_full(full_pipeline):
    """Same-view conditioned re-render via the cached SIREN backbone
    (render_from_backbone) equals the full recompute path: tex-only modulation
    leaves backbone/SDF/weights identical, so the shortcut is exact."""
    cfg, model, v, images, ml = full_pipeline
    ref_info = model.apply(
        v, images, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(4)}
    )
    assert "raw_h" in ref_info["global_render_out"]  # inference requests the cache

    def render(reuse):
        return model.apply(
            v,
            ref_info,
            ref_info["cam_settings"],
            que_info=ref_info["global_render_out"],
            reuse_backbone=reuse,
            method=E3DGE.que_render_given_ref,
            rngs={"noise": jax.random.key(5)},
        )["res_render_out"]

    fast = render(True)
    slow = render(False)
    np.testing.assert_allclose(
        np.asarray(fast["gen_thumb_imgs"]), np.asarray(slow["gen_thumb_imgs"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast["gen_imgs"]), np.asarray(slow["gen_imgs"]), atol=2e-4
    )


def test_que_gather_ray_constant(full_pipeline):
    """The que-side pixel-aligned gather is ray-constant (e3dge.py step 2/4b):
    every depth sample of a ray projects to the ray's own pixel in the camera
    that generated the rays (pinhole: o is the projection center, so x/z of
    o + t*d is independent of t). Pins (a) the projected grid is constant
    along S, (b) the sample-0 gather broadcast across S equals the per-point
    gather — the invariant the r4 cycle-step optimization relies on."""
    from e3dge_tpu.render.camera import camera_params_from_angles, project_points

    cfg, model, v, images, ml = full_pipeline
    ref_info = model.apply(
        v, images, ml, method=E3DGE.encode_ref_images, rngs={"noise": jax.random.key(4)}
    )
    que_cam = camera_params_from_angles(
        jnp.asarray([0.3, -0.2]), jnp.asarray([0.05, 0.15]), cfg.renderer.out_im_res
    )
    que_info = model.apply(
        v, ref_info["pred_latents"], que_cam,
        method=lambda m, lat, cam: m.latent2image(lat, cam, renderer_only=True),
        rngs={"noise": jax.random.key(6)},
    )
    pts = que_info["points"]  # [B, H, W, S, 3]
    B, H, W, S, _ = pts.shape
    pts_all = jnp.transpose(pts.reshape(B, -1, 3), (0, 2, 1))
    xyz = project_points(pts_all, que_cam.calibs)  # [B, 3, N]
    uv = np.asarray(xyz[:, :2]).reshape(B, 2, H * W, S)
    # (a) projection constant along the sample axis
    np.testing.assert_allclose(uv, np.broadcast_to(uv[..., :1], uv.shape), atol=2e-5)

    # (b) per-point gather == sample-0 gather broadcast
    feat = ref_info["ref_view_aligned_feat"]

    def q(m, f, p):
        return m.local.query(f, p, que_cam.calibs)["feats"]

    f_all = model.apply(v, feat, pts_all, method=q)
    f_all = np.asarray(jnp.transpose(f_all, (0, 2, 1)).reshape(B, H, W, S, -1))
    pts_ray = jnp.transpose(pts[:, :, :, 0, :].reshape(B, -1, 3), (0, 2, 1))
    f_ray = model.apply(v, feat, pts_ray, method=q)
    f_ray = np.asarray(jnp.transpose(f_ray, (0, 2, 1)).reshape(B, H, W, 1, -1))
    scale = np.abs(f_all).max() + 1e-6
    np.testing.assert_allclose(f_all / scale, np.broadcast_to(f_ray, f_all.shape) / scale, atol=1e-4)
