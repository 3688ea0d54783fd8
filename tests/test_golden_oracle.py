"""Golden-oracle parity tests: run the reference's ACTUAL torch modules on CPU
with seeded weights, ingest their state_dicts through `torch_ckpt`, and assert
our flax modules reproduce the outputs (VERDICT r4 Missing #1).

Unlike `utils/parity.py` (independent numpy re-implementations), the oracle here
is `/root/reference`'s own code, imported via tests/golden/refbridge.py with
import-time stubs for its unavailable deps. Module families covered:

  SirenGenerator            volume_renderer.py:136   (field query)
  VolumeFeatureRenderer     volume_renderer.py:636   (end-to-end thumb render)
  Decoder                   stylesdf_model.py:587    (G1 upsampler)
  HybridGradualStyleEncoder_V2  fpn_encoders.py:266  (E0)
  HGPIFuNetGANResidualResnetFC  HGPIFuGANNetResidualInputResnetFC.py:19 (E1)
  ResidualAligner / Fuse_sft_MLP  alignment_old.py:316, sft.py:84 (ADA/SFT)
  VolumeRenderDiscriminator  stylesdf_model.py:1369  (GAN + pose-estimator heads)
  upfirdn2d / fused_leaky_relu  op/{upfirdn2d,fused_act}.py CPU fallbacks (L0 ops)
  Ranger optimizer          utils/ranger.py          (15-step trajectory)
  pose curriculum           utils/data_util.py:193   (incl. the tail-cap off-by-one)
  camera generation         utils/camera_utils.py:8  (poses/extrinsics/calibs)
  ArcFace IR-SE-50 + face pool  encoders/model_irse.py, losses/id_loss.py:20-27
  GAN losses + R1 autodiff parity  losses/gan_loss.py (jax.grad vs torch.autograd)
  SirenGeneratorDDF         volume_renderer.py:561   (dead-code proof + runnable mode)
  Encoder4EditingHybridBaseline  e4e_encoders.py:378  (e4e, both progressive stages)
  BackboneEncoderRenderer   restyle_psp_encoders.py:138  (ReStyle w-space)
  LPIPS (alex)              losses/lpips/ (z_score/taps/normalize eps/lin heads)
  PIFu geometry             vendor/pifu/lib/geometry.py:64-130 (index/ortho/persp)
  EMA accumulate            utils/training_utils.py:40  (3-step trajectory)
  align_volume              utils/mesh_utils.py:17-44   (frustum->cube SDF warp)
  secant march              lib/geometry.py:131-190     (dead-code proof)
  geometry losses           losses/geometry_loss.py     (BCE hit-prob, depth l2/sl1)
  PosEncoding + view swap   utils/misc_utils.py:148, training_utils.py:98
  HybridBackboneEncoder     restyle_psp_encoders.py:58 (hardcoded-ir proof)
  VolumeRenderDiscriminatorEncoder  stylesdf_model.py:1422 (W+ head + viewpoints)
  StyleGANEncoder (legacy)  stylesdf_model.py:1620 (2*n_latent W+ rows)
  full Generator z->image   stylesdf_model.py:800  (mapping+render+decode glue)
  mlp_init_pass             volume_renderer.py:1833 (sphere-init; offset-grid bug)
  dead-code proofs          DEncoder/VolumeStyleEncoder/FullEncoder/condition hook/
                            sdf_sample_pass (3D-supervision __getitem__ entry)

Tolerances: both sides are f32; FiLM gamma~30 through sin amplifies matmul
rounding ~30x, so field outputs get 3e-3 abs; plain conv stacks get 1e-4.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.golden import refbridge as rb

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- fixtures


@pytest.fixture(scope="session")
def refopt(tmp_path_factory):
    """The reference's own default option tree (setup_opts, base_setup.py:21)."""
    return rb.reference_opt(str(tmp_path_factory.mktemp("refckpt")))


def _prefix_sd(sd: dict, prefix: str) -> dict:
    return {prefix + k: v for k, v in sd.items()}


def _ingest_standalone(wrapped_vars: dict, sds: dict) -> dict:
    from e3dge_tpu.utils.torch_ckpt import ingest_variables

    new_vars, missing = ingest_variables(wrapped_vars, sds, strict=False)
    assert not missing, f"{len(missing)} unmapped: {missing[:8]}"
    return new_vars


def _t(x: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------- 1. SIREN field


def test_siren_field_golden(refopt):
    """Our SirenGenerator == the reference's, on its own seeded weights.

    Reference forward: volume_renderer.py:240-264 (split pts/views, backbone,
    geo + tex heads, concat [rgb, sdf, features])."""
    vr = rb.import_ref("project.utils.volume_renderer")
    ropt = refopt.rendering

    torch.manual_seed(0)
    ref = vr.SirenGenerator(ropt, D=8, W=256, style_dim=256)
    rb.seed_module(ref, seed=11)
    ref.eval()

    rng = np.random.RandomState(5)
    B, H, W, S = 2, 4, 4, 4  # reference FiLMSiren broadcasts gamma as [B,1,1,1,C]
    pts_warped = rng.uniform(-1, 1, (B, H, W, S, 3)).astype(np.float32)
    views = rng.randn(B, H, W, S, 3).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    styles = (0.3 * rng.randn(B, 9, 256)).astype(np.float32)

    net_inputs = _t(np.concatenate([pts_warped, views], -1))
    with torch.no_grad():
        ref_out = ref(net_inputs, _t(styles)).numpy()

    from e3dge_tpu.models.siren import SirenGenerator

    ours = SirenGenerator(depth=8, width=256, style_dim=256)
    v0 = ours.init(
        jax.random.key(0), jnp.zeros((B, H, W, S, 3)), jnp.zeros((B, H, W, S, 3)), jnp.zeros((B, 9, 256))
    )
    wrapped = {"params": {"generator": {"renderer": {"network": v0["params"]}}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "renderer.network.")}
    new_vars = _ingest_standalone(wrapped, sds)
    params = new_vars["params"]["generator"]["renderer"]["network"]

    out = np.asarray(ours.apply({"params": params}, pts_warped, views, styles))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=3e-3, rtol=0)


# ---------------------------------------------------------------- 2. end-to-end render


def test_volume_render_golden(refopt):
    """End-to-end thumb render: rays + z-sampling + field + SDF integration.

    Reference: VolumeFeatureRenderer.forward (volume_renderer.py:1865) in test
    mode (perturb=0) on explicit cameras. Note base_setup.py:54 hardwires
    static_viewdirs=True — the released models see CAMERA-space viewdirs."""
    vr = rb.import_ref("project.utils.volume_renderer")

    R, S = 16, 8
    ropt = rb._Munch(refopt.rendering)
    ropt.N_samples = S
    ropt.enable_local_model = False
    ropt.return_sdf = True
    ropt.return_xyz = True  # stage scripts set --return_xyz; enables depth/mask output

    torch.manual_seed(0)
    ref = vr.VolumeFeatureRenderer(ropt, style_dim=256, out_im_res=R, mode="test")
    rb.seed_module(ref, seed=21)
    ref.eval()

    # cameras from our generator; identical matrices feed both sides. Angles are
    # deliberately large so camera-space (static) vs world viewdirs diverge hard —
    # this test fails if static_viewdirs handling is wrong on either side.
    from e3dge_tpu.render.camera import camera_params_from_angles

    azim = jnp.asarray([0.5, -0.4])
    elev = jnp.asarray([0.3, -0.25])
    cam = camera_params_from_angles(azim, elev, R, fov_ang=6.0, dist_radius=0.12)

    rng = np.random.RandomState(7)
    styles = (0.3 * rng.randn(2, 9, 256)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            _t(cam.poses), _t(np.asarray(cam.focal)), _t(np.asarray(cam.near)),
            _t(np.asarray(cam.far)), styles=_t(styles),
        )

    from e3dge_tpu.models.volume_renderer import VolumeFeatureRenderer
    from e3dge_tpu.utils.config import RendererConfig

    cfg = RendererConfig(depth=8, width=256, style_dim=256, out_im_res=R, n_samples=S, perturb=False)
    ours = VolumeFeatureRenderer(cfg)
    v0 = ours.init({"params": jax.random.key(0)}, cam, jnp.asarray(styles))
    wrapped = {"params": {"generator": {"renderer": v0["params"]}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "renderer.")}
    new_vars = _ingest_standalone(wrapped, sds)
    out = ours.apply({"params": new_vars["params"]["generator"]["renderer"]}, cam, jnp.asarray(styles))

    np.testing.assert_allclose(
        np.asarray(out["gen_thumb_imgs"]), ref_out["gen_thumb_imgs"].numpy(), atol=3e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out["features"]), ref_out["features"].numpy(), atol=3e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), ref_out["depth"].numpy().reshape(out["depth"].shape), atol=3e-3, rtol=0
    )


# ------------------------------------------------- 2b. occlusion hit-prob query


@pytest.mark.slow
def test_hit_prob_golden(refopt):
    """Occlusion weighting vs the reference's own
    query_hitting_probability_{fixed,adapted}_interval (volume_renderer.py:1326,
    1497) — the cycle-training core (cycle_runner.py:133-161 weights the que-view
    loss by the ref view's hit probability). Pins both return types of the fixed
    query and the adapted tail-weight variant under the released
    static_viewdirs=True. (The viewdir FRAME — camera vs world, reference
    :1420-1423 — is inert for these outputs: weights/visibility derive from the
    view-independent SDF channel only. We mirror the reference's camera-frame
    choice anyway; this golden pins the full re-integration math: per-point ray
    construction, ref-frame z grid, interval-index lerp, tail-weight variant.)"""
    vr = rb.import_ref("project.utils.volume_renderer")

    R, S_ray, Sq = 8, 8, 3
    ropt = rb._Munch(refopt.rendering)
    ropt.N_samples = S_ray
    ropt.enable_local_model = False
    ropt.return_sdf = True
    ropt.return_xyz = True

    torch.manual_seed(0)
    ref = vr.VolumeFeatureRenderer(ropt, style_dim=256, out_im_res=R, mode="test")
    rb.seed_module(ref, seed=33)
    ref.eval()

    from e3dge_tpu.render.camera import camera_params_from_angles

    azim = jnp.asarray([0.35, -0.3])
    elev = jnp.asarray([0.2, -0.15])
    cam = camera_params_from_angles(azim, elev, R, fov_ang=6.0, dist_radius=0.12)

    rng = np.random.RandomState(9)
    styles = (0.3 * rng.randn(2, 9, 256)).astype(np.float32)
    # query points inside the unit-warp shell around the origin (the reference
    # frustum looks at the origin from distance ~1, near/far 0.88/1.12)
    pts = rng.uniform(-0.1, 0.1, (2, R, R, Sq, 3)).astype(np.float32)

    with torch.no_grad():
        render_out = ref(
            _t(cam.poses), _t(np.asarray(cam.focal)), _t(np.asarray(cam.near)),
            _t(np.asarray(cam.far)), styles=_t(styles),
        )
        # ref_img_info as the cycle runner builds it (e3dge_2dalignonly_runner.py:294)
        info = {
            "global_render_out": render_out,
            "cam_settings": {"poses": _t(cam.poses), "extrinsics": _t(cam.extrinsics)},
            "pred_latents": [_t(styles)],
        }
        ref_w = ref.query_hitting_probability_fixed_interval(_t(pts), info, "weights").numpy()
        ref_v = ref.query_hitting_probability_fixed_interval(_t(pts), info, "visibility").numpy()
        ref_a = ref.query_hitting_probability_adapted_interval(_t(pts), info).numpy()

    from e3dge_tpu.models.volume_renderer import VolumeFeatureRenderer
    from e3dge_tpu.utils.config import RendererConfig

    cfg = RendererConfig(depth=8, width=256, style_dim=256, out_im_res=R, n_samples=S_ray, perturb=False)
    ours = VolumeFeatureRenderer(cfg)
    v0 = ours.init({"params": jax.random.key(0)}, cam, jnp.asarray(styles))
    wrapped = {"params": {"generator": {"renderer": v0["params"]}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "renderer.")}
    params = _ingest_standalone(wrapped, sds)["params"]["generator"]["renderer"]

    jpts = jnp.asarray(pts)
    jstyles = jnp.asarray(styles)
    our_w = ours.apply({"params": params}, jpts, cam, jstyles, "weights", method="query_hit_prob")
    our_v = ours.apply({"params": params}, jpts, cam, jstyles, "visibility", method="query_hit_prob")
    our_a = ours.apply({"params": params}, jpts, cam, jstyles, method="query_hit_prob_adapted")

    np.testing.assert_allclose(np.asarray(our_w).reshape(ref_w.shape), ref_w, atol=3e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(our_v).reshape(ref_v.shape), ref_v, atol=3e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(our_a).reshape(ref_a.shape), ref_a, atol=3e-3, rtol=0)


# ---------------------------------------------------------------- 3. decoder G1


@pytest.mark.slow
def test_decoder_golden(refopt):
    """G1 StyleGAN2 upsampler vs the reference Decoder (stylesdf_model.py:587-797)
    at size 256 (in 64): mapping offset indexing, StyledConv pyramid, ToRGB skips,
    explicit noise on both sides."""
    sm = rb.import_ref("project.models.stylesdf_model")
    mopt = rb._Munch(refopt.model)
    mopt.size = 256
    mopt.renderer_spatial_output_dim = 64
    # Generator.__init__ injects this before building Decoder (stylesdf_model.py:814)
    mopt.feature_encoder_in_channels = refopt.rendering.width

    torch.manual_seed(0)
    ref = sm.Decoder(mopt)
    rb.seed_module(ref, seed=31)
    ref.eval()

    rng = np.random.RandomState(9)
    B = 1
    features = (0.5 * rng.randn(B, 256, 64, 64)).astype(np.float32)
    latent = (0.3 * rng.randn(B, ref.n_latent, 512)).astype(np.float32)
    noise = [
        (0.5 * rng.randn(1, 1, r, r)).astype(np.float32)
        for r in [64, 128, 128, 256, 256]
    ]

    with torch.no_grad():
        ref_img, _ = ref(
            _t(features), [_t(latent)], input_is_latent=True,
            noise=[_t(n) for n in noise], randomize_noise=False,
        )
    ref_img = ref_img.numpy()

    from e3dge_tpu.models.decoder import Decoder
    from e3dge_tpu.utils.config import DecoderConfig

    cfg = DecoderConfig(
        size=256, style_dim=512, channel_multiplier=mopt.channel_multiplier,
        channel_base=512, in_res=64, in_channels=256,
    )
    ours = Decoder(cfg)
    jn = [jnp.asarray(n) for n in noise]
    v0 = ours.init(
        {"params": jax.random.key(0)}, jnp.asarray(features), jnp.asarray(latent),
        input_is_latent=True, noise=jn,
    )
    wrapped = {"params": {"generator": {"decoder": v0["params"]}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "decoder.")}
    new_vars = _ingest_standalone(wrapped, sds)
    img, _ = ours.apply(
        {"params": new_vars["params"]["generator"]["decoder"]},
        jnp.asarray(features), jnp.asarray(latent), input_is_latent=True, noise=jn,
    )
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4, rtol=0)


# ---------------------------------------------------------------- 4. E0 FPN encoder


@pytest.mark.slow
def test_fpn_encoder_golden(refopt):
    """E0 vs reference HybridGradualStyleEncoder_V2 (fpn_encoders.py:266-432) at
    the released config: --full_pipeline, fpn dims 128/128 (all 9 pigan styles
    read p32), single_decoder_layer=False. The reference forward uses ONLY
    styles_stylegan[0] repeated (fpn_encoders.py:417-419) — blocks 1..9 are dead
    ckpt weights; this test proves our block-0-repeat forward matches."""
    enc = rb.import_ref("project.models.encoders.fpn_encoders")
    topt = rb._Munch(refopt.training)
    topt.full_pipeline = True  # released scripts pass --full_pipeline

    torch.manual_seed(0)
    ref = enc.HybridGradualStyleEncoder_V2(50, "ir_se", -1, topt)
    rb.seed_module(ref, seed=61)
    ref.eval()

    rng = np.random.RandomState(19)
    x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref_thumb, ref_sg = ref(_t(x))

    from e3dge_tpu.models.encoders.fpn import HybridGradualStyleEncoderV2
    from e3dge_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(single_decoder_layer=False)
    ours = HybridGradualStyleEncoderV2(cfg)
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {
        "params": {"encoder": v0["params"]},
        "batch_stats": {"encoder": v0["batch_stats"]},
    }
    new_vars = _ingest_standalone(wrapped, {"encoder": rb.sd_numpy(ref)})
    thumb, sg = ours.apply(
        {"params": new_vars["params"]["encoder"], "batch_stats": new_vars["batch_stats"]["encoder"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(thumb), ref_thumb.numpy(), atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(sg), ref_sg.numpy(), atol=1e-3, rtol=0)


# ---------------------------------------------------------------- 5. E1 local PIFu net


@pytest.mark.slow
def test_local_net_golden(refopt):
    """E1 vs reference HGPIFuNetGANResidualResnetFC (HGPIFuGANNetResidualInput
    ResnetFC.py:19-104): residual+depth context convs -> stacked hourglass filter,
    perspective pixel-aligned query (geometry.perspective + index + DepthNormalizer),
    and the zero-init ResnetBlockFC tex-modulation head."""
    lm = rb.import_ref("lib.model")
    popt = rb._Munch(refopt.pifu)
    popt.hg_input_channel = 64  # released flag (demo_view_synthesis.sh:9)
    ropt = rb._Munch(refopt.rendering)
    ropt.L_pred_tex_modulations = True  # stage-2 tex SFT head on

    torch.manual_seed(0)
    ref = lm.HGPIFuNetGANResidualResnetFC(popt, ropt, "projection")
    rb.seed_module(ref, seed=71)
    ref.eval()

    rng = np.random.RandomState(23)
    B, N = 2, 64
    resid = rng.uniform(-1, 1, (B, 3, 256, 256)).astype(np.float32)
    depth = rng.uniform(0.8, 1.2, (B, 1, 256, 256)).astype(np.float32)

    from e3dge_tpu.render.camera import camera_params_from_angles

    cam = camera_params_from_angles(
        jnp.asarray([0.2, -0.15]), jnp.asarray([0.1, -0.05]), 64, fov_ang=6.0, dist_radius=0.12
    )
    calibs = np.asarray(cam.calibs, np.float32)
    points = (0.2 * rng.randn(B, 3, N)).astype(np.float32)

    with torch.no_grad():
        ref.filter(_t(resid), depth_feat=_t(depth), feat_key="ref_view")
        im_feat_ref = ref.im_feat_dict["ref_view"][0].numpy()  # [B, 256, 64, 64]
        q_ref = ref.query(_t(points), _t(calibs), feat_key="ref_view", return_feat_only=True)
        feats_in = (0.5 * rng.randn(B, N, 301)).astype(np.float32)
        mod_ref = ref.local_feat_to_tex_modulations_linear(_t(feats_in)).numpy()

    from e3dge_tpu.models.pifu.local_net import LocalFeatureNet
    from e3dge_tpu.utils.config import PifuConfig

    cfg = PifuConfig(query_sample_mode="gather")
    ours = LocalFeatureNet(cfg)
    v0 = ours.init(
        jax.random.key(0), jnp.asarray(resid), jnp.asarray(depth),
        jnp.asarray(points), jnp.asarray(calibs),
    )
    new_vars = _ingest_standalone({"params": {"local": v0["params"]}}, {"local": rb.sd_numpy(ref)})
    var = {"params": new_vars["params"]["local"]}

    im_feat = ours.apply(var, jnp.asarray(resid), jnp.asarray(depth), method=LocalFeatureNet.filter)
    np.testing.assert_allclose(np.asarray(im_feat), im_feat_ref, atol=3e-3, rtol=0)

    q = ours.apply(var, im_feat, jnp.asarray(points), jnp.asarray(calibs), method=LocalFeatureNet.query)
    np.testing.assert_allclose(np.asarray(q["proj_xy"]), q_ref["proj_xy"].numpy(), atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(q["in_img"]), q_ref["in_img"].numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(q["z_condition"]), q_ref["z_condition"].numpy(), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(q["feats"]), q_ref["feats"].numpy(), atol=3e-3, rtol=0)

    alpha, beta = ours.apply(var, jnp.asarray(feats_in), method=LocalFeatureNet.tex_modulations)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(alpha), np.asarray(beta)], -1), mod_ref, atol=2e-4, rtol=0
    )


# ---------------------------------------------------------------- 6. ADA aligner + SFT fusion


def test_ada_aligner_golden(refopt):
    """ADA U-net vs reference ResidualAligner (alignment_old.py:316-398), batch
    norm variant (the reference default aligner_norm_type='batch'), eval mode."""
    al = rb.import_ref("project.models.helper_modules.alignment_old")
    topt = rb._Munch(refopt.training)
    assert topt.aligner_norm_type == "batch" and not topt.aligner_demodulate

    torch.manual_seed(0)
    ref = al.ResidualAligner(topt)
    rb.seed_module(ref, seed=41)
    ref.eval()

    rng = np.random.RandomState(13)
    x = rng.uniform(-1, 1, (2, 6, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(x)).numpy()

    from e3dge_tpu.models.align import ResidualAligner

    ours = ResidualAligner(norm="batch")
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {
        "params": {"grid_align": v0["params"]},
        "batch_stats": {"grid_align": v0["batch_stats"]},
    }
    new_vars = _ingest_standalone(wrapped, {"grid_align": rb.sd_numpy(ref)})
    out = ours.apply(
        {"params": new_vars["params"]["grid_align"], "batch_stats": new_vars["batch_stats"]["grid_align"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=0)


def test_fuse_sft_golden(refopt):
    """SFT MLP fusion vs reference Fuse_sft_MLP (sft.py:84-109)."""
    sft = rb.import_ref("project.models.helper_modules.sft")

    torch.manual_seed(0)
    ref = sft.Fuse_sft_MLP(in_ch=257, out_ch=256)
    rb.seed_module(ref, seed=51)
    ref.eval()

    rng = np.random.RandomState(17)
    enc = (0.5 * rng.randn(2, 64, 257)).astype(np.float32)
    dec = (0.5 * rng.randn(2, 64, 256)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(enc), _t(dec), w=1).numpy()

    from e3dge_tpu.models.align import FuseSftMLP

    ours = FuseSftMLP(out_ch=256)
    v0 = ours.init(jax.random.key(0), jnp.asarray(enc), jnp.asarray(dec))
    wrapped = {"params": {"fuse_sft_block": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"fuse_sft_block": rb.sd_numpy(ref)})
    out = ours.apply({"params": new_vars["params"]["fuse_sft_block"]}, jnp.asarray(enc), jnp.asarray(dec))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=0)


# -------------------------------------------------- 8. volume D / pose estimator


def test_volume_discriminator_golden(refopt):
    """VolumeRenderDiscriminator vs the reference's own (stylesdf_model.py:1369-1419).

    Both heads checked: GAN logit AND the (azim, elev) viewpoint regression —
    the viewpoint head is the camera pose estimator at inference
    (image2camsettings, trainer.py:944-947), so a parity bug here breaks
    released-weight serving directly."""
    sm = rb.import_ref("project.models.stylesdf_model")

    torch.manual_seed(0)
    ref = sm.VolumeRenderDiscriminator(refopt.model)
    rb.seed_module(ref, seed=61)
    ref.eval()

    init_size = int(refopt.model.renderer_spatial_output_dim)
    rng = np.random.RandomState(19)
    x = rng.uniform(-1, 1, (2, 3, init_size, init_size)).astype(np.float32)
    with torch.no_grad():
        ref_gan, ref_view = ref(_t(x))
        ref_gan, ref_view = ref_gan.numpy(), ref_view.numpy()

    from e3dge_tpu.models.discriminator import VolumeRenderDiscriminator

    ours = VolumeRenderDiscriminator(init_size=init_size)
    v0 = ours.init(jax.random.key(0), jnp.asarray(x))
    wrapped = {"params": {"volume_discriminator": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"volume_discriminator": rb.sd_numpy(ref)})
    gan, view = ours.apply({"params": new_vars["params"]["volume_discriminator"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gan), ref_gan, atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(view), ref_view, atol=2e-4, rtol=0)


# -------------------------------------------------- 8b. full-res G1 D


def test_full_discriminator_golden(refopt):
    """Full-res StyleGAN2 Discriminator (minibatch stddev) vs the reference's own
    (stylesdf_model.py:1541-1617) — the adversarial D of stage 2.2. Ingesting it
    from a released StyleSDF/E3DGE training checkpoint ('d' entry) initializes
    adversarial fine-tuning exactly where the reference left off. D_init_size=16
    keeps the fixed-512-channel trunk CPU-sized; batch 4 exercises the stddev
    group path (stddev_group=4)."""
    sm = rb.import_ref("project.models.stylesdf_model")

    dopt = rb._Munch(refopt.model)
    dopt.D_init_size = 16
    dopt.D_input_size = 3

    torch.manual_seed(0)
    ref = sm.Discriminator(dopt)
    rb.seed_module(ref, seed=71)
    ref.eval()

    rng = np.random.RandomState(23)
    x = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(_t(x)).numpy()

    from e3dge_tpu.models.discriminator import Discriminator

    ours = Discriminator(input_size=16, channel_base=512, channel_multiplier=int(dopt.channel_multiplier))
    v0 = ours.init(jax.random.key(0), jnp.asarray(x))
    wrapped = {"params": {"discriminator": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"discriminator": rb.sd_numpy(ref)})
    logits = ours.apply({"params": new_vars["params"]["discriminator"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4, rtol=0)


# -------------------------------------------------- 9. op CPU fallbacks


def test_upfirdn2d_golden():
    """ops.upfirdn2d vs the reference's own CPU fallback `upfirdn2d_native`
    (op/upfirdn2d.py:145-148 dispatches to it on CPU) across the three
    configurations StyleGAN2 uses: blur, up=2, down=2."""
    ref_op = rb.import_ref("project.models.op.upfirdn2d")

    from e3dge_tpu.ops import make_kernel, upfirdn2d

    rng = np.random.RandomState(23)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]), np.float32)

    cases = [
        dict(up=1, down=1, pad=(2, 1)),           # blur
        dict(up=2, down=1, pad=(2, 1)),           # upsample2x
        dict(up=1, down=2, pad=(1, 1)),           # downsample2x
    ]
    for c in cases:
        with torch.no_grad():
            ref_out = ref_op.upfirdn2d(_t(x), _t(k), **c).numpy()
        out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), **c))
        assert out.shape == ref_out.shape, c
        np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=0, err_msg=str(c))


def test_fused_leaky_relu_golden():
    """ops.fused_leaky_relu vs the reference's own CPU fallback
    (op/fused_act.py:106-118): 4D with bias, 2D with bias, no-bias."""
    ref_op = rb.import_ref("project.models.op.fused_act")

    from e3dge_tpu.ops import fused_leaky_relu

    rng = np.random.RandomState(29)
    x4 = rng.randn(2, 5, 8, 8).astype(np.float32)
    x2 = rng.randn(3, 7).astype(np.float32)
    b5 = rng.randn(5).astype(np.float32)
    b7 = rng.randn(7).astype(np.float32)

    with torch.no_grad():
        r4 = ref_op.fused_leaky_relu(_t(x4), _t(b5)).numpy()
        r2 = ref_op.fused_leaky_relu(_t(x2), _t(b7)).numpy()
        r0 = ref_op.fused_leaky_relu(_t(x4), None).numpy()
    np.testing.assert_allclose(np.asarray(fused_leaky_relu(jnp.asarray(x4), jnp.asarray(b5))), r4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_leaky_relu(jnp.asarray(x2), jnp.asarray(b7))), r2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused_leaky_relu(jnp.asarray(x4), None)), r0, atol=1e-6)


# -------------------------------------------------- 10. Ranger optimizer


def test_ranger_golden_trajectory():
    """Our optax Ranger chain vs the reference's OWN Ranger (utils/ranger.py,
    the encoder optimizer at trainer.py:1707) — 15-step trajectory parity on a
    mixed param tree: a matrix + a 4D conv kernel (both get gradient
    centralization, ranger.py:134-137) and a bias vector (no GC). 15 steps
    cover the N_sma<=5 momentum-SGD fallback (t<=5 at beta2=0.999,
    ranger.py:176-180), the rectified-RAdam branch after, and two lookahead
    syncs (k=6, alpha=0.5, ranger.py:183-189)."""
    ranger_mod = rb.import_ref("project.utils.ranger")

    from e3dge_tpu.training.steps import make_optimizer

    rng = np.random.RandomState(31)
    init = {
        "w": rng.randn(4, 3).astype(np.float32),
        "conv": rng.randn(2, 3, 3, 3).astype(np.float32),
        "b": rng.randn(5).astype(np.float32),
    }
    keys = sorted(init)
    grads = [
        {k: rng.randn(*init[k].shape).astype(np.float32) for k in keys}
        for _ in range(15)
    ]
    lr = 1e-3

    # reference side: the reference's own module, CPU torch. Copies are
    # load-bearing: torch.from_numpy shares the buffer, the reference updates
    # params in place and its GC mutates the grad tensor (ranger.py:134-137).
    tparams = {k: torch.nn.Parameter(_t(init[k].copy())) for k in keys}
    opt = ranger_mod.Ranger([tparams[k] for k in keys], lr=lr)
    ref_traj = []
    for g in grads:
        for k in keys:
            tparams[k].grad = _t(g[k].copy())
        opt.step()
        ref_traj.append({k: tparams[k].detach().numpy().copy() for k in keys})

    # our side: the production chain (scripts/train.py --optimizer ranger)
    import optax

    tx = make_optimizer(lr, "ranger")
    params = {k: jnp.asarray(init[k]) for k in keys}
    state = tx.init(params)
    for t, g in enumerate(grads):
        updates, state = tx.update({k: jnp.asarray(v) for k, v in g.items()}, state, params)
        params = optax.apply_updates(params, updates)
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(params[k]), ref_traj[t][k], rtol=2e-5, atol=1e-6,
                err_msg=f"step {t + 1}, param {k}",
            )


# -------------------------------------------------- 11. pose curriculum


def test_pose_curriculum_golden():
    """training.steps.pose_curriculum vs the reference's own
    get_curriculum_pose_lambda (data_util.py:193-210), executed unmodified on a
    minimal `self`. Pins the reference's off-by-one: the loop's post-decrement
    always fires, so the final lambda (1.0) is unreachable and steps past the
    last threshold stay at lambdas[-2] — the released stage-2 recipes
    (stage2.1.sh --progressive_pose_sampling) trained under this cap."""
    import types as _types

    data_util = rb.import_ref("project.utils.data_util")

    from e3dge_tpu.training.steps import pose_curriculum

    steps = [0, 10000, 14000, 18000, 22000, 26000]
    lambdas = [0.0, 0.15, 0.25, 0.5, 0.75, 1.0]
    ref_self = _types.SimpleNamespace(
        opt=_types.SimpleNamespace(
            progressive_pose_sampling=True,
            progressive_pose_lambda=lambdas,
            progressive_pose_steps=steps,
        )
    )
    # unbound method off the class the reference defines it on
    ref_fn = data_util.DATASETGAN_3D.get_curriculum_pose_lambda

    sched = pose_curriculum(steps, lambdas)
    probe = [0, 1, 9999, 10000, 13999, 14000, 17999, 18000, 21999, 22000,
             25999, 26000, 26001, 100000, 434000]
    for s in probe:
        ref_val = float(ref_fn(ref_self, s))
        ours = float(sched(jnp.asarray(s)))
        assert ours == pytest.approx(ref_val, abs=1e-7), f"step {s}: {ours} vs ref {ref_val}"


# -------------------------------------------------- 12. camera generation


def test_camera_params_golden():
    """render.camera.camera_params_from_angles vs the reference's own
    generate_camera_params (camera_utils.py:8-155, locations mode,
    return_calibs=True): poses, focal, near/far, viewpoint, w2c extrinsics and
    the uv-space calib matrices, on a grid that includes the near-pole
    degenerate branch (camera_utils.py:97-101 x-axis rebuild)."""
    cu = rb.import_ref("project.utils.camera_utils")

    from e3dge_tpu.render.camera import camera_params_from_angles

    azim = np.array([0.0, 0.3, -0.3, 1.2, 0.0, 0.5], np.float32)
    elev = np.array([0.0, 0.15, -0.15, 0.6, 1.5707, -1.5707], np.float32)
    res, fov, rad = 64, 6.0, 0.12

    with torch.no_grad():
        # batch must equal len(locations): the calib intrinsics are sized from
        # the batch arg even in locations mode (camera_utils.py:122-125)
        ref = cu.generate_camera_params(
            res, torch.device("cpu"), batch=len(azim),
            locations=torch.from_numpy(np.stack([azim, elev], -1)),
            fov_ang=fov, dist_radius=rad, return_calibs=True,
        )

    cam = camera_params_from_angles(jnp.asarray(azim), jnp.asarray(elev), res,
                                    fov_ang=fov, dist_radius=rad)

    np.testing.assert_allclose(np.asarray(cam.poses), ref["poses"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam.focal).reshape(-1), ref["focal"].numpy().reshape(-1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cam.near).reshape(-1), ref["near"].numpy().reshape(-1), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(cam.far).reshape(-1), ref["far"].numpy().reshape(-1), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(cam.viewpoint), ref["viewpoint"].numpy(), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(cam.extrinsics), ref["extrinsics"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(cam.calibs), ref["calibs"].numpy(), atol=1e-6)


# -------------------------------------------------- 12. ArcFace identity backbone


def test_arcface_golden():
    """training.perceptual.ArcFaceBackbone + the IDLoss face-pool path vs the
    reference's own IR-SE-50 (encoders/model_irse.py::Backbone, the IDLoss
    facenet at losses/id_loss.py:13-16) with seeded weights AND randomized
    BatchNorm running stats (eval mode reads them, so mapping bugs can't hide
    behind the fresh mean=0/var=1). Also pins extract_feats' AdaptiveAvgPool2d
    (id_loss.py:20,26): the 188x188 crop -> 112 face pool is adaptive POOLING,
    not bilinear interpolation."""
    irse = rb.import_ref("project.models.encoders.model_irse")

    torch.manual_seed(0)
    ref = irse.Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    rb.seed_module(ref, seed=83)
    rb.seed_buffers(ref, seed=84)
    ref.eval()

    rng = np.random.RandomState(37)
    x112 = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    x256 = rng.uniform(-1, 1, (2, 3, 256, 256)).astype(np.float32)

    pool = torch.nn.AdaptiveAvgPool2d((112, 112))
    with torch.no_grad():
        ref_emb = ref(_t(x112)).numpy()
        # extract_feats (id_loss.py:23-27): crop rows 35:223, cols 32:220, pool
        ref_emb_256 = ref(pool(_t(x256)[:, :, 35:223, 32:220])).numpy()

    from e3dge_tpu.ops import adaptive_avg_pool2d
    from e3dge_tpu.training.perceptual import ArcFaceBackbone
    from e3dge_tpu.utils.torch_ckpt import ingest_perceptual

    ours = ArcFaceBackbone()
    v0 = ours.init(jax.random.key(0), jnp.zeros((1, 3, 112, 112)))
    # arcface rules expect paths under a 'facenet' wrapper (as inside IDLoss)
    wrapped = {coll: {"facenet": tree} for coll, tree in v0.items()}
    new_vars, missing = ingest_perceptual(wrapped, rb.sd_numpy(ref), "arcface", strict=True)
    var = {coll: tree["facenet"] for coll, tree in new_vars.items()}

    emb = np.asarray(ours.apply(var, jnp.asarray(x112)))
    np.testing.assert_allclose(emb, ref_emb, atol=2e-4, rtol=0)

    cropped = adaptive_avg_pool2d(jnp.asarray(x256)[:, :, 35:223, 32:220], (112, 112))
    emb256 = np.asarray(ours.apply(var, cropped))
    np.testing.assert_allclose(emb256, ref_emb_256, atol=2e-4, rtol=0)


# -------------------------------------------------- 13. GAN losses + autodiff parity


def test_gan_losses_golden():
    """training.losses vs the reference's own losses/gan_loss.py functions on
    identical inputs: d_logistic_loss, g_nonsaturating_loss, viewpoints_loss
    (smooth-L1), eikonal_loss (both with and without the minimal-surface term),
    path regularization, and the VQGAN adaptive-D weight."""
    gl = rb.import_ref("project.losses.gan_loss")

    from e3dge_tpu.training import losses as L

    rng = np.random.RandomState(41)
    real = rng.randn(6, 1).astype(np.float32)
    fake = rng.randn(6, 1).astype(np.float32)

    np.testing.assert_allclose(
        float(L.d_logistic_loss(jnp.asarray(real), jnp.asarray(fake))),
        float(gl.d_logistic_loss(_t(real), _t(fake))), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(L.g_nonsaturating_loss(jnp.asarray(fake))),
        float(gl.g_nonsaturating_loss(_t(fake))), rtol=1e-6,
    )

    vp_pred = rng.randn(4, 2).astype(np.float32)
    vp_gt = (vp_pred + 0.3 * rng.randn(4, 2)).astype(np.float32)  # mixed <1 / >1 gaps
    np.testing.assert_allclose(
        float(L.viewpoint_loss(jnp.asarray(vp_pred), jnp.asarray(vp_gt))),
        float(gl.viewpoints_loss(_t(vp_pred), _t(vp_gt))), rtol=1e-6,
    )

    eik_term = rng.randn(2, 64, 3).astype(np.float32)
    sdf = (0.05 * rng.randn(2, 64, 1)).astype(np.float32)
    r_eik, r_ms = gl.eikonal_loss(_t(eik_term), _t(sdf))
    o_eik, o_ms = L.eikonal_loss(jnp.asarray(eik_term), jnp.asarray(sdf))
    np.testing.assert_allclose(float(o_eik), float(r_eik), rtol=1e-5)
    np.testing.assert_allclose(float(o_ms), float(r_ms), rtol=1e-5)
    r_eik_only, _ = gl.eikonal_loss(_t(eik_term), None)
    o_eik_only, o_zero = L.eikonal_loss(jnp.asarray(eik_term), None)
    np.testing.assert_allclose(float(o_eik_only), float(r_eik_only), rtol=1e-5)
    assert float(o_zero) == 0.0

    # path regularization: identical latent grads in, compare penalty + mean.
    # (The grads themselves are produced by autodiff in each framework's train
    # step; the d_r1 test below pins grad parity through a real network.)
    latent_grads = rng.randn(4, 9, 32).astype(np.float32)
    mean_pl = 0.37
    fake_img = torch.zeros(4, 3, 8, 8)
    lat = torch.zeros(4, 9, 32, requires_grad=True)
    # run the reference path math directly on the grads via its formula lines
    ref_pl = torch.sqrt(_t(latent_grads).pow(2).sum(2).mean(1))
    ref_mean = mean_pl + 0.01 * (ref_pl.mean() - mean_pl)
    ref_penalty = (ref_pl - ref_mean).pow(2).mean()
    o_pen, o_mean = L.path_lengths_from_grads(jnp.asarray(latent_grads), mean_pl)
    np.testing.assert_allclose(float(o_pen), float(ref_penalty), rtol=1e-5)
    np.testing.assert_allclose(float(o_mean), float(ref_mean), rtol=1e-5)

    # adaptive D weight: same tiny graph, reference computes grads itself
    last = torch.nn.Parameter(_t(rng.randn(8, 4).astype(np.float32)))
    inp = _t(rng.randn(4).astype(np.float32))
    h = last @ inp
    recon_loss = (h**2).sum()
    g_loss = torch.sin(h).sum()
    w_ref = gl.calculate_adaptive_weight(recon_loss, g_loss, last, disc_weight_max=1.0)
    recon_g = torch.autograd.grad((last @ inp).pow(2).sum(), last)[0].numpy()
    g_g = torch.autograd.grad(torch.sin(last @ inp).sum(), last)[0].numpy()
    w_ours = L.calculate_adaptive_weight({"w": jnp.asarray(recon_g)}, {"w": jnp.asarray(g_g)})
    np.testing.assert_allclose(float(w_ours), float(w_ref), rtol=1e-5)

    # adopt_weight gating
    assert float(L.adopt_weight(0.8, 5, threshold=10, value=0.0)) == 0.0
    np.testing.assert_allclose(
        float(L.adopt_weight(0.8, 15, threshold=10, value=0.0)),
        float(gl.adopt_weight(0.8, 15, threshold=10, value=0.0)), rtol=1e-6,
    )


def test_d_r1_grad_parity_golden(refopt):
    """Autodiff parity: our jax.grad R1 penalty through the INGESTED full-res D
    equals the reference's torch.autograd d_r1_loss through its own
    Discriminator (gan_loss.py:36-42) — the first golden that pins a GRADIENT
    computed by the two frameworks' autodiff against each other, not just a
    forward pass."""
    sm = rb.import_ref("project.models.stylesdf_model")
    gl = rb.import_ref("project.losses.gan_loss")

    dopt = rb._Munch(refopt.model)
    dopt.D_init_size = 16
    dopt.D_input_size = 3

    torch.manual_seed(0)
    ref = sm.Discriminator(dopt)
    rb.seed_module(ref, seed=89)
    ref.eval()

    rng = np.random.RandomState(43)
    x = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)

    xt = _t(x).requires_grad_(True)
    real_pred = ref(xt)
    ref_r1 = float(gl.d_r1_loss(real_pred, xt))

    from e3dge_tpu.models.discriminator import Discriminator
    from e3dge_tpu.training.losses import d_r1_penalty

    ours = Discriminator(input_size=16, channel_base=512, channel_multiplier=int(dopt.channel_multiplier))
    v0 = ours.init(jax.random.key(0), jnp.asarray(x))
    wrapped = {"params": {"discriminator": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"discriminator": rb.sd_numpy(ref)})
    var = {"params": new_vars["params"]["discriminator"]}

    r1 = float(d_r1_penalty(lambda v, xx: ours.apply(v, xx), var, jnp.asarray(x)))
    np.testing.assert_allclose(r1, ref_r1, rtol=5e-4)


# -------------------------------------------------- 14. SirenGeneratorDDF


def test_siren_ddf_golden(refopt):
    """SirenGeneratorDDF (volume_renderer.py:561-632): executed proof that the
    reference's DDF ablation class is dead code upstream, plus a golden pin of
    the one mode that runs.

    (a) The class cannot instantiate: its __init__ calls
    super().__init__(D=8, ...) without the required `opt` positional
    (volume_renderer.py:571-577 vs :136-148) — consistent with its only use
    site being commented out (:716). (b) Even base-initialized, the feature-tap
    forward crashes for every input rank. (c) The no-tap mode runs and must
    match our forward_ddf (models/siren.py), which implements the class's
    documented intent with working feature taps."""
    vr = rb.import_ref("project.utils.volume_renderer")

    # (a) broken constructor, executed:
    with pytest.raises(TypeError):
        vr.SirenGeneratorDDF()

    torch.manual_seed(0)
    ref = vr.SirenGeneratorDDF.__new__(vr.SirenGeneratorDDF)
    vr.SirenGenerator.__init__(ref, refopt.rendering, D=8, W=256, style_dim=256)
    rb.seed_module(ref, seed=97)
    ref.eval()

    # (b) the feature-tap forward is ALSO broken for every input rank:
    # FiLMSiren hardcodes a 5D gamma broadcast (volume_renderer.py:118), so a
    # flat [B,N,6] batch silently blows up to 5D and crashes the view concat
    # (:606), while a spatial [B,H,W,S,6] batch crashes the feats concat
    # against the 3D zeros init (:580-582, :623). Executed proof of dead-code
    # status (the ledger's by-design-skip claim, now a fact not an opinion):
    rng = np.random.RandomState(47)
    B, S = 2, 4
    styles = (0.3 * rng.randn(B, 9, 256)).astype(np.float32)

    flat = _t(rng.uniform(-1, 1, (B, 48, 6)).astype(np.float32))
    spatial = _t(rng.uniform(-1, 1, (B, 3, 3, S, 6)).astype(np.float32))
    with torch.no_grad():
        with pytest.raises(RuntimeError):
            ref(flat, _t(styles), return_x=True, feat_layer=3, multi_layer_loss=False)
        with pytest.raises(RuntimeError):
            ref(spatial, _t(styles), return_x=True, feat_layer=3, multi_layer_loss=False)
        with pytest.raises(RuntimeError):
            ref(spatial, _t(styles), return_x=True, feat_layer=-1, multi_layer_loss=True)

    # (c) the one mode that DOES run (no feature taps requested) must match our
    # forward_ddf's 'out' head on ingested weights — pinning the shared math.
    pts = np.asarray(spatial[..., :3])
    views = np.asarray(spatial[..., 3:])
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    spatial_n = _t(np.concatenate([pts, views], -1))
    with torch.no_grad():
        ref_out = ref(spatial_n, _t(styles)).numpy()  # output_features=True concat

    from e3dge_tpu.models.siren import SirenGenerator

    ours = SirenGenerator(depth=8, width=256, style_dim=256)
    v0 = ours.init(
        jax.random.key(0), jnp.zeros((B, 3, 3, S, 3)), jnp.zeros((B, 3, 3, S, 3)), jnp.zeros((B, 9, 256))
    )
    wrapped = {"params": {"generator": {"renderer": {"network": v0["params"]}}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "renderer.network.")}
    params = _ingest_standalone(wrapped, sds)["params"]["generator"]["renderer"]["network"]

    ret = ours.apply(
        {"params": params}, pts, views, styles,
        feat_layer=-1, multi_layer=False, method=SirenGenerator.forward_ddf,
    )
    np.testing.assert_allclose(
        np.asarray(ret["out"]), ref_out[..., :4], atol=3e-3, rtol=0, err_msg="rgb+sdf head"
    )
    # 'feats' in the runnable mode are the final view features, which the
    # reference appends to `outputs` when output_features=True (:631-632)
    np.testing.assert_allclose(
        np.asarray(ret["feats"]), ref_out[..., 4:], atol=3e-3, rtol=0, err_msg="view features"
    )


# -------------------------------------------------- 15. e4e Baseline encoder


@pytest.mark.slow
def test_e4e_encoder_golden(refopt):
    """encoders.variants.Encoder4EditingHybrid vs the reference's own
    Encoder4EditingHybridBaseline (e4e_encoders.py:378-497) — the e4e variant
    the reference factory actually reaches (encoders/__init__.py:30; the
    non-Baseline class at :239 cannot instantiate: it appends to
    self.styles_pigan before creating it). Checked at the Inference stage (all
    deltas) AND an intermediate progressive stage (4), which exercises the
    stage gate against the reference's stage-limited delta loop, including
    rows whose FPN source (p2/p1) lies beyond the active stage."""
    e4e = rb.import_ref("project.models.encoders.e4e_encoders")
    topt = rb._Munch(refopt.training)

    # non-Baseline is broken upstream, executed proof:
    with pytest.raises(AttributeError):
        e4e.Encoder4EditingHybrid(50, "ir_se", topt)

    torch.manual_seed(0)
    ref = e4e.Encoder4EditingHybridBaseline(50, "ir_se", topt)
    rb.seed_module(ref, seed=101)
    rb.seed_buffers(ref, seed=102)
    ref.eval()

    rng = np.random.RandomState(53)
    x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)

    from e3dge_tpu.models.encoders.variants import Encoder4EditingHybrid
    from e3dge_tpu.utils.config import EncoderConfig

    ours = Encoder4EditingHybrid(EncoderConfig())
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {
        "params": {"encoder": v0["params"]},
        "batch_stats": {"encoder": v0["batch_stats"]},
    }
    new_vars = _ingest_standalone(wrapped, {"encoder": rb.sd_numpy(ref)})
    var = {
        "params": new_vars["params"]["encoder"],
        "batch_stats": new_vars["batch_stats"]["encoder"],
    }

    for stage in [18, 4]:
        ref.progressive_stage = e4e.ProgressiveStage(min(stage, 18))
        with torch.no_grad():
            ref_thumb, ref_sg = ref(_t(x))
        thumb, sg = ours.apply(var, jnp.asarray(x), train=False, stage=stage)
        np.testing.assert_allclose(
            np.asarray(thumb), ref_thumb.numpy(), atol=1e-3, rtol=0, err_msg=f"thumb stage={stage}"
        )
        np.testing.assert_allclose(
            np.asarray(sg), ref_sg.numpy(), atol=1e-3, rtol=0, err_msg=f"stylegan stage={stage}"
        )


# -------------------------------------------------- 16. ReStyle w-space encoder


def test_backbone_encoder_renderer_golden(refopt):
    """encoders.variants.BackboneEncoderRenderer vs the reference's own
    (restyle_psp_encoders.py:138-187), at the factory's w-space instantiation
    (encoders/__init__.py:34-37: BackboneEncoderRenderer(50, 'ir_se', 2, opts)).
    One 256-d + one 512-d GradualStyleBlock off the final 16² trunk map,
    repeated to the 9/10 W+ rows."""
    rpe = rb.import_ref("project.models.encoders.restyle_psp_encoders")
    topt = rb._Munch(refopt.training)
    assert int(topt.input_nc) == 3

    torch.manual_seed(0)
    ref = rpe.BackboneEncoderRenderer(50, "ir_se", 2, topt)
    rb.seed_module(ref, seed=103)
    rb.seed_buffers(ref, seed=104)
    ref.eval()

    rng = np.random.RandomState(59)
    x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref_thumb, ref_dec = ref(_t(x))

    from e3dge_tpu.models.encoders.variants import BackboneEncoderRenderer
    from e3dge_tpu.utils.config import EncoderConfig

    ours = BackboneEncoderRenderer(EncoderConfig())
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {
        "params": {"encoder": v0["params"]},
        "batch_stats": {"encoder": v0["batch_stats"]},
    }
    new_vars = _ingest_standalone(wrapped, {"encoder": rb.sd_numpy(ref)})
    thumb, dec = ours.apply(
        {"params": new_vars["params"]["encoder"], "batch_stats": new_vars["batch_stats"]["encoder"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(thumb), ref_thumb.numpy(), atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(dec), ref_dec.numpy(), atol=1e-3, rtol=0)


# -------------------------------------------------- 17. LPIPS (alex)


def test_lpips_golden():
    """training.perceptual.LPIPS vs the reference's own losses/lpips package:
    z_score scaling (networks.py:40-56), the AlexNet trunk tap layout
    (:81-88), normalize_activation's exact epsilon layout (utils.py:6-9:
    +1e-8 inside the sqrt, +1e-10 on the norm), RAW lin heads and the
    sum/batch reduction (lpips.py:33-39).

    The trunk weights are seeded and exported to both sides: torchvision is
    absent in this env, so refbridge injects the fixed public
    torchvision-AlexNet `.features` layout the reference slices by index; the
    lin heads get random non-negative weights (the released v0.1 heads are
    non-negative by construction). LPIPS.__init__ is bypassed only because it
    downloads weights (zero egress) — `forward` is the reference's own."""
    lnet = rb.import_ref("project.losses.lpips.networks")
    llp = rb.import_ref("project.losses.lpips.lpips")

    torch.manual_seed(0)
    net = lnet.get_network("alex")
    rb.seed_module(net, seed=107)
    lin = lnet.LinLayers(net.n_channels_list)
    g = torch.Generator().manual_seed(108)
    with torch.no_grad():
        for seq in lin:
            w = seq[1].weight
            w.copy_(0.1 * torch.rand(w.shape, generator=g))

    ref = llp.LPIPS.__new__(llp.LPIPS)
    torch.nn.Module.__init__(ref)
    ref.net, ref.lin = net, lin
    ref.eval()

    rng = np.random.RandomState(61)
    x = rng.uniform(-1, 1, (3, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_val = float(ref(_t(x), _t(y)))

    from e3dge_tpu.training.perceptual import LPIPS
    from e3dge_tpu.utils.torch_ckpt import ingest_perceptual

    # richzhang-layout sd (what ingest_perceptual consumes): trunk convs under
    # net.slice{s}.{tv_idx} and lin heads under lin{i}.model.1
    tv_idx = {1: 0, 2: 3, 3: 6, 4: 8, 5: 10}
    sd = {}
    for s, fi in tv_idx.items():
        sd[f"net.slice{s}.{fi}.weight"] = net.layers[fi].weight.detach().numpy()
        sd[f"net.slice{s}.{fi}.bias"] = net.layers[fi].bias.detach().numpy()
    for i, seq in enumerate(lin):
        sd[f"lin{i}.model.1.weight"] = seq[1].weight.detach().numpy()

    ours = LPIPS()
    v0 = ours.init(jax.random.key(0), jnp.zeros((1, 3, 64, 64)), jnp.zeros((1, 3, 64, 64)))
    new_vars, _ = ingest_perceptual(v0, sd, "lpips", strict=True)

    val = float(ours.apply(new_vars, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(val, ref_val, rtol=1e-4)

    # per-sample variant must average back to the batch value
    per = ours.apply(new_vars, jnp.asarray(x), jnp.asarray(y), per_sample=True)
    np.testing.assert_allclose(float(jnp.mean(per)), val, rtol=1e-5)


# -------------------------------------------------- 18. PIFu geometry + EMA


def test_pifu_geometry_golden():
    """render.camera.project_points{,_orthogonal} + ops.grid_sample{,_mm} vs
    the reference's own vendored geometry (vendor/pifu/lib/geometry.py:64-130:
    index / orthogonal / perspective). The local-net golden pins the composed
    query chain; this pins each primitive, including the ORTHOGONAL projection
    mode (upstream-PIFu projection_mode parity) and out-of-range uv samples
    (zeros padding, align_corners=False)."""
    geo = rb.import_ref("lib.geometry")

    from e3dge_tpu.ops import grid_sample, grid_sample_mm
    from e3dge_tpu.render.camera import (
        camera_params_from_angles,
        project_points,
        project_points_orthogonal,
    )

    cam = camera_params_from_angles(
        jnp.asarray([0.2, -0.3]), jnp.asarray([0.1, 0.05]), 64, fov_ang=6.0, dist_radius=0.12
    )
    calibs = np.asarray(cam.calibs, np.float32)
    rng = np.random.RandomState(67)
    pts = (0.2 * rng.randn(2, 3, 40)).astype(np.float32)

    with torch.no_grad():
        ref_persp = geo.perspective(_t(pts), _t(calibs)).numpy()
        ref_orth = geo.orthogonal(_t(pts), _t(calibs)).numpy()
    np.testing.assert_allclose(
        np.asarray(project_points(jnp.asarray(pts), jnp.asarray(calibs))), ref_persp,
        atol=1e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(project_points_orthogonal(jnp.asarray(pts), jnp.asarray(calibs))), ref_orth,
        atol=1e-6, rtol=0,
    )

    # index: include samples outside [-1,1] to pin the zeros-padding border
    feat = rng.randn(2, 5, 8, 8).astype(np.float32)
    uv = rng.uniform(-1.3, 1.3, (2, 2, 24)).astype(np.float32)
    with torch.no_grad():
        ref_idx = geo.index(_t(feat), _t(uv)).numpy()  # [B, C, N]
    grid = jnp.asarray(uv).transpose(0, 2, 1)[:, :, None, :]  # [B, N, 1, 2]
    ours_idx = np.asarray(grid_sample(jnp.asarray(feat), grid))[:, :, :, 0]
    np.testing.assert_allclose(ours_idx, ref_idx, atol=1e-5, rtol=0)
    ours_mm = np.asarray(grid_sample_mm(jnp.asarray(feat), grid))[:, :, :, 0]
    np.testing.assert_allclose(ours_mm, ref_idx, atol=1e-5, rtol=0)


def test_ema_accumulate_golden():
    """train_utils.ema_update vs the reference's own accumulate
    (training_utils.py:40-45) over a 3-step trajectory with a changing model."""
    tu = rb.import_ref("project.utils.training_utils")

    from e3dge_tpu.training.train_utils import ema_update

    rng = np.random.RandomState(71)
    m_ema = torch.nn.Linear(4, 3)
    m_live = torch.nn.Linear(4, 3)
    with torch.no_grad():
        for p in list(m_ema.parameters()) + list(m_live.parameters()):
            p.copy_(_t(rng.randn(*p.shape).astype(np.float32)))

    # .copy() is load-bearing: jax zero-copies CPU numpy views, and the
    # reference's accumulate mutates the torch storage in place
    ours_ema = {k: jnp.asarray(v.detach().numpy().copy()) for k, v in m_ema.named_parameters()}
    decay = 0.5 ** (32 / 10_000)
    for step in range(3):
        with torch.no_grad():
            for p in m_live.parameters():
                p.add_(_t(0.1 * rng.randn(*p.shape).astype(np.float32)))
        tu.accumulate(m_ema, m_live, decay=decay)
        live = {k: jnp.asarray(v.detach().numpy().copy()) for k, v in m_live.named_parameters()}
        ours_ema = ema_update(ours_ema, live, decay=decay)
        for k, p in m_ema.named_parameters():
            np.testing.assert_allclose(
                np.asarray(ours_ema[k]), p.detach().numpy(), rtol=1e-6,
                err_msg=f"step {step}, {k}",
            )


# -------------------------------------------------- 19. mesh frustum alignment


def test_align_volume_golden():
    """utils.mesh.align_volume vs the reference's own mesh_utils.align_volume
    (mesh_utils.py:17-44) — the frustum->cube SDF warp feeding marching cubes
    on the mesh/3D-eval paths. This golden CAUGHT a real parity bug: our warp
    scaled xy by z/center (shrinking near slices) where the reference scales by
    linspace(far/near -> 1) (expanding them, cube extent = far slice), with
    border-clamped sampling and out-of-frustum cells overwritten with +1."""
    mu = rb.import_ref("project.utils.mesh_utils")

    from e3dge_tpu.utils.mesh import align_volume

    rng = np.random.RandomState(73)
    # batch 1: the reference builds a batch-1 grid, so torch grid_sampler
    # rejects larger batches (mesh_utils.py:29-38); callers run it per-volume
    vol = rng.randn(1, 12, 12, 10, 1).astype(np.float32)

    with torch.no_grad():
        ref_out = mu.align_volume(_t(vol)).numpy()
    ours = np.asarray(align_volume(jnp.asarray(vol)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-5, rtol=0)

    # non-default frustum bounds
    with torch.no_grad():
        ref_out2 = mu.align_volume(_t(vol), near=0.8, far=1.3).numpy()
    ours2 = np.asarray(align_volume(jnp.asarray(vol), near=0.8, far=1.3))
    np.testing.assert_allclose(ours2, ref_out2, atol=1e-5, rtol=0)


# -------------------------------------------------- 20. secant march (dead upstream)


def test_secant_march_dead_code_proof():
    """Executed proof that the reference's render_functions.run_Secant_method
    (vendor/pifu/lib/geometry.py:131-190) is dead code: its final update line
    reads the undefined name `L` (:189), so ANY call crashes on the first
    iteration — consistent with the class never being referenced outside its
    own module. Our find_surface_secant (render/rays.py, component #34) is
    pinned by an analytic sphere golden instead."""
    geo = rb.import_ref("lib.geometry")

    rf = geo.render_functions()
    rf.siren = lambda p, z, ray_directions=None: torch.zeros(p.shape[0], 1, p.shape[2], 4)

    B, N = 2, 3
    f_low = -0.2 * torch.ones(B, N)
    f_high = 0.3 * torch.ones(B, N)
    z_low = 0.9 * torch.ones(B, N)
    z_high = 1.1 * torch.ones(B, N)
    origins = torch.zeros(B, N, 3)
    dirs = torch.ones(B, N, 3)
    with pytest.raises(NameError):
        rf.run_Secant_method(f_low, f_high, z_low, z_high, 1, origins, dirs,
                             torch.zeros(B, 16), logit_tau=0.0)


# -------------------------------------------------- 21. geometry losses


def test_geometry_losses_golden():
    """training.losses.{hit_prob_consistency_loss, depth_consistency_loss} vs
    the reference's own ConsistencyLoss / DepthLoss (losses/geometry_loss.py:
    21-110). The classes are dormant upstream (imported nowhere — the cycle
    runner weights the que loss by hit prob directly), but they are the
    documented neuRay-style semantics our cycle consistency options replicate;
    both DepthLoss modes (default l2, smooth_l1 beta=0.05) pinned."""
    glm = rb.import_ref("project.losses.geometry_loss")

    from e3dge_tpu.training import losses as L

    rng = np.random.RandomState(79)
    hit_gt = rng.uniform(0.01, 0.99, (2, 4, 4, 6, 1)).astype(np.float32)
    hit_pred = rng.uniform(0.01, 0.99, (2, 4, 4, 6, 1)).astype(np.float32)

    cl = glm.ConsistencyLoss({})
    ref_c = float(cl(_t(hit_pred), _t(hit_gt)))
    ours_c = float(L.hit_prob_consistency_loss(jnp.asarray(hit_pred), jnp.asarray(hit_gt)))
    np.testing.assert_allclose(ours_c, ref_c, rtol=1e-5)

    depth_pred = rng.uniform(0.85, 1.15, (2, 8, 8)).astype(np.float32)
    depth_gt = (depth_pred + 0.1 * rng.randn(2, 8, 8)).astype(np.float32)
    info = {"depth": _t(depth_gt), "depth_range": _t(np.tile([0.88, 1.12], (2, 1)))}

    dl_sl1 = glm.DepthLoss({"depth_loss_type": "smooth_l1"})
    ref_sl1 = float(dl_sl1({"depth_mean": _t(depth_pred)}, info))
    ours_sl1 = float(L.depth_consistency_loss(jnp.asarray(depth_pred), jnp.asarray(depth_gt)))
    np.testing.assert_allclose(ours_sl1, ref_sl1, rtol=1e-5)

    dl_l2 = glm.DepthLoss({})
    ref_l2 = float(dl_l2({"depth_mean": _t(depth_pred)}, info))
    ours_l2 = float(L.mse(jnp.asarray(depth_pred), jnp.asarray(depth_gt)))
    np.testing.assert_allclose(ours_l2, ref_l2, rtol=1e-5)


# -------------------------------------------------- 22. PosEncoding + view swap


def test_posenc_and_swap_golden():
    """ops.pos_encoding vs the reference's own PosEncoding (misc_utils.py:
    148-184; the cycle runner's 3D-point embedding, e3dge_full_runner.py:68-74)
    at all three reachable configs (3ch/7freq, 1ch/7freq, 3ch/1freq) plus the
    logscale=False branch; and steps.swap_tree vs the reference's own
    _swap_odd_even_index_view (training_utils.py:98-119, the cycle pair-view
    swap at e3dge_full_runner.py:480-488)."""
    mu = rb.import_ref("project.utils.misc_utils")
    tu = rb.import_ref("project.utils.training_utils")

    from e3dge_tpu.ops import pos_encoding
    from e3dge_tpu.training.steps import swap_tree

    rng = np.random.RandomState(83)
    for ch, nf, logscale in [(3, 7, True), (1, 7, True), (3, 1, True), (3, 5, False)]:
        pe = mu.PosEncoding(ch, N_freqs=nf, logscale=logscale)
        x = rng.uniform(-2, 2, (4, ch)).astype(np.float32)
        with torch.no_grad():
            ref_out = pe(_t(x)).numpy()
        ours = np.asarray(pos_encoding(jnp.asarray(x), n_freqs=nf, logscale=logscale))
        assert ours.shape[-1] == pe.out_channels
        np.testing.assert_allclose(ours, ref_out, atol=1e-6, rtol=0, err_msg=f"{ch}ch/{nf}f/{logscale}")

    x = rng.randn(6, 3, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_sw = tu._swap_odd_even_index_view(_t(x)).numpy()
        ref_dup = tu._duplicate_odd_even_index_view(_t(x)).numpy()
    ours_sw = np.asarray(swap_tree({"a": jnp.asarray(x)})["a"])
    np.testing.assert_allclose(ours_sw, ref_sw, atol=0)
    # duplicate = swap of the swap's even rows == even rows repeated
    np.testing.assert_allclose(ref_dup, np.repeat(x[0::2], 2, axis=0), atol=0)
    assert tu._swap_odd_even_index_view(None) is None


# -------------------------------------------------- 23. ReStyle hybrid encoder


@pytest.mark.slow
def test_hybrid_backbone_encoder_golden(refopt):
    """encoders.variants.HybridBackboneEncoder vs the reference's own
    (restyle_psp_encoders.py:58-89): 9 thumb + 10 decoder GradualStyleBlocks,
    all reading the final 16² trunk map. The reference hardcodes mode='ir' in
    its super().__init__ (:66) regardless of the argument — pinned here by
    instantiating with 'ir_se' and matching with plain-IR bottlenecks."""
    rpe = rb.import_ref("project.models.encoders.restyle_psp_encoders")
    topt = rb._Munch(refopt.training)

    torch.manual_seed(0)
    ref = rpe.HybridBackboneEncoder(50, "ir_se", opts=topt)  # 'ir_se' is ignored
    rb.seed_module(ref, seed=109)
    rb.seed_buffers(ref, seed=110)
    ref.eval()

    rng = np.random.RandomState(87)
    x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref_thumb, ref_dec = ref(_t(x))

    from e3dge_tpu.models.encoders.variants import HybridBackboneEncoder
    from e3dge_tpu.utils.config import EncoderConfig

    ours = HybridBackboneEncoder(EncoderConfig(mode="ir"))
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {
        "params": {"encoder": v0["params"]},
        "batch_stats": {"encoder": v0["batch_stats"]},
    }
    new_vars = _ingest_standalone(wrapped, {"encoder": rb.sd_numpy(ref)})
    thumb, dec = ours.apply(
        {"params": new_vars["params"]["encoder"], "batch_stats": new_vars["batch_stats"]["encoder"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(thumb), ref_thumb.numpy(), atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(dec), ref_dec.numpy(), atol=1e-3, rtol=0)


# -------------------------------------------------- 24. volume-D encoder


def test_vrd_encoder_golden(refopt):
    """encoders.factory.VolumeRenderDiscriminatorEncoder vs the reference's own
    (stylesdf_model.py:1422-1459, the factory's 'VolumeRenderDiscriminator'
    encoder_type): D trunk + separate kernel-2 wplus_latents_pred_conv head
    -> [B, 9, 256] renderer W+ offsets, plus the pred_viewpoints=True path.
    This golden drove an architecture fix: ours previously repurposed
    final_conv as the latents head instead of keeping the reference's separate
    heads (a reference ckpt of this encoder type would not have ingested)."""
    sm = rb.import_ref("project.models.stylesdf_model")

    torch.manual_seed(0)
    ref = sm.VolumeRenderDiscriminatorEncoder(refopt)
    rb.seed_module(ref, seed=113)
    ref.eval()

    init_size = int(refopt.model.renderer_spatial_output_dim)
    rng = np.random.RandomState(91)
    x = rng.uniform(-1, 1, (2, 3, init_size, init_size)).astype(np.float32)
    with torch.no_grad():
        ref_lat, ref_none = ref(_t(x))
        ref_vp = ref(_t(x), pred_viewpoints=True)
    assert ref_none is None

    from e3dge_tpu.models.encoders.factory import VolumeRenderDiscriminatorEncoder
    from e3dge_tpu.utils.config import EncoderConfig

    ours = VolumeRenderDiscriminatorEncoder(EncoderConfig(), init_size=init_size)
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {"params": {"volume_discriminator": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"volume_discriminator": rb.sd_numpy(ref)})
    var = {"params": new_vars["params"]["volume_discriminator"]}

    lat, none = ours.apply(var, jnp.asarray(x))
    assert none is None
    np.testing.assert_allclose(np.asarray(lat), ref_lat.numpy(), atol=2e-4, rtol=0)
    vp = ours.apply(var, jnp.asarray(x), pred_viewpoints=True)
    np.testing.assert_allclose(np.asarray(vp), ref_vp.numpy(), atol=2e-4, rtol=0)


# -------------------------------------------------- 25. legacy StyleGAN encoder


def test_stylegan_encoder_golden(refopt):
    """encoders.factory.StyleGANEncoder vs the reference's own
    (stylesdf_model.py:1620-1679, the decoder-latent half of the 'OldEncoder'
    factory branch): SG2-D trunk + minibatch stddev + final conv + 2-layer
    EqualLinear head -> [B, 2*n_latent, 512] decoder W+ codes (the reference's
    head really emits 2*n_latent rows — style_dim doubling at :1629 and the
    *2 at :1648 compound; replicated)."""
    sm = rb.import_ref("project.models.stylesdf_model")

    dopt = rb._Munch(refopt.model)
    dopt.D_init_size = 16
    dopt.D_input_size = 3

    torch.manual_seed(0)
    ref = sm.StyleGANEncoder(dopt, n_latent=10)
    rb.seed_module(ref, seed=127)
    ref.eval()

    rng = np.random.RandomState(93)
    x = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        (ref_dec,) = ref(_t(x))

    from e3dge_tpu.models.encoders.factory import StyleGANEncoder
    from e3dge_tpu.utils.config import EncoderConfig

    ours = StyleGANEncoder(
        EncoderConfig(), input_size=16, channel_multiplier=int(dopt.channel_multiplier)
    )
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    wrapped = {"params": {"discriminator": v0["params"]}}
    new_vars = _ingest_standalone(wrapped, {"discriminator": rb.sd_numpy(ref)})
    none, dec = ours.apply({"params": new_vars["params"]["discriminator"]}, jnp.asarray(x))
    assert none is None
    assert dec.shape == tuple(ref_dec.shape)
    np.testing.assert_allclose(np.asarray(dec), ref_dec.numpy(), atol=3e-4, rtol=0)


# -------------------------------------------------- 26. legacy encoders (dead upstream)


def test_legacy_encoders_dead_code_proofs(refopt):
    """Executed proofs that the remaining legacy encoder classes are broken
    upstream — our factory variants implement their declared intent and these
    proofs pin WHY no output golden is possible:

    * DEncoder.forward reads `self.wplus_latents_pred_conv` (its __init__ only
      declares renderer/stylegan conv heads; the wplus head is commented out,
      stylesdf_model.py:1704-1710 vs :1737) -> AttributeError.
    * VolumeStyleEncoder.forward reads `self.avg_latent`, which its parent
      accepts as an argument but never stores (:1423-1432 vs :1498-1500)
      -> AttributeError.
    * FullEncoder.forward unpacks the renderer encoder's 2-element return
      into three names (:1756-1757) -> ValueError.
    """
    sm = rb.import_ref("project.models.stylesdf_model")

    dopt = rb._Munch(refopt.model)
    dopt.D_init_size = 16
    dopt.D_input_size = 3
    x16 = torch.zeros(4, 3, 16, 16)
    x64 = torch.zeros(2, 3, int(refopt.model.renderer_spatial_output_dim),
                      int(refopt.model.renderer_spatial_output_dim))

    torch.manual_seed(0)
    denc = sm.DEncoder(dopt, n_latent=10, avg_latent=None)
    with torch.no_grad(), pytest.raises(AttributeError):
        denc(x16)

    vse = sm.VolumeStyleEncoder(refopt, avg_latent=torch.zeros(1, 9, 256),
                                stylegan_avg_latent=torch.zeros(10, 512))
    with torch.no_grad(), pytest.raises(AttributeError):
        vse(x64)

    full = sm.FullEncoder(sm.VolumeRenderDiscriminatorEncoder(refopt),
                          sm.StyleGANEncoder(dopt, n_latent=10))
    with torch.no_grad(), pytest.raises(ValueError):
        full(x16, x64)


# -------------------------------------------------- 27. full Generator (z -> image)


@pytest.mark.slow
def test_full_generator_golden(refopt):
    """models.generator.Generator vs the reference's own full Generator
    (stylesdf_model.py:800-1020) in ONE forward: z -> 3-layer mapping ->
    volume render -> decoder, with explicit noise. The renderer and decoder
    are pinned individually elsewhere; this pins the GLUE — the z->w mapping
    MLP (bypassed by the other goldens' input_is_latent paths), the [B,256] w
    broadcast into the 9-row FiLM stack, and the renderer-w -> decoder-style
    plumbing (decoder_latent = latent, :986-1001)."""
    sm = rb.import_ref("project.models.stylesdf_model")

    R, S, DEC = 16, 8, 32
    mopt = rb._Munch(refopt.model)
    mopt.size = DEC
    mopt.renderer_spatial_output_dim = R
    mopt.is_test = True
    ropt = rb._Munch(refopt.rendering)
    ropt.N_samples = S
    ropt.enable_local_model = False
    ropt.return_sdf = True
    ropt.return_xyz = True

    torch.manual_seed(0)
    ref = sm.Generator(mopt, ropt, full_pipeline=True)
    rb.seed_module(ref, seed=131)
    ref.eval()

    from e3dge_tpu.render.camera import camera_params_from_angles

    cam = camera_params_from_angles(
        jnp.asarray([0.3]), jnp.asarray([-0.2]), R, fov_ang=6.0, dist_radius=0.12
    )
    rng = np.random.RandomState(97)
    z = (0.5 * rng.randn(1, 256)).astype(np.float32)
    noise = [
        (0.5 * rng.randn(1, 1, r, r)).astype(np.float32) for r in [R, 2 * R, 2 * R]
    ]

    with torch.no_grad():
        rgb, thumb, xyz, sdf, mask = ref(
            [_t(z)], _t(cam.poses), _t(np.asarray(cam.focal)),
            _t(np.asarray(cam.near)), _t(np.asarray(cam.far)),
            noise=[_t(n) for n in noise], randomize_noise=False,
            return_xyz=True, return_sdf=True,
        )

    from e3dge_tpu.models.generator import Generator
    from e3dge_tpu.utils.config import DecoderConfig, E3DGEConfig, RendererConfig

    cfg = E3DGEConfig(
        renderer=RendererConfig(depth=8, width=256, style_dim=256, out_im_res=R,
                                n_samples=S, perturb=False),
        decoder=DecoderConfig(size=DEC, style_dim=512, channel_multiplier=int(mopt.channel_multiplier),
                              channel_base=512, in_res=R, in_channels=256),
    )
    ours = Generator(cfg)
    jn = [jnp.asarray(n) for n in noise]
    v0 = ours.init(
        {"params": jax.random.key(0)}, [jnp.asarray(z)], cam,
        input_is_latent=False, noise=jn,
    )
    new_vars = _ingest_standalone(
        {"params": {"generator": v0["params"]}}, {"generator": rb.sd_numpy(ref)}
    )
    out = ours.apply(
        {"params": new_vars["params"]["generator"]}, [jnp.asarray(z)], cam,
        input_is_latent=False, noise=jn,
    )
    np.testing.assert_allclose(
        np.asarray(out["gen_thumb_imgs"]), thumb.numpy(), atol=3e-3, rtol=0
    )
    np.testing.assert_allclose(np.asarray(out["gen_imgs"]), rgb.numpy(), atol=3e-3, rtol=0)
    np.testing.assert_allclose(
        np.asarray(out["sdf"]).reshape(sdf.shape), sdf.numpy(), atol=3e-3, rtol=0
    )


def _no_feats_renderer(refopt, R: int, S: int, seed: int):
    """Reference VolumeFeatureRenderer WITHOUT feature output: the init/sample
    passes split raw as [3,1] (volume_renderer.py:1806,1860), which requires a
    4-channel network — 'no_features_output' key PRESENCE disables the feature
    concat (:657-660) and return_feats=False skips the tap machinery."""
    vr = rb.import_ref("project.utils.volume_renderer")
    ropt = rb._Munch(refopt.rendering)
    ropt.N_samples = S
    ropt.enable_local_model = False
    ropt.return_feats = False
    ropt.no_features_output = True

    torch.manual_seed(0)
    ref = vr.VolumeFeatureRenderer(ropt, style_dim=256, out_im_res=R, mode="test")
    rb.seed_module(ref, seed=seed)
    ref.eval()
    return ref


def test_mlp_init_pass_golden(refopt, monkeypatch):
    """Sphere-init pretraining pass vs the reference's own mlp_init_pass
    (volume_renderer.py:1833-1863): stratified frustum samples -> (sdf, target
    ||pts|| - (far-near)/4). The single torch.rand draw is replaced by a fixed
    array injected into BOTH sides (randoms-as-inputs; everything downstream is
    each side's real code).

    This golden caught parity bug #8: the reference jitters `self.t_vals` —
    the OFFSET grid linspace(0, 1-1/S) under the released --offset_sampling
    default — with the mids/upper/lower scheme, while our mlp_init_pass used
    the stratified linspace(0,1) grid unconditionally (fixed:
    models/volume_renderer.py::mlp_init_pass, render/rays.py jitter='mids')."""
    R, S = 8, 8
    ref = _no_feats_renderer(refopt, R, S, seed=53)

    from e3dge_tpu.render.camera import camera_params_from_angles

    azim = jnp.asarray([0.4, -0.2])
    elev = jnp.asarray([0.15, -0.3])
    cam = camera_params_from_angles(azim, elev, R, fov_ang=6.0, dist_radius=0.12)

    rng = np.random.RandomState(13)
    styles = (0.3 * rng.randn(2, 9, 256)).astype(np.float32)
    fixed = rng.rand(2, R, R, S).astype(np.float32)

    def _fixed_rand(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        assert int(np.prod(shape)) == fixed.size, shape
        return torch.from_numpy(fixed.reshape(shape))

    with monkeypatch.context() as m:
        m.setattr(torch, "rand", _fixed_rand)
        with torch.no_grad():
            ref_sdf, ref_target = ref.mlp_init_pass(
                _t(cam.poses), _t(np.asarray(cam.focal)), _t(np.asarray(cam.near)),
                _t(np.asarray(cam.far)), styles=_t(styles),
            )

    from e3dge_tpu.models.volume_renderer import VolumeFeatureRenderer
    from e3dge_tpu.utils.config import RendererConfig

    cfg = RendererConfig(
        depth=8, width=256, style_dim=256, out_im_res=R, n_samples=S,
        perturb=False, output_features=False,
    )
    ours = VolumeFeatureRenderer(cfg)
    v0 = ours.init({"params": jax.random.key(0)}, cam, jnp.asarray(styles))
    wrapped = {"params": {"generator": {"renderer": v0["params"]}}}
    sds = {"generator": _prefix_sd(rb.sd_numpy(ref), "renderer.")}
    params = _ingest_standalone(wrapped, sds)["params"]["generator"]["renderer"]

    orig_uniform = jax.random.uniform

    def _fixed_uniform(key, shape=(), **kw):
        if tuple(shape) != fixed.shape:
            # flax scope.param abstractly re-traces init fns to shape-validate
            # existing params (scope.py:951) — let those through untouched
            return orig_uniform(key, shape, **kw)
        return jnp.asarray(fixed.reshape(shape))

    with monkeypatch.context() as m:
        m.setattr(jax.random, "uniform", _fixed_uniform)
        our_sdf, our_target = ours.apply(
            {"params": params}, jax.random.key(7), cam, jnp.asarray(styles),
            method="mlp_init_pass",
        )

    ref_sdf = ref_sdf.numpy().reshape(np.asarray(our_sdf).shape)
    ref_target = ref_target.numpy().reshape(np.asarray(our_target).shape)
    np.testing.assert_allclose(np.asarray(our_target), ref_target, atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(our_sdf), ref_sdf, atol=3e-3, rtol=0)


def test_sdf_sample_pass_dead_code_proof(refopt):
    """Executed proof that the reference's 3D-supervision sampling ENTRY POINT is
    dead as shipped: DATASETGAN_3D.__getitem__ -> GAN.data_sample_forward
    (data_util.py:245-258, stylesdf_model.py:905-921) -> renderer.sdf_sample_pass,
    where every assignment to `normalized_pts` is commented out
    (volume_renderer.py:1798-1822) — BOTH merge_spatial_dim modes hit a NameError
    on their first reference to it (:1811 / :1818). The live synthetic-sampling
    path the trainers actually use is DATASETGAN_3D.sample_with_rand_cams
    (datasetgan_runner.py:127-146), which our e3dge.synthetic_sample implements."""
    R, S = 8, 8
    ref = _no_feats_renderer(refopt, R, S, seed=59)

    from e3dge_tpu.render.camera import camera_params_from_angles

    cam = camera_params_from_angles(
        jnp.asarray([0.1]), jnp.asarray([0.05]), R, fov_ang=6.0, dist_radius=0.12
    )
    styles = (0.3 * np.random.RandomState(17).randn(1, 9, 256)).astype(np.float32)
    args = (
        _t(cam.poses), _t(np.asarray(cam.focal)), _t(np.asarray(cam.near)),
        _t(np.asarray(cam.far)), _t(styles),
    )
    with torch.no_grad():
        with pytest.raises(NameError, match="normalized_pts"):
            ref.sdf_sample_pass(*args)  # merge_spatial_dim=True (the caller default)
        with pytest.raises(NameError, match="normalized_pts"):
            ref.sdf_sample_pass(*args, merge_spatial_dim=False)


def test_decoder_condition_hook_dead(refopt):
    """Executed proof that the reference's HFGI condition hook is dead: the
    Decoder loop counter only takes odd values (i += 2 from 1,
    stylesdf_model.py:772-792) so `i == 7 - 1` (:777) never fires — the output
    is bit-identical with and without conditions. No reference trainer passes
    `conditions` either. Our decoder replicates the behavior bug-compatibly
    (condition_layer=6; an odd index must be set explicitly to inject)."""
    sm = rb.import_ref("project.models.stylesdf_model")
    mopt = rb._Munch(refopt.model)
    mopt.size = 64
    mopt.renderer_spatial_output_dim = 16
    mopt.feature_encoder_in_channels = refopt.rendering.width

    torch.manual_seed(0)
    ref = sm.Decoder(mopt)
    rb.seed_module(ref, seed=137)
    ref.eval()

    rng = np.random.RandomState(101)
    features = (0.5 * rng.randn(1, 256, 16, 16)).astype(np.float32)
    latent = (0.3 * rng.randn(1, ref.n_latent, 512)).astype(np.float32)
    noise = [(0.5 * rng.randn(1, 1, r, r)).astype(np.float32) for r in [16, 32, 32, 64, 64]]
    # conditions sized for the (never-reached) injection point
    conds = [torch.ones(1, 512, 16, 16), torch.ones(1, 512, 16, 16)]

    with torch.no_grad():
        base, _ = ref(_t(features), [_t(latent)], input_is_latent=True,
                      noise=[_t(n) for n in noise], randomize_noise=False)
        with_c, _ = ref(_t(features), [_t(latent)], input_is_latent=True,
                        noise=[_t(n) for n in noise], randomize_noise=False,
                        conditions=conds)
    np.testing.assert_array_equal(base.numpy(), with_c.numpy())

    from e3dge_tpu.models.decoder import Decoder
    from e3dge_tpu.utils.config import DecoderConfig

    cfg = DecoderConfig(size=64, style_dim=512, channel_multiplier=int(mopt.channel_multiplier),
                        channel_base=512, in_res=16, in_channels=256)
    ours = Decoder(cfg)
    jn = [jnp.asarray(n) for n in noise]
    v0 = ours.init({"params": jax.random.key(0)}, jnp.asarray(features), jnp.asarray(latent),
                   input_is_latent=True, noise=jn)
    img0, _ = ours.apply(v0, jnp.asarray(features), jnp.asarray(latent),
                         input_is_latent=True, noise=jn)
    img1, _ = ours.apply(v0, jnp.asarray(features), jnp.asarray(latent),
                         input_is_latent=True, noise=jn,
                         conditions=(jnp.ones((1, 512, 16, 16)), jnp.ones((1, 512, 16, 16))))
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
