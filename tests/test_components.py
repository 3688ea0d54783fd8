"""Tests for auxiliary components: encoder factory, train utils, logger, consistency
losses, projector."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3dge_tpu.models.encoders.factory import set_encoder
from e3dge_tpu.training import losses as L
from e3dge_tpu.training.train_utils import ema_update, make_noise, make_pair_same_noise
from e3dge_tpu.utils.config import tiny_test_config
from e3dge_tpu.utils.logger import MetricLogger


@pytest.mark.slow
def test_encoder_factory_variants():
    cfg = tiny_test_config()
    enc = set_encoder("HybridGradualStyleEncoder_V2", cfg.encoder)
    x = jax.random.normal(jax.random.key(0), (1, 3, cfg.encoder.input_res, cfg.encoder.input_res))
    v = enc.init(jax.random.key(1), x)
    thumb, dec = enc.apply(v, x)
    assert thumb.shape == (1, cfg.encoder.n_styles_pigan, cfg.encoder.style_dim)

    enc2 = set_encoder("VolumeRenderDiscriminatorEncoder", cfg.encoder, init_size=8)
    x2 = jax.random.normal(jax.random.key(0), (1, 3, 8, 8))
    v2 = enc2.init(jax.random.key(1), x2)
    thumb2, dec2 = enc2.apply(v2, x2)
    assert thumb2.shape == (1, cfg.encoder.n_styles_pigan, cfg.encoder.style_dim)
    assert dec2 is None


def test_pair_same_noise_and_ema():
    z = make_pair_same_noise(jax.random.key(0), 4, 8)
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(z[1]))
    assert not np.allclose(np.asarray(z[0]), np.asarray(z[2]))

    ema = {"w": jnp.zeros(3)}
    cur = {"w": jnp.ones(3)}
    out = ema_update(ema, cur, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_make_noise_shapes():
    noises = make_noise(jax.random.key(0), size=32, in_res=8, batch=2)
    assert len(noises) == (5 - 3) * 2 + 1  # num_layers
    assert noises[0].shape == (2, 1, 8, 8)
    assert noises[-1].shape == (2, 1, 32, 32)


def test_consistency_losses():
    p = jnp.full((1, 2, 2, 4, 1), 0.5)
    assert float(L.hit_prob_consistency_loss(p, p)) > 0  # BCE of 0.5 vs 0.5 = ln2-ish
    d = jnp.ones((1, 2, 2, 1))
    assert float(L.depth_consistency_loss(d, d)) == 0.0
    pen, mean = L.path_lengths_from_grads(jnp.ones((2, 5, 8)), jnp.asarray(0.0))
    assert np.isfinite(float(pen)) and float(mean) > 0


def test_metric_logger(tmp_path):
    logger = MetricLogger(tmp_path)
    logger.log(1, {"loss": jnp.asarray(0.5)})
    logger.log(2, {"loss": 0.25}, prefix="val/")
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["val/loss"] == 0.25


def test_debug_nans_raises():
    """enable_debug_checks (scripts/train.py --debug-nans) must actually raise at
    the op producing a non-finite value — the JAX equivalent of the reference's
    always-on torch.autograd.set_detect_anomaly (train_ae.py:16-20)."""
    import pytest

    from e3dge_tpu.utils.profiling import enable_debug_checks

    enable_debug_checks()
    try:
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(jax.jit(jnp.log)(jnp.asarray(-1.0)))
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_debug_infs", False)


def test_projector_tiny(tiny_test_setup):
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.render.camera import camera_params_from_angles
    from e3dge_tpu.training.projector import project

    cfg, model, v, ml = tiny_test_setup
    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), cfg.renderer.out_im_res)
    target = jax.random.uniform(jax.random.key(5), (1, 3, cfg.decoder.size, cfg.decoder.size)) * 2 - 1
    latents, losses = project(model, v, ml, target, cam, jax.random.key(6), steps=8, lr=1e-2)
    assert latents[0].shape == (1, cfg.renderer.depth + 1, cfg.renderer.style_dim)
    # optimization reduces the objective
    assert float(losses[-1]) < float(losses[0])


def test_encoder_variants_restyle_and_e4e():
    import jax

    from e3dge_tpu.models.encoders.factory import set_encoder

    cfg = tiny_test_config()
    x = jax.random.normal(jax.random.key(0), (1, 3, cfg.encoder.input_res, cfg.encoder.input_res))
    for name in ["HybridBackboneEncoder", "Encoder4Editing"]:
        enc = set_encoder(name, cfg.encoder)
        v = enc.init(jax.random.key(1), x)
        thumb, dec = enc.apply(v, x)
        assert thumb.shape == (1, cfg.encoder.n_styles_pigan, cfg.encoder.style_dim)
        assert dec.shape == (1, cfg.encoder.n_styles_decoder, cfg.encoder.decoder_style_dim)

    # e4e progressive gating: stage 0 -> all rows equal the base row
    enc0 = set_encoder("Encoder4Editing", cfg.encoder, stage=0)
    v0 = enc0.init(jax.random.key(1), x)
    thumb0, _ = enc0.apply(v0, x)
    np.testing.assert_allclose(np.asarray(thumb0[:, 0]), np.asarray(thumb0[:, 1]), atol=1e-6)

    # training-time anneal: per-call traced stage, ONE compile for all stages
    # (reference anneals via set_progressive_stage, e4e_encoders.py:91-93)
    from e3dge_tpu.models.encoders.variants import e4e_progressive_stage

    apply_j = jax.jit(lambda vv, xx, s: enc0.apply(vv, xx, stage=s))
    t_s0, _ = apply_j(v0, x, e4e_progressive_stage(0, every=10))
    t_s1, _ = apply_j(v0, x, e4e_progressive_stage(10, every=10))
    # jit vs eager op ordering through the FPN laterals -> ~1e-6 float noise
    np.testing.assert_allclose(np.asarray(t_s0), np.asarray(thumb0), atol=1e-5)
    # stage 1 activates row 1's delta; row 2 remains the base
    assert not np.allclose(np.asarray(t_s1[:, 1]), np.asarray(t_s1[:, 0]))
    np.testing.assert_allclose(np.asarray(t_s1[:, 2]), np.asarray(t_s1[:, 0]), atol=1e-6)

    # HybridBackboneEncoder must refuse return_featmap (no FPN pyramid)
    enc_bb = set_encoder("HybridBackboneEncoder", cfg.encoder)
    v_bb = enc_bb.init(jax.random.key(1), x)
    with pytest.raises(ValueError, match="no FPN feature maps"):
        enc_bb.apply(v_bb, x, return_featmap=True)


def test_siren_ddf_and_feature_aligner():
    """Last ablation components: SirenGeneratorDDF per-layer features
    (volume_renderer.py:561-632), CorrelationVolume/FeatureL2Norm
    (alignment_old.py:43-79), FeatureAligner U-net (:500-612)."""
    import numpy as np

    from e3dge_tpu.models.align import FeatureAligner, correlation_volume, feature_l2_norm
    from e3dge_tpu.models.siren import SirenGenerator

    net = SirenGenerator(depth=3, width=16, style_dim=8)
    pts = jax.random.normal(jax.random.key(0), (2, 5, 3))
    views = jax.random.normal(jax.random.key(1), (2, 5, 3))
    styles = jax.random.normal(jax.random.key(2), (2, 4, 8)) * 0.1
    v = net.init(jax.random.key(3), pts, views, styles)
    out = net.apply(v, pts, views, styles, 1, True, method=SirenGenerator.forward_ddf)
    assert out["out"].shape == (2, 5, 4)
    # layers 1,2 plus the view features -> 3 * width
    assert out["feats"].shape == (2, 5, 3 * 16)
    # base forward consistency: rgb+sdf identical
    base = net.apply(v, pts, views, styles)
    np.testing.assert_allclose(np.asarray(out["out"]), np.asarray(base[..., :4]), rtol=1e-6)

    # correlation volume: out[b, qA(col-major), i, j] = <A[:, qA], B[:, i, j]>
    fa = jax.random.normal(jax.random.key(4), (1, 4, 3, 3))
    fb = jax.random.normal(jax.random.key(5), (1, 4, 3, 3))
    corr = correlation_volume(fa, fb)
    assert corr.shape == (1, 9, 3, 3)
    a_cm = np.transpose(np.asarray(fa[0]), (0, 2, 1)).reshape(4, 9)  # col-major
    want = a_cm[:, 4] @ np.asarray(fb[0, :, 1, 2])  # qA=4 -> (h=1, w=1)... col-major: q=4 -> w=1,h=1
    np.testing.assert_allclose(float(corr[0, 4, 1, 2]), float(want), rtol=1e-5)
    n = feature_l2_norm(fa)
    np.testing.assert_allclose(np.asarray(jnp.sum(n**2, axis=1)), 1.0, rtol=1e-4)

    # FeatureAligner with all four contexts
    aligner = FeatureAligner(norm="none")
    res_img = jnp.zeros((1, 3, 16, 16))
    dep = jnp.zeros((1, 1, 16, 16))
    reff = jnp.zeros((1, 8, 16, 16))
    thumb = jnp.zeros((1, 3, 16, 16))
    va = aligner.init(jax.random.key(6), res_img, dep, reff, thumb)
    out = aligner.apply(va, res_img, dep, reff, thumb)
    assert out.shape == (1, 32, 16, 16)


def test_shapenet_dataset(tmp_path):
    """ShapeNet loader parity (reference MultiResolutionDataset_ShapeNet,
    data/dataset.py:328-377): list-file paths, ../pose/<stem>.txt 4x4 c2w, zeroed
    rotation/translation before inversion."""
    import numpy as np
    from PIL import Image

    from e3dge_tpu.training.data import ShapeNetDataset

    (tmp_path / "renders").mkdir()
    (tmp_path / "pose").mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(3):
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype("uint8")).save(
            tmp_path / "renders" / f"v{i}.png"
        )
        pose = np.eye(4)
        pose[:3, 3] = rng.randn(3)
        np.savetxt(tmp_path / "pose" / f"v{i}.txt", pose)
        names.append(f"renders/v{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(names))

    ds = ShapeNetDataset(tmp_path / "list.txt", size=16)
    assert len(ds) == 3
    batch = next(ds.iter_batches(2))
    assert batch["image"].shape == (2, 3, 16, 16)
    assert batch["poses"].shape == (2, 3, 4)
    # zero_pose: identity rotation, zero translation (reference behavior)
    np.testing.assert_allclose(batch["poses"][0], np.eye(4)[:3], atol=1e-6)


def test_reference_flag_compat():
    from e3dge_tpu.utils.options_compat import config_from_reference_flags

    cfg, unknown = config_from_reference_flags([
        "--size", "512", "--N_samples", "12", "--enable_local_model",
        "--netLocal_type", "HGPIFuNetGANResidualResnetFC",
        "--loadSize", "256", "--z_size", "1.12", "--fov", "6",
        "--no_offset_sampling", "--some_dead_flag", "x",
    ])
    assert cfg.decoder.size == 512
    assert cfg.renderer.n_samples == 12
    assert cfg.renderer.enable_local_model
    assert not cfg.renderer.offset_sampling
    assert cfg.encoder.n_styles_decoder == cfg.decoder.n_latent  # recoupled
    assert unknown == ["--some_dead_flag"]


def test_volume_style_encoder_and_panels(tmp_path):
    import jax

    from e3dge_tpu.models.encoders.factory import set_encoder
    from e3dge_tpu.utils.image_io import save_image_grid, save_panel

    cfg = tiny_test_config()
    enc = set_encoder("VolumeStyleEncoder", cfg.encoder, init_size=8)
    x = jax.random.normal(jax.random.key(0), (1, 3, 8, 8))
    v = enc.init(jax.random.key(1), x)
    thumb, dec = enc.apply(v, x)
    assert thumb.shape == (1, cfg.encoder.n_styles_pigan, cfg.encoder.style_dim)
    assert dec.shape == (1, cfg.encoder.n_styles_decoder, cfg.encoder.decoder_style_dim)

    imgs = np.random.rand(2, 3, 8, 8).astype(np.float32) * 2 - 1
    save_image_grid(tmp_path / "grid.png", imgs, nrow=2)
    save_panel(tmp_path / "panel.png", {"a": imgs, "b": imgs * 0.5})
    from PIL import Image

    g = Image.open(tmp_path / "grid.png")
    assert g.size == (16, 8)
    p = Image.open(tmp_path / "panel.png")
    assert p.size == (16, 16)  # 2 cols side-by-side, 2 rows stacked


def test_fusion_ablation_blocks():
    """Conv SFT block, demodulated conv, and the inpainter fusion ablation
    (reference sft.py:18-80, helpers.py:14-80, alignment_old.py:455-496)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from e3dge_tpu.models.align import (
        AlignInpainterFusionBlock,
        ConvResBlock,
        DemodulatedConv2d,
        FuseSftBlock,
    )

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))

    conv = DemodulatedConv2d(6, 3, padding=1)
    v = conv.init(jax.random.key(1), x)
    out = conv.apply(v, x)
    assert out.shape == (2, 6, 8, 8)
    # demodulation: per-output-channel weight norms are 1 -> bounded outputs
    w = v["params"]["weight"]
    demod_w = w[0] * jax.lax.rsqrt(jnp.sum(w**2, axis=(2, 3, 4)) + 1e-8)[0][:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(jnp.sum(demod_w**2, axis=(1, 2, 3))), 1.0, rtol=1e-4
    )

    rb = ConvResBlock(8)
    v = rb.init(jax.random.key(2), x)
    assert rb.apply(v, x).shape == x.shape

    sft = FuseSftBlock(out_ch=8)
    v = sft.init(jax.random.key(3), x, x)
    assert sft.apply(v, x, x, w=0.5).shape == x.shape

    fuse = AlignInpainterFusionBlock()
    mask = jnp.ones((2, 1, 8, 8))
    v = fuse.init(jax.random.key(4), x, x, mask)
    out = fuse.apply(v, x, x, mask)
    assert out.shape == (2, 8, 8, 1, 8)  # B H W 1 C reshape
    out_flat = fuse.apply(v, x, x, mask, reshape=False)
    assert out_flat.shape == x.shape
