"""Alternative E0 encoders (reference alt-configs).

  * HybridBackboneEncoder — ReStyle-style: ALL style vectors read from the final
    16x16 feature map of an IR(-SE) backbone; dual heads 9x256 + 10x512
    (reference restyle_psp_encoders.py:58-89).
  * Encoder4EditingHybrid — e4e-style progressive-delta encoder: one base style +
    per-row zero-init deltas gated by a progressive stage
    (reference e4e_encoders.py:36-497, ProgressiveStage enum :14-33).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e3dge_tpu.models.encoders.fpn import (
    BatchNorm,
    BottleneckIRSE,
    GradualStyleBlock,
    PReLU,
    TorchConv,
    get_blocks,
)
from e3dge_tpu.ops.grid_sample import interpolate_bilinear
from e3dge_tpu.utils.config import EncoderConfig


class _IRBackbone(nn.Module):
    """Shared IR(-SE) trunk: stem + all bottleneck units -> final 512ch map."""

    cfg: EncoderConfig
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        h = TorchConv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        h = BatchNorm(64, self.axis_name, name="input_bn")(h, train)
        h = PReLU(64, name="input_prelu")(h)
        for i, spec in enumerate(get_blocks(c.num_layers)):
            h = BottleneckIRSE(
                spec.in_channel, spec.depth, spec.stride, se=(c.mode == "ir_se"),
                axis_name=self.axis_name, name=f"body_{i}",
            )(h, train)
        return h  # [B, 512, res/16, res/16]


class HybridBackboneEncoder(nn.Module):
    """All styles from the final feature map (restyle_psp_encoders.py:58-89).

    NOTE the reference class hardcodes mode='ir' in its super().__init__
    (:66: `super().__init__(num_layers, mode='ir', n_styles=10, opts=opts)`),
    silently ignoring the mode argument — every reference instantiation uses
    plain IR bottlenecks. Pass cfg.mode='ir' to match (golden-pinned);
    unreachable from the reference factory either way (encoders/__init__.py)."""

    cfg: EncoderConfig
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        c = self.cfg
        h = _IRBackbone(c, self.axis_name, name="backbone")(x, train)
        spatial = c.input_res // 16
        thumb = jnp.stack(
            [GradualStyleBlock(c.style_dim, spatial, name=f"thumb_styles_{j}")(h) for j in range(c.n_styles_pigan)],
            axis=1,
        )
        dec = jnp.stack(
            [GradualStyleBlock(c.decoder_style_dim, spatial, name=f"styles_{j}")(h) for j in range(c.n_styles_decoder)],
            axis=1,
        )
        if return_featmap:
            # The ReStyle backbone has no FPN pyramid: there is no honest p32
            # (32², 512ch) or p64 feature map to hand the E1/HFGI consumers —
            # the raw 16² trunk map silently breaks their spatial assumptions.
            # Fail loudly instead (the reference never combines this encoder
            # with the local branch either, restyle_psp_encoders.py:58-89).
            raise ValueError(
                "HybridBackboneEncoder has no FPN feature maps; return_featmap "
                "requires HybridGradualStyleEncoder_V2 (the local/HFGI branch "
                "consumes p64/p32 pyramid maps this backbone cannot provide)"
            )
        return [thumb, dec]


class BackboneEncoderRenderer(nn.Module):
    """W-space ReStyle encoder (reference restyle_psp_encoders.py:138-187, the
    `--encoder_type BackboneEncoderRenderer` branch of the reference factory,
    encoders/__init__.py:34-37): ONE 256-d and ONE 512-d style vector read from
    the final 16² trunk map by GradualStyleBlocks, repeated across the 9 pigan
    / 10 decoder W+ rows (:174-187 repeat_interleave). The trunk is inlined
    (not wrapped) so param paths mirror the torch state_dict for ingestion."""

    cfg: EncoderConfig
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_featmap: bool = False):
        c = self.cfg
        h = TorchConv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        h = BatchNorm(64, self.axis_name, name="input_bn")(h, train)
        h = PReLU(64, name="input_prelu")(h)
        for i, spec in enumerate(get_blocks(c.num_layers)):
            h = BottleneckIRSE(
                spec.in_channel, spec.depth, spec.stride, se=(c.mode == "ir_se"),
                axis_name=self.axis_name, name=f"body_{i}",
            )(h, train)
        s16 = c.input_res // 16
        w_thumb = GradualStyleBlock(c.style_dim, s16, name="styles_0")(h)
        w_dec = GradualStyleBlock(c.decoder_style_dim, s16, name="styles_1")(h)
        if return_featmap:
            raise ValueError(
                "BackboneEncoderRenderer has no FPN feature maps; return_featmap "
                "requires HybridGradualStyleEncoder_V2"
            )
        return [
            jnp.repeat(w_thumb[:, None], c.n_styles_pigan, axis=1),
            jnp.repeat(w_dec[:, None], c.n_styles_decoder, axis=1),
        ]


class Encoder4EditingHybrid(nn.Module):
    """e4e progressive-delta encoder, matching the reference's
    Encoder4EditingHybridBaseline (e4e_encoders.py:378-497) — the variant the
    reference's set_encoder factory actually reaches (encoders/__init__.py:30;
    the non-Baseline Encoder4EditingHybrid at :239 cannot even instantiate:
    it appends to `self.styles_pigan` before creating it, :279).

    Row 0 of each branch is the base style; rows i>0 add a per-row zero-init
    delta, enabled while i <= progressive stage (ProgressiveStage enum
    :14-33). Deltas read FPN features: the pigan branch switches from c3 (16²)
    to p2 (32², upsample_add(c3, latlayer1(c2))) at row 6 (:487-492); the
    stylegan branch switches to p2 at row 3 and to p1 (64²,
    upsample_add(p2, latlayer2(c1))) at row 7 (:498-508). `stage` may be
    passed per call as a traced scalar so a training loop can anneal it
    WITHOUT recompiling — the gate is arithmetic on (stage >= i), not Python
    control flow; rows beyond the stage equal the base row exactly, like the
    reference's stage-limited loop. The static attribute is the default
    (Inference = all deltas active). latlayer3 exists in reference ckpts but
    is never used by the Baseline forward (dead weights; not replicated)."""

    cfg: EncoderConfig
    stage: int = 18  # ProgressiveStage.Inference
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_featmap: bool = False,
        stage: jnp.ndarray | int | None = None,
    ):
        c = self.cfg
        # tapped IR trunk (taps at body indices 6/20/23, e4e_encoders.py:459-467)
        h = TorchConv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        h = BatchNorm(64, self.axis_name, name="input_bn")(h, train)
        h = PReLU(64, name="input_prelu")(h)
        taps = {}
        for i, spec in enumerate(get_blocks(c.num_layers)):
            h = BottleneckIRSE(
                spec.in_channel, spec.depth, spec.stride, se=(c.mode == "ir_se"),
                axis_name=self.axis_name, name=f"body_{i}",
            )(h, train)
            if i == 6:
                taps["c1"] = h  # 128ch, res/4
            elif i == 20:
                taps["c2"] = h  # 256ch, res/8
            elif i == 23:
                taps["c3"] = h  # 512ch, res/16

        def upsample_add(a, b):
            return interpolate_bilinear(a, b.shape[2:], align_corners=True) + b

        c3 = taps["c3"]
        p2 = upsample_add(c3, TorchConv(512, 1, name="latlayer1")(taps["c2"]))
        p1 = upsample_add(p2, TorchConv(512, 1, name="latlayer2")(taps["c1"]))

        s16, s32, s64 = c.input_res // 16, c.input_res // 8, c.input_res // 4
        stage_v = jnp.asarray(self.stage if stage is None else stage)

        def progressive(n_rows, dim, prefix, feat_plan):
            # feat_plan: list of (features, gsb_spatial) per row
            feats0, sp0 = feat_plan[0]
            base = GradualStyleBlock(dim, sp0, name=f"{prefix}0")(feats0)  # w0
            rows = [base]
            for i in range(1, n_rows):
                feats, sp = feat_plan[i]
                delta = GradualStyleBlock(dim, sp, name=f"{prefix}{i}")(feats)
                gate = (stage_v >= i).astype(base.dtype)
                rows.append(base + gate * delta)
            return jnp.stack(rows, axis=1)

        # pigan: rows 0..5 read c3 @16, rows 6..8 read p2 @32 (pigan_coarse_indx=6)
        pigan_plan = [(c3, s16)] * 6 + [(p2, s32)] * 3
        thumb = progressive(c.n_styles_pigan, c.style_dim, "styles_pigan_", pigan_plan[: c.n_styles_pigan])
        # stylegan: rows 0..2 read c3 @16, 3..6 read p2 @32, 7..9 read p1 @64
        sg_plan = [(c3, s16)] * 3 + [(p2, s32)] * 4 + [(p1, s64)] * 3
        dec = progressive(c.n_styles_decoder, c.decoder_style_dim, "styles_", sg_plan[: c.n_styles_decoder])

        if return_featmap:
            raise ValueError(
                "Encoder4EditingHybrid has no FPN feature maps; return_featmap "
                "requires HybridGradualStyleEncoder_V2"
            )
        return [thumb, dec]


def e4e_progressive_stage(step: jnp.ndarray | int, every: int, max_stage: int = 18):
    """Progressive-stage schedule: advance one delta every `every` steps, capped
    at Inference (reference anneal semantics, e4e_encoders.py:14-33). Returns a
    traced scalar usable as Encoder4EditingHybrid's per-call `stage`."""
    return jnp.minimum(jnp.asarray(step) // every, max_stage)
