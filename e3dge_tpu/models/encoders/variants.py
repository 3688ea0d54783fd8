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
    """All styles from the final feature map (restyle_psp_encoders.py:58-89)."""

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


class Encoder4EditingHybrid(nn.Module):
    """e4e progressive-delta encoder: row 0 is the base style; rows i>0 are
    zero-init deltas added cumulatively, enabled up to the progressive stage
    (reference e4e_encoders.py ProgressiveStage enum :14-33, annealed during
    training via set_progressive_stage :91-93). `stage` may be passed per call
    as a traced scalar so a training loop can anneal it WITHOUT recompiling —
    the gate is a jnp.where on (stage >= i), not Python control flow. The
    static attribute is the default (Inference = all deltas active)."""

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
        h = _IRBackbone(c, self.axis_name, name="backbone")(x, train)
        spatial = c.input_res // 16
        stage_v = jnp.asarray(self.stage if stage is None else stage)

        def progressive(n_rows: int, dim: int, prefix: str) -> jnp.ndarray:
            base = GradualStyleBlock(dim, spatial, name=f"{prefix}_0")(h)  # w0
            rows = [base]
            for i in range(1, n_rows):
                delta = GradualStyleBlock(dim, spatial, name=f"{prefix}_{i}")(h)
                # zero the delta's contribution beyond the current stage
                gate = (stage_v >= i).astype(base.dtype)
                rows.append(base + gate * delta)
            return jnp.stack(rows, axis=1)

        thumb = progressive(c.n_styles_pigan, c.style_dim, "thumb_styles")
        dec = progressive(c.n_styles_decoder, c.decoder_style_dim, "styles")
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
