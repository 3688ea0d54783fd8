"""Perceptual networks: LPIPS (AlexNet) and ArcFace identity loss, in JAX.

The reference downloads pretrained torch weights (`losses/lpips/lpips.py:17`,
`losses/id_loss.py:7` + `encoders/model_irse.py`); here the same architectures are
implemented in flax so those weights can be ingested by utils/torch_ckpt.py. With
random init the losses are still valid smooth image-similarity surrogates, which is
what the unit tests and throughput benchmarks exercise.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e3dge_tpu.models.encoders.fpn import BatchNorm, BottleneckIRSE, PReLU, TorchConv, get_blocks
from e3dge_tpu.ops.grid_sample import adaptive_avg_pool2d

# LPIPS input scaling constants (lpips networks.py ScalingLayer)
_LPIPS_SHIFT = jnp.asarray([-0.030, -0.088, -0.188]).reshape(1, 3, 1, 1)
_LPIPS_SCALE = jnp.asarray([0.458, 0.448, 0.450]).reshape(1, 3, 1, 1)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet .features trunk, returning the 5 relu taps."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []

        def conv(h, ch, k, s, p, name):
            return TorchConv(ch, k, stride=s, padding=p, name=name)(h)

        def maxpool(h):
            # torch MaxPool2d(3, stride=2) on NCHW
            return jnp.transpose(
                nn.max_pool(jnp.transpose(h, (0, 2, 3, 1)), (3, 3), strides=(2, 2)), (0, 3, 1, 2)
            )

        h = jax.nn.relu(conv(x, 64, 11, 4, 2, "conv0"))
        taps.append(h)
        h = maxpool(h)
        h = jax.nn.relu(conv(h, 192, 5, 1, 2, "conv1"))
        taps.append(h)
        h = maxpool(h)
        h = jax.nn.relu(conv(h, 384, 3, 1, 1, "conv2"))
        taps.append(h)
        h = jax.nn.relu(conv(h, 256, 3, 1, 1, "conv3"))
        taps.append(h)
        h = jax.nn.relu(conv(h, 256, 3, 1, 1, "conv4"))
        taps.append(h)
        return taps


class LPIPS(nn.Module):
    """LPIPS v0.1 (alex): unit-normalize tap channels, squared diff, 1x1 linear
    heads, spatial mean, sum over taps (reference losses/lpips/lpips.py)."""

    channels: Sequence[int] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(
        self, pred: jnp.ndarray, target: jnp.ndarray, per_sample: bool = False
    ) -> jnp.ndarray:
        net = AlexNetFeatures(name="net")

        def scale(x):
            return (x - _LPIPS_SHIFT) / _LPIPS_SCALE

        f_pred = net(scale(pred))
        f_tgt = net(scale(target))

        def normalize(f):
            # reference lpips/utils.py::normalize_activation — epsilon layout
            # matters at near-zero activations: +1e-8 INSIDE the sqrt, +1e-10
            # added to the norm (golden-pinned)
            return f / (jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True) + 1e-8) + 1e-10)

        total = 0.0
        for i, (fp, ft) in enumerate(zip(f_pred, f_tgt)):
            diff = (normalize(fp) - normalize(ft)) ** 2
            w = self.param(f"lin{i}_weight", nn.initializers.ones, (1, self.channels[i], 1, 1))
            # 1x1 conv == weighted channel sum; the reference applies the lin
            # weights RAW (lpips.py:36-39 — the released v0.1 heads are
            # non-negative by construction, so no abs)
            tap = jnp.sum(w * diff, axis=1)  # [B, H, W]
            total = total + (jnp.mean(tap, axis=(1, 2)) if per_sample else jnp.mean(tap))
        return total


class ArcFaceBackbone(nn.Module):
    """IR-SE-50 face embedding (reference encoders/model_irse.py): 112x112 input,
    512-d l2-normalized output."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = TorchConv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        h = BatchNorm(64, name="input_bn")(h)
        h = PReLU(64, name="input_prelu")(h)
        for i, spec in enumerate(get_blocks(50)):
            h = BottleneckIRSE(spec.in_channel, spec.depth, spec.stride, name=f"body_{i}")(h)
        h = BatchNorm(512, name="output_bn")(h)
        h = h.reshape(h.shape[0], -1)
        w = self.param("output_weight", nn.initializers.lecun_normal(), (512, h.shape[-1]))
        b = self.param("output_bias", nn.initializers.zeros, (512,))
        h = h @ w.T + b
        # final BatchNorm1d (model_irse.py output_layer[4]) — eval-mode affine
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="output_bn1d")(h)
        return h * jax.lax.rsqrt(jnp.sum(h**2, axis=-1, keepdims=True) + 1e-10)


class IDLoss(nn.Module):
    """ArcFace cosine-similarity loss with the reference's face crop
    (id_loss.py:24-26: rows 35:223, cols 32:220 of the 256 image, then
    AdaptiveAvgPool2d((112,112)) — adaptive POOLING, not a bilinear resize;
    the two differ and the released metric uses the pool)."""

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray, per_sample: bool = False):
        backbone = ArcFaceBackbone(name="facenet")

        def embed(img):
            if img.shape[-1] >= 224:
                img = img[:, :, 35:223, 32:220]
            img = adaptive_avg_pool2d(img, (112, 112))
            return backbone(img)

        e_pred = embed(pred)
        e_tgt = embed(target)
        sim = jnp.sum(e_pred * e_tgt, axis=-1)
        if per_sample:
            return 1.0 - sim, sim
        return jnp.mean(1.0 - sim), jnp.mean(sim)


def make_perceptual_fns(
    image_size: int = 256,
    lpips_ckpt: str | None = None,
    arcface_ckpt: str | None = None,
    seed: int = 0,
):
    """Construct jitted (lpips_fn, id_fn) closures for validation / training.

    When torch checkpoints are given (reference pretrained_models/model_ir_se50.pth
    and the LPIPS alex weights), they are ingested via utils/torch_ckpt; otherwise
    random-init nets serve as smooth surrogates (metrics then are NOT comparable to
    the reference numbers — pass the ckpts for that).

    Both returned fns accept an optional per_sample=True kwarg (static) to return
    per-image values."""
    lp = LPIPS()
    x = jnp.zeros((1, 3, image_size, image_size))
    v_lp = lp.init(jax.random.PRNGKey(seed), x, x)
    idl = IDLoss()
    xi = jnp.zeros((1, 3, image_size, image_size))
    v_id = idl.init(jax.random.PRNGKey(seed + 1), xi, xi)

    if lpips_ckpt or arcface_ckpt:
        from e3dge_tpu.utils.torch_ckpt import ingest_perceptual, load_torch_file

        if lpips_ckpt:
            v_lp, _ = ingest_perceptual(v_lp, load_torch_file(lpips_ckpt), "lpips", strict=False)
        if arcface_ckpt:
            v_id, _ = ingest_perceptual(v_id, load_torch_file(arcface_ckpt), "arcface", strict=False)

    lpips_fn = jax.jit(lambda p, t, per_sample=False: lp.apply(v_lp, p, t, per_sample), static_argnames="per_sample")
    id_fn = jax.jit(lambda p, t, per_sample=False: idl.apply(v_id, p, t, per_sample), static_argnames="per_sample")
    return lpips_fn, id_fn
