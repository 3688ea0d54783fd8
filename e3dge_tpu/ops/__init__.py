"""L0 numeric primitives (TPU-native equivalents of the reference's CUDA ops)."""

from e3dge_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from e3dge_tpu.ops.grid_sample import (
    adaptive_avg_pool2d,
    grid_sample,
    grid_sample_3d,
    grid_sample_mm,
    interpolate_bicubic,
    interpolate_bicubic_nhwc,
    interpolate_bilinear,
)
from e3dge_tpu.ops.posenc import pos_encoding
from e3dge_tpu.ops.upfirdn2d import (
    blur,
    conv2d_up_fused,
    conv_transpose2x_blur_phased,
    downsample2x,
    fuse_fir_upsample,
    make_kernel,
    upfirdn2d,
    upsample2x,
)

__all__ = [
    "adaptive_avg_pool2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
    "grid_sample",
    "grid_sample_3d",
    "grid_sample_mm",
    "interpolate_bicubic",
    "interpolate_bicubic_nhwc",
    "interpolate_bilinear",
    "pos_encoding",
    "upfirdn2d",
    "make_kernel",
    "upsample2x",
    "downsample2x",
    "blur",
    "fuse_fir_upsample",
    "conv2d_up_fused",
    "conv_transpose2x_blur_phased",
]
