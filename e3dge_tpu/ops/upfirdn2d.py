"""upfirdn2d — UPsample, FIR filter, DowNsample: the StyleGAN2 resampling primitive.

TPU-native reimplementation of the reference CUDA kernel
(`project/models/op/upfirdn2d_kernel.cu`, semantics defined by the pure fallback in
`project/models/op/upfirdn2d.py:157-200`): zero-insertion upsample by `up`, zero pad by
`pad` (negative = crop), 2D FIR convolution with the *flipped* kernel, then stride-`down`
subsampling.

On TPU this whole pipeline is a single XLA `conv_general_dilated`:
  * zero-insertion upsample  -> `lhs_dilation=(up, up)`
  * pad (in upsampled space) -> explicit `padding` pairs (XLA allows negative = crop);
    zero-insertion leaves `up-1` trailing zeros that lhs_dilation does not, so the
    high-side pad absorbs `up-1`.
  * FIR filter               -> depthwise conv (`feature_group_count=C`); XLA convs
    correlate, so we flip the kernel to get true convolution, matching the reference.
  * downsample               -> `window_strides=(down, down)`

XLA lowers this onto the MXU / fused VPU pipeline directly; no custom autograd is needed
(the reference needed a hand-written double-backward, `op/upfirdn2d.py:18-142` — JAX
differentiates through `conv_general_dilated` natively to any order).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k) -> np.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    Mirrors `make_kernel` (reference `stylesdf_model.py:85-93`): 1D taps are outer-
    producted into 2D and the kernel is normalized to unit sum.

    Returns a HOST (numpy) array on purpose: under jit, omnistaging would turn a
    jnp kernel into a tracer, and upfirdn2d needs concrete taps to take the
    shifted-add path (the depthwise-conv fallback pays TPU layout copies).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / np.sum(k)
    return k


def _upfirdn2d_shifted(
    x: jnp.ndarray,
    kernel_np: np.ndarray,
    up: tuple[int, int],
    down: tuple[int, int],
    pads: tuple[int, int, int, int],
) -> jnp.ndarray:
    """upfirdn2d as lax.pad (interior padding = zero-insert) + SHIFTED ADDS.

    Why not a depthwise conv: on TPU the depthwise FIR emitter
    (EmitDepthwiseInputBatchInSublanes) forces layout-conversion copies of the
    LARGEST pyramid tensors on both sides of every 512^2/1024^2 blur — profiled
    at 6-11 ms per copy, ~half the decoder fwd+bwd time (r3 xprof of the
    isolated decoder; the r2 98 ms/step training 'data formatting' bill).
    Expressing the FIR as slice-multiply-adds keeps everything in the producing
    conv's native layout — no conv op, no relayout; XLA fuses each pass into one
    loop fusion. Separable kernels (all StyleGAN2 FIRs — make_kernel outer-
    products 1D taps) use two 1-D passes (8 MACs/elem for 4 taps vs 16).
    """
    up_y, up_x = up
    down_y, down_x = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pads
    kh, kw = kernel_np.shape
    kf = kernel_np[::-1, ::-1]  # true convolution == correlation with flipped taps

    # zero-insert + edge pad/crop in ONE lax.pad (interior padding is native XLA);
    # zero-insertion leaves up-1 trailing zeros that interior padding does not.
    x = jax.lax.pad(
        x,
        jnp.asarray(0.0, x.dtype),
        ((0, 0, 0), (0, 0, 0), (pad_y0, pad_y1 + up_y - 1, up_y - 1), (pad_x0, pad_x1 + up_x - 1, up_x - 1)),
    )
    h, w = x.shape[2], x.shape[3]
    oh, ow = h - kh + 1, w - kw + 1

    # separability probe (host-side: kernel taps are compile-time constants)
    u, s, vt = np.linalg.svd(kf.astype(np.float64))
    separable = kh > 1 and kw > 1 and s[1] < 1e-12 * s[0]
    if separable:
        col = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)   # H taps
        row = (vt[0] * np.sqrt(s[0])).astype(np.float32)     # W taps
        acc = None
        for dy in range(kh):
            t = jnp.asarray(col[dy], x.dtype) * x[:, :, dy : dy + oh, :]
            acc = t if acc is None else acc + t
        out = None
        for dx in range(kw):
            t = jnp.asarray(row[dx], x.dtype) * acc[:, :, :, dx : dx + ow]
            out = t if out is None else out + t
    else:
        out = None
        for dy in range(kh):
            for dx in range(kw):
                t = jnp.asarray(kf[dy, dx], x.dtype) * x[:, :, dy : dy + oh, dx : dx + ow]
                out = t if out is None else out + t
    return out[:, :, ::down_y, ::down_x]


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    pad: tuple[int, ...] = (0, 0),
) -> jnp.ndarray:
    """Apply upsample-FIR-downsample to an NCHW tensor.

    Args:
      x: [B, C, H, W] input.
      kernel: [kh, kw] FIR filter taps.
      up / down: int or (y, x) integer resampling factors.
      pad: (pad0, pad1) applied to both axes, or (x0, x1, y0, y1).

    Returns:
      [B, C, (H*up_y + pad_y0 + pad_y1 - kh)//down_y + 1, (...)] tensor.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    # Constant taps (every internal caller: make_kernel output) -> shifted-add
    # path, which avoids the TPU depthwise-conv layout copies entirely.
    if not isinstance(kernel, jax.core.Tracer):
        return _upfirdn2d_shifted(
            x, np.asarray(kernel, np.float64),
            (up_y, up_x), (down_y, down_x), (pad_x0, pad_x1, pad_y0, pad_y1),
        )

    b, c, h, w = x.shape
    kh, kw = kernel.shape

    # Fallback (traced kernel): true convolution == correlation with a flipped
    # kernel, one depthwise lhs-dilated conv. Runs in the INPUT dtype.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise: one shared filter broadcast over channels.
    # Kernel layout HWIO with feature_group_count=C: [kh, kw, 1, C].
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))

    out = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def upfirdn2d_ref(x: np.ndarray, kernel: np.ndarray, up=1, down=1, pad=(0, 0)) -> np.ndarray:
    """Pure-numpy golden model of upfirdn2d used by the unit tests.

    Implements the reference semantics step by step (zero-insert, pad/crop, convolve
    with flipped kernel, stride) without any torch/XLA dependence.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    b, c, h, w = x.shape
    kh, kw = kernel.shape
    # zero-insertion upsample (trailing zeros included)
    out = np.zeros((b, c, h * up_y, w * up_x), dtype=np.float64)
    out[:, :, ::up_y, ::up_x] = x
    # pad / crop
    out = np.pad(
        out,
        ((0, 0), (0, 0), (max(pad_y0, 0), max(pad_y1, 0)), (max(pad_x0, 0), max(pad_x1, 0))),
    )
    out = out[
        :,
        :,
        max(-pad_y0, 0) : out.shape[2] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[3] - max(-pad_x1, 0),
    ]
    # convolve with flipped kernel (valid)
    kf = kernel[::-1, ::-1]
    oh = out.shape[2] - kh + 1
    ow = out.shape[3] - kw + 1
    res = np.zeros((b, c, oh, ow), dtype=np.float64)
    for dy in range(kh):
        for dx in range(kw):
            res += kf[dy, dx] * out[:, :, dy : dy + oh, dx : dx + ow]
    return res[:, :, ::down_y, ::down_x].astype(x.dtype)


def fuse_fir_upsample(weight: jnp.ndarray, fir: jnp.ndarray, gain: float = 4.0):
    """Compose `conv_transpose(stride 2, weight) -> FIR blur` into ONE lhs-dilated
    correlation kernel + padding (the fused form of the reference's upsample
    ModulatedConv2d + Blur, stylesdf_model.py:328-344 + :96-120).

    The two-pass form writes the pre-blur tensor (the largest activation in the
    StyleGAN2 pyramid) to HBM and reads it back for a depthwise VPU blur. Since
    blur is per-channel linear, it folds into the conv weight: the composite of
    true-conv by W then true-conv by F is true-conv by (F * W) — one MXU conv,
    which XLA phase-decomposes over the dilated input (same MACs, half the
    HBM passes).

    Args:
      weight: [out, in, k, k] conv_transpose weight (per-pair true-conv taps).
      fir:    [kh, kw] normalized FIR taps (make_kernel output).
      gain:   up**2 blur gain (reference Blur(upsample_factor=2)).
    Returns:
      (g_hwio [K, K, in, out] correlation kernel with K = k + kh - 1,
       pad (pl, pr) for conv_general_dilated with lhs_dilation=2)
    matching: blur(conv_transpose2d_torch(x, w.transpose(0,1)), fir*gain,
              pad=((p+1)//2+1, p//2+1)) with p = (kh-2) - (k-1).
    """
    o, i, k, _ = weight.shape
    kh = fir.shape[0]
    # conv_full(F, w) per (out, in) pair == correlate(w, flip(F)) at full padding
    pairs = weight.reshape(o * i, 1, k, k)
    ff = jnp.flip(fir, (0, 1)).astype(weight.dtype)[:, :, None, None]  # HWIO [kh,kw,1,1]
    c = jax.lax.conv_general_dilated(
        pairs,
        ff,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [o*i, 1, K, K] = conv_full(F, w)
    kk = k + kh - 1
    # composite correlation kernel G = flip(conv_full(F, w)) * gain
    g = jnp.flip(c, (-2, -1)).reshape(o, i, kk, kk) * gain
    g_hwio = jnp.transpose(g, (2, 3, 1, 0))
    p = (kh - 2) - (k - 1)
    q0 = (p + 1) // 2 + 1  # blur high-side pad at the call site
    pl = q0 + k - 1
    pr = kk - pl
    return g_hwio, (pl, pr)


def conv2d_up_fused(x: jnp.ndarray, g_hwio: jnp.ndarray, pad: tuple[int, int]) -> jnp.ndarray:
    """Apply the fused upsample conv: correlate the 2x-dilated input with the
    composed kernel from fuse_fir_upsample."""
    return jax.lax.conv_general_dilated(
        x,
        g_hwio.astype(x.dtype),
        window_strides=(1, 1),
        padding=(pad, pad),
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )


def conv_transpose2x_blur_phased(x: jnp.ndarray, weight: jnp.ndarray, fir: jnp.ndarray, gain: float = 4.0):
    """conv_transpose(stride 2, k=3) + FIR blur as ONE stride-1 MXU conv via
    manual phase decomposition — the fast fused form on TPU.

    The naive fused form (conv2d_up_fused: 6x6 kernel over the 2x-dilated input)
    is 2x slower on v5e because Mosaic does not phase-decompose the dilated conv
    (pays 4x MACs), and the two-pass form pays a VPU-bound 16-tap depthwise blur
    over the LARGEST pyramid tensors (~1 ms per 1024^2 layer, measured). Here the
    decomposition is done by hand: output phase (py, px) of the composed kernel G
    (fuse_fir_upsample) sees only taps G[2dy+3-py, 2dx+3-px] — a 3x3 subkernel —
    so the whole op becomes one stride-1 conv with 4x the output channels on the
    UN-dilated input, followed by a depth-to-space interleave. Same MAC count as
    the plain conv_transpose, all on the MXU, zero blur.

    Args:
      x: [B, I, H, W]; weight: [O, I, 3, 3] (conv_transpose taps, per-pair true
      conv); fir: [4, 4] normalized taps; gain: blur gain (up**2).
    Returns [B, O, 2H, 2W], numerically equal to
      blur(conv_transpose2d_torch(x, w.T, 2), fir*gain, pad=(1, 1)).
    """
    o, i, k, _ = weight.shape
    kh = fir.shape[0]
    assert k == 3 and kh == 4, "phase decomposition specialized to k=3, 4-tap FIR"
    g, _pad = fuse_fir_upsample(weight, fir, gain)  # [6, 6, I, O] HWIO correlation kernel
    # phase subkernels: K[py,px][dy+1, dx+1] = G[2dy+3-py, 2dx+3-px]
    dy = jnp.arange(3) * 2 + 1  # 2*(-1..1) + 3
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            phases.append(g[dy[:, None] - py, dy[None, :] - px])  # [3, 3, I, O]
    kern = jnp.concatenate(phases, axis=-1)  # [3, 3, I, 4*O]
    b, _, h, w = x.shape
    out = jax.lax.conv_general_dilated(
        x,
        kern.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )  # [B, 4*O, H, W] ordered (py, px, O)
    out = out.reshape(b, 2, 2, o, h, w)
    out = jnp.transpose(out, (0, 3, 4, 1, 5, 2))  # [B, O, H, 2, W, 2]
    return out.reshape(b, o, 2 * h, 2 * w)


# ---- StyleGAN2 resampling wrappers (reference stylesdf_model.py:96-165) ----


def upsample2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """FIR 2x upsample (reference `Upsample`, factor fixed at 2)."""
    factor = 2
    kh = kernel.shape[0]
    p = kh - factor
    k = kernel * (factor**2)
    return upfirdn2d(x, k, up=factor, down=1, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """FIR 2x downsample (reference `Downsample`)."""
    factor = 2
    kh = kernel.shape[0]
    p = kh - factor
    return upfirdn2d(x, kernel, up=1, down=factor, pad=((p + 1) // 2, p // 2))


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: tuple[int, int], upsample_factor: int = 1) -> jnp.ndarray:
    """FIR blur with optional gain for upsample paths (reference `Blur`)."""
    k = kernel * (upsample_factor**2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, pad=pad)
