"""Space-to-depth (phase-space) forms of the StyleGAN2 pyramid ops.

Motivation (r3 xprof of the isolated decoder, scripts/bench_decoder.py): the
>512^2 tail convs run at 32 of 128 MXU lanes AND pay 6-11 ms layout-conversion
copies per conv fwd/bwd (Mosaic's conv emitters relayout the [1025,32,130,32]-
class bf16 tensors on both sides). Working in PHASE SPACE — x[B,C,2H,2W] stored
as x_ph[B,4C,H,W], phase-major channel order c_ph = (2a+b)*C + c for full-res
pixel (2i+a, 2j+b) — keeps every tail tensor at half resolution with 4x the
channels: full lane width, no pathological layouts, and the post-upsample FIR
blur folds into the conv_transpose kernel with no depth-to-space interleave
(the interleave is what made the r2 `conv_transpose2x_blur_phased` form lose;
here phases are only re-interleaved ONCE, on the final 3-channel RGB).

All kernels are assembled from the UNCHANGED torch-layout parameters, so the
phase path is numerically the standard path up to float reassociation (pinned
by tests/test_s2d.py). Reference semantics: Decoder conv pyramid,
`project/models/stylesdf_model.py:587-797` + Blur (:96-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from e3dge_tpu.ops.upfirdn2d import fuse_fir_upsample


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, 2H, 2W] -> [B, 4C, H, W], phase-major: c_ph = (2a+b)*C + c."""
    b, c, h2, w2 = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, c, h, 2, w, 2)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))  # [B, 2(a), 2(b), C, H, W]
    return x.reshape(b, 4 * c, h, w)


def d2s(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of s2d: [B, 4C, H, W] -> [B, C, 2H, 2W]."""
    b, c4, h, w = x.shape
    c = c4 // 4
    x = x.reshape(b, 2, 2, c, h, w)
    x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))  # [B, C, H, a, W, b]
    return x.reshape(b, c, 2 * h, 2 * w)


def d2s_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """d2s as a one-hot stride-2 conv_transpose — bit-exact (each output taps
    exactly one input through a 1.0 weight) but ~2.6x faster on v5e than the
    reshape/transpose form, which Mosaic lowers to a pathological interleave
    copy (measured on the serving shape [1,12,512,512]: 2.48 ms reshape form
    vs 0.94 ms this form, r3 micro-bench). The MXU does the interleave in its
    native layout.

    SERVING-ONLY: in the isolated op micro-bench the conv form wins both
    directions, but in the full decoder fwd+bwd the reshape form's backward
    fuses into the surrounding fusions while the conv backward stays a
    standalone convolution — decoder fwd+bwd measured 84.6 ms (reshape), 87.1
    (this form), 88.5 (custom_vjp conv-fwd/reshape-bwd hybrid). The decoder
    therefore picks d2s_mxu only when train=False; see models/decoder.py."""
    b, c4, h, w = x.shape
    c = c4 // 4
    wgt = np.zeros((c4, c, 2, 2), np.float32)
    for a in (0, 1):
        for b2 in (0, 1):
            wgt[(2 * a + b2) * c : (2 * a + b2 + 1) * c, :, a, b2] = np.eye(c)
    # conv_transpose stride 2 == lhs-dilated correlation with the flipped kernel
    wf = jnp.asarray(wgt[:, :, ::-1, ::-1].transpose(2, 3, 0, 1), x.dtype)  # HWIO
    return jax.lax.conv_general_dilated(
        x, wf, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )


def conv_transpose2x_blur_phase_kernel(weight: jnp.ndarray, fir: np.ndarray, gain: float = 4.0):
    """Phased kernel for conv_transpose(stride 2, k=3) + FIR blur, output in
    phase space: returns HWIO [3, 3, I, 4O] for a stride-1 conv with padding 1
    whose output channel (2py+px)*O + o is full-res phase (py, px).

    Same math as ops/upfirdn2d.conv_transpose2x_blur_phased minus the final
    depth-to-space (we STAY in phase space)."""
    o, i, k, _ = weight.shape
    assert k == 3 and fir.shape[0] == 4
    g, _ = fuse_fir_upsample(weight, jnp.asarray(fir), gain)  # [6, 6, I, O]
    dy = jnp.arange(3) * 2 + 1
    phases = [g[dy[:, None] - py, dy[None, :] - px] for py in (0, 1) for px in (0, 1)]
    return jnp.concatenate(phases, axis=-1)  # [3, 3, I, 4O], phase-major O


def conv3x3_phase_kernel(weight: jnp.ndarray) -> jnp.ndarray:
    """[O, I, 3, 3] stride-1 pad-1 conv -> phase-space conv kernel
    [4O, 4I, 3, 3] (apply with conv2d_torch(x_ph, K, padding=1)).

    Placement rule (full-res Y = 2i + a, input Y' = Y + ky - 1 = 2(i+dy) + p):
    K[a-phase o, p-phase i, dy+1, dx+1] = W[o, i, ky, kx]. Each (a, ky) pair
    maps to exactly one (p, dy); 36 of 144 blocks are nonzero — 4x the MACs of
    the full-res conv, at 4x the lane utilization and none of the layout
    copies."""
    o, i, k, _ = weight.shape
    assert k == 3
    K = jnp.zeros((4 * o, 4 * i, 3, 3), weight.dtype)
    for a in (0, 1):
        for ky in range(3):
            t = a + ky - 1
            p, dyy = t % 2, (t - (t % 2)) // 2
            for b2 in (0, 1):
                for kx in range(3):
                    s = b2 + kx - 1
                    q, dxx = s % 2, (s - (s % 2)) // 2
                    K = K.at[
                        (2 * a + b2) * o : (2 * a + b2 + 1) * o,
                        (2 * p + q) * i : (2 * p + q + 1) * i,
                        dyy + 1,
                        dxx + 1,
                    ].set(weight[:, :, ky, kx])
    return K


def conv1x1_phase_kernel(weight: jnp.ndarray) -> jnp.ndarray:
    """[O, I, 1, 1] 1x1 conv -> block-diagonal phase kernel [4O, 4I, 1, 1]."""
    o, i = weight.shape[:2]
    K = jnp.zeros((4 * o, 4 * i, 1, 1), weight.dtype)
    for ph in range(4):
        K = K.at[ph * o : (ph + 1) * o, ph * i : (ph + 1) * i].set(weight)
    return K


def upsample2x_phases(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """upsample2x (zero-insert + 4-tap FIR, ops/upfirdn2d.upsample2x) with the
    output in phase space: [B, C, H, W] -> [B, 4C, H, W] == s2d(upsample2x(x)).

    Per output phase only 2 of the 4 taps hit non-zero (inserted) samples, so
    each phase is a 2x2-tap shifted-add on the ORIGINAL grid — no zero-inserted
    2x tensor is ever materialized (this is the ToRGB skip-accumulation path)."""
    kh = kernel.shape[0]
    assert kh == 4
    k2d = np.asarray(kernel, np.float64) * 4.0  # upsample gain (factor**2)
    kf = k2d[::-1, ::-1]
    # vertical taps per phase a: a=0 -> (kf[0], u=i-1), (kf[2], u=i)
    #                            a=1 -> (kf[1], u=i),   (kf[3], u=i+1)
    # (derived from upfirdn2d(up=2, pad=(2,1)); pinned by tests/test_s2d.py)
    taps = {0: ((0, -1), (2, 0)), 1: ((1, 0), (3, 1))}
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    h, w = x.shape[2], x.shape[3]
    outs = []
    for a in (0, 1):
        for b2 in (0, 1):
            acc = None
            for my, uy in taps[a]:
                for mx, ux in taps[b2]:
                    coeff = kf[my, mx]
                    sl = xp[:, :, 1 + uy : 1 + uy + h, 1 + ux : 1 + ux + w]
                    t = jnp.asarray(coeff, x.dtype) * sl
                    acc = t if acc is None else acc + t
            outs.append(acc)
    return jnp.concatenate(outs, axis=1)  # phase-major [B, 4C, H, W]


def s2d_strided(x: jnp.ndarray) -> jnp.ndarray:
    """s2d as a one-hot stride-2 conv — same trick as d2s_mxu (the reshape form
    lowers to an interleave copy; xprof showed it as the two 0.38 ms hot
    reshapes at the serving noise split). Bit-exact: each output taps one input
    through a 1.0 weight."""
    b, c, h2, w2 = x.shape
    wgt = np.zeros((4 * c, c, 2, 2), np.float32)
    for a in (0, 1):
        for b2 in (0, 1):
            wgt[(2 * a + b2) * c : (2 * a + b2 + 1) * c, :, a, b2] = np.eye(c)
    wf = jnp.asarray(wgt.transpose(2, 3, 1, 0), x.dtype)  # HWIO
    return jax.lax.conv_general_dilated(
        x, wf, (2, 2), ((0, 0), (0, 0)), dimension_numbers=("NCHW", "HWIO", "NCHW")
    )


def s2d_noise(noise: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[B, 1, 2H, 2W] per-layer decoder noise -> [B, 4*channels, H, W]: phase
    split then repeated per channel so index (2a+b)*C + c carries noise(2i+a,
    2j+b) — aligned with the phase-major image channel order."""
    ph = s2d_strided(noise)  # [B, 4, H, W]
    return jnp.repeat(ph, channels, axis=1)  # channel idx = phase*C + c
