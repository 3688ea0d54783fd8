"""Pallas TPU kernel: fused FiLM-SIREN field query (HOT LOOP #1).

The volume renderer queries the SIREN MLP at N = H*W*S ray samples per image
(98k at the default 64^2 x 24). In the layer-by-layer XLA formulation every hidden
activation [N, 256] (~100 MB f32) round-trips HBM between layers — the render is
bandwidth-bound. This kernel keeps ALL layer weights (~0.7 MB) resident in VMEM and
streams point tiles through the entire 8-layer backbone + SDF/view/RGB heads, so HBM
traffic drops to one read of the inputs and one write of the outputs (~25x less).

Numerics mirror models/siren.py exactly:
  h_i   = sin(gamma_i * (h W_i^T + b_i) + beta_i)            (FiLM per layer)
  sdf   = h W_sigma^T + b_sigma
  feat  = sin(gamma_v * (h W_vh^T + dirs W_vd^T + b_v) + beta_v)
  rgb   = feat W_rgb^T + b_rgb
with optional local SFT modulation h <- (alpha+1)*h + beta before the view layer.

gamma/beta FiLM vectors are tiny per-style matmuls computed OUTSIDE the kernel.
The kernel is exact (f32 accumulate) — used on the inference path; training uses the
XLA formulation (same math) so autodiff needs no custom VJP.

VERDICT (r3, scripts/bench_field.py at the 98304-pt serving shape, honest sync):
  XLA f32+sin 8.54 ms | pallas highest 8.23 ms | XLA bf16+fast_sin 2.74 ms |
  pallas serving (bf16 mm + fast_sin) 3.67 ms.
The r2 sine bottleneck is gone on both paths; with it gone the XLA formulation
wins standalone by 25% (pipelined whole-array matmuls beat the kernel's
sequential per-tile layer loop) and more e2e (pallas_call is a fusion barrier).
Fusing volume integration into the kernel cannot flip this: the raw
[B,H,W,S,260] round-trip it would remove costs ~0.13 ms at HBM bandwidth.
MEASURED DEAD END — kept for parity tests / future multi-chip ring experiments;
production keeps renderer.fused_inference=False.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _siren_kernel(
    pts_ref,      # [T, 8]   (xyz padded to 8 lanes)
    dirs_ref,     # [T, 8]
    w_first_ref,  # [8, W]   (first layer weight, padded input dim)
    w_stack_ref,  # [D-1, W, W]
    b_stack_ref,  # [D, W]   (first layer bias at row 0)
    gamma_ref,    # [D+1, W]
    beta_ref,     # [D+1, W]
    w_vh_ref,     # [W, W]   views_linears weight for the h part
    w_vd_ref,     # [8, W]   views_linears weight for the dirs part
    b_v_ref,      # [1, W]
    w_heads_ref,  # [W, 8]   columns: rgb(3), sdf(1), zero-pad
    b_heads_ref,  # [1, 8]
    alpha_ref,    # [T, W]   local SFT alpha (zeros when disabled)
    lbeta_ref,    # [T, W]   local SFT beta
    feat_ref,     # out [T, W]
    out_ref,      # out [T, 8] (rgb, sdf, pad)
    *,
    depth: int,
    precision: str,
):
    f32 = jnp.float32

    # r2 measured the f32+jnp.sin kernel VPU-bound (sin() on N*W*(D+1) ~ 226M
    # elements ~ 9 ms). 'serving' applies the same fixes as the XLA serving path
    # (models/siren.py): bf16 MXU matmuls with f32 accumulate + the range-reduced
    # polynomial fast_sin (ops/fast_math.py, ~6 FMAs, max err 9.6e-8) — matching
    # the bf16 field tolerance the precision tests already pin. 'highest' keeps
    # exact f32 + jnp.sin for golden parity.
    if precision in ("bf16", "serving"):
        def mm(a, w):
            return jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=f32)
    else:
        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=f32)
    if precision == "serving":
        from e3dge_tpu.ops.fast_math import fast_sin as sin_fn
    else:
        sin_fn = jnp.sin

    pts = pts_ref[:]
    # layer 0: [T, 8] @ [8, W]
    h = mm(pts, w_first_ref[:])
    h = sin_fn(gamma_ref[0][None, :] * (h + b_stack_ref[0][None, :]) + beta_ref[0][None, :])
    # layers 1..D-1
    for i in range(depth - 1):
        z = mm(h, w_stack_ref[i])
        h = sin_fn(
            gamma_ref[i + 1][None, :] * (z + b_stack_ref[i + 1][None, :]) + beta_ref[i + 1][None, :]
        )
    # sdf head reads the UNMODULATED backbone (models/siren.py geo_head)
    sdf = mm(h, w_heads_ref[:])
    # local SFT modulation of the tex branch only (identity when alpha=beta=0)
    h = (alpha_ref[:] + 1.0) * h + lbeta_ref[:]
    # view-conditioned feature layer
    zv = mm(h, w_vh_ref[:]) + mm(dirs_ref[:], w_vd_ref[:]) + b_v_ref[0][None, :]
    feat = sin_fn(gamma_ref[depth][None, :] * zv + beta_ref[depth][None, :])
    feat_ref[:] = feat
    # heads: rgb (cols 0..2) from feat, sdf (col 3) from the backbone
    rgb_sdf = mm(feat, w_heads_ref[:]) + b_heads_ref[0][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, rgb_sdf.shape, 1)
    out_ref[:] = jnp.where(col == 3, sdf + b_heads_ref[0][None, :], rgb_sdf)


def pack_siren_params(params: dict, depth: int = 8, width: int = 256):
    """SirenGenerator flax params -> dense kernel operand pack (traceable: params may
    be jit tracers)."""
    p = params
    w_first = jnp.zeros((8, width), jnp.float32).at[:3].set(jnp.transpose(p["pts_linears_0"]["weight"]))
    w_stack = jnp.stack(
        [jnp.transpose(p[f"pts_linears_{i}"]["weight"]) for i in range(1, depth)]
    )  # [D-1, W, W]
    b_stack = jnp.stack([p[f"pts_linears_{i}"]["bias"] for i in range(depth)])

    wv = jnp.transpose(p["views_linears"]["weight"])  # [W+3, W]
    w_vh = wv[:width]
    w_vd = jnp.zeros((8, width), jnp.float32).at[:3].set(wv[width:])
    b_v = p["views_linears"]["bias"][None]

    # heads: rgb [W,3] in cols 0..2; sigma [W,1] in col 3 (std_init=1, bias_init=0)
    w_heads = (
        jnp.zeros((width, 8), jnp.float32)
        .at[:, :3].set(jnp.transpose(p["rgb_linear"]["weight"]))
        .at[:, 3:4].set(jnp.transpose(p["sigma_linear"]["weight"]))
    )
    b_heads = (
        jnp.zeros((1, 8), jnp.float32)
        .at[0, :3].set(p["rgb_linear"]["bias"])
        .at[0, 3].set(p["sigma_linear"]["bias"][0])
    )
    return dict(
        w_first=w_first,
        w_stack=w_stack,
        b_stack=b_stack,
        w_vh=w_vh,
        w_vd=w_vd,
        b_v=b_v,
        w_heads=w_heads,
        b_heads=b_heads,
    )


def film_vectors(params: dict, styles: jnp.ndarray, depth: int = 8):
    """Per-layer gamma/beta from W+ styles (tiny matmuls, outside the kernel).

    styles: [D+1, style_dim] for ONE batch item (or [style_dim] broadcast).
    Returns gamma, beta each [D+1, W].
    """

    def head(layer_params, s):
        w = layer_params["weight"]
        b = layer_params["bias"]
        return s @ jnp.asarray(w).T + jnp.asarray(b)

    gammas, betas = [], []
    names = [f"pts_linears_{i}" for i in range(depth)] + ["views_linears"]
    for i, name in enumerate(names):
        s = styles[min(i, styles.shape[0] - 1)] if styles.ndim == 2 else styles
        g = 15.0 * head(params[name]["gamma"], s) + 30.0
        b = 0.25 * head(params[name]["beta"], s)
        gammas.append(g)
        betas.append(b)
    return jnp.stack(gammas), jnp.stack(betas)


@partial(jax.jit, static_argnames=("depth", "width", "tile", "precision"))
def siren_query_fused(
    pts: jnp.ndarray,     # [N, 3] (already box-warped)
    dirs: jnp.ndarray,    # [N, 3]
    pack: dict,
    gamma: jnp.ndarray,   # [D+1, W]
    beta: jnp.ndarray,    # [D+1, W]
    alpha: jnp.ndarray | None = None,  # [N, W] local SFT
    lbeta: jnp.ndarray | None = None,
    depth: int = 8,
    width: int = 256,
    tile: int = 1024,
    precision: str = "highest",
):
    """Fused field query for one batch item: returns (feat [N, W], rgb_sdf [N, 8]).

    precision: 'highest' (exact f32 + jnp.sin — default, golden-parity), 'serving'
    (bf16 matmuls + fast_sin, matching the XLA bf16 serving field), or 'bf16'
    (bf16 matmuls + jnp.sin, experimental)."""
    n = pts.shape[0]
    n_pad = _round_up(n, tile)

    def pad_rows(x, w8):
        out = jnp.zeros((n_pad, w8), x.dtype)
        return out.at[:n, : x.shape[1]].set(x)

    pts8 = pad_rows(pts, 8)
    dirs8 = pad_rows(dirs, 8)
    if alpha is None:
        alpha = jnp.zeros((n_pad, width), jnp.float32)
        lbeta = jnp.zeros((n_pad, width), jnp.float32)
    else:
        alpha = pad_rows(alpha, width)
        lbeta = pad_rows(lbeta, width)

    grid = (n_pad // tile,)
    # CPU (tests / virtual meshes) runs the kernel in interpreter mode
    interpret = jax.default_backend() == "cpu"

    def row_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    feat, out = pl.pallas_call(
        partial(_siren_kernel, depth=depth, precision=precision),
        grid=grid,
        in_specs=[
            row_spec(8),                          # pts
            row_spec(8),                          # dirs
            full_spec((8, width)),                # w_first
            full_spec((depth - 1, width, width)),  # w_stack
            full_spec((depth, width)),            # b_stack
            full_spec((depth + 1, width)),        # gamma
            full_spec((depth + 1, width)),        # beta
            full_spec((width, width)),            # w_vh
            full_spec((8, width)),                # w_vd
            full_spec((1, width)),                # b_v
            full_spec((width, 8)),                # w_heads
            full_spec((1, 8)),                    # b_heads
            row_spec(width),                      # alpha
            row_spec(width),                      # lbeta
        ],
        out_specs=[row_spec(width), row_spec(8)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, width), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * width * (8 + (depth - 1) * width + width + 8 + 8),
            bytes_accessed=n_pad * (8 + 8 + 2 * width + width + 8) * 4,
            transcendentals=n_pad * width * (depth + 1),
        ),
        interpret=interpret,
    )(
        pts8,
        dirs8,
        pack["w_first"],
        pack["w_stack"],
        pack["b_stack"],
        gamma,
        beta,
        pack["w_vh"],
        pack["w_vd"],
        pack["b_v"],
        pack["w_heads"],
        pack["b_heads"],
        alpha,
        lbeta,
    )
    return feat[:n], out[:n]
