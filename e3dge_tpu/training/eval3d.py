"""3D evaluation metrics (reference NoW/deca eval, trainer.py:2103-2208, 2639-2953).

The reference's 3D eval pipeline crops NoW scans and computes point-to-mesh errors
via external deca utilities. Here we provide the self-contained core metrics that
work on any (pred, gt) geometry pair:

  chamfer_distance    — symmetric point-set distance (used by the reference's
                        commented chamfer path, losses/builder.py:121-128)
  depth_error         — masked L1/RMSE between rendered depth maps
  normal_consistency  — cosine distance between surface normal maps

All run in JAX on device; point sets are plain arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer over [Na, 3], [Nb, 3] point sets (squared distances)."""
    d2 = jnp.sum((a[:, None] - b[None]) ** 2, axis=-1)  # [Na, Nb]
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def batched_chamfer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, M, 3] -> [B] chamfer distances."""
    return jax.vmap(chamfer_distance)(a, b)


def depth_error(pred_depth: jnp.ndarray, gt_depth: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Masked L1 + RMSE between depth maps (any matching shapes)."""
    diff = pred_depth - gt_depth
    if mask is not None:
        w = mask
        denom = jnp.maximum(jnp.sum(w), 1.0)
        l1 = jnp.sum(jnp.abs(diff) * w) / denom
        rmse = jnp.sqrt(jnp.sum(diff**2 * w) / denom)
    else:
        l1 = jnp.mean(jnp.abs(diff))
        rmse = jnp.sqrt(jnp.mean(diff**2))
    return {"depth_l1": l1, "depth_rmse": rmse}


def normal_consistency(pred_normals: jnp.ndarray, gt_normals: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Mean cosine similarity between normal maps [..., 3]."""

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    cos = jnp.sum(unit(pred_normals) * unit(gt_normals), axis=-1)
    if mask is not None:
        m = mask.reshape(cos.shape)
        return jnp.sum(cos * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(cos)


# ----------------------------------------------------- NoW point-to-scan scoring
#
# Self-contained equivalent of the official now_evaluation scorer the reference
# defers to (trainer.py:2205-2207 "please run main.py in now_evaluation"): rigid
# (similarity) alignment of the predicted mesh to the GT scan — by 7 landmarks
# when available (Umeyama), else ICP from a centroid/scale init — followed by
# scan-to-mesh distances (nearest vertex, refined by exact point-to-triangle
# against the faces incident to it), reported as mean/median/std.


import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform src -> dst over [N, 3] correspondences
    (Umeyama 1991). Returns (s, R [3,3], t [3]) with dst ~= s * src @ R.T + t."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def _nearest_vertex_dist(points: jnp.ndarray, verts: jnp.ndarray, chunk: int = 2048):
    """[Np] distances + [Np] indices of the nearest vertex, chunked over points."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts = pts.reshape(-1, chunk, 3)

    def one(p):
        d2 = jnp.sum((p[:, None] - verts[None]) ** 2, axis=-1)  # [chunk, Nv]
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1)

    d2, idx = jax.lax.map(one, pts)
    return jnp.sqrt(d2.reshape(-1)[:n]), idx.reshape(-1)[:n]


def _point_triangle_dist(p: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Exact distances from points [N, 3] to triangles [N, K, 3, 3] (per-point
    candidate sets), vectorized numpy; returns [N] min distance over K."""
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab, ac = b - a, c - a
    ap = p[:, None] - a
    # project into the triangle plane via barycentric clamping (Ericson 5.1.5)
    d1 = np.einsum("nkd,nkd->nk", ab, ap)
    d2 = np.einsum("nkd,nkd->nk", ac, ap)
    bp = p[:, None] - b
    d3 = np.einsum("nkd,nkd->nk", ab, bp)
    d4 = np.einsum("nkd,nkd->nk", ac, bp)
    cp = p[:, None] - c
    d5 = np.einsum("nkd,nkd->nk", ab, cp)
    d6 = np.einsum("nkd,nkd->nk", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-30)
    v = np.clip(vb / denom, 0.0, 1.0)
    w = np.clip(vc / denom, 0.0, 1.0)
    # clamp region by region (vertex / edge / face)
    closest = a + v[..., None] * ab + w[..., None] * ac
    # vertex regions
    closest = np.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, closest)
    closest = np.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, closest)
    closest = np.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, closest)
    # edge AB
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = np.clip(d1 / np.maximum(d1 - d3, 1e-30), 0, 1)
    closest = np.where(on_ab[..., None], a + t_ab[..., None] * ab, closest)
    # edge AC
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ac = np.clip(d2 / np.maximum(d2 - d6, 1e-30), 0, 1)
    closest = np.where(on_ac[..., None], a + t_ac[..., None] * ac, closest)
    # edge BC
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = np.clip((d4 - d3) / np.maximum((d4 - d3) + (d5 - d6), 1e-30), 0, 1)
    closest = np.where(on_bc[..., None], b + t_bc[..., None] * (c - b), closest)

    d = np.linalg.norm(p[:, None] - closest, axis=-1)
    return d.min(axis=1)


def scan_to_mesh_distance(
    scan_points: np.ndarray, verts: np.ndarray, faces: np.ndarray, max_incident: int = 16
) -> np.ndarray:
    """Per-scan-point distance to the mesh: nearest vertex (JAX, chunked pairwise)
    refined by exact point-to-triangle distance over that vertex's incident faces."""
    scan_points = np.asarray(scan_points, np.float32)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    if len(faces) == 0 or len(verts) == 0:
        return np.full((len(scan_points),), np.inf, np.float32)

    d_vert, idx = _nearest_vertex_dist(jnp.asarray(scan_points), jnp.asarray(verts))
    d_vert, idx = np.asarray(d_vert), np.asarray(idx)

    # vertex -> incident faces table, padded to max_incident with face 0
    incident = np.zeros((len(verts), max_incident), np.int64)
    counts = np.zeros((len(verts),), np.int64)
    for fi, f in enumerate(faces):
        for v in f:
            c = counts[v]
            if c < max_incident:
                incident[v, c] = fi
                counts[v] = c + 1
    cand = incident[idx]  # [Np, K]
    tri = verts[faces[cand]]  # [Np, K, 3, 3]
    d_tri = _point_triangle_dist(scan_points.astype(np.float64), tri.astype(np.float64))
    has_face = counts[idx] > 0
    return np.where(has_face, np.minimum(d_vert, d_tri), d_vert).astype(np.float32)


def icp_align(
    src: np.ndarray, dst: np.ndarray, iters: int = 30, with_scale: bool = True, sample: int = 4096
):
    """ICP similarity alignment src -> dst point sets, initialized from centroid +
    RMS-scale matching. Returns (s, R, t)."""
    rng = np.random.RandomState(0)
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    s = float(np.sqrt(((dst - dst.mean(0)) ** 2).sum(1).mean() / max(((src - src.mean(0)) ** 2).sum(1).mean(), 1e-12)))
    R = np.eye(3)
    t = dst.mean(0) - s * src.mean(0)
    src_s = src[rng.choice(len(src), min(sample, len(src)), replace=False)]
    dst_j = jnp.asarray(dst[rng.choice(len(dst), min(sample * 4, len(dst)), replace=False)], jnp.float32)
    for _ in range(iters):
        cur = src_s @ (s * R).T + t
        _, idx = _nearest_vertex_dist(jnp.asarray(cur, jnp.float32), dst_j)
        corr = np.asarray(dst_j)[np.asarray(idx)]
        s, R, t = umeyama(src_s, corr, with_scale=with_scale)
    return s, R, t


def parse_picked_points(path) -> np.ndarray:
    """MeshLab .pp picked-points file -> [N, 3] (the NoW landmark format)."""
    import re

    pts = []
    for m in re.finditer(r'<point[^>]*/>', open(path).read()):
        tag = m.group(0)
        get = lambda k: float(re.search(rf'{k}="([^"]+)"', tag).group(1))
        pts.append([get("x"), get("y"), get("z")])
    return np.asarray(pts, np.float64)


def now_scan_error(
    pred_verts: np.ndarray,
    pred_faces: np.ndarray,
    scan_points: np.ndarray,
    pred_lms: np.ndarray | None = None,
    scan_lms: np.ndarray | None = None,
    crop_radius: float | None = 100.0,
) -> np.ndarray:
    """Official-NoW-style error: similarity-align the predicted mesh to the scan
    (7 landmarks when both sides are given, else ICP), crop the scan to the
    face region around the aligned mesh (the official scorer crops by landmarks),
    and return per-point scan-to-mesh distances (scan units; mm for NoW)."""
    if pred_lms is not None and scan_lms is not None:
        s, R, t = umeyama(pred_lms, scan_lms, with_scale=True)
    else:
        s, R, t = icp_align(pred_verts, scan_points)
    aligned = np.asarray(pred_verts, np.float64) @ (s * R).T + t

    scan = np.asarray(scan_points, np.float64)
    if crop_radius is not None:
        center = scan_lms.mean(0) if scan_lms is not None else aligned.mean(0)
        scan = scan[np.linalg.norm(scan - center, axis=1) < crop_radius]
        if len(scan) == 0:
            scan = np.asarray(scan_points, np.float64)
    return scan_to_mesh_distance(scan.astype(np.float32), aligned.astype(np.float32), pred_faces)


def landmark_98_to_7(landmark_98: np.ndarray) -> np.ndarray:
    """98-point detector landmarks -> the 7 NoW-evaluation landmarks (reference
    utils/misc_utils.py:297-319): eye corners (60/64/68/72), nose tip (57),
    mouth corners (76/92)."""
    idx = [60, 64, 68, 72, 57, 76, 92]
    return np.asarray(landmark_98, np.float32)[idx]
