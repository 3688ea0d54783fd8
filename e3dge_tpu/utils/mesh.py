"""Mesh export: frustum->cube volume alignment, isosurface extraction, OBJ I/O.

Mirrors the reference mesh path (`project/utils/mesh_utils.py:17-126`,
`volume_renderer.py:1733-1758`):

  align_volume      — warp the per-ray frustum SDF samples onto a cubic grid
                      (grid_sample with frustum adjustment, mesh_utils.py:17-44)
  extract_mesh      — marching tetrahedra at level 0 (native C++ via ctypes; numpy
                      fallback), rescale verts to +-0.12 scene scale, flip y/z
                      (mesh_utils.py:48-69)
  xyz2mesh          — Delaunay-style depth mesh from the surface xyz map
                      (mesh_utils.py:107-126)
  save_obj          — plain .obj writer (replaces trimesh export)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from e3dge_tpu.ops.grid_sample import grid_sample_3d

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "libmarching.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        except Exception:
            return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.march_tetrahedra.restype = ctypes.c_int64
    lib.march_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.rasterize.restype = ctypes.c_int64
    lib.rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def align_volume(sdf: jnp.ndarray, near: float = 0.88, far: float = 1.12) -> jnp.ndarray:
    """Warp [B, H, W, S, 1] frustum SDF samples into a cubic grid of the same shape.

    The renderer samples along a perspective frustum; marching cubes wants a
    regular box. Reference-exact (mesh_utils.py:17-44, golden-pinned): the cube
    xy extent equals the FAR slice's frustum extent, so near slices are read at
    xy coordinates scaled UP by linspace(far/near -> 1) over depth
    (frostum_adjustment_coeffs, :26-28); samples falling outside the frustum
    are border-clamped by the resample and then overwritten with +1 (outside
    the surface) to avoid marching-cubes artifacts (:41-44)."""
    b, h, w, s, _ = sdf.shape
    vol = jnp.transpose(sdf, (0, 4, 3, 1, 2))  # [B, C, S(D), H, W]

    # torch.meshgrid(linspace(h), linspace(w), linspace(d)) default 'ij'
    gy, gx, gz = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, h), jnp.linspace(-1.0, 1.0, w), jnp.linspace(-1.0, 1.0, s),
        indexing="ij",
    )  # [h, w, s] each; grid = stack([xx, yy, zz], -1)
    coeff = jnp.linspace(far / near, 1.0, s).reshape(1, 1, s)
    gxw = gx * coeff
    gyw = gy * coeff
    grid_hws = jnp.stack([gxw, gyw, gz], axis=-1)  # [h, w, s, 3]
    oob = jnp.any((grid_hws < -1.0) | (grid_hws > 1.0), axis=-1)  # [h, w, s]

    grid = jnp.transpose(grid_hws, (2, 0, 1, 3))[None]  # [1, D, H, W, 3]
    grid = jnp.broadcast_to(grid, (b, s, h, w, 3))
    out = grid_sample_3d(vol, grid, padding_mode="border")  # [B, C, D, H, W]
    final = jnp.transpose(out, (0, 3, 4, 2, 1))  # [B, H, W, D, C]
    return jnp.where(oob[None, :, :, :, None], jnp.asarray(1.0, final.dtype), final)


def _march_numpy(sdf: np.ndarray, iso: float = 0.0) -> np.ndarray:
    """Pure-numpy marching tetrahedra fallback (same decomposition as the C++)."""
    corners = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
    )
    tets = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])
    nx, ny, nz = sdf.shape
    tris = []

    def lerp(p0, p1, v0, v1):
        d = v1 - v0
        t = 0.5 if abs(d) < 1e-12 else np.clip((iso - v0) / d, 0.0, 1.0)
        return p0 + t * (p1 - p0)

    for x in range(nx - 1):
        for y in range(ny - 1):
            for z in range(nz - 1):
                v = np.array([sdf[x + c[0], y + c[1], z + c[2]] for c in corners])
                if (v >= iso).all() or (v < iso).all():
                    continue
                p = np.array([[x + c[0], y + c[1], z + c[2]] for c in corners], dtype=np.float64)
                for tet in tets:
                    inside = [i for i in tet if v[i] < iso]
                    # match the C++ ord[] fill: outside corners land back-to-front
                    outside = [i for i in tet if v[i] >= iso][::-1]
                    if not inside or not outside:
                        continue
                    if len(inside) == 1:
                        a = inside[0]
                        tris.append([lerp(p[a], p[o], v[a], v[o]) for o in outside])
                    elif len(inside) == 3:
                        a = outside[-1]  # C++ ord[3] = first-scanned outside corner
                        tris.append([lerp(p[a], p[i], v[a], v[i]) for i in inside])
                    else:
                        i0, i1 = inside
                        o0, o1 = outside  # ord[2], ord[3]
                        e00 = lerp(p[i0], p[o0], v[i0], v[o0])
                        e01 = lerp(p[i0], p[o1], v[i0], v[o1])
                        e10 = lerp(p[i1], p[o0], v[i1], v[o0])
                        e11 = lerp(p[i1], p[o1], v[i1], v[o1])
                        tris.append([e00, e01, e11])
                        tris.append([e00, e11, e10])
    if not tris:
        return np.zeros((0, 3, 3))
    return np.asarray(tris, dtype=np.float32)


def march(sdf: np.ndarray, iso: float = 0.0) -> np.ndarray:
    """Triangle soup [T, 3, 3] at the iso level; native C++ when available."""
    sdf = np.ascontiguousarray(sdf, dtype=np.float32)
    lib = _load_native()
    if lib is None:
        return _march_numpy(sdf, iso)
    max_tris = int(sdf.size * 12)  # generous: ~12 tris/cell worst case
    out = np.empty((max_tris, 3, 3), dtype=np.float32)
    n = lib.march_tetrahedra(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sdf.shape[0],
        sdf.shape[1],
        sdf.shape[2],
        ctypes.c_float(iso),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_tris,
    )
    if n < 0:
        raise RuntimeError("marching buffer overflow")
    return out[:n]


def weld(tris: np.ndarray, decimals: int = 5):
    """Triangle soup -> (verts [V,3], faces [T,3]) by welding identical vertices."""
    flat = tris.reshape(-1, 3)
    keys = np.round(flat, decimals)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    return uniq.astype(np.float32), faces.astype(np.int32)


def extract_mesh(sdf_vol: np.ndarray, scene_scale: float = 0.12):
    """Grid SDF [H, W, D] -> (verts, faces) in scene coordinates.

    Matches the reference rescale/flip (volume_renderer.py:1745-1753): coordinates
    normalized to +-scene_scale, y and z flipped to fix the normal direction. The
    input is permuted (y, x, z) -> (x, y, z) like the reference's sdf permute(1,0,2).
    """
    vol = np.transpose(np.asarray(sdf_vol), (1, 0, 2))
    tris = march(vol, 0.0)
    verts, faces = weld(tris)
    if len(verts):
        dims = np.array(vol.shape, dtype=np.float32)
        verts = (verts / dims - 0.5) * (2 * scene_scale)
        verts[:, 1] *= -1
        verts[:, 2] *= -1
        # flipping two axes preserves orientation; keep face winding
    return verts, faces


def xyz2mesh(xyz: np.ndarray):
    """Depth mesh: triangulate the per-pixel surface xyz map on its pixel grid
    (reference xyz2mesh, mesh_utils.py:107-126)."""
    h, w, _ = xyz.shape
    verts = xyz.reshape(-1, 3).astype(np.float32)
    idx = np.arange(h * w).reshape(h, w)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1), np.stack([b, d, c], -1)], 0)
    return verts, faces.astype(np.int32)


def rasterize(verts_screen: np.ndarray, faces: np.ndarray, vertex_color: np.ndarray, height: int, width: int):
    """Z-buffer rasterize a mesh: verts [V, 3] as (x_pix, y_pix, depth), faces
    [F, 3], vertex_color [V] -> (color [H, W], depth [H, W]; depth 0 = background).

    Native C++ (marching.cpp rasterize); replaces the reference's pytorch3d depth
    renderer on the noise-projection path."""
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (build e3dge_tpu/native)")
    v = np.ascontiguousarray(verts_screen, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    c = np.ascontiguousarray(vertex_color, dtype=np.float32)
    out_color = np.empty((height, width), np.float32)
    out_depth = np.empty((height, width), np.float32)
    lib.rasterize(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(f),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        out_color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_color, out_depth


def project_to_screen(verts: np.ndarray, calibs: np.ndarray, height: int, width: int) -> np.ndarray:
    """World-space verts [V, 3] -> screen verts [V, 3] (x_pix, y_pix, depth) through
    a uv-space calib [4, 4], with the grid-convention y-flip (HGPIFuGANNet.py:114-115)."""
    homo = calibs[:3, :3] @ verts.T + calibs[:3, 3:4]  # [3, V]
    depth = -homo[2]
    safe = np.where(np.abs(depth) < 1e-8, 1e-8, depth)
    u = homo[0] / safe
    v = -homo[1] / safe
    x_pix = (u + 1.0) * 0.5 * width
    y_pix = (v + 1.0) * 0.5 * height
    return np.stack([x_pix, y_pix, depth], axis=-1).astype(np.float32)


def project_noise(
    noise: np.ndarray,          # [1, 1, H, W] current noise buffer
    verts: np.ndarray,          # [V, 3] world-space mesh verts
    faces: np.ndarray,          # [F, 3]
    calibs: np.ndarray,         # [4, 4] uv-space calib for the target view
    vert_noise: np.ndarray | None = None,  # [V] fixed per-vertex noise
    prev_noise: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Geometry-aware noise projection (reference NoiseInjection.project_noise,
    stylesdf_model.py:423-457): rasterize a fixed per-vertex noise texture through
    the view; keep the previous noise where the mesh gives no coverage. Returns
    (projected noise [1, 1, H, W], vert_noise for reuse across frames)."""
    _, _, h, w = noise.shape
    if vert_noise is None:
        vert_noise = np.random.RandomState(0).randn(len(verts)).astype(np.float32)
    screen = project_to_screen(verts, calibs, h, w)
    color, dep = rasterize(screen, faces, vert_noise, h, w)
    base = prev_noise if prev_noise is not None else noise
    out = np.where(dep[None, None] > 0, color[None, None], base)
    return out.astype(np.float32), vert_noise


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals [V, 3] (replaces trimesh vertex_normals
    used by the reference's Meshes construction, trainer.py:2295-2310)."""
    n = np.zeros_like(verts, dtype=np.float64)
    tri = verts[faces]  # [F, 3, 3]
    face_n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for i in range(3):
        np.add.at(n, faces[:, i], face_n)
    return (n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)).astype(np.float32)


def phong_vertex_intensity(
    verts: np.ndarray,
    normals: np.ndarray,
    cam_origin: np.ndarray,
    light_pos=(0.0, 0.0, 5.0),
    ambient: float = 0.1,
    diffuse: float = 0.65,
    specular: float = 0.2,
    shininess: float = 64.0,
) -> np.ndarray:
    """Per-vertex gray Phong intensity in [0, 1]. Lighting constants match the
    reference's create_mesh_renderer call (trainer.py:2320-2330: point light at
    (0, 0, 5), ambient 0.1, diffuse 0.65, specular 0.2; pytorch3d default
    shininess 64). Gray because the reference uses a textureless gray material."""
    l = np.asarray(light_pos, np.float32) - verts
    l = l / np.maximum(np.linalg.norm(l, axis=1, keepdims=True), 1e-12)
    v = np.asarray(cam_origin, np.float32) - verts
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    ndl = np.clip(np.sum(normals * l, axis=1), 0.0, None)
    r = 2.0 * ndl[:, None] * normals - l  # reflection of the light about the normal
    rdv = np.clip(np.sum(r * v, axis=1), 0.0, None)
    return np.clip(ambient + diffuse * ndl + specular * rdv**shininess, 0.0, 1.0).astype(np.float32)


def save_obj(path: str | os.PathLike, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces + 1:  # obj is 1-indexed
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def load_obj_vertices(path: str | os.PathLike) -> np.ndarray:
    """Vertex positions from a .obj (the NoW scans) — faces/uv ignored."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(verts, np.float64)
