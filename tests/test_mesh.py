"""Tests for the native marching-tetrahedra mesh path."""

import numpy as np
import pytest

from e3dge_tpu.utils.mesh import (
    _load_native,
    _march_numpy,
    align_volume,
    extract_mesh,
    march,
    save_obj,
    weld,
    xyz2mesh,
)


def _sphere_sdf(n=24, r=0.35):
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (np.sqrt(x**2 + y**2 + z**2) - r).astype(np.float32)


def test_native_library_builds():
    assert _load_native() is not None, "C++ marching library failed to build"


def test_march_sphere_native():
    sdf = _sphere_sdf()
    tris = march(sdf, 0.0)
    assert len(tris) > 100
    # all triangle vertices lie near the sphere of radius 0.35 (grid units)
    verts = tris.reshape(-1, 3)
    center = (sdf.shape[0] - 1) / 2.0
    rad = np.linalg.norm(verts - center, axis=-1) * (2.0 / (sdf.shape[0] - 1))
    np.testing.assert_allclose(rad.mean(), 0.35, atol=0.02)
    assert rad.std() < 0.02


def test_native_matches_numpy():
    sdf = _sphere_sdf(10)
    t_native = march(sdf)
    t_numpy = _march_numpy(sdf)
    assert len(t_native) == len(t_numpy)
    np.testing.assert_allclose(
        np.sort(t_native.reshape(-1)), np.sort(t_numpy.reshape(-1)), atol=1e-5
    )


def test_extract_mesh_and_obj(tmp_path):
    verts, faces = extract_mesh(_sphere_sdf(16))
    assert len(verts) > 0 and len(faces) > 0
    assert faces.max() < len(verts)
    # scene scale: verts within +-0.12
    assert np.abs(verts).max() <= 0.12 + 1e-5
    p = tmp_path / "mesh.obj"
    save_obj(p, verts, faces)
    lines = p.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == len(verts)
    assert sum(1 for l in lines if l.startswith("f ")) == len(faces)


def test_weld_dedups():
    tri = np.zeros((2, 3, 3), dtype=np.float32)
    tri[0] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    tri[1] = [[1, 0, 0], [1, 1, 0], [0, 1, 0]]
    verts, faces = weld(tri)
    assert len(verts) == 4  # two shared vertices welded
    assert faces.shape == (2, 3)


def test_xyz2mesh():
    xyz = np.random.rand(4, 5, 3).astype(np.float32)
    verts, faces = xyz2mesh(xyz)
    assert verts.shape == (20, 3)
    assert faces.shape == (2 * 3 * 4, 3)


def test_align_volume_shapes():
    import jax.numpy as jnp

    sdf = jnp.ones((1, 8, 8, 6, 1))
    out = align_volume(sdf)
    assert out.shape == (1, 8, 8, 6, 1)
    # constant volume stays constant in the interior
    assert np.allclose(np.asarray(out)[0, 2:-2, 2:-2, 1:-1, 0], 1.0, atol=1e-4)


def test_vertex_normals_and_phong():
    """Sphere-ish quad: normals unit-length, outward; Phong intensity bounded and
    brighter for a face turned toward the light."""
    from e3dge_tpu.utils.mesh import phong_vertex_intensity, vertex_normals

    # single triangle in the z=0 plane, CCW seen from +z -> normal +z
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    n = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(n, np.tile([[0, 0, 1.0]], (3, 1)), atol=1e-6)

    cam = np.array([0, 0, 1.0], np.float32)
    lit = phong_vertex_intensity(verts, n, cam)  # light at (0,0,5): facing it
    unlit = phong_vertex_intensity(verts, -n, cam)  # facing away -> ambient only
    assert np.all(lit > unlit)
    np.testing.assert_allclose(unlit, 0.1, atol=1e-6)  # ambient term
    assert np.all((lit >= 0) & (lit <= 1))


def test_project_to_screen_center():
    """A vertex on the optical axis in front of the camera lands mid-image."""
    from e3dge_tpu.utils.mesh import project_to_screen

    # identity calib: camera at origin looking down -z (depth = -z)
    calib = np.eye(4, dtype=np.float32)
    screen = project_to_screen(np.array([[0, 0, -1.0]], np.float32), calib, 64, 64)
    np.testing.assert_allclose(screen[0, :2], [32.0, 32.0], atol=1e-5)
    assert screen[0, 2] > 0
