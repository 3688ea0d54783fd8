"""Tests for 3D eval metrics and the native rasterizer / noise projection."""

import jax.numpy as jnp
import numpy as np

from e3dge_tpu.training.eval3d import batched_chamfer, chamfer_distance, depth_error, normal_consistency
from e3dge_tpu.utils.mesh import project_noise, rasterize


def test_chamfer():
    a = jnp.asarray([[0.0, 0, 0], [1, 0, 0]])
    assert float(chamfer_distance(a, a)) == 0.0
    b = a + jnp.asarray([0.1, 0.0, 0.0])
    np.testing.assert_allclose(float(chamfer_distance(a, b)), 2 * 0.01, rtol=1e-5)
    out = batched_chamfer(a[None], b[None])
    assert out.shape == (1,)


def test_depth_and_normal_metrics():
    d = jnp.ones((1, 4, 4))
    m = depth_error(d, d + 0.5)
    np.testing.assert_allclose(float(m["depth_l1"]), 0.5, rtol=1e-6)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (4, 4, 3))
    np.testing.assert_allclose(float(normal_consistency(n, n)), 1.0, rtol=1e-6)


def test_umeyama_recovers_similarity():
    from e3dge_tpu.training.eval3d import umeyama

    rng = np.random.RandomState(0)
    src = rng.randn(7, 3)
    # ground-truth similarity
    theta = 0.4
    R_gt = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ])
    s_gt, t_gt = 2.5, np.array([0.3, -1.0, 4.0])
    dst = s_gt * src @ R_gt.T + t_gt
    s, R, t = umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_gt, rtol=1e-8)
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt, atol=1e-8)
    np.testing.assert_allclose(s * src @ R.T + t, dst, atol=1e-8)


def test_scan_to_mesh_distance_exact():
    from e3dge_tpu.training.eval3d import scan_to_mesh_distance

    # unit right triangle in z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    pts = np.array([
        [0.25, 0.25, 0.0],   # on the face -> 0
        [0.25, 0.25, 0.5],   # above the face -> 0.5
        [-1.0, 0.0, 0.0],    # beyond vertex A along -x -> 1.0
        [0.5, -0.3, 0.0],    # below edge AB -> 0.3
    ], np.float32)
    d = scan_to_mesh_distance(pts, verts, faces)
    np.testing.assert_allclose(d, [0.0, 0.5, 1.0, 0.3], atol=1e-5)


def test_now_scan_error_landmark_alignment():
    """Transformed copy of a mesh scores ~0 after landmark Umeyama alignment."""
    from e3dge_tpu.training.eval3d import now_scan_error

    rng = np.random.RandomState(1)
    # icosahedron-ish random mesh: points on a sphere + faces from hull-ish triples
    verts = rng.randn(40, 3)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.stack([np.arange(0, 38), np.arange(1, 39), np.arange(2, 40)], axis=1)
    # scan = similarity-transformed vertex samples
    theta = -0.7
    R = np.array([
        [np.cos(theta), 0, np.sin(theta)],
        [0, 1, 0],
        [-np.sin(theta), 0, np.cos(theta)],
    ])
    s, t = 12.0, np.array([5.0, -2.0, 1.0])
    scan = s * verts @ R.T + t
    lms_idx = np.arange(7)
    d = now_scan_error(
        verts, faces, scan, pred_lms=verts[lms_idx], scan_lms=scan[lms_idx], crop_radius=None
    )
    assert d.max() < 1e-4


def test_rasterize_triangle():
    # one triangle covering the lower-left half of an 8x8 image
    verts = np.array([[0, 0, 1.0], [8, 0, 1.0], [0, 8, 1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    color, depth = rasterize(verts, faces, np.array([2.0, 2.0, 2.0], np.float32), 8, 8)
    assert color[1, 1] == 2.0 and depth[1, 1] == 1.0
    assert depth[7, 7] == 0.0  # background
    # z-buffer: nearer triangle wins
    verts2 = np.concatenate([verts, verts * np.array([1, 1, 0.5], np.float32)])
    faces2 = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors2 = np.array([2, 2, 2, 5, 5, 5], np.float32)
    c2, d2 = rasterize(verts2, faces2, colors2, 8, 8)
    assert c2[1, 1] == 5.0 and abs(d2[1, 1] - 0.5) < 1e-6


def test_project_noise():
    # a big quad in front of the camera at origin-ish depth 1
    # +-0.02 in scene units ~ +-0.19 in uv (fov half-angle 6 deg): covers the
    # central ~12 pixels of a 64-image, leaving the corners background
    verts = np.array(
        [[-0.02, -0.02, 0.0], [0.02, -0.02, 0.0], [0.02, 0.02, 0.0], [-0.02, 0.02, 0.0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # frontal camera calib (azim=elev=0): from camera.py conventions
    import jax

    from e3dge_tpu.render.camera import camera_params_from_angles

    cam = camera_params_from_angles(jnp.asarray([0.0]), jnp.asarray([0.0]), 64)
    noise = np.random.randn(1, 1, 64, 64).astype(np.float32)
    out, vert_noise = project_noise(noise, verts, faces, np.asarray(cam.calibs[0]))
    assert out.shape == noise.shape
    # center pixels covered by the quad -> projected values differ from input noise
    assert not np.allclose(out[0, 0, 28:36, 28:36], noise[0, 0, 28:36, 28:36])
    # far corners uncovered -> original noise kept
    np.testing.assert_allclose(out[0, 0, :4, :4], noise[0, 0, :4, :4])


def test_landmark_98_to_7():
    import numpy as np

    from e3dge_tpu.training.eval3d import landmark_98_to_7

    lms = np.arange(98 * 2, dtype=np.float32).reshape(98, 2)
    out = landmark_98_to_7(lms)
    assert out.shape == (7, 2)
    np.testing.assert_array_equal(out[0], lms[60])
    np.testing.assert_array_equal(out[4], lms[57])
    np.testing.assert_array_equal(out[6], lms[92])
