"""Camera projection and parameter file parsing."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.models.camera import (Camera, load_cameras_txt,
                                             project_points,
                                             save_cameras_txt)


def make_cameras(rng, n=4):
    from scipy.spatial.transform import Rotation as R
    rots = R.random(n, random_state=np.random.RandomState(0)).as_matrix()
    return Camera(
        rotation=jnp.asarray(rots, jnp.float32),
        translation=jnp.asarray(
            rng.standard_normal((n, 3)) + [0, 0, 10], jnp.float32),
        focal=jnp.asarray(2000 + 100 * rng.random((n, 2)), jnp.float32),
        center=jnp.asarray(1000 + 50 * rng.random((n, 2)), jnp.float32),
    )


def test_projection_matches_manual(rng):
    cam = make_cameras(rng)
    pts = jnp.asarray(rng.standard_normal((17, 3)), jnp.float32)
    proj = np.asarray(project_points(cam, pts))
    assert proj.shape == (4, 17, 2)
    for v in range(4):
        for i in range(17):
            p = np.asarray(cam.rotation[v]) @ np.asarray(pts[i]) + \
                np.asarray(cam.translation[v])
            xy = p[:2] / p[2]
            expect = xy * np.asarray(cam.focal[v]) + np.asarray(cam.center[v])
            np.testing.assert_allclose(proj[v, i], expect, rtol=2e-5,
                                       atol=1e-2)


def test_center_point_projects_to_principal_point(rng):
    cam = make_cameras(rng, n=1)
    # Place a point on the optical axis: x_cam = (0, 0, 5).
    Rm = np.asarray(cam.rotation[0])
    t = np.asarray(cam.translation[0])
    world = np.linalg.solve(Rm, np.array([0, 0, 5.0]) - t)
    proj = np.asarray(project_points(cam, jnp.asarray(world, jnp.float32)))
    np.testing.assert_allclose(proj[0], np.asarray(cam.center[0]), atol=0.1)


def test_demo_camera_file(demo_data_dir):
    cam = load_cameras_txt(f"{demo_data_dir}/3DOH50K_Parameters.txt")
    assert cam.num_views == 6
    np.testing.assert_allclose(float(cam.focal[0, 0]), 2398.9525, atol=1e-3)
    np.testing.assert_allclose(float(cam.center[0, 0]), 1022.838, atol=1e-3)
    # Rotations must be orthonormal.
    R = np.asarray(cam.rotation)
    np.testing.assert_allclose(
        np.einsum("vij,vkj->vik", R, R), np.eye(3)[None].repeat(6, 0),
        atol=1e-5)


def test_camera_roundtrip(tmp_path, rng):
    cam = make_cameras(rng)
    path = str(tmp_path / "cams.txt")
    save_cameras_txt(path, cam)
    back = load_cameras_txt(path)
    np.testing.assert_allclose(np.asarray(back.rotation),
                               np.asarray(cam.rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.focal),
                               np.asarray(cam.focal), atol=1e-3)
