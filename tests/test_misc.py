"""Geometry utils and adjustment-refit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import FitConfig, fit_frame, init_guess
from mvsmplfitting_tpu.fitting.adjust import refit_with_observations
from mvsmplfitting_tpu.fitting.lm import LMOptions
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.ops.geometry import (
    estimate_translation_weak, rel_change, rigid_transform_3d,
)

from test_fitting import make_problem


def test_rel_change():
    assert float(rel_change(10.0, 9.0)) == pytest.approx(0.1)
    assert float(rel_change(0.5, 0.4)) == pytest.approx(0.1)


def test_rigid_transform_3d(rng):
    A = rng.standard_normal((10, 3))
    th = 0.7
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    B = A @ R_true.T + t_true
    R, t = rigid_transform_3d(jnp.asarray(A, jnp.float32),
                              jnp.asarray(B, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_estimate_translation_weak(rng):
    S = rng.standard_normal((17, 3)) * 0.5
    t_true = np.array([0.2, -0.1, 4.0])
    fx = fy = 1000.0
    cx, cy = 500.0, 400.0
    P = S + t_true
    j2d = P[:, :2] / P[:, 2:] * [fx, fy] + [cx, cy]
    t = estimate_translation_weak(
        jnp.asarray(S, jnp.float32), jnp.asarray(j2d, jnp.float32),
        jnp.ones(17), fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)


class TestAdjustRefit:
    def test_refit_tracks_shifted_keypoints(self, rng):
        import os
        assets = synthetic_smpl()
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "vposer_weights.npz")
        vw = (vposer_lib.load_npz(path) if os.path.exists(path)
              else vposer_lib.random_weights())
        cam, obs, true, _ = make_problem(assets, vw, rng)
        cfg = FitConfig(lm=LMOptions(max_iters=25))
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        first = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                          vposer_w=vw, img_height=1080.0)

        # "Hand-edit": keypoints of the same body moved +8cm in world x
        # (a uniform image-space shift would be multi-view-inconsistent
        # for a camera ring and correctly ignored by the solver).
        from mvsmplfitting_tpu.models.camera import project_points
        from mvsmplfitting_tpu.models.smpl import smpl_forward

        shifted = first.params.replace(
            transl=first.params.transl + jnp.asarray([0.08, 0.0, 0.0]))
        _, joints = smpl_forward(assets, shifted, first.body_pose)
        edited = obs.replace(gt2d=project_points(cam, joints))
        second = refit_with_observations(cfg, assets, cam, edited, first,
                                         vposer_w=vw, img_height=1080.0)
        assert float(second.loss) < float(first.loss) + 1e3
        delta = np.asarray(second.params.transl - first.params.transl)
        np.testing.assert_allclose(delta, [0.08, 0.0, 0.0], atol=0.02)
