"""SMPL-H / SMPL-X family: generic-joint-count LBS, mappings, fits."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.models import joints as J
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.joint_model import (
    build_joint_model, joint_forward, with_joint_model,
)
from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward


class TestKinematicTables:
    def test_parents_lengths(self):
        assert len(J.SMPL_PARENTS) == 24
        assert len(J.SMPLH_PARENTS) == 52
        assert len(J.SMPLX_PARENTS) == 55

    def test_tree_validity(self):
        for parents in (J.SMPL_PARENTS, J.SMPLH_PARENTS,
                        J.SMPLX_PARENTS):
            assert parents[0] == -1
            for i, p in enumerate(parents[1:], 1):
                assert 0 <= p < i   # topological order

    def test_smplx_hand_roots(self):
        # finger chains root at the wrists (20 left, 21 right)
        assert J.SMPLX_PARENTS[25] == 20
        assert J.SMPLX_PARENTS[40] == 21
        assert J.SMPLX_PARENTS[22] == 15  # jaw on head


def test_smplx_forward_and_joint_model(rng):
    assets = synthetic_smpl("smplx")
    assert assets.v_template.shape == (10475, 3)
    assert len(assets.parents) == 55
    assert assets.posedirs.shape[0] == 9 * 54

    params = SMPLParams(
        betas=jnp.asarray(0.5 * rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray([0.2, -0.3, 0.1]),
        body_pose=jnp.asarray(0.3 * rng.standard_normal(69), jnp.float32),
        transl=jnp.asarray([0.1, 0.2, 0.3]),
        scale=jnp.asarray(1.1))
    verts, joints = smpl_forward(assets, params)
    assert verts.shape == (10475, 3)
    assert joints.shape == (25, 3)     # coco25 annotation set
    assert np.isfinite(np.asarray(verts)).all()

    jm = build_joint_model(assets)
    got = joint_forward(jm, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(joints),
                               atol=5e-4)


def test_smplx_full_pose_with_hands(rng):
    """Passing a full 54-joint pose (hands + face posed) works too."""
    assets = synthetic_smpl("smplx")
    params = SMPLParams.zeros()
    full_body = jnp.asarray(0.2 * rng.standard_normal(54 * 3),
                            jnp.float32)
    _, j_posed = smpl_forward(assets, params, body_pose=full_body)
    _, j_rest = smpl_forward(assets, params,
                             body_pose=jnp.zeros(54 * 3))
    # Posing hands/face must change the mapped joints (coco25 includes
    # wrist-driven and face points).
    assert float(jnp.abs(j_posed - j_rest).max()) > 1e-3


def test_smplh_fit_e2e(rng):
    """Staged fit of a synthetic SMPL-H body from coco17 observations."""
    import os

    from mvsmplfitting_tpu.fitting import (FitConfig, fit_frame,
                                           init_guess)
    from mvsmplfitting_tpu.fitting.energy import (Observations,
                                                  reprojection_error_px)
    from mvsmplfitting_tpu.fitting.lm import LMOptions
    from mvsmplfitting_tpu.fitting import pack
    from mvsmplfitting_tpu.models import vposer as vposer_lib
    from mvsmplfitting_tpu.models.camera import project_points
    from test_triangulate import make_cameras

    assets = with_joint_model(synthetic_smpl("smplh",
                                             pose_format="coco17"))
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    vw = (vposer_lib.load_npz(path) if os.path.exists(path)
          else vposer_lib.random_weights())
    cam = make_cameras()

    z_true = jnp.asarray(0.3 * rng.standard_normal(32), jnp.float32)
    true = SMPLParams(
        betas=jnp.asarray(0.4 * rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray([0.1, 0.4, -0.2]),
        body_pose=jnp.zeros(69),
        transl=jnp.asarray([0.1, -0.1, 0.2]),
        scale=jnp.asarray(1.05))
    body_pose = vposer_lib.decode(vw, z_true)
    _, joints = smpl_forward(assets, true, body_pose)
    gt2d = project_points(cam, joints)
    K = gt2d.shape[1]
    obs = Observations(gt2d=gt2d, conf=jnp.ones((6, K)),
                       view_mask=jnp.ones(6), joint_weights=jnp.ones(K))

    cfg = FitConfig(lm=LMOptions(max_iters=30))
    guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
    result = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                       vposer_w=vw, img_height=1080.0)
    err = reprojection_error_px(cfg.spec, assets, cam, obs, vw,
                                pack(cfg.spec, result.params, result.z))
    assert float(err) < 6.0, f"smplh reproj err {float(err):.2f}px"
