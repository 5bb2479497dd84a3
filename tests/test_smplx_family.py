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


class TestProductionBlocks:
    """SMPL-H/X PCA hands, expression, jaw/eye pose (VERDICT item 3)."""

    def test_hand_pca_decode_semantics(self, rng):
        """PCA coeffs map through components + mean (body_models.py:593-608)."""
        assets = synthetic_smpl("smplh")
        coeffs_l = jnp.asarray(0.5 * rng.standard_normal(6), jnp.float32)
        coeffs_r = jnp.asarray(0.5 * rng.standard_normal(6), jnp.float32)
        params = SMPLParams.zeros().replace(
            left_hand_pose=coeffs_l, right_hand_pose=coeffs_r)

        from mvsmplfitting_tpu.models.smpl import assemble_chain_pose
        chain = assemble_chain_pose(assets, params, jnp.zeros(63))
        assert chain.shape == (51 * 3,)
        want_l = (coeffs_l @ assets.hand_components[0, :6]
                  + assets.hand_means[0])
        want_r = (coeffs_r @ assets.hand_components[1, :6]
                  + assets.hand_means[1])
        np.testing.assert_allclose(np.asarray(chain[63:108]),
                                   np.asarray(want_l), atol=1e-6)
        np.testing.assert_allclose(np.asarray(chain[108:153]),
                                   np.asarray(want_r), atol=1e-6)

    def test_flat_hand_mean(self, rng):
        """flat_hand_mean zeroes the means (body_models.py:505-513)."""
        flat = synthetic_smpl("smplh", flat_hand_mean=True)
        assert float(jnp.abs(flat.hand_means).max()) == 0.0
        curled = synthetic_smpl("smplh", flat_hand_mean=False)
        assert float(jnp.abs(curled.hand_means).max()) > 0.0
        # Zero params on the non-flat model pose the hands at the mean.
        p = SMPLParams.zeros()
        _, j_flat = smpl_forward(flat, p)
        _, j_mean = smpl_forward(curled, p)
        assert float(jnp.abs(j_flat - j_mean).max()) > 1e-5

    def test_smplx_blocks_move_joints_and_match_joint_model(self, rng):
        """Hands+expression+face blocks: full forward == reduced fold."""
        assets = synthetic_smpl("smplx")
        assert assets.expr_dirs is not None
        assert assets.expr_dirs.shape[-1] == 10
        params = SMPLParams(
            betas=jnp.asarray(0.3 * rng.standard_normal(10), jnp.float32),
            global_orient=jnp.asarray([0.1, -0.2, 0.3]),
            body_pose=jnp.asarray(
                0.2 * rng.standard_normal(69), jnp.float32),
            transl=jnp.asarray([0.05, -0.1, 0.2]),
            scale=jnp.asarray(1.08),
            left_hand_pose=jnp.asarray(
                0.5 * rng.standard_normal(6), jnp.float32),
            right_hand_pose=jnp.asarray(
                0.5 * rng.standard_normal(6), jnp.float32),
            expression=jnp.asarray(
                0.8 * rng.standard_normal(10), jnp.float32),
            jaw_pose=jnp.asarray([0.2, 0.0, 0.1]),
            leye_pose=jnp.asarray([0.0, 0.1, 0.0]),
            reye_pose=jnp.asarray([0.1, 0.0, 0.0]))
        verts, joints = smpl_forward(assets, params)

        jm = build_joint_model(assets)
        got = joint_forward(jm, params)
        np.testing.assert_allclose(np.asarray(got), np.asarray(joints),
                                   atol=5e-4)

        # Each block must actually move the output.
        base_v, base_j = smpl_forward(assets, SMPLParams.zeros())
        for field in ("left_hand_pose", "expression", "jaw_pose"):
            solo = SMPLParams.zeros().replace(
                **{field: getattr(params, field)})
            v2, _ = smpl_forward(assets, solo)
            assert float(jnp.abs(v2 - base_v).max()) > 1e-6, field

    def test_pack_unpack_roundtrip_and_energy_identity(self, rng):
        """Extended layout: pack/unpack roundtrip + residual^2 == scalar."""
        from mvsmplfitting_tpu.fitting.energy import (
            EnergySpec, Observations, StageWeights, free_mask,
            num_unknowns, pack, residuals, total_energy, unpack)
        from mvsmplfitting_tpu.models import vposer as vposer_lib
        from mvsmplfitting_tpu.models.camera import project_points
        from test_triangulate import make_cameras

        spec = EnergySpec(hand_dim=6, num_expr=10, opt_face=True)
        n = num_unknowns(spec)
        assert n == 32 + 10 + 7 + 12 + 10 + 9
        assert free_mask(spec).shape == (n,)

        x = jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
        params, z = unpack(spec, x)
        assert params.left_hand_pose.shape == (6,)
        assert params.expression.shape == (10,)
        assert params.jaw_pose.shape == (3,)
        np.testing.assert_allclose(np.asarray(pack(spec, params, z)),
                                   np.asarray(x), atol=1e-7)

        assets = synthetic_smpl("smplx")
        vw = vposer_lib.random_weights()
        cam = make_cameras()
        _, joints = smpl_forward(assets, SMPLParams.zeros())
        gt2d = project_points(cam, joints)
        K = gt2d.shape[1]
        obs = Observations(gt2d=gt2d, conf=jnp.ones((6, K)),
                           view_mask=jnp.ones(6),
                           joint_weights=jnp.ones(K))
        w = StageWeights.make(data=0.5, pose=40.0, shape=10.0)
        r = residuals(spec, assets, cam, obs, w, vw, None, x)
        e = total_energy(spec, assets, cam, obs, w, vw, None, x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)


def test_load_real_pkl_layout(tmp_path, rng):
    """`load_smpl` reads the official pkl/npz key layout incl. hands."""
    import pickle

    from mvsmplfitting_tpu.models.assets import load_smpl

    nv, nj = 64, 52
    parents = np.zeros(nj, np.int64)
    parents[1:22] = np.asarray(J.SMPLH_PARENTS[1:22])
    parents[22:] = np.asarray(J.SMPLH_PARENTS[22:])
    raw = {
        "v_template": rng.standard_normal((nv, 3)).astype(np.float32),
        "shapedirs": rng.standard_normal((nv, 3, 16)).astype(np.float32),
        "posedirs": rng.standard_normal(
            (nv, 3, 9 * (nj - 1))).astype(np.float32),
        "J_regressor": rng.random((nj, nv)).astype(np.float32),
        "weights": rng.random((nv, nj)).astype(np.float32),
        "f": rng.integers(0, nv, (100, 3)).astype(np.int64),
        "kintree_table": np.stack([parents, np.arange(nj)]),
        "hands_componentsl": rng.standard_normal((45, 45)).astype(np.float32),
        "hands_componentsr": rng.standard_normal((45, 45)).astype(np.float32),
        "hands_meanl": rng.standard_normal(45).astype(np.float32),
        "hands_meanr": rng.standard_normal(45).astype(np.float32),
    }
    d = tmp_path / "models" / "smplh"
    d.mkdir(parents=True)
    with open(d / "SMPLH_NEUTRAL.pkl", "wb") as f:
        pickle.dump(raw, f)

    # joint_map indexes into 52 chain + 5 extras; remap the smplh
    # surface ids into the tiny vertex range first.
    assets = load_smpl(str(tmp_path / "models"), "smplh", "neutral",
                       pose_format="coco17", flat_hand_mean=False)
    assert assets.hand_components.shape == (2, 45, 45)
    np.testing.assert_allclose(np.asarray(assets.hand_means[0]),
                               raw["hands_meanl"], atol=1e-7)
    assert assets.shapedirs.shape[-1] == 10  # sliced to NUM_BETAS
    assert len(assets.parents) == 52

    flat = load_smpl(str(tmp_path / "models"), "smplh", "neutral",
                     pose_format="coco17", flat_hand_mean=True)
    assert float(jnp.abs(flat.hand_means).max()) == 0.0


def test_smplx_fit_with_hands_and_expression(rng):
    """Staged LM fit recovers hand/expression blocks on synthetic data."""
    from mvsmplfitting_tpu.fitting import FitConfig, fit_frame, init_guess
    from mvsmplfitting_tpu.fitting.energy import (EnergySpec,
                                                  Observations,
                                                  reprojection_error_px)
    from mvsmplfitting_tpu.fitting import pack
    from mvsmplfitting_tpu.fitting.lm import LMOptions
    from mvsmplfitting_tpu.models import vposer as vposer_lib
    from mvsmplfitting_tpu.models.camera import project_points
    from test_triangulate import make_cameras

    assets = with_joint_model(synthetic_smpl("smplx"))
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    vw = (vposer_lib.load_npz(path) if os.path.exists(path)
          else vposer_lib.random_weights())
    cam = make_cameras()

    z_true = jnp.asarray(0.25 * rng.standard_normal(32), jnp.float32)
    body_pose = vposer_lib.decode(vw, z_true)
    true = SMPLParams(
        betas=jnp.asarray(0.4 * rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray([0.1, 0.3, -0.1]),
        body_pose=jnp.zeros(69),
        transl=jnp.asarray([0.1, -0.1, 0.3]),
        scale=jnp.asarray(1.05),
        left_hand_pose=jnp.asarray(
            0.6 * rng.standard_normal(6), jnp.float32),
        right_hand_pose=jnp.asarray(
            0.6 * rng.standard_normal(6), jnp.float32),
        expression=jnp.asarray(
            0.5 * rng.standard_normal(10), jnp.float32),
        jaw_pose=jnp.asarray([0.15, 0.0, 0.05]),
        leye_pose=jnp.zeros(3), reye_pose=jnp.zeros(3))
    _, joints = smpl_forward(assets, true, body_pose)
    gt2d = project_points(cam, joints)
    K = gt2d.shape[1]
    obs = Observations(gt2d=gt2d, conf=jnp.ones((6, K)),
                       view_mask=jnp.ones(6), joint_weights=jnp.ones(K))

    spec = EnergySpec(hand_dim=6, num_expr=10, opt_face=True)
    cfg = FitConfig(spec=spec, lm=LMOptions(max_iters=40))
    guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
    result = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                       vposer_w=vw, img_height=1080.0)
    assert result.params.left_hand_pose.shape == (6,)
    assert result.params.expression.shape == (10,)
    assert np.isfinite(float(result.loss))
    err = reprojection_error_px(spec, assets, cam, obs, vw,
                                pack(spec, result.params, result.z))
    assert float(err) < 8.0, f"smplx reproj err {float(err):.2f}px"


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
