"""Golden parity tests against the reference's *actual torch code*.

These import the reference modules (read-only at /root/reference) and
compare outputs numerically — the strongest form of behavioral parity
evidence.  Skipped wherever a reference import needs an unavailable
dependency (pyrender, torchgeometry, ...).
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/code")


def _torch():
    import torch
    return torch


class TestCameraGolden:
    @pytest.fixture(scope="class")
    def ref_camera_mod(self):
        try:
            import camera as ref_camera  # /root/reference/code/camera.py
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference camera unavailable: {e}")
        return ref_camera

    def test_projection_matches(self, ref_camera_mod, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.camera import (Camera,
                                                     project_points)

        R = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(
            np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = np.asarray([0.1, -0.2, 4.0], np.float32)
        pts = rng.standard_normal((1, 17, 3)).astype(np.float32)

        cam = ref_camera_mod.create_camera(
            focal_length_x=1234.0, focal_length_y=1111.0,
            center=torch.tensor([[320.0, 240.0]]),
            rotation=torch.from_numpy(R[None]),
            translation=torch.from_numpy(t[None]))
        with torch.no_grad():
            want = cam(torch.from_numpy(pts)).numpy()[0]

        ours = Camera(rotation=jnp.asarray(R[None]),
                      translation=jnp.asarray(t[None]),
                      focal=jnp.asarray([[1234.0, 1111.0]]),
                      center=jnp.asarray([[320.0, 240.0]]))
        got = np.asarray(project_points(ours, jnp.asarray(pts[0])))[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


class TestPriorsGolden:
    @pytest.fixture(scope="class")
    def ref_prior_mod(self):
        try:
            import prior as ref_prior
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference prior unavailable: {e}")
        return ref_prior

    def test_l2_prior(self, ref_prior_mod, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.priors import l2_prior

        x = rng.standard_normal((1, 69)).astype(np.float32)
        ref = ref_prior_mod.L2Prior()
        want = float(ref(torch.from_numpy(x), None).sum())
        got = float(l2_prior(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_angle_prior(self, ref_prior_mod, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.priors import angle_prior_terms

        # Reference takes pose (1, 63+) = full_pose[3:66].
        pose63 = (0.5 * rng.standard_normal((1, 63))).astype(np.float32)
        ref = ref_prior_mod.SMPLifyAnglePrior(dtype=torch.float32)
        want = ref(torch.from_numpy(pose63), None).numpy()[0]
        pose69 = np.concatenate([pose63[0], np.zeros(6, np.float32)])
        got = np.asarray(angle_prior_terms(jnp.asarray(pose69)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestGMMGolden:
    """GMM max-mixture prior vs the reference's `MaxMixturePrior`
    (`prior.py:100-231`), instantiated from a synthetic mixture pkl in
    the exact on-disk format (dict of means/covars/weights) — this also
    exercises our real `load_gmm` pkl path."""

    @pytest.fixture(scope="class")
    def gmm_pkl(self, tmp_path_factory):
        import pickle

        rng = np.random.default_rng(7)
        M, D = 8, 69
        means = (0.3 * rng.standard_normal((M, D))).astype(np.float64)
        covs = []
        for _ in range(M):
            a = 0.05 * rng.standard_normal((D, D))
            covs.append(a @ a.T + 0.5 * np.eye(D))
        covars = np.stack(covs)
        weights = rng.dirichlet(np.ones(M))
        d = tmp_path_factory.mktemp("gmm")
        path = d / "gmm_08.pkl"
        with open(path, "wb") as f:
            pickle.dump({"means": means, "covars": covars,
                         "weights": weights}, f)
        return str(d), str(path)

    @pytest.fixture(scope="class")
    def ref_gmm(self, gmm_pkl):
        try:
            import prior as ref_prior
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference prior unavailable: {e}")
        folder, _ = gmm_pkl
        return ref_prior.MaxMixturePrior(prior_folder=folder,
                                         num_gaussians=8, use_merged=True)

    def test_merged_nll_matches(self, ref_gmm, gmm_pkl, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.priors import load_gmm

        _, path = gmm_pkl
        ours = load_gmm(path)
        for _ in range(5):
            pose = (0.5 * rng.standard_normal((1, 69))).astype(np.float32)
            want = float(ref_gmm(torch.from_numpy(pose), None))
            got = float(ours.merged_nll(jnp.asarray(pose[0])))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)

    def test_non_merged_nll_matches(self, ref_gmm, gmm_pkl, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.priors import load_gmm

        _, path = gmm_pkl
        ours = load_gmm(path)
        ref_gmm.use_merged = False
        try:
            for _ in range(3):
                pose = (0.5 * rng.standard_normal((1, 69))
                        ).astype(np.float32)
                want = float(ref_gmm(torch.from_numpy(pose), None))
                got = float(ours.log_likelihood(jnp.asarray(pose[0])))
                np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)
        finally:
            ref_gmm.use_merged = True

    def test_residual_square_identity(self, gmm_pkl, rng):
        """sum(residuals^2) equals the argmin component's 0.5*quad."""
        from mvsmplfitting_tpu.models.priors import load_gmm

        _, path = gmm_pkl
        ours = load_gmm(path)
        pose = jnp.asarray(
            (0.5 * rng.standard_normal(69)).astype(np.float32))
        r = ours.residuals(pose)
        diff = pose[None] - ours.means
        quad = jnp.einsum("mi,mij,mj->m", diff, ours.precisions, diff)
        best = int(jnp.argmin(0.5 * quad - jnp.log(ours.nll_weights)))
        np.testing.assert_allclose(float(jnp.sum(r * r)),
                                   float(0.5 * quad[best]), rtol=1e-4)


class TestGMoFGolden:
    def test_gmof(self, rng):
        torch = _torch()
        sys.path.insert(0, "/root/reference/code")
        try:
            import types

            for name in ("pyrender", "pyrender.constants", "trimesh"):
                if name not in sys.modules:
                    mod = types.ModuleType(name)
                    mod.__getattr__ = lambda *a: None
                    sys.modules[name] = mod
            sys.modules["pyrender.constants"].RenderFlags = object
            from utils.utils import GMoF
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference GMoF unavailable: {e}")
        from mvsmplfitting_tpu.ops.robust import gmof

        x = (100 * rng.standard_normal((4, 17, 2))).astype(np.float32)
        want = GMoF(rho=100)(torch.from_numpy(x)).numpy()
        got = np.asarray(gmof(jnp.asarray(x), 100.0))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestLBSGolden:
    """The root-scale LBS semantics against `code/smplx/lbs.py:135-222`
    on a small random model (the function is size-generic)."""

    @pytest.fixture(scope="class")
    def ref_lbs(self):
        try:
            from smplx.lbs import lbs as ref_lbs_fn
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference lbs unavailable: {e}")
        return ref_lbs_fn

    def test_lbs_with_scale_matches(self, ref_lbs, rng):
        torch = _torch()
        from mvsmplfitting_tpu.models.smpl import SMPLAssets, lbs

        V, J_, NB = 40, 24, 10
        parents_np = np.asarray(
            [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
             16, 17, 18, 19, 20, 21])
        v_template = rng.standard_normal((V, 3)).astype(np.float32)
        shapedirs = (0.1 * rng.standard_normal((V, 3, NB))).astype(
            np.float32)
        posedirs_t = (0.01 * rng.standard_normal(
            (9 * (J_ - 1), V * 3))).astype(np.float32)
        j_reg = rng.random((J_, V)).astype(np.float32)
        j_reg /= j_reg.sum(1, keepdims=True)
        w = rng.random((V, J_)).astype(np.float32)
        w /= w.sum(1, keepdims=True)

        betas = (0.5 * rng.standard_normal((1, NB))).astype(np.float32)
        pose = (0.4 * rng.standard_normal((1, J_ * 3))).astype(
            np.float32)
        scale = np.float32(1.37)

        with torch.no_grad():
            want_v, want_j = ref_lbs(
                torch.from_numpy(betas), torch.from_numpy(pose),
                torch.from_numpy(v_template[None]),
                torch.from_numpy(shapedirs),
                torch.from_numpy(posedirs_t),
                torch.from_numpy(j_reg),
                torch.from_numpy(parents_np).long(),
                torch.from_numpy(w), torch.tensor(scale))
        assets = SMPLAssets(
            v_template=jnp.asarray(v_template),
            shapedirs=jnp.asarray(shapedirs),
            posedirs=jnp.asarray(posedirs_t),
            j_regressor=jnp.asarray(j_reg),
            lbs_weights=jnp.asarray(w),
            faces=jnp.zeros((1, 3), jnp.int32),
            extra_joint_ids=jnp.zeros((1,), jnp.int32),
            joint_map=jnp.zeros((1,), jnp.int32),
            parents=tuple(int(p) for p in parents_np))
        got_v, got_j = lbs(assets, jnp.asarray(betas[0]),
                           jnp.asarray(pose[0]), jnp.asarray(scale))
        np.testing.assert_allclose(np.asarray(got_v),
                                   want_v.numpy()[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_j),
                                   want_j.numpy()[0], atol=2e-5)


class TestEnergyGolden:
    """The reference's SMPLifyLoss.forward vs our total_energy on the
    same synthetic inputs — the whole-energy parity check."""

    @pytest.fixture(scope="class")
    def ref_fitting(self):
        import types

        for name in ("pyrender", "pyrender.constants", "trimesh"):
            if name not in sys.modules:
                mod = types.ModuleType(name)
                mod.__getattr__ = lambda *a: None
                sys.modules[name] = mod
        if not hasattr(sys.modules["pyrender.constants"], "RenderFlags"):
            sys.modules["pyrender.constants"].RenderFlags = object
        try:
            import prior as ref_prior
            from utils import fitting as ref_fitting
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference fitting unavailable: {e}")
        return ref_fitting

    def test_vposer_l2_energy_matches(self, ref_fitting, rng):
        torch = _torch()
        import camera as ref_camera
        import prior as ref_prior

        from mvsmplfitting_tpu.fitting.energy import (
            EnergySpec, Observations, StageWeights, total_energy)
        from mvsmplfitting_tpu.models.assets import synthetic_smpl
        from mvsmplfitting_tpu.models.camera import (Camera,
                                                     project_points)
        from mvsmplfitting_tpu.models import vposer as vposer_lib
        from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward
        from mvsmplfitting_tpu.fitting import pack
        from test_triangulate import make_cameras

        assets = synthetic_smpl()
        path = "/root/repo/assets/vposer_weights.npz"
        import os as _os
        if not _os.path.exists(path):
            pytest.skip("bundled vposer weights missing")
        vw = vposer_lib.load_npz(path)
        cam = make_cameras()

        z = jnp.asarray(0.3 * rng.standard_normal(32), jnp.float32)
        params = SMPLParams(
            betas=jnp.asarray(0.4 * rng.standard_normal(10),
                              jnp.float32),
            global_orient=jnp.asarray([0.2, -0.1, 0.3]),
            body_pose=jnp.zeros(69),
            transl=jnp.asarray([0.1, -0.2, 0.2]),
            scale=jnp.asarray(1.1))
        body_pose = vposer_lib.decode(vw, z)
        verts, joints = smpl_forward(assets, params, body_pose)

        K = joints.shape[0]
        gt2d = np.asarray(project_points(cam, joints)) + \
            rng.normal(scale=30.0, size=(6, K, 2)).astype(np.float32)
        conf = rng.uniform(0.2, 1.0, size=(6, K)).astype(np.float32)
        joint_weights = np.ones(K, np.float32)

        weights = StageWeights.make(data=500.0 / 1080, pose=57.4,
                                    shape=10.0)

        # ---- ours -------------------------------------------------
        spec = EnergySpec(use_vposer=True)
        obs = Observations(gt2d=jnp.asarray(gt2d),
                           conf=jnp.asarray(conf),
                           view_mask=jnp.ones(6),
                           joint_weights=jnp.asarray(joint_weights))
        x = pack(spec, params, z)
        got = float(total_energy(spec, assets, cam, obs, weights, vw,
                                 None, x))

        # ---- reference --------------------------------------------
        loss = ref_fitting.SMPLifyLoss(
            rho=100.0,
            body_pose_prior=ref_prior.L2Prior(),
            shape_prior=ref_prior.L2Prior(),
            angle_prior=ref_prior.SMPLifyAnglePrior(dtype=torch.float32),
            use_joints_conf=True, interpenetration=False,
            data_weight=500.0 / 1080,
            body_pose_weight=57.4, shape_weight=10.0,
            bending_prior_weight=3.17 * 57.4,
            fix_shape=False)

        R = np.asarray(cam.rotation)
        tt = np.asarray(cam.translation)
        f = np.asarray(cam.focal)
        c = np.asarray(cam.center)
        cams = []
        for v in range(6):
            cams.append(ref_camera.create_camera(
                focal_length_x=float(f[v, 0]),
                focal_length_y=float(f[v, 1]),
                center=torch.from_numpy(c[v:v + 1].copy()),
                rotation=torch.from_numpy(R[v:v + 1].copy()),
                translation=torch.from_numpy(tt[v:v + 1].copy())))

        from collections import namedtuple
        Output = namedtuple(
            "Output", ["joints", "body_pose", "betas", "full_pose",
                       "vertices"])
        full_pose = np.concatenate(
            [np.asarray(params.global_orient),
             np.asarray(body_pose)])[None]
        out = Output(
            joints=torch.from_numpy(np.asarray(joints)[None].copy()),
            body_pose=torch.from_numpy(
                np.asarray(body_pose)[None].copy()),
            betas=torch.from_numpy(np.asarray(params.betas)[None].copy()),
            full_pose=torch.from_numpy(full_pose.copy()),
            vertices=torch.from_numpy(np.asarray(verts)[None].copy()))

        gt = torch.from_numpy(gt2d[:, None])          # (V, 1, K, 2)
        confs = [torch.from_numpy(conf[v].reshape(1, -1))
                 for v in range(6)]
        with torch.no_grad():
            want = float(loss(
                out, camera=cams, gt_joints=gt, joints_conf=confs,
                body_model_faces=torch.zeros(3, dtype=torch.long),
                joint_weights=torch.from_numpy(joint_weights),
                use_vposer=True,
                pose_embedding=torch.from_numpy(np.asarray(z)[None].copy()),
            ))

        np.testing.assert_allclose(got, want, rtol=1e-4)
