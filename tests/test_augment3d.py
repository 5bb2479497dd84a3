"""3D-SMPL target transform goldens vs the reference's own code
(`simple_transform_3d_smpl.py`, `transforms.py` 3D helpers) and the
HybrIK train step built on it."""

import importlib
import sys
import types

import numpy as np
import pytest

from mvsmplfitting_tpu.detect.augment3d import (
    H36M17_PAIRS, SMPL24_PAIRS, SMPL29_PAIRS, Hybrik3DConfig,
    flip_joints_3d, flip_thetas, flip_twist, flip_xyz_joints_3d,
    hybrik_train_sample, integral_uvd_target, integral_xyz_target,
    intrinsic_matrix, rodrigues_np, rotmat_to_quat_np)


def _ref_transforms():
    sys.path.insert(0, "/root/reference/alphapose_core")
    try:
        import alphapose.utils.transforms as T
    except Exception as e:              # pragma: no cover
        pytest.skip(f"reference transforms unavailable: {e}")
    finally:
        sys.path.pop(0)
    return T


def _ref_preset():
    sys.path.insert(0, "/root/reference/alphapose_core")
    try:
        import alphapose.utils  # noqa: F401
        ra = types.ModuleType("alphapose.utils.roi_align")
        ra.RoIAlign = object
        sys.modules.setdefault("alphapose.utils.roi_align", ra)
        pkg = types.ModuleType("alphapose.utils.presets")
        pkg.__path__ = ["/root/reference/alphapose_core/alphapose/"
                        "utils/presets"]
        sys.modules.setdefault("alphapose.utils.presets", pkg)
        mod = importlib.import_module(
            "alphapose.utils.presets.simple_transform_3d_smpl")
    except Exception as e:              # pragma: no cover
        pytest.skip(f"reference 3d preset unimportable: {e}")
    finally:
        sys.path.pop(0)
    return mod


class TestHelpersGolden:
    def test_flip_joints_3d(self):
        T = _ref_transforms()
        rng = np.random.default_rng(0)
        j = rng.uniform(0, 200, (29, 3, 2)).astype(np.float32)
        j[:, :, 1] = (rng.uniform(size=(29, 3)) > 0.3)
        want = T.flip_joints_3d(j.copy(), 192, SMPL29_PAIRS)
        got = flip_joints_3d(j, 192, SMPL29_PAIRS)
        np.testing.assert_allclose(got, want)

    def test_flip_xyz_joints_3d(self):
        T = _ref_transforms()
        rng = np.random.default_rng(1)
        j = rng.standard_normal((24, 3)).astype(np.float32)
        np.testing.assert_allclose(
            flip_xyz_joints_3d(j, SMPL24_PAIRS),
            T.flip_xyz_joints_3d(j.copy(), SMPL24_PAIRS))

    def test_flip_thetas(self):
        T = _ref_transforms()
        rng = np.random.default_rng(2)
        th = 0.4 * rng.standard_normal((24, 3)).astype(np.float32)
        np.testing.assert_allclose(flip_thetas(th, SMPL24_PAIRS),
                                   T.flip_thetas(th.copy(),
                                                 SMPL24_PAIRS))

    def test_flip_twist(self):
        T = _ref_transforms()
        rng = np.random.default_rng(3)
        phi = rng.standard_normal((23, 2)).astype(np.float32)
        w = (rng.uniform(size=(23, 2)) > 0.5).astype(np.float32)
        want_p, want_w = T.flip_twist(phi.copy(), w.copy(),
                                      SMPL24_PAIRS)
        got_p, got_w = flip_twist(phi, w, SMPL24_PAIRS)
        np.testing.assert_allclose(got_p, want_p)
        np.testing.assert_allclose(got_w, want_w)

    def test_rodrigues_and_quat(self):
        T = _ref_transforms()
        rng = np.random.default_rng(4)
        aa = 0.6 * rng.standard_normal((24, 3))
        want_R = T.batch_rodrigues_numpy(aa.copy())
        got_R = rodrigues_np(aa)
        np.testing.assert_allclose(got_R, want_R, atol=1e-12)
        np.testing.assert_allclose(rotmat_to_quat_np(got_R),
                                   T.rotmat_to_quat_numpy(want_R),
                                   atol=1e-12)

    def test_intrinsic_matrix(self):
        T = _ref_transforms()
        f, c = np.asarray([1200.0, 1100.0]), np.asarray([320.0, 240.0])
        for inv in (False, True):
            np.testing.assert_allclose(
                intrinsic_matrix(f, c, inv),
                T.get_intrinsic_metrix(f, c, inv))


def _label(rng, W=320, H=240):
    j29 = np.zeros((29, 3), np.float32)
    j29[:, 0] = rng.uniform(60, 260, 29)
    j29[:, 1] = rng.uniform(40, 200, 29)
    j29[:, 2] = rng.uniform(-400, 400, 29)     # depth rel. root, mm
    cam29 = rng.standard_normal((29, 3)).astype(np.float32) * 300
    return {
        "bbox": [60.0, 30.0, 270.0, 220.0],
        "joint_img_17": j29[:17].copy(),
        "joint_vis_17": np.ones((17, 3), np.float32),
        "joint_relative_17": (cam29[:17] - cam29[0:1]).copy(),
        "joint_img_29": j29,
        "joint_vis_29": np.ones((29, 3), np.float32),
        "joint_cam_29": cam29,
        "beta": rng.standard_normal(10).astype(np.float32) * 0.5,
        "theta": (0.3 * rng.standard_normal((24, 3))).astype(
            np.float32),
        "twist_phi": rng.standard_normal((23, 2)).astype(np.float32),
        "twist_weight": np.ones((23, 2), np.float32),
        "f": np.asarray([1000.0, 1000.0], np.float32),
        "c": np.asarray([W / 2, H / 2], np.float32),
        "root_cam": np.asarray([0.1, 0.2, 3.0], np.float32),
        "width": W, "height": H,
    }


class TestFullTransformGolden:
    def test_eval_path_matches_reference(self):
        """train=False is fully deterministic: every output of the
        reference's 3d_data_w_smpl branch must match."""
        mod = _ref_preset()
        rng = np.random.default_rng(7)
        W, H = 320, 240
        src = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        label = _label(rng, W, H)

        class _DS:
            joint_pairs_17 = H36M17_PAIRS
            joint_pairs_24 = SMPL24_PAIRS
            joint_pairs_29 = SMPL29_PAIRS
            bbox_3d_shape = (2000, 2000, 2000)

        ref = mod.SimpleTransform3DSMPL(
            _DS(), scale_factor=0.3, color_factor=0.2, occlusion=True,
            add_dpg=False, input_size=(256, 256),
            output_size=(64, 64), depth_dim=64,
            bbox_3d_shape=(2000, 2000, 2000), rot=30, sigma=2,
            train=False)
        want = ref(src.copy(), {k: (v.copy() if hasattr(v, "copy")
                                    else v) for k, v in label.items()})

        got = hybrik_train_sample(np.random.default_rng(0),
                                  src.astype(np.float32), label,
                                  Hybrik3DConfig(), train=False)

        np.testing.assert_allclose(
            got["image"].transpose(2, 0, 1),
            want["image"].numpy(), atol=2e-2)   # uint8 vs float warp
        for k in ("target_uvd_29", "target_xyz_24", "target_xyz_17",
                  "target_weight_29", "target_weight_24",
                  "target_weight_17", "target_theta", "trans_inv",
                  "intrinsic_param", "joint_root", "depth_factor",
                  "target_twist", "target_twist_weight", "bbox"):
            np.testing.assert_allclose(
                got[k], want[k].numpy(), atol=1e-5, err_msg=k)

    def test_train_path_invariants(self):
        rng = np.random.default_rng(11)
        W, H = 320, 240
        src = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        for seed in range(6):
            got = hybrik_train_sample(np.random.default_rng(seed),
                                      src.copy(), _label(rng, W, H))
            assert got["image"].shape == (256, 256, 3)
            assert np.isfinite(got["image"]).all()
            assert got["target_uvd_29"].shape == (87,)
            assert np.abs(got["target_xyz_24"]).max() < 10
            # quats are unit (w, x, y, z) per joint
            q = got["target_theta"].reshape(24, 4)
            np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0,
                                       atol=1e-5)
            assert set(np.unique(got["target_weight_29"])) <= {0.0, 1.0}


class TestHybrikTrainStep:
    def test_loss_decreases_with_ik(self):
        import jax
        import jax.numpy as jnp

        from mvsmplfitting_tpu.detect.hybrik import Simple3DPoseSMPLCam
        from mvsmplfitting_tpu.detect.train import (
            init_train_state, lr_schedule, make_hybrik_train_step,
            make_optimizer)
        from mvsmplfitting_tpu.models.assets import synthetic_smpl

        rng = np.random.default_rng(5)
        W = H = 320
        src = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        samples = [hybrik_train_sample(
            np.random.default_rng(s), src.copy(), _label(rng, W, H),
            Hybrik3DConfig(input_hw=(64, 64))) for s in range(2)]
        batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                 for k in samples[0]}

        model = Simple3DPoseSMPLCam(depth_dim=16, height_dim=16,
                                    width_dim=16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        batch["image"][:1])
        tx = make_optimizer("adam", lr_schedule("multistep", 1e-4,
                                                1000, 2000))
        state = init_train_state(variables, tx)
        step = make_hybrik_train_step(model, tx,
                                      assets=synthetic_smpl())
        hist = {"loss_uvd": [], "loss_twist": [], "loss_beta": [],
                "loss_theta": [], "total": []}
        for _ in range(10):
            state, loss, aux = step(state, batch)
            hist["total"].append(float(loss))
            for k in ("loss_uvd", "loss_twist", "loss_beta",
                      "loss_theta"):
                hist[k].append(float(aux[k]))
        for k, v in hist.items():
            assert np.isfinite(v).all(), (k, v)
        # Overfitting one batch must drive the directly-supervised
        # heads down (uvd via the integral volume, twist via decphi;
        # beta rides noisy untrained-BN pooled features at N=2 and
        # theta flows THROUGH the IK of a garbage skeleton, so those
        # only need to stay finite here — tools/hybrik_train_demo.py
        # is the full learnability proof).
        assert hist["loss_uvd"][-1] < hist["loss_uvd"][0], hist
        assert hist["loss_twist"][-1] < hist["loss_twist"][0], hist
