"""HybrIK regressor: analytical IK round-trip + decode arithmetic.

The reference model (`simple3dposeSMPLWithCam.py`) cannot run as
shipped (commented-out SMPL_layer import, missing model_files), so the
tests validate (a) the twist-and-swing IK against our own FK as an
exact round-trip, and (b) the integral decode / camera back-projection
against direct numpy transliterations of the cited arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.detect.hybrik import (
    Simple3DPoseSMPLCam, integral_uvd, uvd_to_xyz,
)
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.hybrik import (
    _SMPL_CHILD, forward_rotmats, hybrik_ik, twist_angles,
)
from mvsmplfitting_tpu.models.smpl import rodrigues

LEAVES = [i for i in range(24) if _SMPL_CHILD[i] < 0]


class TestIK:
    def test_round_trip_recovers_pose(self, rng):
        """IK(FK(pose), twists(pose)) == pose for non-leaf joints."""
        assets = synthetic_smpl()
        betas = jnp.asarray(0.4 * rng.standard_normal(10), jnp.float32)
        pose = 0.35 * rng.standard_normal((24, 3)).astype(np.float32)
        pose[LEAVES] = 0.0     # leaves are identity in the 24-joint IK
        R_true = rodrigues(jnp.asarray(pose))

        _, joints_t = forward_rotmats(assets, betas, R_true)
        phis = twist_angles(assets, betas, R_true)
        R_ik = hybrik_ik(assets, joints_t, betas, phis)

        np.testing.assert_allclose(np.asarray(R_ik), np.asarray(R_true),
                                   atol=2e-5)
        verts_t, _ = forward_rotmats(assets, betas, R_true)
        verts_i, joints_i = forward_rotmats(assets, betas, R_ik)
        np.testing.assert_allclose(
            np.asarray(verts_i - joints_i[0]),
            np.asarray(verts_t - joints_t[0]), atol=1e-4)

    def test_primary_bones_matched_even_with_wrong_twists(self, rng):
        """Swing alone lands every PRIMARY-child bone on its target.

        (Secondary children — the collar bones off spine3 — legitimately
        depend on the twist; that is exactly why the network regresses
        phis.)
        """
        assets = synthetic_smpl()
        betas = jnp.zeros(10)
        pose = 0.3 * rng.standard_normal((24, 3)).astype(np.float32)
        pose[LEAVES] = 0.0
        R_true = rodrigues(jnp.asarray(pose))
        _, joints_t = forward_rotmats(assets, betas, R_true)

        zero_phis = jnp.tile(jnp.asarray([1.0, 0.0]), (23, 1))
        R_ik = hybrik_ik(assets, joints_t, betas, zero_phis)
        _, joints_i = forward_rotmats(assets, betas, R_ik)
        ji = np.asarray(joints_i - joints_i[0])
        jt = np.asarray(joints_t - joints_t[0])
        for i in range(1, 24):
            c = _SMPL_CHILD[i]
            if c < 0:
                continue
            bi = ji[c] - ji[i]
            bt = jt[c] - jt[i]
            cos = bi @ bt / (np.linalg.norm(bi) * np.linalg.norm(bt))
            assert cos > 1 - 1e-5, (i, c, cos)

    def test_29_joint_skeleton_accepted(self, rng):
        assets = synthetic_smpl()
        betas = jnp.zeros(10)
        skel = jnp.asarray(rng.standard_normal((29, 3)), jnp.float32)
        phis = jnp.tile(jnp.asarray([1.0, 0.0]), (23, 1))
        R = hybrik_ik(assets, skel, betas, phis)
        assert R.shape == (24, 3, 3)
        assert np.isfinite(np.asarray(R)).all()


class TestDecode:
    def test_integral_uvd_matches_numpy(self, rng):
        """`simple3dposeSMPLWithCam.py:211-238` as direct numpy."""
        N, J, D, H, W = 2, 4, 8, 6, 5
        vol = rng.standard_normal((N, J, D, H, W)).astype(np.float32)
        uvd, maxvals = integral_uvd(jnp.asarray(vol), W, H, D)

        flat = vol.reshape(N, J, -1)
        e = np.exp(flat - flat.max(axis=2, keepdims=True))
        heat = (e / e.sum(axis=2, keepdims=True))
        want_max = heat.max(axis=2, keepdims=True)
        heat = heat.reshape(N, J, D, H, W)
        hm_x = heat.sum((2, 3))
        hm_y = heat.sum((2, 4))
        hm_z = heat.sum((3, 4))
        cx = (hm_x * np.arange(W)).sum(-1) / W - 0.5
        cy = (hm_y * np.arange(H)).sum(-1) / H - 0.5
        cz = (hm_z * np.arange(D)).sum(-1) / D - 0.5
        np.testing.assert_allclose(
            np.asarray(uvd), np.stack([cx, cy, cz], -1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(maxvals), want_max,
                                   atol=1e-6)

    def test_uvd_to_xyz_matches_numpy(self, rng):
        """No-bbox branch of `simple3dposeSMPLWithCam.py:284-322`."""
        N, J = 2, 29
        f, size, df = 1000.0, 256.0, 2.0
        uvd = rng.uniform(-0.5, 0.5, (N, J, 3)).astype(np.float32)
        cam = np.stack([rng.uniform(0.5, 1.5, N),
                        rng.uniform(-0.2, 0.2, N),
                        rng.uniform(-0.2, 0.2, N)], -1).astype(np.float32)
        xyz, root = uvd_to_xyz(jnp.asarray(uvd), jnp.asarray(cam),
                               f, size, df)

        cam_depth = f / (size * cam[:, 0] + 1e-9)    # (N,)
        want = np.zeros_like(uvd)
        want[..., 2] = uvd[..., 2]
        xy_m = ((uvd[..., :2] * size / f) *
                (uvd[..., 2:] * df + cam_depth[:, None, None]) -
                cam[:, None, 1:])
        want[..., :2] = xy_m / df
        want_root = want[:, 0] * df
        want_root[:, 2] += cam_depth
        want = want - want[:, :1]
        np.testing.assert_allclose(np.asarray(xyz), want, atol=1e-5)
        np.testing.assert_allclose(np.asarray(root), want_root,
                                   atol=1e-5)


class TestNetwork:
    def test_forward_shapes(self, rng):
        model = Simple3DPoseSMPLCam(num_joints=5, depth_dim=8,
                                    height_dim=16, width_dim=16)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out["pred_uvd_jts"].shape == (1, 5, 3)
        assert out["pred_shape"].shape == (1, 10)
        assert out["pred_phi"].shape == (1, 23, 2)
        assert out["pred_camera"].shape == (1, 3)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()
        # uvd expectations live inside the decode's value range
        assert float(jnp.abs(out["pred_uvd_jts"]).max()) <= 0.5


class TestConverterParity:
    def test_full_graph_matches_torch_random_weights(self, rng):
        """The reference's exact module layout
        (`simple3dposeSMPLWithCam.py:32-127`: preact ResNet-50,
        `_make_deconv_layer` stack, final 1x1, fc1/fc2 + dec heads —
        no ReLU between the FCs, dropout eval-identity), random
        weights + randomized BN stats, converted with
        `convert_hybrik_sd`.  The uvd decode applies OUR
        (numpy-golden) `integral_uvd` to the torch volume so the
        assertion isolates converter + architecture parity."""
        import importlib.util
        import sys

        import torch
        import torch.nn as tnn

        path = ("/root/reference/alphapose_core/alphapose/models/"
                "layers/Resnet.py")
        spec = importlib.util.spec_from_file_location("apx_resnet_h",
                                                      path)
        rmod = importlib.util.module_from_spec(spec)
        sys.modules["apx_resnet_h"] = rmod
        spec.loader.exec_module(rmod)

        J, D, F = 29, 8, 64   # narrow deconvs + depth for speed

        class THybrik(tnn.Module):
            def __init__(self):
                super().__init__()
                self.preact = rmod.ResNet("resnet50")
                self.deconv_layers = tnn.Sequential(
                    tnn.ConvTranspose2d(2048, F, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(F), tnn.ReLU(True),
                    tnn.ConvTranspose2d(F, F, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(F), tnn.ReLU(True),
                    tnn.ConvTranspose2d(F, F, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(F), tnn.ReLU(True))
                self.final_layer = tnn.Conv2d(F, J * D, 1)
                self.avg_pool = tnn.AdaptiveAvgPool2d(1)
                self.fc1 = tnn.Linear(2048, 1024)
                self.fc2 = tnn.Linear(1024, 1024)
                self.decshape = tnn.Linear(1024, 10)
                self.decphi = tnn.Linear(1024, 23 * 2)
                self.deccam = tnn.Linear(1024, 3)

            def forward(self, x):
                feat = self.preact(x)
                vol = self.final_layer(self.deconv_layers(feat))
                xc = self.avg_pool(feat).flatten(1)
                xc = self.fc2(self.fc1(xc))
                return (vol, self.decshape(xc), self.decphi(xc),
                        self.deccam(xc))

        torch.manual_seed(0)
        tm = THybrik()
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            vol_t, shape_t, phi_t, cam_t = tm(
                torch.from_numpy(x).permute(0, 3, 1, 2))
        H = W = 16
        vol_t = vol_t.reshape(1, J, D, H, W).numpy()
        want_uvd, want_max = integral_uvd(jnp.asarray(vol_t), W, H, D)

        from mvsmplfitting_tpu.detect.convert import convert_hybrik_sd
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_hybrik_sd(sd))
        model = Simple3DPoseSMPLCam(
            num_joints=J, depth_dim=D, height_dim=H, width_dim=W,
            deconv_filters=(F, F, F))
        out = model.apply(variables, jnp.asarray(x))

        np.testing.assert_allclose(np.asarray(out["pred_uvd_jts"]),
                                   np.asarray(want_uvd),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["maxvals"]),
                                   np.asarray(want_max),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["pred_shape"]),
                                   shape_t.numpy(), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["pred_phi"]).reshape(1, -1),
            phi_t.numpy(), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["pred_camera"]) - np.array([0.9, 0, 0]),
            cam_t.numpy(), atol=2e-4, rtol=1e-3)
