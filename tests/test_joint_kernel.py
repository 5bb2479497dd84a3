"""Fused Pallas joint-Jacobian kernel (`ops/joint_kernel.py`).

Exactness contract: the kernel is the SAME algebra as
`models/joint_jac.py:joint_jacobian` reassociated — values must match
to float32 round-off (NOT bitwise: XLA and Mosaic contract
multiply-adds differently; the documented fori/while-class spread).
CPU interpret mode does not validate Mosaic (CLAUDE.md) — the chip
compile gate lives in `tools/bench_joint_kernel.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsmplfitting_tpu.fitting import energy as E
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.joint_jac import joint_jacobian
from mvsmplfitting_tpu.models.joint_model import with_joint_model
from mvsmplfitting_tpu.models.smpl import SMPLParams
from mvsmplfitting_tpu.ops import joint_kernel as JK

RTOL = 3e-5   # fp32 reassociation spread (same class as fori/while)
ATOL = 1e-5


def _rand_inputs(rng, B, J=24, NB=10):
    theta = jnp.asarray(rng.normal(0, 0.4, (B, J * 3)), jnp.float32)
    betas = jnp.asarray(rng.normal(0, 1.0, (B, NB)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.7, 1.5, (B,)), jnp.float32)
    return theta, betas, scale


def _ref_blocks(jm, theta, betas, scale):
    """Vmapped XLA closed form, joints WITHOUT transl."""
    def one(th, be, sc):
        params = SMPLParams(
            betas=be, global_orient=th[:3],
            body_pose=jnp.zeros((th.shape[0] - 3,), th.dtype),
            transl=jnp.zeros((3,), th.dtype), scale=sc)
        return joint_jacobian(jm, params, th[3:])
    return jax.vmap(one)(theta, betas, scale)


def _assert_blocks_close(got, want, what=""):
    gj, gblk = got
    wj, wblk = want
    np.testing.assert_allclose(np.asarray(gj), np.asarray(wj),
                               rtol=RTOL, atol=ATOL,
                               err_msg=f"{what} joints")
    assert set(gblk) == set(wblk)
    for k in wblk:
        np.testing.assert_allclose(
            np.asarray(gblk[k]), np.asarray(wblk[k]),
            rtol=RTOL, atol=ATOL, err_msg=f"{what} block {k}")


@pytest.mark.parametrize("model_type", ["smpl", "smpllsp"])
class TestCoreExactness:
    def test_core_matches_xla_closed_form(self, model_type):
        """_core run as plain XLA == joint_jacobian, both slot kinds."""
        assets = with_joint_model(synthetic_smpl(model_type))
        jm = assets.joint_model
        rng = np.random.default_rng(0)
        B = 7
        theta, betas, scale = _rand_inputs(rng, B)

        tables = JK._build_tables(jm)
        meta = tables.meta
        thT = theta.reshape(B, 24, 3).transpose(2, 1, 0).reshape(72, B)
        out = JK._core(thT, betas.T, scale.reshape(1, B),
                       tables.fold_p, tables.c_p, tables.c_cb,
                       tables.c_vb_w, tables.c_vb_p, tables.smalls,
                       tables.mats, meta)
        assert out.shape == (JK.out_rows(meta), B)
        joints, dth, dbe, dsc = JK._unpack_out(out.T, meta)
        got = (joints, {"orient": dth[:, :3], "pose": dth[:, 3:],
                        "betas": dbe, "scale": dsc,
                        "transl": jnp.broadcast_to(
                            jnp.eye(3)[None, :, None, :],
                            (B, 3, meta.K, 3))})
        _assert_blocks_close(got, _ref_blocks(jm, theta, betas, scale),
                             model_type)

    def test_pallas_interpret_matches(self, model_type):
        """The pallas_call path (interpret mode) incl. lane padding."""
        assets = with_joint_model(synthetic_smpl(model_type))
        jm = assets.joint_model
        rng = np.random.default_rng(1)
        B = 5   # far from the 128-lane tile: exercises padding
        theta, betas, scale = _rand_inputs(rng, B)
        got = JK.joint_jacobian_batched(jm, theta, betas, scale,
                                        interpret=True)
        _assert_blocks_close(got, _ref_blocks(jm, theta, betas, scale),
                             f"{model_type} interpret")

    def test_pallas_multiblock_grid(self, model_type):
        """B > 128 exercises the lane-block grid."""
        assets = with_joint_model(synthetic_smpl(model_type))
        jm = assets.joint_model
        rng = np.random.default_rng(2)
        B = 130
        theta, betas, scale = _rand_inputs(rng, B)
        got = JK.joint_jacobian_batched(jm, theta, betas, scale,
                                        interpret=True)
        _assert_blocks_close(got, _ref_blocks(jm, theta, betas, scale),
                             f"{model_type} grid")


class TestAutoWrapper:
    def test_unbatched_call_uses_xla(self):
        assets = with_joint_model(synthetic_smpl("smpl"))
        jm = assets.joint_model
        rng = np.random.default_rng(3)
        theta, betas, scale = _rand_inputs(rng, 1)
        auto = JK.make_joint_jacobian_auto(jm)
        gj, gblk = auto(theta[0], betas[0], scale[0])
        wj, wblk = _ref_blocks(jm, theta, betas, scale)
        _assert_blocks_close(
            (gj[None], {k: v[None] for k, v in gblk.items()}),
            (wj, wblk), "unbatched")

    def test_vmapped_call_hits_kernel(self):
        assets = with_joint_model(synthetic_smpl("smpl"))
        jm = assets.joint_model
        rng = np.random.default_rng(4)
        B = 6
        theta, betas, scale = _rand_inputs(rng, B)
        auto = JK.make_joint_jacobian_auto(jm)
        got = jax.jit(jax.vmap(auto))(theta, betas, scale)
        _assert_blocks_close(got, _ref_blocks(jm, theta, betas, scale),
                             "vmapped")


class TestEnergyIntegration:
    def test_residual_jacobian_kernel_vs_xla(self, monkeypatch):
        """End-to-end: residual_jacobian with the kernel enabled equals
        the XLA analytic path on the full vmapped r+J."""
        import sys
        sys.path.insert(0, "tests")
        from test_fitting import vposer_w as _vw_fixture  # noqa: F401
        from test_triangulate import make_cameras

        import os
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "vposer_weights.npz")
        from mvsmplfitting_tpu.models import vposer as vposer_lib
        vw = (vposer_lib.load_npz(path) if os.path.exists(path)
              else vposer_lib.random_weights())

        assets = with_joint_model(synthetic_smpl("smpl"))
        spec = E.EnergySpec(use_vposer=True)
        cam = make_cameras(num_views=3)
        rng = np.random.default_rng(6)
        K = int(assets.joint_map.shape[0])
        obs = E.Observations(
            gt2d=jnp.asarray(rng.normal(500, 80, (3, K, 2)),
                             jnp.float32),
            conf=jnp.ones((3, K), jnp.float32),
            view_mask=jnp.ones((3,), jnp.float32),
            joint_weights=jnp.ones((K,), jnp.float32))
        weights = E.StageWeights.make(data=0.5, pose=2.0, shape=1.0)
        n = E.num_unknowns(spec)
        xs = jnp.asarray(rng.normal(0, 0.1, (4, n)), jnp.float32)

        def rj(x, o):
            return E.residual_jacobian(spec, assets, cam, o, weights,
                                       vw, None, x)

        obs_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (4,) + a.shape), obs)

        monkeypatch.setenv("MVSF_JOINT_KERNEL", "0")
        assert "pallas_call" not in str(
            jax.make_jaxpr(jax.vmap(rj))(xs, obs_b))
        r0, J0 = jax.jit(jax.vmap(rj))(xs, obs_b)
        monkeypatch.setenv("MVSF_JOINT_KERNEL", "1")
        # positive control: the flag really switches the graph (the
        # r5 chip-measurement trap was a silently-reused trace)
        assert "pallas_call" in str(
            jax.make_jaxpr(jax.vmap(rj))(xs, obs_b))
        r1, J1 = jax.jit(lambda a, b: jax.vmap(rj)(a, b))(xs, obs_b)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   rtol=RTOL, atol=ATOL)
        scale_ref = np.maximum(np.abs(np.asarray(J0)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(J1), np.asarray(J0),
                                   rtol=RTOL,
                                   atol=ATOL * scale_ref)


class TestVposerTailKernel:
    """Fused decoder-tail kernel (`ops/vposer_kernel.py`)."""

    def _vw(self):
        import os
        from mvsmplfitting_tpu.models import vposer as vposer_lib
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "vposer_weights.npz")
        return (vposer_lib.load_npz(path) if os.path.exists(path)
                else vposer_lib.random_weights())

    def test_batched_matches_decode_jac(self):
        from mvsmplfitting_tpu.models import vposer as V
        from mvsmplfitting_tpu.ops import vposer_kernel as VK
        vw = self._vw()
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(0, 0.6, (5, 32)), jnp.float32)
        aa1, D1 = VK.decode_jac_batched(vw, z, interpret=True)
        aa0, D0 = jax.vmap(lambda zi: V.decode_jac(vw, zi))(z)
        np.testing.assert_allclose(np.asarray(aa1), np.asarray(aa0),
                                   rtol=RTOL, atol=ATOL)
        sc = np.maximum(np.abs(np.asarray(D0)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                                   rtol=3e-4, atol=3e-4 * sc)

    def test_near_identity_rotations(self):
        # The small-angle / pivot-floor quirks must differentiate
        # identically (6D reps near the identity rotation).
        from mvsmplfitting_tpu.models import vposer as V
        from mvsmplfitting_tpu.ops import vposer_kernel as VK
        vw = self._vw()
        rng = np.random.default_rng(1)
        z = jnp.asarray(rng.normal(0, 1e-3, (3, 32)), jnp.float32)
        aa1, D1 = VK.decode_jac_batched(vw, z, interpret=True)
        aa0, D0 = jax.vmap(lambda zi: V.decode_jac(vw, zi))(z)
        np.testing.assert_allclose(np.asarray(aa1), np.asarray(aa0),
                                   rtol=RTOL, atol=ATOL)
        sc = np.maximum(np.abs(np.asarray(D0)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                                   rtol=3e-4, atol=3e-4 * sc)

    def test_auto_wrapper_vmap(self):
        from mvsmplfitting_tpu.models import vposer as V
        from mvsmplfitting_tpu.ops import vposer_kernel as VK
        vw = self._vw()
        rng = np.random.default_rng(2)
        z = jnp.asarray(rng.normal(0, 0.6, (4, 32)), jnp.float32)
        auto = VK.make_decode_jac_auto(vw)
        aa1, D1 = jax.jit(jax.vmap(auto))(z)
        aa0, D0 = jax.vmap(lambda zi: V.decode_jac(vw, zi))(z)
        np.testing.assert_allclose(np.asarray(aa1), np.asarray(aa0),
                                   rtol=RTOL, atol=ATOL)
        sc = np.maximum(np.abs(np.asarray(D0)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                                   rtol=3e-4, atol=3e-4 * sc)
