"""Schur-complement shared-shape sequence fitting tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import FitConfig, init_guess
from mvsmplfitting_tpu.fitting.lm import LMOptions
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.camera import project_points
from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward
from mvsmplfitting_tpu.fitting.energy import Observations
from mvsmplfitting_tpu.parallel.mesh import MeshLayout, make_mesh
from mvsmplfitting_tpu.parallel.schur import schur_sequence_fit

from test_triangulate import make_cameras


@pytest.fixture(scope="module")
def assets():
    return synthetic_smpl()


@pytest.fixture(scope="module")
def vposer_w():
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    return (vposer_lib.load_npz(path) if os.path.exists(path)
            else vposer_lib.random_weights())


def make_sequence(assets, vposer_w, rng, B=4):
    """B frames of one person (fixed betas/scale, drifting pose)."""
    cam = make_cameras()
    betas = jnp.asarray(0.5 * rng.standard_normal(10), jnp.float32)
    scale = jnp.asarray(1.15, jnp.float32)
    obs_list, guesses_p, guesses_z = [], [], []
    for f in range(B):
        z = jnp.asarray(0.3 * rng.standard_normal(32), jnp.float32)
        params = SMPLParams(
            betas=betas, global_orient=jnp.asarray(
                [0.1 * f, 0.3, -0.1], jnp.float32),
            body_pose=jnp.zeros(69),
            transl=jnp.asarray([0.05 * f, -0.2, 0.3], jnp.float32),
            scale=scale)
        body_pose = vposer_lib.decode(vposer_w, z)
        _, joints = smpl_forward(assets, params, body_pose)
        gt2d = project_points(cam, joints)
        K = gt2d.shape[1]
        obs = Observations(gt2d=gt2d, conf=jnp.ones((6, K)),
                           view_mask=jnp.ones(6),
                           joint_weights=jnp.ones(K))
        obs_list.append(obs)
        g = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        guesses_p.append(g.params)
        guesses_z.append(g.z)
    batch_obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    batch_p = jax.tree.map(lambda *xs: jnp.stack(xs), *guesses_p)
    batch_z = jnp.stack(guesses_z)
    return cam, batch_obs, batch_p, batch_z, betas, scale


class TestSchurSequence:
    def test_shared_shape_recovered(self, assets, vposer_w, rng):
        cam, obs, p0, z0, betas_true, scale_true = make_sequence(
            assets, vposer_w, rng)
        cfg = FitConfig(lm=LMOptions(max_iters=30))
        params, z, losses, shared = jax.jit(
            lambda o, p, zz: schur_sequence_fit(
                cfg, assets, cam, o, p, zz, vposer_w=vposer_w,
                img_height=1080.0))(obs, p0, z0)

        assert losses.shape == (4,)
        assert np.isfinite(np.asarray(losses)).all()
        # One shared shape/scale across all frames.
        assert np.ptp(np.asarray(params.scale)) == 0.0
        np.testing.assert_allclose(float(params.scale[0]),
                                   float(scale_true), rtol=0.05)
        # Betas are only weakly observable from 17 joints x 4 frames
        # (the shape prior shrinks flat directions, and fp-level
        # trajectory changes move individual coefficients by ~0.4 at
        # UNCHANGED final losses — verified with a 2x iteration
        # budget).  Assert the determined part: strong correlation
        # with truth plus a loose elementwise bound.
        b = np.asarray(params.betas[0])
        bt = np.asarray(betas_true)
        assert float(np.corrcoef(b, bt)[0, 1]) > 0.7
        np.testing.assert_allclose(b, bt, atol=0.6)

    def test_sharded_matches_unsharded(self, assets, vposer_w, rng):
        cam, obs, p0, z0, *_ = make_sequence(assets, vposer_w, rng, B=8)
        cfg = FitConfig(lm=LMOptions(max_iters=6),
                        pose_weights=(57.4,), shape_weights=(10.0,),
                        coll_weights=(0.0,))
        mesh = make_mesh(MeshLayout(frames=8, cameras=1))

        _, _, losses_plain, shared_plain = schur_sequence_fit(
            cfg, assets, cam, obs, p0, z0, vposer_w=vposer_w,
            img_height=1080.0)
        _, _, losses_mesh, shared_mesh = schur_sequence_fit(
            cfg, assets, cam, obs, p0, z0, vposer_w=vposer_w,
            img_height=1080.0, mesh=mesh)
        # psum reduction order vs jnp.sum differs in float32 and the LM
        # accept/reject trajectory amplifies it — equivalence here is
        # statistical, so the bounds are intentionally loose (the exact
        # single-device math is covered by test_shared_shape_recovered).
        np.testing.assert_allclose(np.asarray(shared_mesh),
                                   np.asarray(shared_plain), atol=0.15)
        np.testing.assert_allclose(np.asarray(losses_mesh),
                                   np.asarray(losses_plain), rtol=0.3)
