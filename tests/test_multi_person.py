"""Multi-person fitting with SDF coupling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import FitConfig
from mvsmplfitting_tpu.fitting.energy import EnergySpec, Observations
from mvsmplfitting_tpu.fitting.lm import LMOptions
from mvsmplfitting_tpu.fitting.multi_person import fit_people
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.camera import project_points
from mvsmplfitting_tpu.models.joint_model import with_joint_model
from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward

from test_triangulate import make_cameras


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(7)
    assets = with_joint_model(synthetic_smpl())
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    vw = (vposer_lib.load_npz(path) if os.path.exists(path)
          else vposer_lib.random_weights())
    cam = make_cameras()

    obs_list = []
    # Two people close enough that their TRUE bodies interpenetrate —
    # the collision tests' premise must hold for any solver trajectory
    # (at +-0.25 the r4 analytic-Jacobian solo fits happened to land
    # just clear of each other).
    for dx in (-0.2, 0.2):
        z = jnp.asarray(0.2 * rng.standard_normal(32), jnp.float32)
        true = SMPLParams(
            betas=jnp.asarray(0.3 * rng.standard_normal(10),
                              jnp.float32),
            global_orient=jnp.asarray([0.1, 0.2, 0.0]),
            body_pose=jnp.zeros(69),
            transl=jnp.asarray([dx, -0.1, 0.2]),
            scale=jnp.asarray(1.0))
        body_pose = vposer_lib.decode(vw, z)
        _, joints = smpl_forward(assets, true, body_pose)
        gt2d = project_points(cam, joints)
        K = gt2d.shape[1]
        obs_list.append(Observations(
            gt2d=gt2d, conf=jnp.ones((6, K)), view_mask=jnp.ones(6),
            joint_weights=jnp.ones(K)))
    obs_people = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    return assets, vw, cam, obs_people


class TestMultiPerson:
    def test_independent_fits(self, setup):
        assets, vw, cam, obs_people = setup
        cfg = FitConfig(lm=LMOptions(max_iters=15),
                        pose_weights=(404.0, 57.4),
                        shape_weights=(100.0, 10.0),
                        coll_weights=(0.0, 0.0))
        results, sums = fit_people(cfg, assets, cam, obs_people,
                                   vposer_w=vw, img_height=1080.0,
                                   refine_collision=False)
        assert results.loss.shape == (2,)
        assert np.isfinite(np.asarray(results.loss)).all()
        # Two distinct people recovered at distinct positions.
        dx = float(results.params.transl[1, 0] -
                   results.params.transl[0, 0])
        assert 0.2 < dx < 0.6   # truth separation is 0.4 (setup dx=+-0.2)

    def test_collision_refinement_runs(self, setup):
        assets, vw, cam, obs_people = setup
        spec = EnergySpec(interpenetration=True, coll_grid_size=16)
        cfg = FitConfig(spec=spec, lm=LMOptions(max_iters=8),
                        pose_weights=(404.0, 57.4),
                        shape_weights=(100.0, 10.0),
                        coll_weights=(0.0, 1000.0))
        results, sums = fit_people(cfg, assets, cam, obs_people,
                                   vposer_w=vw, img_height=1080.0,
                                   sdf_engine="grid")
        assert sums.shape == (2,)
        assert np.isfinite(np.asarray(sums)).all()
        assert np.isfinite(np.asarray(results.loss)).all()

    def test_hybrid_matches_exact_energy(self, setup):
        """The round-3 quality fix: the hybrid lagged+polish schedule
        must land at the reference's every-evaluation-semantics energy
        (`code/utils/fitting.py:352-394`), not the lagged schedule's
        worse minimum (r2 measured 1.6e8 vs 1.1e8 on the big fixture)."""
        assets, vw, cam, obs_people = setup
        spec = EnergySpec(interpenetration=True, coll_grid_size=16)
        cfg = FitConfig(spec=spec, lm=LMOptions(max_iters=8),
                        pose_weights=(404.0, 57.4),
                        shape_weights=(100.0, 10.0),
                        coll_weights=(0.0, 1000.0))
        w_coll = cfg.coll_weights[-1]

        def joint_energy(results, sums):
            # The joint refinement objective: per-person data+prior
            # energies plus the collision rows at the final weight.
            return float(np.asarray(results.loss).sum() +
                         ((w_coll * np.asarray(sums) / 2.0) ** 2).sum())

        e = {}
        for mode in ("exact", "hybrid"):
            r, s = fit_people(cfg, assets, cam, obs_people,
                              vposer_w=vw, img_height=1080.0,
                              lagged_sdf=mode, sdf_engine="grid")
            e[mode] = joint_energy(r, s)
        assert np.isfinite(e["exact"]) and np.isfinite(e["hybrid"])
        # Same-or-better minimum within LM trajectory noise.
        assert e["hybrid"] <= 1.10 * e["exact"], e

    def test_points_engine_resolves_penetration(self, setup):
        """The round-3 production engine (`sdf_engine="points"`, the
        default): the TRUE (gridless) penetration must be driven to
        ~zero without degrading the data fit.

        The grid energy at a coarse test grid is NOT a valid ruler
        here: trilinear self-sampling of each person's own surface
        dominates the grid sums (measured [58, 72] "penetration" at
        G=16 vs the true field's [0.35, 0] on this fixture), so
        grid-judged comparisons reward suppressing a discretization
        artifact.  At the reference's production G=128 the artifact is
        small and the two fields agree."""
        from mvsmplfitting_tpu.ops.sdf import collision_sums_points

        assets, vw, cam, obs_people = setup
        spec = EnergySpec(interpenetration=True, coll_grid_size=16)
        cfg = FitConfig(spec=spec, lm=LMOptions(max_iters=8),
                        pose_weights=(404.0, 57.4),
                        shape_weights=(100.0, 10.0),
                        coll_weights=(0.0, 1000.0))

        def people_verts(r):
            def pv(params, z):
                bp = vposer_lib.decode(vw, z)
                v, _ = smpl_forward(assets, params, bp)
                return v
            return jax.vmap(pv)(r.params, r.z)

        r_solo, _ = fit_people(cfg, assets, cam, obs_people,
                               vposer_w=vw, img_height=1080.0,
                               refine_collision=False)
        s0 = np.asarray(collision_sums_points(people_verts(r_solo),
                                              assets.faces))
        assert s0.sum() > 0.1          # fixture really interpenetrates

        # The +-0.2 fixture overlaps deeper than the original +-0.25
        # one; give the refinement a correspondingly deeper budget
        # (default 15 resolves 94.6% here — just under the bar).
        r_pts, s_pts = fit_people(cfg, assets, cam, obs_people,
                                  vposer_w=vw, img_height=1080.0,
                                  points_iters=25)
        s_pts = np.asarray(s_pts)
        assert np.isfinite(s_pts).all()
        # True penetration resolved (>=95% of the initial overlap).
        assert s_pts.sum() <= 0.05 * s0.sum() + 1e-6, (s0, s_pts)
        # Data terms stay honest: same final-stage weighting in both
        # results, so a bounded ratio means the bodies were pushed
        # apart, not distorted away from their detections.
        assert (np.asarray(r_pts.loss)
                <= 2.0 * np.asarray(r_solo.loss) + 1e3).all(), (
            r_solo.loss, r_pts.loss)
