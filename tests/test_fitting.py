"""Energy, solvers, and end-to-end synthetic fitting tests.

Checks (a) the residual form squares to the scalar energy exactly (the
LM solver therefore minimizes the identical objective the reference's
L-BFGS minimizes — `code/utils/fitting.py:290-415`), (b) both solvers
drive synthetic multi-view fits to low reprojection error, (c) the whole
staged fit recovers ground-truth-ish parameters from rendered 2D
keypoints of a known body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import (
    EnergySpec, FitConfig, Observations, StageWeights,
    fit_frame, free_mask, init_guess, lbfgs_fit, lm_fit, pack,
    residuals, total_energy, unpack,
)
from mvsmplfitting_tpu.fitting.energy import reprojection_error_px
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.camera import project_points
from mvsmplfitting_tpu.models.priors import random_gmm
from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward

from test_triangulate import make_cameras


@pytest.fixture(scope="module")
def assets():
    return synthetic_smpl()


@pytest.fixture(scope="module")
def vposer_w():
    # The real decoder weights (converted from the reference's bundled
    # snapshot, committed as assets/vposer_weights.npz) make the latent ->
    # pose map smooth; a random MLP decoder is hopelessly ill-conditioned
    # and stalls any solver in local minima.
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    if os.path.exists(path):
        return vposer_lib.load_npz(path)
    return vposer_lib.random_weights()


def make_problem(assets, vposer_w, rng, noise_px=0.0):
    """Ground-truth body + its 2D projections in 6 views."""
    cam = make_cameras()
    z_true = jnp.asarray(0.4 * rng.standard_normal(32), jnp.float32)
    true = SMPLParams(
        betas=jnp.asarray(0.5 * rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray([0.2, 0.4, -0.1], jnp.float32),
        body_pose=jnp.zeros(69),
        transl=jnp.asarray([0.1, -0.2, 0.3], jnp.float32),
        scale=jnp.asarray(1.1, jnp.float32),
    )
    body_pose = vposer_lib.decode(vposer_w, z_true)
    _, joints = smpl_forward(assets, true, body_pose)
    gt2d = project_points(cam, joints)
    if noise_px:
        gt2d = gt2d + noise_px * rng.standard_normal(gt2d.shape)
    K = gt2d.shape[1]
    obs = Observations(
        gt2d=jnp.asarray(gt2d, jnp.float32),
        conf=jnp.ones((6, K)),
        view_mask=jnp.ones(6),
        joint_weights=jnp.ones(K),
    )
    return cam, obs, true, z_true


class TestEnergyForms:
    def test_residuals_square_to_energy(self, assets, vposer_w, rng):
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        spec = EnergySpec(use_vposer=True)
        w = StageWeights.make(data=500.0 / 1080, pose=404.0, shape=100.0)
        x = pack(spec, true, z_true) + 0.05
        r = residuals(spec, assets, cam, obs, w, vposer_w, None, x)
        e = total_energy(spec, assets, cam, obs, w, vposer_w, None, x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)

    def test_residuals_square_to_energy_no_vposer_l2(self, assets, rng):
        cam, obs, true, _ = make_problem(
            assets, vposer_lib.random_weights(), rng)
        spec = EnergySpec(use_vposer=False, prior_type="l2")
        w = StageWeights.make(data=0.5, pose=4.78, shape=5.0)
        params = true.replace(body_pose=jnp.asarray(
            0.1 * rng.standard_normal(69), jnp.float32))
        x = pack(spec, params)
        r = residuals(spec, assets, cam, obs, w, None, None, x)
        e = total_energy(spec, assets, cam, obs, w, None, None, x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)

    def test_gmm_residuals_match_quadratic_part(self, assets, rng):
        gmm = random_gmm()
        pose = jnp.asarray(0.3 * rng.standard_normal(69), jnp.float32)
        r = gmm.residuals(pose)
        # sum(r^2) == 0.5 * quad of the argmin component
        diff = pose[None] - gmm.means
        quad = jnp.einsum("mi,mij,mj->m", diff, gmm.precisions, diff)
        best = int(jnp.argmin(0.5 * quad - jnp.log(gmm.nll_weights)))
        np.testing.assert_allclose(float(jnp.sum(r * r)),
                                   float(0.5 * quad[best]), rtol=1e-4)

    def test_view_mask_removes_view_contribution(self, assets, vposer_w,
                                                 rng):
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        spec = EnergySpec()
        w = StageWeights.make(data=0.5, pose=10.0, shape=10.0)
        x = pack(spec, true, z_true) + 0.1
        # Corrupt view 5, then mask it: energy must equal the clean-5-view
        # energy with the same mask.
        bad = obs.replace(gt2d=obs.gt2d.at[5].add(1e4),
                          view_mask=obs.view_mask.at[5].set(0.0))
        clean = obs.replace(view_mask=obs.view_mask.at[5].set(0.0))
        e_bad = total_energy(spec, assets, cam, bad, w, vposer_w, None, x)
        e_clean = total_energy(spec, assets, cam, clean, w, vposer_w, None,
                               x)
        np.testing.assert_allclose(float(e_bad), float(e_clean), rtol=1e-6)


class TestSolvers:
    def test_lm_on_rosenbrock(self):
        def res(x):
            return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        x, loss = lm_fit(res, jnp.asarray([-1.2, 1.0]), jnp.ones(2))
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-4)

    def test_lbfgs_on_rosenbrock(self):
        def fg(x):
            f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
            return f, jax.grad(
                lambda q: 100.0 * (q[1] - q[0] ** 2) ** 2 +
                (1 - q[0]) ** 2)(x)

        from mvsmplfitting_tpu.fitting.lbfgs import LBFGSOptions
        x, f = lbfgs_fit(fg, jnp.asarray([-1.2, 1.0]), jnp.ones(2),
                         LBFGSOptions(max_iters=200))
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-3)

    def test_lm_respects_mask(self):
        def res(x):
            return x - jnp.asarray([1.0, 2.0, 3.0])

        mask = jnp.asarray([1.0, 0.0, 1.0])
        x, _ = lm_fit(res, jnp.zeros(3), mask)
        np.testing.assert_allclose(np.asarray(x), [1.0, 0.0, 3.0],
                                   atol=1e-6)


    @pytest.mark.parametrize("linsolve", ["lu", "chol", "schulz"])
    @pytest.mark.parametrize("speculative", [False, True])
    def test_lm_variants_on_rosenbrock(self, linsolve, speculative):
        """Every (linsolve, speculative) combination reaches the same
        minimum — the round-2 production path is schulz+speculative."""
        from mvsmplfitting_tpu.fitting.lm import LMOptions

        def res(x):
            return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        x, loss = lm_fit(res, jnp.asarray([-1.2, 1.0]), jnp.ones(2),
                         LMOptions(max_iters=80, linsolve=linsolve,
                                   speculative=speculative))
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-3)

    def test_speculative_respects_mask(self):
        from mvsmplfitting_tpu.fitting.lm import LMOptions

        def res(x):
            return x - jnp.asarray([1.0, 2.0, 3.0])

        mask = jnp.asarray([1.0, 0.0, 1.0])
        x, _ = lm_fit(res, jnp.zeros(3), mask,
                      LMOptions(speculative=True))
        np.testing.assert_allclose(np.asarray(x), [1.0, 0.0, 3.0],
                                   atol=1e-5)

    def test_solve_spd_methods_agree(self, rng):
        from mvsmplfitting_tpu.fitting.lm import _solve_spd, _spd_inv

        M = rng.standard_normal((30, 30)).astype(np.float32)
        A = jnp.asarray(M @ M.T + 0.5 * np.eye(30, dtype=np.float32))
        b = jnp.asarray(rng.standard_normal(30).astype(np.float32))
        ref = np.asarray(_solve_spd(A, b, "lu"))
        for m in ("chol", "schulz"):
            got = np.asarray(_solve_spd(A, b, m))
            np.testing.assert_allclose(got, ref, atol=5e-3,
                                       err_msg=m)
        inv = np.asarray(_spd_inv(A))
        np.testing.assert_allclose(inv @ np.asarray(A), np.eye(30),
                                   atol=1e-3)

    def test_schulz_badly_scaled_high_cond(self, rng):
        """Jacobi-preconditioned Newton-Schulz regression guard: an
        LM-style JtJ with parameter scales spanning 1e3 (cond ~1e6,
        where the unpreconditioned r1 form lost all accuracy)."""
        from mvsmplfitting_tpu.fitting.lm import _solve_spd

        n = 51
        J = (rng.standard_normal((120, n))
             * np.logspace(0, 3, n)).astype(np.float32)
        JtJ = J.T @ J
        A = JtJ + 1e-3 * np.diag(np.diag(JtJ)).astype(np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        want = np.linalg.solve(A.astype(np.float64),
                               b.astype(np.float64))
        got = np.asarray(_solve_spd(jnp.asarray(A), jnp.asarray(b),
                                    "schulz"))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-4, rel

    def test_lbfgs_respects_mask(self):
        def fg(x):
            f = jnp.sum((x - jnp.asarray([1.0, 2.0, 3.0])) ** 2)
            return f, 2 * (x - jnp.asarray([1.0, 2.0, 3.0]))

        mask = jnp.asarray([1.0, 0.0, 1.0])
        x, _ = lbfgs_fit(fg, jnp.zeros(3), mask)
        np.testing.assert_allclose(np.asarray(x), [1.0, 0.0, 3.0],
                                   atol=1e-5)

    @pytest.mark.parametrize("optim_type", ["adam", "rmsprop", "sgd"])
    def test_first_order_on_quadratic(self, optim_type):
        """Factory variants (`optim_factory.py:27-65`) converge + mask."""
        from mvsmplfitting_tpu.fitting.gradient import (GradientOptions,
                                                        gradient_fit)

        target = jnp.asarray([1.0, 2.0, 3.0])

        def fg(x):
            return jnp.sum((x - target) ** 2), 2 * (x - target)

        opts = GradientOptions(optim_type=optim_type, lr=0.05,
                               max_iters=2000, ftol=0.0)
        mask = jnp.asarray([1.0, 0.0, 1.0])
        x, loss = jax.jit(
            lambda x0: gradient_fit(fg, x0, mask, opts))(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(x), [1.0, 0.0, 3.0],
                                   atol=2e-2)

    def test_adam_staged_fit_smoke(self, assets, vposer_w, rng):
        """A full staged fit driven by adam reduces the energy."""
        from mvsmplfitting_tpu.fitting.gradient import GradientOptions
        from mvsmplfitting_tpu.fitting.stages import default_stages

        cam, obs, _, _ = make_problem(assets, vposer_w, rng)
        spec = EnergySpec()
        cfg = FitConfig(spec=spec, solver="adam",
                        grad=GradientOptions(optim_type="adam", lr=1e-2,
                                             max_iters=150))
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        result = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                           vposer_w=vposer_w, img_height=1080.0)
        assert np.isfinite(float(result.loss))
        w_last = default_stages(cfg, jnp.asarray(1080.0))[-1]
        init_e = total_energy(spec, assets, cam, obs, w_last, vposer_w,
                              None, pack(spec, guess.params, guess.z))
        assert float(result.loss) < float(init_e)


class TestEndToEnd:
    @pytest.mark.parametrize("solver", ["lm", "lbfgs"])
    def test_staged_fit_reaches_low_reproj_error(self, assets, vposer_w,
                                                 rng, solver):
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        cfg = FitConfig(solver=solver)
        result = jax.jit(
            lambda p, z: fit_frame(cfg, assets, cam, obs, p, z,
                                   vposer_w=vposer_w, img_height=1080.0)
        )(guess.params, guess.z)
        err = reprojection_error_px(
            cfg.spec, assets, cam, obs, vposer_w,
            pack(cfg.spec, result.params, result.z))
        assert float(err) < 8.0, f"reproj err {float(err):.2f}px"
        # Stage losses anneal downward overall.
        assert float(result.stage_losses[-1]) < float(
            result.stage_losses[0])

    def test_init_guess_close_to_truth(self, assets, vposer_w, rng):
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        # Translation within tens of cm and scale within ~30% is enough
        # for the annealing to converge.
        assert float(jnp.linalg.norm(
            guess.params.transl - true.params.transl
            if hasattr(true, "params") else
            guess.params.transl - true.transl)) < 0.6
        assert 0.5 < float(guess.params.scale) < 2.0

    def test_fixed_scale_and_shape_stay_fixed(self, assets, vposer_w, rng):
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask,
                           est_scale=False, fixed_scale=1.25)
        betas0 = jnp.full((10,), 0.3)
        spec = EnergySpec(fix_shape=True, fix_scale=True)
        cfg = FitConfig(spec=spec)
        result = fit_frame(cfg, assets, cam, obs,
                           guess.params.replace(betas=betas0), guess.z,
                           vposer_w=vposer_w, img_height=1080.0)
        np.testing.assert_allclose(float(result.params.scale), 1.25,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(result.params.betas),
                                   np.asarray(betas0), rtol=1e-6)

    def test_vmap_over_frames(self, assets, vposer_w, rng):
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        cfg = FitConfig(lm=cfg_lm_fast())
        B = 3
        batch_p = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), guess.params)
        batch_z = jnp.broadcast_to(guess.z, (B, 32))
        batch_obs = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), obs)
        fit = jax.vmap(
            lambda o, p, z: fit_frame(cfg, assets, cam, o, p, z,
                                      vposer_w=vposer_w,
                                      img_height=1080.0))
        out = fit(batch_obs, batch_p, batch_z)
        assert out.loss.shape == (B,)
        # Identical inputs -> identical outputs across the batch.
        np.testing.assert_allclose(np.asarray(out.loss[0]),
                                   np.asarray(out.loss[1]), rtol=1e-6)


def cfg_lm_fast():
    from mvsmplfitting_tpu.fitting.lm import LMOptions
    return LMOptions(max_iters=15)


class TestFusedStages:
    def test_fused_matches_unrolled(self, assets, vposer_w, rng):
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        base = FitConfig(lm=cfg_lm_fast())
        fused = base.replace(fused=True)
        r1 = fit_frame(base, assets, cam, obs, guess.params, guess.z,
                       vposer_w=vposer_w, img_height=1080.0)
        r2 = fit_frame(fused, assets, cam, obs, guess.params, guess.z,
                       vposer_w=vposer_w, img_height=1080.0)
        # Same annealing math; trajectories may differ slightly.
        np.testing.assert_allclose(float(r2.loss), float(r1.loss),
                                   rtol=0.1)


class TestUse3D:
    def test_3d_term_in_energy_and_residuals(self, assets, vposer_w, rng):
        """use_3d adds the robustified 3D-joint term
        (`fitting.py:319-324`); residual form must still square to it."""
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        body_pose = vposer_lib.decode(vposer_w, z_true)
        _, joints = smpl_forward(assets, true, body_pose)
        gt3d = joints + jnp.asarray(
            0.02 * rng.standard_normal(joints.shape), jnp.float32)
        obs3 = obs.replace(gt3d=gt3d,
                           conf3d=jnp.full((joints.shape[0],), 0.8))
        spec = EnergySpec(use_3d=True)
        w = StageWeights.make(data=0.46, pose=57.4, shape=10.0)
        x = pack(spec, true, z_true) + 0.02
        r = residuals(spec, assets, cam, obs3, w, vposer_w, None, x)
        e = total_energy(spec, assets, cam, obs3, w, vposer_w, None, x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)
        # The 3D term contributes (energy grows vs the 2D-only spec).
        e2d = total_energy(EnergySpec(), assets, cam, obs, w, vposer_w,
                           None, x)
        assert float(e) > float(e2d)

    def test_fit_with_3d_supervision(self, assets, vposer_w, rng):
        """Two views + 3D joints converges (the reference's use_3d mode
        rescues under-constrained rigs)."""
        cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
        body_pose = vposer_lib.decode(vposer_w, z_true)
        _, joints = smpl_forward(assets, true, body_pose)
        two_view = obs.replace(
            view_mask=jnp.asarray([1, 1, 0, 0, 0, 0], jnp.float32),
            gt3d=joints, conf3d=jnp.ones((joints.shape[0],)))
        cfg = FitConfig(spec=EnergySpec(use_3d=True),
                        lm=cfg_lm_fast())
        guess = init_guess(assets, cam, two_view.gt2d, two_view.conf,
                           two_view.view_mask, gt3d=joints)
        result = fit_frame(cfg, assets, cam, two_view, guess.params,
                           guess.z, vposer_w=vposer_w,
                           img_height=1080.0)
        assert np.isfinite(float(result.loss))
        # 3D term pulls the fit to the right translation.
        np.testing.assert_allclose(np.asarray(result.params.transl),
                                   np.asarray(true.transl), atol=0.05)


class TestOutlierGates:
    def test_angle_gate_consistency(self, assets, rng):
        """When the angle prior trips the reference's 1e4 gate, both the
        scalar energy AND the residual form drop it (`fitting.py:349`)."""
        cam, obs, true, _ = make_problem(
            assets, vposer_lib.random_weights(), rng)
        spec = EnergySpec(use_vposer=False, prior_type="l2")
        w = StageWeights.make(data=0.46, pose=4.78, shape=5.0)
        # Extreme knee/elbow bends -> exp terms explode past the gate.
        pose = jnp.zeros(69).at[jnp.asarray([52, 9])].set(-8.0)
        params = true.replace(body_pose=pose)
        x = pack(spec, params)
        from mvsmplfitting_tpu.fitting.energy import energy_terms
        terms = energy_terms(spec, assets, cam, obs, w, None, None, x)
        assert float(terms["angle_prior"]) == 0.0       # gated off
        r = residuals(spec, assets, cam, obs, w, None, None, x)
        e = total_energy(spec, assets, cam, obs, w, None, None, x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)

    def test_gmm_gate_consistency(self, assets, rng):
        gmm = random_gmm()
        cam, obs, true, _ = make_problem(
            assets, vposer_lib.random_weights(), rng)
        spec = EnergySpec(use_vposer=False, prior_type="gmm")
        w = StageWeights.make(data=0.46, pose=404.0, shape=5.0)
        # A pose far from every mixture component trips the 5e4 gate.
        pose = jnp.full((69,), 3.0)
        params = true.replace(body_pose=pose)
        x = pack(spec, params)
        base = float(gmm.merged_nll(pose)) * 404.0 ** 2
        assert base > 5e4
        r = residuals(spec, assets, cam, obs, w, None, gmm, x)
        e = total_energy(spec, assets, cam, obs, w, None, gmm, x)
        # With the term gated in BOTH forms, the residual square equals
        # the scalar energy exactly (the -log w offset is also gated).
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(e),
                                   rtol=1e-5)


class TestSingleViewInit:
    def test_masked_first_view(self, assets, vposer_w, rng):
        """Single live view that is NOT view 0 must still produce a
        finite initial guess (the reference Python-filters dead views;
        we mask — regression for the hardcoded-view-0 heuristic)."""
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        only3 = obs.replace(
            view_mask=jnp.asarray([0, 0, 0, 1, 0, 0], jnp.float32),
            gt2d=obs.gt2d.at[jnp.asarray([0, 1, 2, 4, 5])].set(0.0))
        guess = init_guess(assets, cam, only3.gt2d, only3.conf,
                           only3.view_mask)
        assert np.isfinite(np.asarray(guess.params.transl)).all()
        assert np.isfinite(float(guess.params.scale))
        assert np.isfinite(np.asarray(guess.params.global_orient)).all()
