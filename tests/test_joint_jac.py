"""Analytic Jacobian exactness: closed-form chain/decoder Jacobians
must equal forward-mode AD of the same functions (pure algebra, no
approximation), and the LM solver must land at the same optimum with
either Jacobian.  See `models/joint_jac.py` / `energy.residual_jacobian`
and the chip motivation in docs/BENCH_NOTES.md (round 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import (
    EnergySpec, FitConfig, Observations, StageWeights, fit_frame,
    free_mask, pack, residuals,
)
from mvsmplfitting_tpu.fitting import energy as E
from mvsmplfitting_tpu.fitting.lm import LMOptions
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.joint_jac import joint_jacobian
from mvsmplfitting_tpu.models.joint_model import (
    build_joint_model, joint_forward, with_joint_model,
)
from mvsmplfitting_tpu.models.priors import random_gmm
from mvsmplfitting_tpu.models.smpl import SMPLParams

from test_fitting import make_problem, vposer_w  # noqa: F401  (fixture)
from test_triangulate import make_cameras  # noqa: F401


def _params(rng):
    return SMPLParams(
        betas=jnp.asarray(rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray(0.5 * rng.standard_normal(3),
                                  jnp.float32),
        body_pose=jnp.asarray(0.4 * rng.standard_normal(69), jnp.float32),
        transl=jnp.asarray(rng.standard_normal(3), jnp.float32),
        scale=jnp.asarray(1.0 + 0.4 * rng.random(), jnp.float32),
    )


def _tol(want, got, rtol=2e-4):
    scale = np.maximum(np.abs(np.asarray(want)).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=rtol * scale, rtol=rtol)


@pytest.mark.parametrize("model_type", ["smpl", "smpllsp"])
def test_joint_jacobian_matches_ad(model_type, rng):
    assets = synthetic_smpl(model_type)
    jm = build_joint_model(assets)
    for _ in range(2):
        params = _params(rng)
        joints, blk = joint_jacobian(jm, params, params.body_pose)

        _tol(joint_forward(jm, params), joints, rtol=1e-5)

        def fwd(bp, orient, betas, transl, scale):
            p = params.replace(global_orient=orient, betas=betas,
                               transl=transl, scale=scale)
            return joint_forward(jm, p, bp)

        J = jax.jacfwd(fwd, argnums=(0, 1, 2, 3, 4))(
            params.body_pose, params.global_orient, params.betas,
            params.transl, params.scale)
        # jacfwd returns (K, 3, n_group); blocks are (n_group, K, 3).
        _tol(jnp.moveaxis(J[0], -1, 0), blk["pose"])
        _tol(jnp.moveaxis(J[1], -1, 0), blk["orient"])
        _tol(jnp.moveaxis(J[2], -1, 0), blk["betas"])
        _tol(jnp.moveaxis(J[3], -1, 0), blk["transl"])
        _tol(J[4][None], blk["scale"])


def test_decode_jac_matches_ad(vposer_w, rng):  # noqa: F811
    for _ in range(2):
        z = jnp.asarray(0.6 * rng.standard_normal(32), jnp.float32)
        bp, D = vposer_lib.decode_jac(vposer_w, z)
        _tol(vposer_lib.decode(vposer_w, z), bp, rtol=1e-5)
        _tol(jax.jacfwd(lambda v: vposer_lib.decode(vposer_w, v))(z), D)


@pytest.mark.parametrize("mode", ["vposer", "l2", "gmm", "3d"])
def test_residual_jacobian_matches_linearize(mode, vposer_w, rng):  # noqa: F811
    assets = with_joint_model(synthetic_smpl())
    cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
    gmm = None
    if mode == "vposer":
        spec = EnergySpec(use_vposer=True)
    elif mode == "gmm":
        spec = EnergySpec(use_vposer=False, prior_type="gmm")
        gmm = random_gmm()
    elif mode == "3d":
        spec = EnergySpec(use_vposer=True, use_3d=True)
        obs = obs.replace(
            gt3d=jnp.asarray(rng.standard_normal((obs.gt2d.shape[1], 3)),
                             jnp.float32),
            conf3d=jnp.ones((obs.gt2d.shape[1],)))
    else:
        spec = EnergySpec(use_vposer=False, prior_type="l2")
    assert E.analytic_jac_ok(spec, assets)

    w = StageWeights.make(data=500.0 / 1080, pose=57.4, shape=10.0)
    vw = vposer_w if spec.use_vposer else None
    x = pack(spec, true,
             jnp.asarray(0.3 * rng.standard_normal(32), jnp.float32)
             if spec.use_vposer else None)

    r_want, lin = jax.linearize(
        lambda v: residuals(spec, assets, cam, obs, w, vw, gmm, v), x)
    J_want = jax.vmap(lin)(jnp.eye(x.shape[0])).T

    r_got, J_got = E.residual_jacobian(spec, assets, cam, obs, w, vw,
                                       gmm, x)
    _tol(r_want, r_got, rtol=1e-5)
    _tol(J_want, J_got)


@pytest.mark.parametrize("fused", [False, True])
def test_lm_analytic_matches_ad_fit(fused, vposer_w, rng):  # noqa: F811
    """End-to-end: the staged fit with the analytic Jacobian reaches the
    same optimum as the AD-Jacobian fit (same energy, same stationary
    points; trajectories may differ in round-off)."""
    assets = with_joint_model(synthetic_smpl())
    cam, obs, true, z_true = make_problem(assets, vposer_w, rng)
    init = SMPLParams(
        betas=jnp.zeros(10), global_orient=true.global_orient,
        body_pose=jnp.zeros(69), transl=true.transl,
        scale=jnp.asarray(1.0, jnp.float32))
    z0 = jnp.zeros(32)

    def run(jac):
        cfg = FitConfig(spec=EnergySpec(use_vposer=True), fused=fused,
                        lm=LMOptions(max_iters=40, jac=jac))
        return jax.jit(lambda: fit_frame(
            cfg, assets, cam, obs, init, z0, vposer_w=vposer_w))()

    res_ad = run("ad")
    res_an = run("analytic")
    np.testing.assert_allclose(float(res_an.loss), float(res_ad.loss),
                               rtol=5e-2)
    assert float(res_an.loss) < 0.8 * float(
        jax.jit(lambda: fit_frame(
            FitConfig(spec=EnergySpec(use_vposer=True),
                      lm=LMOptions(max_iters=1)), assets, cam, obs,
            init, z0, vposer_w=vposer_w))().loss)
