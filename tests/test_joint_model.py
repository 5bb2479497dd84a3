"""Reduced joint model must match the full vertex pipeline exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.models.joint_model import (
    build_joint_model, joint_forward,
)
from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward


@pytest.mark.parametrize("model_type", ["smpl", "smpllsp"])
def test_matches_full_forward(model_type, rng):
    assets = synthetic_smpl(model_type)
    jm = build_joint_model(assets)
    for trial in range(3):
        params = SMPLParams(
            betas=jnp.asarray(rng.standard_normal(10), jnp.float32),
            global_orient=jnp.asarray(0.5 * rng.standard_normal(3),
                                      jnp.float32),
            body_pose=jnp.asarray(0.4 * rng.standard_normal(69),
                                  jnp.float32),
            transl=jnp.asarray(rng.standard_normal(3), jnp.float32),
            scale=jnp.asarray(1.0 + 0.3 * rng.random(), jnp.float32),
        )
        _, want = smpl_forward(assets, params)
        got = joint_forward(jm, params)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)


def test_jacobian_matches(rng):
    """Gauss-Newton consumes d joints / d params — must agree too."""
    import jax

    assets = synthetic_smpl("smpllsp")
    jm = build_joint_model(assets)
    base = SMPLParams(
        betas=jnp.asarray(rng.standard_normal(10), jnp.float32),
        global_orient=jnp.asarray([0.2, -0.1, 0.4]),
        body_pose=jnp.asarray(0.3 * rng.standard_normal(69), jnp.float32),
        transl=jnp.asarray([0.1, 0.2, 0.3]),
        scale=jnp.asarray(1.1))

    def full_j(bp):
        _, j = smpl_forward(assets, base, body_pose=bp)
        return j

    def red_j(bp):
        return joint_forward(jm, base, body_pose=bp)

    Jf = jax.jacfwd(full_j)(base.body_pose)
    Jr = jax.jacfwd(red_j)(base.body_pose)
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(Jf), atol=5e-4)


def test_fit_with_reduced_model_matches_full(rng):
    """End-to-end: staged fit with the reduced model lands at the same
    optimum as the full vertex pipeline."""
    import os

    import jax

    from mvsmplfitting_tpu.fitting import FitConfig, fit_frame, init_guess
    from mvsmplfitting_tpu.fitting.lm import LMOptions
    from mvsmplfitting_tpu.models import vposer as vposer_lib
    from mvsmplfitting_tpu.models.joint_model import with_joint_model
    from test_fitting import make_problem

    assets = synthetic_smpl()
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    vw = (vposer_lib.load_npz(path) if os.path.exists(path)
          else vposer_lib.random_weights())
    cam, obs, true, _ = make_problem(assets, vw, rng)
    cfg = FitConfig(lm=LMOptions(max_iters=25))
    guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)

    full = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                     vposer_w=vw, img_height=1080.0)
    reduced = fit_frame(cfg, with_joint_model(assets), cam, obs,
                        guess.params, guess.z, vposer_w=vw,
                        img_height=1080.0)
    np.testing.assert_allclose(float(reduced.loss), float(full.loss),
                               rtol=0.05)
    np.testing.assert_allclose(np.asarray(reduced.params.transl),
                               np.asarray(full.params.transl), atol=0.02)
