"""Priors: L2, angle, GMM max-mixture and its least-squares form."""

import jax.numpy as jnp
import numpy as np

from mvsmplfitting_tpu.models import priors
from mvsmplfitting_tpu.ops.robust import gmof, gmof_residual


def test_l2():
    x = jnp.asarray([1.0, -2.0, 3.0])
    assert float(priors.l2_prior(x)) == 14.0


def test_angle_prior_indices():
    pose = jnp.zeros(69)
    terms = np.asarray(priors.angle_prior_terms(pose))
    np.testing.assert_allclose(terms, np.ones(4), atol=1e-6)
    # Bending the left knee the natural way (positive, sign -1) decreases
    # the penalty; hyperextension increases it.
    bend = jnp.zeros(69).at[9].set(1.0)
    terms = np.asarray(priors.angle_prior_terms(bend))
    assert terms[2] < 1.0
    hyper = jnp.zeros(69).at[9].set(-1.0)
    terms = np.asarray(priors.angle_prior_terms(hyper))
    assert terms[2] > 1.0


def test_gmof():
    r = jnp.asarray([0.0, 1.0, 100.0, 1e6])
    out = np.asarray(gmof(r, 100.0))
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1], 1e4 * 1.0 / (1 + 1e4), rtol=1e-5)
    np.testing.assert_allclose(out[2], 1e4 / 2, rtol=1e-5)
    assert out[3] <= 1e4  # saturates at rho^2 (fp32 rounds to the limit)


def test_gmof_residual_squares_to_gmof(rng):
    r = jnp.asarray(rng.standard_normal(100).astype(np.float32) * 200)
    e = gmof_residual(r, 100.0)
    np.testing.assert_allclose(
        np.asarray(e) ** 2, np.asarray(gmof(r, 100.0)), rtol=1e-4, atol=1e-3)


def test_gmm_merged_nll_matches_numpy(rng):
    g = priors.random_gmm(num_components=4)
    pose = jnp.asarray(rng.standard_normal(69).astype(np.float32) * 0.5)
    ours = float(g.merged_nll(pose))

    means = np.asarray(g.means)
    precs = np.asarray(g.precisions)
    nw = np.asarray(g.nll_weights)
    diff = np.asarray(pose)[None] - means
    quad = np.einsum("mi,mij,mj->m", diff, precs, diff)
    expect = np.min(0.5 * quad - np.log(nw))
    np.testing.assert_allclose(ours, expect, rtol=1e-4)


def test_gmm_residuals_square_to_quadratic(rng):
    g = priors.random_gmm(num_components=4)
    pose = jnp.asarray(rng.standard_normal(69).astype(np.float32) * 0.5)
    r = np.asarray(g.residuals(pose))
    means = np.asarray(g.means)
    precs = np.asarray(g.precisions)
    nw = np.asarray(g.nll_weights)
    diff = np.asarray(pose)[None] - means
    quad = np.einsum("mi,mij,mj->m", diff, precs, diff)
    best = np.argmin(0.5 * quad - np.log(nw))
    np.testing.assert_allclose(np.sum(r ** 2), 0.5 * quad[best], rtol=1e-4)
