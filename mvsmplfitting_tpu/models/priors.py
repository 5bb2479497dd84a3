"""Pose/shape priors: L2, angle (bending), and GMM max-mixture.

Behavior mirrors `code/prior.py:36-231`; the implementations are
branch-free jnp so they sit inside the jitted energy.
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# Axis-angle components of the 69-D body pose penalized by the bending
# prior: left/right elbow and knee bend, after shifting the full-pose
# indices [55, 58, 12, 15] by the 3 global-orient dims (`prior.py:53-89`).
ANGLE_IDXS = (52, 55, 9, 12)
ANGLE_SIGNS = (1.0, -1.0, -1.0, -1.0)


def l2_prior(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares (`prior.py:92-97`)."""
    return jnp.sum(x * x)


def angle_prior_terms(body_pose: jnp.ndarray) -> jnp.ndarray:
    """Per-term bending penalties exp(2 * s * theta), shape (4,).

    The reference computes ``exp(pose * sign)**2`` (`prior.py:87-89`);
    the loss multiplies the *sum* by the bending weight (not squared).
    """
    theta = body_pose[..., jnp.asarray(ANGLE_IDXS)]
    return jnp.exp(theta * jnp.asarray(ANGLE_SIGNS)) ** 2


@struct.dataclass
class GMMPrior:
    """Max-mixture Gaussian pose prior over the 69-D body pose."""

    means: jnp.ndarray        # (M, 69)
    precisions: jnp.ndarray   # (M, 69, 69)
    prec_chol: jnp.ndarray    # (M, 69, 69) upper Cholesky factors U, P=U^T U
    nll_weights: jnp.ndarray  # (M,) mixture weights / (const * reldet)

    def merged_nll(self, pose: jnp.ndarray) -> jnp.ndarray:
        """Min-over-components NLL, matching `prior.py:181-196`."""
        diff = pose[None, :] - self.means                   # (M, 69)
        quad = jnp.einsum("mi,mij,mj->m", diff, self.precisions, diff)
        return jnp.min(0.5 * quad - jnp.log(self.nll_weights))

    def log_likelihood(self, pose: jnp.ndarray,
                       epsilon: float = 1e-16) -> jnp.ndarray:
        """The reference's non-merged NLL (`prior.py:201-226`,
        `use_merged=False`).

        Reference quirks preserved: the quadratic term is NOT halved
        (only the cov/pi constant is), and the selected component's
        -log(nll_weight) is added at the end.
        """
        diff = pose[None, :] - self.means                   # (M, 69)
        quad = jnp.einsum("mi,mij,mj->m", diff, self.precisions, diff)
        d = self.means.shape[1]
        cov_term = -2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.prec_chol, axis1=1, axis2=2))),
            axis=1)
        ll = quad + 0.5 * (cov_term + d * jnp.log(2 * jnp.pi))
        best = jnp.argmin(ll)
        return -jnp.log(self.nll_weights[best]) + ll[best]

    def residuals(self, pose: jnp.ndarray) -> jnp.ndarray:
        """Least-squares form for Gauss-Newton: rows r with sum(r^2) equal to
        the argmin component's quadratic term (the -log w offset is locally
        constant and dropped from the Jacobian by construction).
        """
        diff = pose[None, :] - self.means
        quad = jnp.einsum("mi,mij,mj->m", diff, self.precisions, diff)
        best = jnp.argmin(0.5 * quad - jnp.log(self.nll_weights))
        u = self.prec_chol[best]
        return jnp.sqrt(0.5) * (u @ diff[best])


def gmm_from_arrays(means: np.ndarray, covs: np.ndarray,
                    weights: np.ndarray, dtype=jnp.float32) -> GMMPrior:
    """Build the prior from raw mixture parameters (`prior.py:126-176`)."""
    means = np.asarray(means, np.float64)
    covs = np.asarray(covs, np.float64)
    weights = np.asarray(weights, np.float64)
    precisions = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (means.shape[1] / 2.0)
    nll_weights = weights / (const * (sqrdets / sqrdets.min()))
    chol = np.stack([np.linalg.cholesky(p).T for p in precisions])
    return GMMPrior(
        means=jnp.asarray(means, dtype),
        precisions=jnp.asarray(precisions, dtype),
        prec_chol=jnp.asarray(chol, dtype),
        nll_weights=jnp.asarray(nll_weights, dtype),
    )


def load_gmm(path: str, dtype=jnp.float32) -> GMMPrior:
    """Load a smplify GMM pickle (dict with means/covars/weights)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        return gmm_from_arrays(gmm["means"], gmm["covars"], gmm["weights"],
                               dtype)
    # sklearn GMM object
    return gmm_from_arrays(gmm.means_, gmm.covars_, gmm.weights_, dtype)


def random_gmm(num_components: int = 8, dim: int = 69,
               seed: int = 0) -> GMMPrior:
    """Deterministic synthetic GMM for tests (the real pkl is external)."""
    rng = np.random.default_rng(seed)
    means = 0.3 * rng.standard_normal((num_components, dim))
    covs = []
    for _ in range(num_components):
        a = rng.standard_normal((dim, dim)) * 0.05
        covs.append(a @ a.T + 0.5 * np.eye(dim))
    weights = rng.dirichlet(np.ones(num_components))
    return gmm_from_arrays(means, np.stack(covs), weights)
