"""Robustifiers for the fitting energy."""

from __future__ import annotations

import jax.numpy as jnp


def gmof(residual: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Geman-McClure robustifier, applied elementwise.

    ``rho^2 * r^2 / (r^2 + rho^2)`` — matches the reference
    (`code/utils/utils.py:427-438`, rho=100 in the demo config).
    """
    sq = residual * residual
    return rho * rho * sq / (sq + rho * rho)


def gmof_residual(residual: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Smooth residual ``e`` with ``e^2 == gmof(r, rho)`` exactly.

    ``e = rho * r / sqrt(r^2 + rho^2)``.  Lets a Gauss-Newton /
    Levenberg-Marquardt solver minimize the *identical* robustified
    objective the reference minimizes with L-BFGS, while keeping the
    least-squares structure the MXU-friendly normal equations need.
    """
    return rho * residual * (residual * residual + rho * rho) ** -0.5
