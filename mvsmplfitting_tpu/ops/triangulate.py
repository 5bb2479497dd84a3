"""Confidence-weighted linear triangulation (DLT, ray-nullspace form).

Reproduces the semantics of the reference's `recompute3D`
(`code/utils/recompute3D.py:22-62`): for each joint, accumulate per-view
normal equations of the point-to-ray distance

    AtA_i = sum_v (conf_vi + 1e-6) * R_v^T (I - n n^T) R_v
    Atb_i = sum_v (conf_vi + 1e-6) * (-R_v^T (I - n n^T) t_v)

with n the unit back-projected pixel ray K^-1 [u, v, 1], then solve the
3x3 system.  The reference runs a per-view, per-joint Python loop on the
host; here the whole thing is three einsums and one batched 3x3 solve, so
it jits, vmaps over frames/people, and shards over the cameras axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.camera import Camera


def backproject_rays(cam: Camera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Unit camera-space rays for pixels (V, K, 2) -> (V, K, 3)."""
    xy = (pixels - cam.center[:, None, :]) / cam.focal[:, None, :]
    ones = jnp.ones(xy.shape[:-1] + (1,), xy.dtype)
    rays = jnp.concatenate([xy, ones], axis=-1)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def triangulate(cam: Camera, pixels: jnp.ndarray, conf: jnp.ndarray,
                view_mask: jnp.ndarray | None = None,
                conf_eps: float = 1e-6) -> jnp.ndarray:
    """Triangulate K joints observed in V views.

    Args:
      pixels: (V, K, 2) 2D detections per view.
      conf: (V, K) per-joint confidences (used as ray weights).
      view_mask: optional (V,) 0/1 mask for padded / dropped views
        (the reference instead drops views in Python — `main.py:49-57`).

    Returns:
      (K, 3) world-space points.
    """
    n = backproject_rays(cam, pixels)                       # (V, K, 3)
    # I - n n^T per observation.
    nmat = jnp.eye(3, dtype=n.dtype) - jnp.einsum("vka,vkb->vkab", n, n)
    # Rotate into world: R^T (I - nn^T) R  and  -R^T (I - nn^T) t.
    rn = jnp.einsum("vba,vkbc->vkac", cam.rotation, nmat)   # R^T @ nmat
    w = conf + conf_eps
    if view_mask is not None:
        w = w * view_mask[:, None]
    AtA = jnp.einsum("vk,vkab,vbc->kac", w, rn, cam.rotation)
    Atb = jnp.einsum("vk,vkab,vb->ka", -w, rn, cam.translation)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
