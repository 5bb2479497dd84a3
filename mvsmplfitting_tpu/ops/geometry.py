"""Misc geometry utilities (reference: `code/utils/utils.py`,
`code/utils/module_utils.py`), batched jnp.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rel_change(prev_val, curr_val):
    """Relative objective change (`utils.py:348`)."""
    return (prev_val - curr_val) / jnp.maximum(
        jnp.maximum(jnp.abs(prev_val), jnp.abs(curr_val)), 1.0)


def estimate_translation_weak(S: jnp.ndarray, joints_2d: jnp.ndarray,
                              conf: jnp.ndarray, fx: float, fy: float,
                              cx: float, cy: float) -> jnp.ndarray:
    """Weighted LSQ camera-frame translation from 2D/3D correspondences.

    Solves for t such that perspective projection of (S + t) best
    matches joints_2d under confidence weights — the reference's
    `estimate_translation_from_intri` (`utils.py:222-255`) normal
    equations, assembled as one small dense solve.
    """
    K = S.shape[0]
    f = jnp.asarray([fx, fy])
    center = jnp.asarray([cx, cy])

    Z = jnp.repeat(S[:, 2], 2)                       # (2K,)
    XY = S[:, :2].reshape(-1)
    O = jnp.tile(center, (K,))
    F = jnp.tile(f, (K,))
    w = jnp.repeat(jnp.sqrt(conf), 2)

    ex = jnp.tile(jnp.asarray([1.0, 0.0]), (K,))
    ey = jnp.tile(jnp.asarray([0.0, 1.0]), (K,))
    obs = joints_2d.reshape(-1)
    Q = jnp.stack([F * ex, F * ey, O - obs], axis=1)  # (2K, 3)
    c = (obs - O) * Z - F * XY

    Qw = Q * w[:, None]
    cw = c * w
    A = Qw.T @ Qw + 1e-6 * jnp.eye(3)
    return jnp.linalg.solve(A, Qw.T @ cw)


def surface_project(vertices: jnp.ndarray, exter: jnp.ndarray,
                    intri: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project mesh vertices into one camera
    (`module_utils.py:533-541` ``surface_project``).

    Returns (camera-space points (N, 3), integer pixel coordinates
    (N, 2) — truncated to int32 exactly like the reference's
    ``astype(np.int32)``).
    """
    vh = jnp.concatenate([vertices,
                          jnp.ones_like(vertices[:, :1])], axis=1)
    cam_pts = (exter @ vh.T)                       # (4, N)
    mesh_3d = cam_pts.T[:, :3]
    intri_ = jnp.concatenate([intri, jnp.zeros((3, 1))], axis=1)
    proj = (intri_ @ cam_pts) / cam_pts[2]
    mesh_2d = proj[:2].astype(jnp.int32).T
    return mesh_3d, mesh_2d


def convert_world_coord(pose: jnp.ndarray, transl: jnp.ndarray,
                        extri: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame SMPL params -> world frame
    (`module_utils.py:289-325` ``convert_world_coord``).

    Rotates the global orientation and translation by the inverse
    extrinsic.  (The reference's in-function SMPL forward computes a
    root joint it never uses — its root-pivot correction is commented
    out — so the active math is exactly this rotation.)

    Args: pose (F, 72) axis-angle, transl (F, 3), extri (4, 4).
    Returns (pose', transl') in the world frame.
    """
    from .rotations import matrix_to_axis_angle, rodrigues

    inv = jnp.linalg.inv(extri)
    R = rodrigues(pose[:, :3])                         # (F, 3, 3)
    new_orient = matrix_to_axis_angle(
        jnp.einsum("ij,fjk->fik", inv[:3, :3], R))
    new_pose = pose.at[:, :3].set(new_orient)
    new_trans = jnp.einsum("ij,fj->fi", inv[:3, :3], transl) + inv[:3, 3]
    return new_pose, new_trans


def rigid_transform_3d(A: jnp.ndarray, B: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kabsch rigid alignment A -> B (`module_utils.py:506-531`).

    Returns (R (3,3), t (3,)) with ``B ~= A @ R.T + t``; reflections
    corrected by flipping the last right-singular vector.
    """
    ca = A.mean(axis=0)
    cb = B.mean(axis=0)
    H = (A - ca).T @ (B - cb)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(
        jnp.sign(det))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t
