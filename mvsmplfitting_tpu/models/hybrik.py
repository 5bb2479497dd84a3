"""HybrIK twist-and-swing inverse kinematics over the SMPL skeleton.

Rebuild target: the reference's 3D regressor
(`alphapose_core/alphapose/models/simple3dposeSMPLWithCam.py:329-335`)
feeds its integral-regressed joint skeleton + 23 twist angles into
`self.smpl.hybrik(pose_skeleton, betas, phis, ...)`.  The reference
cannot actually run that call as shipped — the `SMPL_layer` import is
commented out (`simple3dposeSMPLWithCam.py:9`) and
`models/layers/smpl/` does not exist in the tree — so this module is a
working implementation of the published HybrIK analytical IK
(twist-and-swing decomposition) against OUR SMPL assets:

* the rest skeleton comes from the shape blend (betas);
* the root rotation solves a 3-bone orthogonal-Procrustes alignment of
  the root's children (pelvis -> hips + spine);
* every other joint's local rotation is swing (minimal rotation taking
  the template bone to the target bone, both expressed in the parent's
  frame) composed with twist (rotation about the template bone axis by
  the regressed angle phi, given as (cos, sin));
* leaves (feet tips / head / hands in the 24-joint skeleton) have no
  child bone, so their swing is undefined and their local rotation is
  the identity (the network's 29-joint skeleton adds leaf targets for
  exactly this reason; we accept-but-ignore the 5 leaf rows).

Everything is branch-free jnp over static topology: the 24-step chain
unrolls exactly like `smpl.py:_rigid_chain`, so the whole IK+FK jits
into the same program as the rest of the pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .smpl import SMPLAssets, _rigid_chain

# Primary child of each SMPL joint (first child in index order; -1 for
# leaves).  Used for the bone direction of the swing solve.
_SMPL_CHILD = (1, 4, 5, 6, 7, 8, 9, 10, 11, 12, -1, -1, 15, 16, 17,
               -1, 18, 19, 20, 21, 22, 23, -1, -1)


def _quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _swing_between(b: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation taking direction b to direction v (3,3).

    Rodrigues from axis = b x v; safe at parallel/antiparallel via the
    half-angle quaternion construction with an epsilon floor.
    """
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-8)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-8)
    axis = jnp.cross(b, v)
    c = jnp.dot(b, v)
    # Quaternion (w, xyz) = (1 + c, axis), normalized — half-angle form.
    q = jnp.concatenate([jnp.asarray([1.0 + c]), axis])
    n = jnp.linalg.norm(q)
    # Antiparallel (c = -1): fall back to any axis orthogonal to b.
    ortho = jnp.cross(b, jnp.asarray([1.0, 0.0, 0.0]))
    ortho = jnp.where(jnp.linalg.norm(ortho) < 1e-6,
                      jnp.cross(b, jnp.asarray([0.0, 1.0, 0.0])), ortho)
    ortho = ortho / jnp.maximum(jnp.linalg.norm(ortho), 1e-8)
    q_flip = jnp.concatenate([jnp.zeros(1), ortho])
    q = jnp.where(n < 1e-6, q_flip, q / jnp.maximum(n, 1e-8))
    return _quat_to_mat(q)


def _twist_about(b: jnp.ndarray, cos_sin: jnp.ndarray) -> jnp.ndarray:
    """Rotation about axis b by the angle whose (cos, sin) is given."""
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-8)
    cs = cos_sin / jnp.maximum(jnp.linalg.norm(cos_sin), 1e-8)
    c, s = cs[0], cs[1]
    K = jnp.asarray([[0.0, -b[2], b[1]],
                     [b[2], 0.0, -b[0]],
                     [-b[1], b[0], 0.0]])
    return jnp.eye(3) + s * K + (1 - c) * (K @ K)


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """R minimizing ||R src - dst||_F over rotations; src/dst (K, 3)."""
    M = dst.T @ src
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) .at[2].set(d))
    return U @ D @ Vt


def hybrik_ik(assets: SMPLAssets, skeleton: jnp.ndarray,
              betas: jnp.ndarray, phis: jnp.ndarray) -> jnp.ndarray:
    """Analytical IK: joint positions + twists -> SMPL rotations.

    Args:
      skeleton: (24, 3) or (29, 3) root-relative joint targets in the
        template's metric frame (rows beyond 24 — the network's leaf
        joints — are ignored; see module docstring).
      betas: (NB,) shape coefficients (the rest skeleton to bend).
      phis: (23, 2) per-joint twist (cos, sin) for joints 1..23.

    Returns:
      rot_mats (24, 3, 3) — local rotations, root first.
    """
    skel = skeleton[:24]
    skel = skel - skel[0]
    dtype = assets.v_template.dtype
    v_shaped = assets.v_template + jnp.einsum(
        "vct,t->vc", assets.shapedirs, betas.astype(dtype))
    j_rest = (assets.j_regressor @ v_shaped)[:24]
    j_rest = j_rest - j_rest[0]
    parents = assets.parents[:24]

    # Root: Procrustes over the root's child bones (hips + lower spine).
    root_children = [i for i in range(1, 24) if parents[i] == 0]
    rest_dirs = jnp.stack([j_rest[c] for c in root_children])
    targ_dirs = jnp.stack([skel[c] for c in root_children])
    R_root = _kabsch(rest_dirs, targ_dirs)

    glob = [R_root]          # accumulated global rotations
    local = [R_root]
    for i in range(1, 24):
        p = parents[i]
        child = _SMPL_CHILD[i]
        if child < 0:
            R_local = jnp.eye(3, dtype=dtype)
        else:
            b = j_rest[child] - j_rest[i]           # template bone
            d_t = skel[child] - skel[i]             # target bone (global)
            v = glob[p].T @ d_t                     # in parent frame
            swing = _swing_between(b, v)
            twist = _twist_about(b, phis[i - 1])
            R_local = swing @ twist
        local.append(R_local)
        glob.append(glob[p] @ R_local)
    return jnp.stack(local)


def twist_angles(assets: SMPLAssets, betas: jnp.ndarray,
                 rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Extract (cos, sin) twists of local rotations about their bones.

    The inverse of the twist half of the decomposition — used to build
    self-consistency tests (IK(FK(pose), twists(pose)) == pose) and to
    convert full poses into the network's phi parameterization.
    """
    dtype = assets.v_template.dtype
    v_shaped = assets.v_template + jnp.einsum(
        "vct,t->vc", assets.shapedirs, betas.astype(dtype))
    j_rest = (assets.j_regressor @ v_shaped)[:24]
    out = []
    for i in range(1, 24):
        child = _SMPL_CHILD[i]
        if child < 0:
            out.append(jnp.asarray([1.0, 0.0], dtype))
            continue
        b = j_rest[child] - j_rest[i]
        b = b / jnp.maximum(jnp.linalg.norm(b), 1e-8)
        # Swing-twist decomposition via quaternion projection onto b.
        R = rot_mats[i]
        # quaternion from matrix (w component via trace; robust enough
        # for |angle| < pi which covers articulated joints)
        w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + jnp.trace(R), 1e-12))
        xyz = jnp.asarray([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                           R[1, 0] - R[0, 1]]) / jnp.maximum(4 * w, 1e-8)
        proj = jnp.dot(xyz, b)
        tq = jnp.asarray([w, proj])
        tq = tq / jnp.maximum(jnp.linalg.norm(tq), 1e-8)
        # twist angle t: quaternion (cos t/2, sin t/2 * b)
        cos_half, sin_half = tq[0], tq[1]
        out.append(jnp.asarray([cos_half ** 2 - sin_half ** 2,
                                2 * cos_half * sin_half]))
    return jnp.stack(out)


def forward_rotmats(assets: SMPLAssets, betas: jnp.ndarray,
                    rot_mats: jnp.ndarray,
                    scale: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LBS forward from explicit per-joint rotation matrices.

    Same math as `smpl.lbs` (`lbs.py:135-222` in the reference) but
    skipping the axis-angle -> matrix step: used to pose the body with
    IK output.  Returns (verts (V, 3), joints (J, 3)).
    """
    dtype = assets.v_template.dtype
    J = rot_mats.shape[0]
    v_shaped = assets.v_template + jnp.einsum(
        "vct,t->vc", assets.shapedirs, betas.astype(dtype))
    j_rest = (assets.j_regressor @ v_shaped)[:J]

    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[1:] - ident).reshape(-1)
    pose_offsets = (pose_feature @ assets.posedirs).reshape(-1, 3)
    v_posed = v_shaped + pose_offsets

    s = jnp.asarray(1.0, dtype) if scale is None else scale
    posed_joints, A = _rigid_chain(rot_mats, j_rest,
                                   tuple(assets.parents[:J]), s)
    T = (assets.lbs_weights @ A.reshape(J, 16)).reshape(-1, 4, 4)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    return verts, posed_joints
