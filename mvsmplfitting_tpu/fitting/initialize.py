"""Initial-guess construction for the fit (reference: `init_guess.py`).

Pipeline (matching `code/utils/init_guess.py:18-134`, jit/vmap-friendly):
rest-pose annotation joints -> triangulate the 2D detections (multi-view)
or torso-height depth heuristic (single view) -> Umeyama similarity on
the 4 torso joints (L/R shoulder, L/R hip — `use_torso=True` at
`main.py:77`) -> (global_orient, transl, scale); betas and the pose
latent start at zero.  Sequence warm-start (`load_init`) reuses the
previous frame's parameters unless its loss exceeded 5000.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.camera import Camera
from ..models.smpl import SMPLAssets, SMPLParams, rest_joints
from ..ops.alignment import umeyama
from ..ops.rotations import matrix_to_axis_angle
from ..ops.triangulate import triangulate
from .energy import LATENT_DIM

# numpy on purpose: module-level jnp constants initialize the XLA
# backend at import, which breaks `jax.distributed.initialize` (it must
# run first) and costs a tunnel round-trip on the pinned TPU platform.
TORSO = np.asarray([5, 6, 11, 12])  # LShoulder RShoulder LHip RHip


def torso_indices(model_type: str) -> np.ndarray:
    """Shoulder+hip rows in the model's annotation order.

    coco17 and lsp14 both carry shoulders at 5/6 and hips at 11/12
    (the reference hardcodes [5, 6, 11, 12], `init_guess.py:89-92`);
    the smplx path maps to OpenPose BODY_25 order where shoulders are
    2/5 and hips 9/12 (the reference never exercises that path — its
    smplx branch shape-errors before reaching the init)."""
    if model_type == "smplx":
        return np.asarray([2, 5, 9, 12])
    return TORSO


@struct.dataclass
class InitGuess:
    params: SMPLParams
    z: jnp.ndarray           # (32,) vposer latent (zeros)
    joints3d: jnp.ndarray    # (K, 3) triangulated target joints


def _single_view_depth(cam: Camera, rest: jnp.ndarray,
                       pixels: jnp.ndarray,
                       view_mask: jnp.ndarray,
                       torso: jnp.ndarray = TORSO) -> jnp.ndarray:
    """Torso-height depth heuristic for one view (`init_guess.py:54-79`).

    Places the rest joints at depth f * (3D torso height / 2D torso
    height) along the live camera's optical axis.  The reference
    Python-filters dead views so its index 0 is always the live one
    (`main.py:49-57`); with padded static views the live view is
    selected by the mask.
    """
    v = jnp.argmax(view_mask)                                # first live
    R = cam.rotation[v]
    t = cam.translation[v]
    torso3d_w = rest[torso]                                  # (4, 3)
    torso3d_c = torso3d_w @ R.T + t
    d3 = jnp.stack([torso3d_c[0] - torso3d_c[2],
                    torso3d_c[1] - torso3d_c[3]])
    h3 = jnp.mean(jnp.linalg.norm(d3, axis=-1))

    torso2d = pixels[v][torso]
    # sic: the reference uses (t0 - t2) twice (`init_guess.py:66`).
    d2 = jnp.stack([torso2d[0] - torso2d[2], torso2d[0] - torso2d[2]])
    h2 = jnp.mean(jnp.linalg.norm(d2, axis=-1))

    est_d = cam.focal[v, 0] * (h3 / jnp.maximum(h2, 1e-6))
    cam_joints = rest @ R.T + t
    cam_joints = cam_joints.at[:, 2].add(est_d)
    return (cam_joints - t) @ R


def init_guess(assets: SMPLAssets, cam: Camera, pixels: jnp.ndarray,
               conf: jnp.ndarray, view_mask: jnp.ndarray,
               est_scale: bool = True, fixed_scale: float = 1.0,
               gt3d: Optional[jnp.ndarray] = None,
               use_torso: bool = True) -> InitGuess:
    """Build the initial parameter guess for one frame.

    Args:
      pixels: (V, K, 2) 2D keypoints; conf: (V, K); view_mask: (V,).
      gt3d: optional (K, 3) annotated 3D joints (used instead of
        triangulation when provided — `init_guess.py:85-86`).
    """
    rest = rest_joints(assets)                               # (K, 3)
    torso = torso_indices(assets.model_type)

    n_views = jnp.sum(view_mask)
    tri = triangulate(cam, pixels, conf, view_mask)
    single = _single_view_depth(cam, rest, pixels, view_mask, torso)
    joints3d = jnp.where(n_views > 1, tri, single)
    if gt3d is not None:
        joints3d = gt3d

    if use_torso:
        src, dst = rest[torso], joints3d[torso]
    else:
        src, dst = rest, joints3d
    rot, trans, scale = umeyama(src, dst, est_scale)
    orient = matrix_to_axis_angle(rot)
    scale = jnp.where(jnp.asarray(est_scale), scale,
                      jnp.asarray(fixed_scale, scale.dtype))

    params = SMPLParams(
        betas=jnp.zeros((assets.num_betas,)),
        global_orient=orient,
        body_pose=jnp.zeros((69,)),
        transl=trans,
        scale=scale,
    )
    return InitGuess(params=params, z=jnp.zeros((LATENT_DIM,)),
                     joints3d=joints3d)


def warm_start(prev_params: SMPLParams, prev_z: jnp.ndarray,
               prev_loss: jnp.ndarray, fresh: InitGuess,
               loss_threshold: float = 5000.0) -> InitGuess:
    """Sequence warm-start (`load_init`, `init_guess.py:137-166`).

    Reuses the previous frame's solution unless its final loss exceeded
    the threshold, in which case the fresh guess wins.  Branch-free, so
    a batched sequence fit can mix both per frame.
    """
    use_prev = prev_loss <= loss_threshold

    def pick(a, b):
        return jnp.where(use_prev, a, b)

    # Align optional SMPL-H/X blocks: a fitted previous frame carries
    # them while a fresh guess does not — fill missing sides with zeros
    # so the pytrees match.
    fresh_params = fresh.params
    for name in ("left_hand_pose", "right_hand_pose", "expression",
                 "jaw_pose", "leye_pose", "reye_pose"):
        pv = getattr(prev_params, name)
        fv = getattr(fresh_params, name)
        if pv is not None and fv is None:
            fresh_params = fresh_params.replace(**{name: jnp.zeros_like(pv)})
        elif pv is None and fv is not None:
            prev_params = prev_params.replace(**{name: jnp.zeros_like(fv)})

    params = jax.tree.map(pick, prev_params, fresh_params)
    z = pick(prev_z, fresh.z)
    return InitGuess(params=params, z=z, joints3d=fresh.joints3d)
