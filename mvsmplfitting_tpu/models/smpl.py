"""Scaled SMPL body model as pure JAX functions.

Re-implements the *behavior* of the reference's scaled SMPL
(`code/smplx/body_models_scale.py`, `code/smplx/lbs.py`) TPU-first:

* the model is an immutable pytree of arrays (`SMPLAssets`), not a module;
* the forward pass is a pure function of (assets, params) that vmaps and
  differentiates cleanly (used under `jacfwd` in the Gauss-Newton solver);
* the 24-step kinematic chain is unrolled at trace time (static topology),
  so XLA sees a fixed DAG of small matmuls it can fuse;
* the learnable per-body `scale` multiplies the root transform's rotation
  block, exactly like the reference (`lbs.py:348`), so recovered
  (beta, theta, s) parameters are directly comparable.

Everything is float32: the whole fit is ~50 unknowns and accuracy-bound,
so the MXU's bf16 path buys nothing here; batching across frames is where
the TPU throughput comes from (see `parallel/`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.rotations import rodrigues, transform_mat
from . import joints as J


@struct.dataclass
class SMPLAssets:
    """SMPL model data as a pytree; static metadata as aux fields."""

    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, NB)
    posedirs: jnp.ndarray        # (207, V*3)  (transposed for one matmul)
    j_regressor: jnp.ndarray     # (24, V)
    lbs_weights: jnp.ndarray     # (V, 24)
    faces: jnp.ndarray           # (F, 3) int32
    extra_joint_ids: jnp.ndarray  # (E,) int32  surface keypoints to append
    joint_map: jnp.ndarray       # (K,) int32  model joints -> annotation order
    lsp_regressor: Optional[jnp.ndarray] = None  # (14, V) for model_type smpllsp
    # Optional precomputed reduced joint model (see models/joint_model.py):
    # lets the energy skip all 6890-vertex work; built via
    # `joint_model.with_joint_model(assets)`.
    joint_model: Optional[object] = None

    parents: Tuple[int, ...] = struct.field(
        pytree_node=False, default=J.SMPL_PARENTS)
    model_type: str = struct.field(pytree_node=False, default="smpl")
    gender: str = struct.field(pytree_node=False, default="neutral")

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]


@struct.dataclass
class SMPLParams:
    """Per-body parameters (a single body; vmap for batches)."""

    betas: jnp.ndarray          # (10,)
    global_orient: jnp.ndarray  # (3,)
    body_pose: jnp.ndarray      # (69,)
    transl: jnp.ndarray         # (3,)
    scale: jnp.ndarray          # ()

    @classmethod
    def zeros(cls, num_betas: int = 10, dtype=jnp.float32) -> "SMPLParams":
        return cls(
            betas=jnp.zeros((num_betas,), dtype),
            global_orient=jnp.zeros((3,), dtype),
            body_pose=jnp.zeros((69,), dtype),
            transl=jnp.zeros((3,), dtype),
            scale=jnp.ones((), dtype),
        )


def _rigid_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                 parents: Tuple[int, ...], scale: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose the kinematic tree; returns posed joints and skinning A.

    rot_mats: (J, 3, 3); joints: (J, 3) rest joints; scale: scalar.
    Generic over the joint count J (24 SMPL, 52 SMPL-H, 55 SMPL-X).
    The root transform's rotation block is multiplied by `scale`
    (reference `lbs.py:348`), which scales the whole body about the root.
    """
    rel = joints.at[1:].add(-joints[np.asarray(parents[1:])])
    T = transform_mat(rot_mats, rel)  # (J, 4, 4)
    root = T[0].at[:3, :3].multiply(scale)

    # Static-topology unroll: J-1 (4x4)@(4x4) matmuls; XLA fuses these.
    chain = [root]
    for i in range(1, len(parents)):
        chain.append(chain[parents[i]] @ T[i])
    transforms = jnp.stack(chain, axis=0)  # (J, 4, 4)

    posed_joints = transforms[:, :3, 3]
    # Relative-to-rest transforms for skinning: subtract the transform of
    # the rest joint location (only affects the translation column).
    correction = jnp.einsum("jab,jb->ja", transforms[:, :3, :3], joints)
    A = transforms.at[:, :3, 3].add(-correction)
    return posed_joints, A


def lbs(assets: SMPLAssets, betas: jnp.ndarray, full_pose: jnp.ndarray,
        scale: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning for one body (generic joint count).

    Args:
      betas: (NB,) shape coefficients.
      full_pose: (J*3,) axis-angle (root + J-1 joints).
      scale: () root scale.

    Returns:
      verts (V, 3), posed joints (J, 3) — both *before* translation.
    """
    dtype = assets.v_template.dtype
    J = len(assets.parents)
    v_shaped = assets.v_template + jnp.einsum(
        "vct,t->vc", assets.shapedirs, betas.astype(dtype))
    j_rest = assets.j_regressor @ v_shaped  # (J, 3)

    rot_mats = rodrigues(full_pose.reshape(J, 3))  # (J, 3, 3)
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[1:] - ident).reshape(-1)  # ((J-1)*9,)
    pose_offsets = (pose_feature @ assets.posedirs).reshape(-1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = _rigid_chain(rot_mats, j_rest, assets.parents, scale)

    # Per-vertex transforms: (V, J) @ (J, 16) — one MXU matmul.
    T = (assets.lbs_weights @ A.reshape(J, 16)).reshape(-1, 4, 4)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    return verts, posed_joints


def smpl_forward(assets: SMPLAssets, params: SMPLParams,
                 body_pose: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full model forward: returns (verts (V,3), mapped joints (K,3)).

    Mirrors `body_models_scale.py:327-412`: LBS -> (optional LSP joint
    regression from vertices) -> append surface keypoints -> gather into
    annotation order -> add translation.  `body_pose` overrides
    `params.body_pose` (used when the pose comes from the VPoser decoder).
    For SMPL-H / SMPL-X assets a shorter body pose is zero-padded: hand,
    jaw, and eye joints rest flat unless explicitly posed (the
    reference's default hand/face behavior).
    """
    pose = body_pose if body_pose is not None else params.body_pose
    J = len(assets.parents)
    need = (J - 1) * 3
    if pose.shape[-1] < need:
        pose = jnp.concatenate(
            [pose, jnp.zeros(pose.shape[:-1] + (need - pose.shape[-1],),
                             pose.dtype)], axis=-1)
    full_pose = jnp.concatenate([params.global_orient, pose])
    verts, posed_joints = lbs(assets, params.betas, full_pose, params.scale)

    if assets.model_type == "smpllsp":
        base_joints = assets.lsp_regressor @ verts  # (14, 3)
    else:
        base_joints = posed_joints  # (24, 3)

    extra = verts[assets.extra_joint_ids]  # (E, 3)
    all_joints = jnp.concatenate([base_joints, extra], axis=0)
    mapped = all_joints[assets.joint_map]

    verts = verts + params.transl
    mapped = mapped + params.transl
    return verts, mapped


def rest_joints(assets: SMPLAssets) -> jnp.ndarray:
    """Annotation-order joints of the zero-pose, zero-shape, unit-scale body.

    Used by the initializer (`init_guess.py:35-52`): regress joints from the
    rest vertices, append surface keypoints, map to annotation order.
    """
    params = SMPLParams.zeros(assets.num_betas, assets.v_template.dtype)
    _, joints = smpl_forward(assets, params)
    return joints
