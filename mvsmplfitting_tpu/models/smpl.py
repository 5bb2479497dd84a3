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

    # SMPL-H / SMPL-X production data (None for plain SMPL):
    # MANO hand PCA — the *full* bases are stored; the energy spec picks
    # how many components to optimize (`num_pca_comps=6` in the
    # reference, `body_models.py:424-425,493-496`).
    hand_components: Optional[jnp.ndarray] = None  # (2, C, 45)  [left, right]
    hand_means: Optional[jnp.ndarray] = None       # (2, 45); zeros when
    #                                       flat_hand_mean (body_models.py:505-513)
    # SMPL-X expression blend shapes (columns 10:20 of the model's
    # shapedirs — the reference concatenates [betas, expression] and uses
    # the full shapedirs, `body_models.py:914-921`).
    expr_dirs: Optional[jnp.ndarray] = None        # (V, 3, NE)

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

    @property
    def num_expr(self) -> int:
        return 0 if self.expr_dirs is None else self.expr_dirs.shape[-1]


@struct.dataclass
class SMPLParams:
    """Per-body parameters (a single body; vmap for batches).

    The SMPL-H / SMPL-X blocks are optional (None for plain SMPL): hand
    poses are MANO PCA coefficients (C,) — or raw axis-angle (45,) when
    bypassing the PCA — expression is (NE,) coefficients, and the face
    poses are per-joint axis-angle (3,).  None behaves as zeros.
    """

    betas: jnp.ndarray          # (10,)
    global_orient: jnp.ndarray  # (3,)
    body_pose: jnp.ndarray      # (69,)
    transl: jnp.ndarray         # (3,)
    scale: jnp.ndarray          # ()
    left_hand_pose: Optional[jnp.ndarray] = None   # (C,) PCA or (45,) aa
    right_hand_pose: Optional[jnp.ndarray] = None  # (C,) PCA or (45,) aa
    expression: Optional[jnp.ndarray] = None       # (NE,)
    jaw_pose: Optional[jnp.ndarray] = None         # (3,)
    leye_pose: Optional[jnp.ndarray] = None        # (3,)
    reye_pose: Optional[jnp.ndarray] = None        # (3,)

    @classmethod
    def zeros(cls, num_betas: int = 10, dtype=jnp.float32) -> "SMPLParams":
        return cls(
            betas=jnp.zeros((num_betas,), dtype),
            global_orient=jnp.zeros((3,), dtype),
            body_pose=jnp.zeros((69,), dtype),
            transl=jnp.zeros((3,), dtype),
            scale=jnp.ones((), dtype),
        )


NUM_HAND_JOINTS = 15          # per hand (MANO), SMPL-H/X
HAND_AA = 3 * NUM_HAND_JOINTS  # 45
BODY63 = 63                   # 21 body joints for SMPL-H/X


def _hand_aa(model, block: Optional[jnp.ndarray], side: int,
             dtype) -> jnp.ndarray:
    """One hand's (45,) axis-angle from its parameter block.

    PCA coefficients are decoded through the model's MANO components
    (`body_models.py:593-596`: `einsum('bi,ij->bj')`); a (45,) block is
    raw axis-angle (the reference's `use_pca=False` path).  The hand
    mean is always added — it is zeros when the model was loaded with
    `flat_hand_mean=True` (`body_models.py:505-513`).
    """
    if block is None:
        aa = jnp.zeros((HAND_AA,), dtype)
    elif block.shape[-1] == HAND_AA:
        aa = block
    else:
        aa = block @ model.hand_components[side, : block.shape[-1]]
    if model.hand_means is not None:
        aa = aa + model.hand_means[side]
    return aa


def assemble_chain_pose(assets, params: SMPLParams,
                        pose: jnp.ndarray) -> jnp.ndarray:
    """Full ((J-1)*3,) chain pose from the body pose + optional blocks.

    `assets` is any model carrier with `.parents`, `.model_type`,
    `.hand_components`, `.hand_means` (SMPLAssets or the reduced
    JointModel).

    SMPL/SMPL-LSP: the 69-dim body pose is the chain pose.  SMPL-H:
    [body(63), left hand(45), right hand(45)]; SMPL-X: [body(63),
    jaw(3), leye(3), reye(3), hands(90)] — the reference's full_pose
    assembly plus pose_mean (`body_models.py:596-608,903-910`).  A pose
    that is already full chain length is passed through untouched
    (raw-pose escape hatch used by synthetic tests).

    Note the reference's *scaled* SMPL-H/X forwards are latently broken
    (they call `lbs()` without its required `scale` argument,
    `body_models_scale.py:622,935`) — this implements the intended
    semantics: the stock smplx assembly with the scaled-SMPL root-scale.
    """
    J = len(assets.parents)
    need = (J - 1) * 3
    if assets.model_type in ("smpl", "smpllsp") or pose.shape[-1] == need:
        return pose

    body = pose[..., :BODY63]
    if body.shape[-1] < BODY63:
        body = jnp.concatenate(
            [body, jnp.zeros(body.shape[:-1] + (BODY63 - body.shape[-1],),
                             body.dtype)], axis=-1)
    pieces = [body]
    if assets.model_type == "smplx":
        for blk in (params.jaw_pose, params.leye_pose, params.reye_pose):
            pieces.append(blk if blk is not None
                          else jnp.zeros((3,), body.dtype))
    pieces.append(_hand_aa(assets, params.left_hand_pose, 0, body.dtype))
    pieces.append(_hand_aa(assets, params.right_hand_pose, 1, body.dtype))
    return jnp.concatenate(pieces, axis=-1)


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

    # Pointer-jumping tree composition: P_k[j] holds the product of the
    # local transforms along the 2^k-ancestor path segment ending at j
    # (the full W_j once the segment reaches the root), and ptr_k[j]
    # jumps 2^k ancestors at a time.  ceil(log2(depth)) batched
    # (J,4,4)@(J,4,4) matmuls with STATIC gathers replace the
    # depth-many level matmuls + scatters of the naive form — on chip
    # every small dot_general is a separate ~50us kernel regardless of
    # its size, so halving the dot count (8 levels -> 3 jumps for
    # SMPL's depth-8 tree, each tripled in the AD tangent graph) is
    # worth far more than any per-dot tuning (docs/BENCH_NOTES.md r4).
    # Multiplication grouping changes; the product is associatively
    # identical (fp32 spread vs the sequential chain ~1e-7 rel, same
    # class as the documented fori/while contraction spread).
    J = len(parents)
    depth = [0] * J
    for i in range(1, J):
        depth[i] = depth[parents[i]] + 1
    transforms = T.at[0].set(root)
    ptr = np.asarray(parents, np.int64)
    ptr[0] = 0
    done = np.zeros(J, bool)
    done[0] = True
    steps = max(1, int(np.ceil(np.log2(max(max(depth), 1) + 1))))
    for _ in range(steps):
        if done.all():
            break
        # Unrolled 4-term multiply-add instead of einsum: a (J,4,4)
        # batched matmul is a separate ~50-70us dot_general kernel on
        # chip, while broadcast elementwise ops FUSE with their
        # neighbors (the r4 cost model) — and the AD tangent graph
        # inherits the same fusion.
        par_t = transforms[ptr]
        gathered = sum(par_t[:, :, b, None] * transforms[:, None, b, :]
                       for b in range(4))
        transforms = jnp.where(done[:, None, None], transforms, gathered)
        done = done | done[ptr]
        ptr = ptr[ptr]

    posed_joints = transforms[:, :3, 3]
    # Relative-to-rest transforms for skinning: subtract the transform of
    # the rest joint location (only affects the translation column).
    correction = sum(transforms[:, :3, b] * joints[:, None, b]
                     for b in range(3))
    A = transforms.at[:, :3, 3].add(-correction)
    return posed_joints, A


def lbs(assets: SMPLAssets, betas: jnp.ndarray, full_pose: jnp.ndarray,
        scale: jnp.ndarray, expression: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning for one body (generic joint count).

    Args:
      betas: (NB,) shape coefficients.
      full_pose: (J*3,) axis-angle (root + J-1 joints).
      scale: () root scale.
      expression: optional (NE,) SMPL-X expression coefficients; applied
        through `expr_dirs` exactly like the reference's concatenated
        [betas, expression] against the full shapedirs
        (`body_models.py:914-921`), so rest joints move with it too.

    Returns:
      verts (V, 3), posed joints (J, 3) — both *before* translation.
    """
    dtype = assets.v_template.dtype
    J = len(assets.parents)
    v_shaped = assets.v_template + jnp.einsum(
        "vct,t->vc", assets.shapedirs, betas.astype(dtype))
    if expression is not None and assets.expr_dirs is not None:
        v_shaped = v_shaped + jnp.einsum(
            "vce,e->vc", assets.expr_dirs, expression.astype(dtype))
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
    For SMPL-H / SMPL-X the full chain pose is assembled from the body
    pose plus the optional hand-PCA / jaw / eye blocks and the model's
    hand means (see `assemble_chain_pose`).
    """
    pose = body_pose if body_pose is not None else params.body_pose
    pose = assemble_chain_pose(assets, params, pose)
    full_pose = jnp.concatenate([params.global_orient, pose])
    verts, posed_joints = lbs(assets, params.betas, full_pose, params.scale,
                              expression=params.expression)

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
