"""Reduced joint model: the LBS -> joint pipeline with vertices folded
out.

The fitting energy only consumes the K mapped annotation joints, and
every vertex-derived joint is *linear* in the posed vertices:

    joints_k = sum_v G[k,v] * verts_v
    verts_v  = sum_j W[v,j] * A_j[:3,:4] @ [v_posed_v; 1]
    v_posed  = v_template + shapedirs @ beta + posedirs^T @ posefeat

so, defining GW[k,j,v] = G[k,v] * W[v,j],

    joints_k = sum_j A_j[:3,:4] @ H_kj,
    H_kj     = H0_kj + Hb_kj @ beta + Hp_kj @ posefeat

with H0 (K,24,4), Hb (K,24,3,NB), Hp (K,24,3,207) all *precomputed
constants*.  The 6890-vertex blend-shape / pose-offset / skinning
matmuls (the reference's per-iteration hot ops, `lbs.py:179-212`)
disappear from the optimization loop entirely — the per-iteration cost
drops from ~20 MFLOP to ~0.3 MFLOP per body, a ~50x reduction that
multiplies across the ~50 Jacobian JVPs of the Gauss-Newton solver.
Chain-derived joints (model_type 'smpl' body joints) come from the
kinematic chain as before; the rest-joint regressor is likewise reduced
to j0 + JB @ beta.

Exactness: this is algebra, not approximation — outputs match
`smpl_forward` to float32 round-off (tested).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.rotations import rodrigues
from .smpl import SMPLAssets, SMPLParams, _rigid_chain, assemble_chain_pose


@struct.dataclass
class JointModel:
    """Precomputed reduced model for the K mapped annotation joints."""

    H0: jnp.ndarray        # (K, 24, 4)
    Hb: jnp.ndarray        # (K, 24, 3, NB)
    Hp: jnp.ndarray        # (K, 24, 3, 207)
    j0: jnp.ndarray        # (24, 3) rest joints at beta=0
    JB: jnp.ndarray        # (24, 3, NB) rest-joint shape basis
    chain_idx: jnp.ndarray  # (K,) int32: source chain joint or -1
    chain_mask: jnp.ndarray  # (K,) 1.0 where chain-derived
    # Fused linear fold: one (J*3 + K*J*3, NB + 207) basis applied to
    # [betas; posefeat] replaces the three separate JB/Hb/Hp
    # contractions — on chip each small dot_general is its own ~50us
    # kernel (tripled in the AD tangent graph), so primal dot count is
    # the cost model (docs/BENCH_NOTES.md r4).
    fold: Optional[jnp.ndarray] = None  # (J*3 + K*J*3, NB + 207)
    # SMPL-X expression fold (None otherwise): same algebra as Hb/JB
    # over expr_dirs.
    He: Optional[jnp.ndarray] = None  # (K, J, 3, NE)
    JE: Optional[jnp.ndarray] = None  # (J, 3, NE)
    # Hand-PCA data shared with the full assets (for pose assembly).
    hand_components: Optional[jnp.ndarray] = None  # (2, C, 45)
    hand_means: Optional[jnp.ndarray] = None       # (2, 45)
    parents: Tuple[int, ...] = struct.field(
        pytree_node=False, default=None)
    model_type: str = struct.field(pytree_node=False, default="smpl")


def build_joint_model(assets: SMPLAssets) -> JointModel:
    """Precompute the reduced tensors from full SMPL assets (one-time)."""
    V = assets.num_verts
    K = int(assets.joint_map.shape[0])
    NB = assets.num_betas

    joint_map = np.asarray(assets.joint_map)
    extra_ids = np.asarray(assets.extra_joint_ids)

    # Decide per mapped slot: chain joint (index into 24) or vertex row.
    nj = len(assets.parents)
    if assets.model_type == "smpllsp":
        num_base = int(assets.lsp_regressor.shape[0])
        base_rows = np.asarray(assets.lsp_regressor)      # vertex-derived
        base_is_chain = np.zeros(num_base, bool)
    else:
        num_base = nj
        base_rows = None
        base_is_chain = np.ones(num_base, bool)

    G = np.zeros((K, V), np.float32)
    chain_idx = np.full((K,), -1, np.int32)
    for k, src in enumerate(joint_map):
        if src < num_base:
            if base_is_chain[src]:
                chain_idx[k] = src
            else:
                G[k] = base_rows[src]
        else:
            G[k, extra_ids[src - num_base]] = 1.0
    chain_mask = (chain_idx >= 0).astype(np.float32)

    W = np.asarray(assets.lbs_weights)                    # (V, J)
    GW = np.einsum("kv,vj->kjv", G, W)                    # (K, J, V)

    vt = np.asarray(assets.v_template)
    vt_h = np.concatenate([vt, np.ones((V, 1), np.float32)], 1)
    H0 = np.einsum("kjv,vc->kjc", GW, vt_h)               # (K, J, 4)

    S = np.asarray(assets.shapedirs)                      # (V, 3, NB)
    Hb = np.einsum("kjv,vcb->kjcb", GW, S)                # (K, J, 3, NB)

    Pd = np.asarray(assets.posedirs)                      # (9(J-1), V*3)
    Pd = Pd.reshape(-1, V, 3)
    Hp = np.einsum("kjv,pvc->kjcp", GW, Pd)               # (K, J, 3, 9(J-1))

    JR = np.asarray(assets.j_regressor)                   # (J, V)
    j0 = JR @ vt                                          # (J, 3)
    JB = np.einsum("jv,vcb->jcb", JR, S)                  # (J, 3, NB)

    nj3 = nj * 3
    P9 = Hp.shape[-1]
    fold = np.zeros((nj3 + K * nj3, NB + P9), np.float32)
    fold[:nj3, :NB] = JB.reshape(nj3, NB)
    fold[nj3:, :NB] = Hb.reshape(K * nj3, NB)
    fold[nj3:, NB:] = Hp.reshape(K * nj3, P9)

    He = JE = None
    if assets.expr_dirs is not None:
        Ed = np.asarray(assets.expr_dirs)                 # (V, 3, NE)
        He = jnp.asarray(np.einsum("kjv,vce->kjce", GW, Ed))
        JE = jnp.asarray(np.einsum("jv,vce->jce", JR, Ed))

    return JointModel(
        H0=jnp.asarray(H0), Hb=jnp.asarray(Hb), Hp=jnp.asarray(Hp),
        fold=jnp.asarray(fold),
        j0=jnp.asarray(j0), JB=jnp.asarray(JB),
        chain_idx=jnp.asarray(np.maximum(chain_idx, 0)),
        chain_mask=jnp.asarray(chain_mask),
        He=He, JE=JE,
        hand_components=assets.hand_components,
        hand_means=assets.hand_means,
        parents=assets.parents,
        model_type=assets.model_type)


def with_joint_model(assets: SMPLAssets) -> SMPLAssets:
    """Return assets carrying their precomputed reduced joint model."""
    return assets.replace(joint_model=build_joint_model(assets))


def joint_forward(jm: JointModel, params: SMPLParams,
                  body_pose: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mapped annotation joints (K, 3) without touching vertices."""
    pose = body_pose if body_pose is not None else params.body_pose
    J = len(jm.parents)
    pose = assemble_chain_pose(jm, params, pose)
    need = (J - 1) * 3
    if pose.shape[-1] < need:   # plain SMPL body pose is already 69
        pose = jnp.concatenate(
            [pose, jnp.zeros(pose.shape[:-1] + (need - pose.shape[-1],),
                             pose.dtype)], axis=-1)
    full_pose = jnp.concatenate([params.global_orient, pose])

    dtype = jm.H0.dtype
    betas = params.betas.astype(dtype)
    K = jm.H0.shape[0]
    ident = jnp.eye(3, dtype=dtype)

    rot_mats = rodrigues(full_pose.reshape(J, 3))
    pf = (rot_mats[1:] - ident).reshape(-1)               # (207,)

    if jm.fold is not None:
        # One fused dot for the three linear folds (JB/Hb/Hp) — on chip
        # every small dot_general is its own ~50us kernel (tripled in
        # the AD tangent graph), so primal dot count is the cost model
        # (docs/BENCH_NOTES.md r4).
        v = jm.fold @ jnp.concatenate([betas, pf])
        j_rest = jm.j0 + v[:J * 3].reshape(J, 3)
        off = v[J * 3:].reshape(K, J, 3)
    else:
        j_rest = jm.j0 + jnp.einsum("jcb,b->jc", jm.JB, betas)
        off = (jnp.einsum("kjcb,b->kjc", jm.Hb, betas)
               + jnp.einsum("kjcp,p->kjc", jm.Hp, pf))

    if params.expression is not None and jm.He is not None:
        expr = params.expression.astype(dtype)
        j_rest = j_rest + jnp.einsum("jce,e->jc", jm.JE, expr)
        off = off + jnp.einsum("kjce,e->kjc", jm.He, expr)

    posed_joints, A = _rigid_chain(rot_mats, j_rest, jm.parents,
                                   params.scale)

    H = (jm.H0
         + jnp.concatenate(
             [off, jnp.zeros(jm.H0.shape[:2] + (1,), dtype)], axis=-1))

    vert_joints = jnp.einsum("jab,kjb->ka", A[:, :3, :4], H)
    chain_joints = posed_joints[jm.chain_idx]
    joints = jnp.where(jm.chain_mask[:, None], chain_joints, vert_joints)
    return joints + params.transl
