"""Analytic Jacobian of the reduced joint model (Gauss-Newton hot path).

Chip profiling (`tools/bench_iter_breakdown.py`, docs/BENCH_NOTES.md r4)
showed the LM iteration is latency-bound on the *tangent op chain* of
`joint_forward`: 49 forward-mode AD columns each re-walk rodrigues +
the level-batched kinematic chain + the H einsums, and that tangent
graph is 97% of the 2.07 ms linearize (the FLOPs are trivial; the
sequential op depth is not).  This module computes the same Jacobian in
closed form from the PRIMAL chain quantities — a handful of batched
einsums with no per-column graphs — using the classic kinematic result:

for a chain of local transforms ``W_j = W_parent . T_j``, perturbing
joint l's parameters perturbs every descendant j as

    dW_j = G_l . W_j,     G_l = W_{l-} . (dT_l . T_l^{-1}) . W_{l-}^{-1}

with ``W_{l-}`` the parent world transform.  The generator ``G_l`` is
built from primal quantities only; ancestry masking turns the sum over
parameters into one einsum.  Extended here to the scaled root
(`lbs.py:348` semantics: the root rotation block is ``scale * R_0``),
the beta-dependent rest skeleton, the pose-corrective offsets
(``Hp . vec(R - I)``), and the vertex-regressed joint rows of the
reduced model (`models/joint_model.py`).

Exactness: pure algebra — tested against ``jax.jacfwd(joint_forward)``
to float32 round-off (`tests/test_joint_jac.py`).  The rodrigues
derivative itself is taken by AD of the shared `ops.rotations.rodrigues`
(3 columns of a tiny function, batched over joints), so the reference's
+1e-8 parity quirk differentiates consistently by construction.

Scope: model types whose packed parameter vector has no extra blocks
(smpl / smpllsp — the production fitting path).  SMPL-H/X fits fall
back to the AD linearize in `fitting/lm.py`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import rodrigues
from .joint_model import JointModel
from .smpl import SMPLParams, _rigid_chain


def _ancestry(parents: Tuple[int, ...]) -> np.ndarray:
    """(J, J) anc[l, j] = 1 if l is an ancestor of j or l == j."""
    J = len(parents)
    anc = np.zeros((J, J), np.float32)
    for j in range(J):
        l = j
        while True:
            anc[l, j] = 1.0
            if l == 0:
                break
            l = parents[l]
    return anc


def joint_jacobian(jm: JointModel, params: SMPLParams,
                   body_pose: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mapped joints (K, 3) and their analytic Jacobian blocks.

    Returns ``(joints, blocks)`` where ``blocks`` maps each model
    parameter group to an array of Jacobian *columns* shaped
    ``(n_group, K, 3)``:

      - ``"pose"``   ((J-1)*3, K, 3) — chain body pose (axis-angle)
      - ``"orient"`` (3, K, 3)       — global orientation
      - ``"betas"``  (NB, K, 3)
      - ``"transl"`` (3, K, 3)
      - ``"scale"``  (1, K, 3)

    Requires a plain chain pose (smpl/smpllsp: `assemble_chain_pose` is
    the identity) and no expression fold (``jm.He is None`` path).
    """
    parents = jm.parents
    J = len(parents)
    dtype = jm.H0.dtype
    par = np.asarray(parents)

    pose = body_pose
    need = (J - 1) * 3
    if pose.shape[-1] < need:  # zero-padded tail (parity with forward)
        pose = jnp.concatenate(
            [pose, jnp.zeros(pose.shape[:-1] + (need - pose.shape[-1],),
                             pose.dtype)], axis=-1)
    theta = jnp.concatenate([params.global_orient, pose]).reshape(J, 3)

    betas = params.betas.astype(dtype)
    scale = params.scale.astype(dtype)

    # --- primal chain (shared code path with joint_forward) ---
    R = rodrigues(theta)                                   # (J, 3, 3)
    eye3_ = jnp.eye(3, dtype=dtype)
    pf = (R[1:] - eye3_).reshape(-1)                       # (9(J-1),)
    if jm.fold is not None:
        # Same fused fold dot as joint_forward (dot count is the chip
        # cost model — BENCH_NOTES r4).
        v = jm.fold @ jnp.concatenate([betas, pf])
        j_rest = jm.j0 + v[:J * 3].reshape(J, 3)
        h_off = v[J * 3:].reshape(-1, J, 3)
    else:
        j_rest = jm.j0 + jnp.einsum("jcb,b->jc", jm.JB, betas)
        h_off = (jnp.einsum("kjcb,b->kjc", jm.Hb, betas)
                 + jnp.einsum("kjcp,p->kjc", jm.Hp, pf))
    p, A = _rigid_chain(R, j_rest, parents, scale)
    Rw = A[:, :3, :3]                                      # world rot (scaled)
    tw = p                                                 # world transl

    rel = j_rest.at[1:].add(-j_rest[par[1:]])              # local offsets
    eye3 = jnp.eye(3, dtype=dtype)
    Rp = Rw[par].at[0].set(eye3)                           # parent world rot
    twp = tw[par].at[0].set(jnp.zeros((3,), dtype))        # parent world pos

    # Rw = scale * (orthonormal) for every joint (scale enters once at
    # the root), so the parent inverse is Rp^T / scale^2 — except the
    # root row, whose "parent" is the identity.
    inv_f = jnp.full((J,), 1.0 / jnp.maximum(scale * scale, 1e-30),
                     dtype).at[0].set(1.0)
    Rpinv = jnp.swapaxes(Rp, -1, -2) * inv_f[:, None, None]

    anc = jnp.asarray(_ancestry(parents), dtype)           # (J, J)

    # --- rotation generators G_l^a (l = joint, a = axis-angle comp) ---
    # dR by AD of the shared rodrigues (keeps the +1e-8 quirk's true
    # derivative); (J, 3, 3, 3) with the last axis the input component.
    dR = jax.vmap(jax.jacfwd(rodrigues))(theta)
    # All 3-wide contractions below are unrolled multiply-adds instead
    # of einsums: on chip each (batched) tiny dot_general is a separate
    # ~50-70us kernel, while broadcast elementwise chains FUSE (the r4
    # cost model, docs/BENCH_NOTES.md).
    # Kg = dR^A . R^T                                        (l,r,s,A)
    Kg = sum(dR[:, :, None, c, :] * R[:, None, :, c, None]
             for c in range(3))
    G1 = sum(Rp[:, :, b, None, None] * Kg[:, None, b, :, :]
             for b in range(3))                            # Rp.Kg (l,i,c,A)
    G_rot = sum(G1[:, :, c, None, :] * Rpinv[:, None, c, :, None]
                for c in range(3))                         # (l,3,3,A)
    # translation part: -G_rot . tw_parent - (Rp.Kg) . rel    (l,3,A)
    G_t = -(sum(G_rot[:, :, d, :] * twp[:, None, d, None]
                for d in range(3))
            + sum(G1[:, :, c, :] * rel[:, None, c, None]
                  for c in range(3)))

    GrT = G_rot.transpose(0, 3, 1, 2)                      # (l,A,a,d)
    GtT = G_t.transpose(0, 2, 1)                           # (l,A,a)

    # --- chain-joint derivatives dp_j (for chain-derived slots) ---
    # dp[l,A,j,:] = anc(l,j) (G_rot p_j + G_t)
    dp_theta = (sum(GrT[:, :, None, :, d] * p[None, None, :, None, d]
                    for d in range(3))
                + GtT[:, :, None, :]) * \
        anc[:, None, :, None]                              # (l,A,j,3)

    # betas: translation-only generators, drel from the rest-shape basis.
    # anc/drel are constants — contract them FIRST so XLA constant-folds
    # that einsum at compile time and only ONE runtime dot remains.
    drel = jm.JB.at[1:].add(-jm.JB[par[1:]])               # (J,3,NB) const
    anc_drel = jnp.einsum("lj,lbB->ljbB", anc, drel)       # const-folded
    dtw_b = jnp.einsum("lab,ljbB->jaB", Rp, anc_drel)      # (j,3,NB)

    # scale: dW_j/ds = [I/s, -rel_0/s] . W_j  =>  dp_j = (p_j - rel_0)/s
    dp_s = (p - rel[0][None, :]) / scale                   # (j,3)

    # --- vertex-regressed joint rows ---
    h = jm.H0[..., :3] + h_off                             # (K,J,3)
    w = jm.H0[..., 3]                                      # (K,J) const
    q = h - w[..., None] * j_rest[None]                    # (K,J,3)
    contrib = (sum(Rw[None, :, :, b] * q[:, :, None, b]
                   for b in range(3))
               + w[..., None] * tw[None])                  # (K,J,3)
    v_pre = jnp.sum(contrib, axis=1)                       # (K,3)

    Y = jnp.einsum("lj,kja->kla", anc, contrib)            # (K,J,3)
    Yt = Y.transpose(1, 0, 2)                              # (l,K,3)
    u = jnp.einsum("lj,kj->kl", anc, w)                    # (K,J) const

    # theta: rigid part + pose-corrective part
    dv_theta = (sum(GrT[:, :, None, :, d] * Yt[:, None, :, None, d]
                    for d in range(3))
                + u.transpose(1, 0)[:, None, :, None]
                * GtT[:, :, None, :])                      # (l,A,K,3)
    P = jnp.einsum("jab,kjbp->kap", Rw, jm.Hp)             # (K,3,207)
    P9 = P.reshape(P.shape[0], 3, J - 1, 9)
    dR9 = dR.reshape(J, 9, 3)                              # row-major (r,c)
    dv_pc = jnp.einsum("kalq,lqA->lAka", P9, dR9[1:])      # (l-1,A,K,3)
    dv_theta = dv_theta.at[1:].add(dv_pc)

    # betas / scale: reassociate so every const x const contraction
    # folds at compile time — three runtime dots collapse to two.
    HbW = jm.Hb - jnp.einsum("kj,jbB->kjbB", w, jm.JB)     # const-folded
    u_drel = jnp.einsum("kl,lbB->klbB", u, drel)           # const-folded
    dv_b = (jnp.einsum("jab,kjbB->kaB", Rw, HbW)
            + jnp.einsum("lab,klbB->kaB", Rp, u_drel))     # (K,3,NB)
    Wk = jnp.sum(w, axis=1)                                # (K,)
    dv_s = (v_pre - Wk[:, None] * rel[0][None]) / scale    # (K,3)

    # --- combine per mapped slot ---
    cidx = jm.chain_idx
    cm = jm.chain_mask[:, None]                            # (K,1)

    joints = jnp.where(cm, p[cidx], v_pre) + params.transl

    def mix(d_chain, d_vert):
        # d_chain (..., j, 3) gathered at cidx vs d_vert (..., K, 3)
        return jnp.where(cm, d_chain, d_vert)

    dth = mix(dp_theta[:, :, cidx, :].reshape(J * 3, -1, 3),
              dv_theta.reshape(J * 3, -1, 3))              # (J*3,K,3)
    blocks = {
        "orient": dth[:3],
        "pose": dth[3:3 + need],
        "betas": mix(dtw_b[cidx].transpose(2, 0, 1),
                     dv_b.transpose(2, 0, 1)),
        "transl": jnp.broadcast_to(eye3[:, None, :],
                                   (3, joints.shape[0], 3)),
        "scale": mix(dp_s[cidx], dv_s)[None],
    }
    return joints, blocks
