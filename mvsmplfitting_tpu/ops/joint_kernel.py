"""Fused Pallas joint-Jacobian kernel (the round-5 step function).

`models/joint_jac.py` computes the analytic Gauss-Newton Jacobian of
the reduced joint model as ~15 batched einsums; on chip every batched
small dot_general is its own ~40-70us kernel launch plus layout
transposes, so the whole analytic r+J costs ~1.5 ms at B=128 while its
FLOPs are trivial (docs/BENCH_NOTES.md r4/r5).  This module computes
the SAME quantities inside ONE Pallas program:

* layout: batch rides the LANE axis (128 lanes per grid block = the
  production B=128 tile), structure (the J=24 chain joints / K mapped
  slots) rides SUBLANES — every 3-4-wide contraction of
  `joint_jacobian` becomes a fused VPU multiply-add over (24, 128)
  tiles with no kernel-launch latency;
* the only real-FLOP contractions (the fused H fold, the
  pose-corrective `Rw . Hp` products, the beta blocks) are
  constant-matrix @ per-lane-matrix matmuls on the MXU, with the
  constant matrices' row/column orders PERMUTED AT BUILD TIME so the
  kernel needs no internal relayouts (every consumer slices contiguous
  sublane runs);
* static structure (parents, pointer-jumping tables, chain-vs-vertex
  slot choice, ancestry masks) is baked per `JointModel` as closure
  constants — the chain/vertex `mix` select of the XLA form becomes
  compile-time specialization;
* the rodrigues derivative is hand-derived from the same quirked
  formula (`ops/rotations.py:34`, the reference's +1e-8 shift,
  `lbs.py:290`), so it matches AD of the shared primal.

Exactness: same algebra as `joint_jacobian` reassociated — tested
against it to float32 round-off tolerance (NOT bitwise: XLA and Mosaic
contract multiply-adds differently, the documented fori/while-class
spread; see CLAUDE.md).  `tests/test_joint_kernel.py`.

Integration: `make_joint_jacobian_auto` returns a
`jax.custom_batching.custom_vmap` wrapper — unbatched calls
(single-frame CLI) use the XLA closed form, vmapped calls (the
production batched fit) collapse to ONE kernel invocation over the
whole batch.  Reference workload being replaced: the reference's
entire per-closure autograd pass (`code/optimizers/lbfgs_ls.py:256-445`
+ `code/smplx/lbs.py:135-222`).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.joint_jac import _ancestry
from ..models.joint_model import JointModel

_EPS = 1e-8  # rodrigues component shift (`ops/rotations.py:17`)
_LANES = 128


class _Meta(NamedTuple):
    """Static structure + small numpy constants baked into the kernel."""

    J: int
    K: int
    NB: int
    kv_rows: Tuple[int, ...]     # vertex-derived slot ids
    kc_rows: Tuple[int, ...]     # chain-derived slot ids
    cidx: Tuple[int, ...]        # chain source joint per chain slot
    steps: int
    np_consts: dict              # name -> np.ndarray (closure-baked)


class _Tables(NamedTuple):
    """Big per-JointModel constants, permuted into kernel row orders
    (passed to the kernel as VMEM refs)."""

    fold_p: jnp.ndarray      # (3J + K*3J, NB + 207)
    c_p: jnp.ndarray         # (Kv*9*(J-1), 3J) pose-corrective
    c_cb: jnp.ndarray        # (max(Kc,1)*NB, 3J) chain beta (on Xp)
    c_vb_w: jnp.ndarray      # (max(Kv,1)*NB, 3J) vertex beta (on X)
    c_vb_p: jnp.ndarray      # (max(Kv,1)*NB, 3J) vertex beta (on Xp)
    smalls: jnp.ndarray      # (S*J, 1) packed column constants
    mats: jnp.ndarray        # (M*J, J) packed (J, J) matrix constants
    meta: _Meta


def _perm_mat(idx, J):
    """One-hot (J, J) matrix M with (M @ a)[i] == a[idx[i]]."""
    m = np.zeros((J, J), np.float32)
    m[np.arange(J), np.asarray(idx, int)] = 1.0
    return m


def _build_tables(jm: JointModel) -> _Tables:
    """Permuted constants (numpy — jm leaves must be concrete)."""
    par = tuple(int(p) for p in jm.parents)
    J = len(par)
    H0 = np.asarray(jm.H0)                 # (K, J, 4)
    Hb = np.asarray(jm.Hb)                 # (K, J, 3, NB)
    Hp = np.asarray(jm.Hp)                 # (K, J, 3, P9)
    j0 = np.asarray(jm.j0)                 # (J, 3)
    JB = np.asarray(jm.JB)                 # (J, 3, NB)
    K, _, _, NB = Hb.shape
    P9 = Hp.shape[-1]
    assert P9 == 9 * (J - 1)

    chain_mask = np.asarray(jm.chain_mask).astype(bool)
    cidx_all = np.asarray(jm.chain_idx).astype(int)
    kc_rows = tuple(int(k) for k in np.nonzero(chain_mask)[0])
    kv_rows = tuple(int(k) for k in np.nonzero(~chain_mask)[0])
    Kc, Kv = len(kc_rows), len(kv_rows)

    anc = _ancestry(jm.parents)            # (J, J)
    w = H0[..., 3]                         # (K, J)
    u = np.einsum("lj,kj->kl", anc, w)     # (K, J)
    drel = JB.copy()
    drel[1:] -= JB[np.asarray(par[1:])]    # (J, 3, NB)

    # ---- fold, permuted ----------------------------------------------
    # input rows: [betas (NB)] + pf' ordered (r, c, j>=1) — the kernel
    # builds pf' by concatenating nine contiguous (J-1, B) R-atoms.
    # output rows: j_rest as (c, j), then h_off as (k, b, j) — every
    # consumer slices contiguous J-row runs.
    fold_in = np.zeros((NB + P9, NB + P9), np.float32)
    fold_in[:NB, :NB] = np.eye(NB)
    for r in range(3):
        for c in range(3):
            for j in range(1, J):
                fold_in[NB + (r * 3 + c) * (J - 1) + (j - 1),
                        NB + (j - 1) * 9 + r * 3 + c] = 1.0
    out_sel = np.zeros((3 * J + K * 3 * J, J * 3 + K * J * 3),
                       np.float32)
    for c in range(3):
        for j in range(J):
            out_sel[c * J + j, j * 3 + c] = 1.0
    for k in range(K):
        for b in range(3):
            for j in range(J):
                out_sel[3 * J + (k * 3 + b) * J + j,
                        J * 3 + (k * J + j) * 3 + b] = 1.0
    fold_p = out_sel @ np.asarray(jm.fold) @ fold_in.T

    # ---- pose-corrective constant (vertex slots only) ----------------
    # C_P[(i, q, l-1), (b*J + j)] = Hp[kv_i, j, b, (l-1)*9 + q]
    if Kv:
        hp_r = Hp[np.asarray(kv_rows)]                  # (Kv, J, 3, P9)
        t = hp_r.reshape(Kv, J, 3, J - 1, 9).transpose(0, 4, 3, 2, 1)
        c_p = np.ascontiguousarray(
            t.reshape(Kv * 9 * (J - 1), 3 * J)).astype(np.float32)
    else:
        c_p = np.zeros((9 * (J - 1), 3 * J), np.float32)

    # ---- beta-block constants ----------------------------------------
    c_cb = np.zeros((max(Kc, 1) * NB, 3 * J), np.float32)
    for s, k in enumerate(kc_rows):
        jsl = cidx_all[k]
        for b in range(3):
            c_cb[s * NB:(s + 1) * NB, b * J:(b + 1) * J] = (
                (anc[:, jsl][:, None] * drel[:, b, :]).T)
    HbW = Hb - np.einsum("kj,jbB->kjbB", w, JB)
    c_vb_w = np.zeros((max(Kv, 1) * NB, 3 * J), np.float32)
    c_vb_p = np.zeros((max(Kv, 1) * NB, 3 * J), np.float32)
    for i, k in enumerate(kv_rows):
        for b in range(3):
            c_vb_w[i * NB:(i + 1) * NB, b * J:(b + 1) * J] = \
                HbW[k, :, b, :].T
            c_vb_p[i * NB:(i + 1) * NB, b * J:(b + 1) * J] = (
                (u[k, :][:, None] * drel[:, b, :]).T)

    # ---- small closure constants -------------------------------------
    par0 = _perm_mat([0] + list(par[1:]), J)
    par0[0, :] = 0.0                       # parent gather, root row -> 0

    depth = [0] * J
    for i in range(1, J):
        depth[i] = depth[par[i]] + 1
    ptr = np.asarray(par, np.int64)
    ptr[0] = 0
    done = np.zeros(J, bool)
    done[0] = True
    ptr_mats, keep_cols = [], []
    while not done.all():
        ptr_mats.append(_perm_mat(ptr, J))
        keep_cols.append(done.astype(np.float32)[:, None])
        done = done | done[ptr]
        ptr = ptr[ptr]

    # Pack every (J,)-column constant into ONE (S*J, 1) ref and every
    # (J, J) matrix constant into ONE (M*J, J) ref — pallas_call
    # requires constants as inputs, and contiguous sublane slices are
    # the relayout-free way to address them in the kernel.
    small_rows = []
    sidx = {}

    def add_small(name, vec):
        sidx[name] = len(small_rows)
        small_rows.append(np.asarray(vec, np.float32).reshape(J))

    add_small("root1", np.eye(J)[0])
    for c in range(3):
        add_small(("j0c", c), j0[:, c])
    for step, kc in enumerate(keep_cols):
        add_small(("keep", step), kc.reshape(J))
    for i, k in enumerate(kv_rows):
        for b in range(3):
            add_small(("h0", i, b), H0[k, :, b])
        add_small(("w", i), w[k])
        add_small(("u", i), u[k])
    for s in range(Kc):
        add_small(("ancj", s), anc[:, cidx_all[kc_rows[s]]])
    smalls = np.concatenate(small_rows).reshape(-1, 1)

    mat_stack = []
    midx = {}

    def add_mat(name, m):
        midx[name] = len(mat_stack)
        mat_stack.append(np.asarray(m, np.float32))

    add_mat("par0", par0)
    add_mat("anc", anc)
    for step, pm in enumerate(ptr_mats):
        add_mat(("ptr", step), pm)
    mats = np.concatenate(mat_stack, axis=0)

    npc = {
        "sidx": sidx, "midx": midx,
        "wsum": {i: float(w[k].sum()) for i, k in enumerate(kv_rows)},
    }
    meta = _Meta(J=J, K=K, NB=NB, kv_rows=kv_rows, kc_rows=kc_rows,
                 cidx=tuple(int(cidx_all[k]) for k in kc_rows),
                 steps=len(ptr_mats), np_consts=npc)
    return _Tables(fold_p=jnp.asarray(fold_p), c_p=jnp.asarray(c_p),
                   c_cb=jnp.asarray(c_cb), c_vb_w=jnp.asarray(c_vb_w),
                   c_vb_p=jnp.asarray(c_vb_p),
                   smalls=jnp.asarray(smalls), mats=jnp.asarray(mats),
                   meta=meta)


def out_rows(meta: _Meta) -> int:
    K = meta.K
    return K * 3 + 3 * K * 3 * meta.J + K * 3 * meta.NB + K * 3


def _core(thT, beT, scT, fold_p, c_p, c_cb, c_vb_w, c_vb_p, smalls,
          mats, meta: _Meta):
    """The whole joint-Jacobian on (rows, B)-shaped values.

    thT: (3*J, B), rows c*J + j (component-major).
    beT: (NB, B); scT: (1, B); smalls (S*J, 1); mats (M*J, J).
    Returns the packed (out_rows, B) result — see `_unpack_out`.
    Runs as plain XLA for testing and as the Pallas kernel body.
    """
    J, K, NB = meta.J, meta.K, meta.NB
    npc = meta.np_consts
    sidx, midx = npc["sidx"], npc["midx"]
    f32 = thT.dtype
    B = thT.shape[-1]
    Kv, Kc = len(meta.kv_rows), len(meta.kc_rows)

    def col(name):                                     # (J, 1)
        i = sidx[name]
        return smalls[i * J:(i + 1) * J]

    def cmat(name):                                    # (J, J)
        i = midx[name]
        return mats[i * J:(i + 1) * J, :]

    root1 = col("root1")
    par_m = cmat("par0")
    anc_m = cmat("anc")

    def mat(m, x):
        # HIGHEST: the MXU's default single-pass bf16 matmul truncates
        # the gathered/contracted fp32 values to 8 mantissa bits
        # (chip-measured 7e-3 rel on the one-hot permutation dots);
        # full fp32 passes keep the kernel in the reassociation class.
        return jnp.dot(m, x, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    # ---- rodrigues + closed-form dR ------------------------------
    v = [thT[c * J:(c + 1) * J] for c in range(3)]     # 3 x (J, B)
    a = [vc + _EPS for vc in v]
    theta = jnp.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2])
    inv_t = 1.0 / theta
    dth = [ai * inv_t for ai in a]                     # d theta / d v_i
    u = [vc * inv_t for vc in v]
    du = [[((1.0 if c == i else 0.0) - u[c] * dth[i]) * inv_t
           for i in range(3)] for c in range(3)]
    s = jnp.sin(theta)
    cs = jnp.cos(theta)
    C = 1.0 - cs
    ds = [cs * d for d in dth]
    dC = [s * d for d in dth]

    zero = jnp.zeros_like(theta)
    Km = [[zero, -u[2], u[1]],
          [u[2], zero, -u[0]],
          [-u[1], u[0], zero]]
    zl = [zero, zero, zero]
    dKm = [[zl, [-du[2][i] for i in range(3)],
            [du[1][i] for i in range(3)]],
           [[du[2][i] for i in range(3)], zl,
            [-du[0][i] for i in range(3)]],
           [[-du[1][i] for i in range(3)],
            [du[0][i] for i in range(3)], zl]]
    K2 = [[sum(Km[r][b] * Km[b][c] for b in range(3))
           for c in range(3)] for r in range(3)]
    dK2 = [[[sum(dKm[r][b][i] * Km[b][c] + Km[r][b] * dKm[b][c][i]
                 for b in range(3))
             for i in range(3)] for c in range(3)] for r in range(3)]
    eye3 = [[1.0 if r == c else 0.0 for c in range(3)]
            for r in range(3)]
    R = [[eye3[r][c] + s * Km[r][c] + C * K2[r][c]
          for c in range(3)] for r in range(3)]
    dR = [[[ds[i] * Km[r][c] + s * dKm[r][c][i]
            + dC[i] * K2[r][c] + C * dK2[r][c][i]
            for i in range(3)] for c in range(3)] for r in range(3)]

    # ---- fused fold: j_rest + h_off ------------------------------
    pf_rows = [R[r][c][1:] - eye3[r][c] for r in range(3)
               for c in range(3)]                      # 9 x (J-1, B)
    fold_in = jnp.concatenate([beT] + pf_rows, axis=0)
    fold_out = mat(fold_p, fold_in)                    # (rows, B)
    j_rest = [fold_out[c * J:(c + 1) * J] + col(("j0c", c))
              for c in range(3)]                       # 3 x (J, B)

    # ---- kinematic chain (pointer jumping) -----------------------
    scale = scT                                        # (1, B)
    rel = [jc - mat(par_m, jc) for jc in j_rest]
    rootf = 1.0 + (scale - 1.0) * root1                # (J, B)
    # 12 live atoms: T[r][c], r<3, c<4 (bottom row is constant 0001)
    T = [[R[r][c] * rootf for c in range(3)] + [rel[r]]
         for r in range(3)]
    for step in range(meta.steps):
        ptr_m = cmat(("ptr", step))
        keep = col(("keep", step))                     # (J, 1)
        P = [[mat(ptr_m, T[r][c]) for c in range(4)] for r in range(3)]
        newT = [[sum(P[r][b] * T[b][c] for b in range(3))
                 + (P[r][3] if c == 3 else 0.0)
                 for c in range(4)] for r in range(3)]
        T = [[keep * T[r][c] + (1.0 - keep) * newT[r][c]
              for c in range(4)] for r in range(3)]

    p = [T[d][3] for d in range(3)]                    # world joints
    Rw = [[T[a_][b] for b in range(3)] for a_ in range(3)]

    # parent-world quantities (root -> identity / zero translation)
    Rp = [[mat(par_m, Rw[a_][b]) + eye3[a_][b] * root1
           for b in range(3)] for a_ in range(3)]
    twp = [mat(par_m, p[d]) for d in range(3)]
    inv_f = ((1.0 - root1) / jnp.maximum(scale * scale, 1e-30)
             + root1)                                  # (J, B)
    Rpi = [[Rp[b][c] * inv_f for c in range(3)] for b in range(3)]

    # ---- generators ----------------------------------------------
    Kg = [[[sum(dR[r][c][A] * R[sx][c] for c in range(3))
            for A in range(3)] for sx in range(3)] for r in range(3)]
    G1 = [[[sum(Rp[i][b] * Kg[b][c][A] for b in range(3))
            for A in range(3)] for c in range(3)] for i in range(3)]
    Grot = [[[sum(G1[i][c][A] * Rpi[jx][c] for c in range(3))
              for A in range(3)] for jx in range(3)] for i in range(3)]
    Gt = [[-(sum(Grot[a_][d][A] * twp[d] for d in range(3))
             + sum(G1[a_][c][A] * rel[c] for c in range(3)))
           for A in range(3)] for a_ in range(3)]

    # ---- X / Xp: MXU operands for beta & pose-corrective blocks --
    # rows (b*J + joint); lanes = [a0 | a1 | a2] blocks of B
    X = jnp.concatenate(
        [jnp.concatenate([Rw[a_][b] for b in range(3)], axis=0)
         for a_ in range(3)], axis=1)                  # (3J, 3B)
    Xp = jnp.concatenate(
        [jnp.concatenate([Rp[a_][b] for b in range(3)], axis=0)
         for a_ in range(3)], axis=1)
    M_cb = mat(c_cb, Xp) if Kc else None               # (Kc*NB, 3B)
    M_vb = (mat(c_vb_w, X) + mat(c_vb_p, Xp)) if Kv else None

    def P_slot(i):
        # Per-slot pose-corrective product (207, 3B).  One matmul per
        # vertex slot instead of a single (Kv*207, 3B) product: the
        # full P_mat at Kv=17 is 5.4 MB and (with fp32-precision
        # matmul scratch) overflowed the 16 MB VMEM budget on chip;
        # per-slot products are consumed immediately, so the stack
        # allocator reuses one 0.3 MB slab.
        lo = i * 9 * (J - 1)
        return mat(c_p[lo:lo + 9 * (J - 1)], X)

    # ---- vertex-slot primitives ----------------------------------
    vp = {}        # [(i, a)] -> (1, B) vertex-joint positions
    Yd = {}        # [(i, d)] -> (J, B) ancestry-folded contributions
    for i in range(Kv):
        wk = col(("w", i))
        q = [col(("h0", i, b))
             + fold_out[3 * J + (meta.kv_rows[i] * 3 + b) * J:
                        3 * J + (meta.kv_rows[i] * 3 + b) * J + J]
             - wk * j_rest[b] for b in range(3)]
        for a_ in range(3):
            cb = sum(Rw[a_][b] * q[b] for b in range(3)) + wk * p[a_]
            vp[(i, a_)] = jnp.sum(cb, axis=0, keepdims=True)
            Yd[(i, a_)] = mat(anc_m, cb)

    # ---- assemble output atoms -----------------------------------
    rel0 = [rel[c][:1] for c in range(3)]              # (1, B)
    inv_s = 1.0 / scale

    def lane(mmat, r0, r1, a_):
        return mmat[r0:r1, a_ * B:(a_ + 1) * B]

    vi = {k: i for i, k in enumerate(meta.kv_rows)}
    ci = {k: s for s, k in enumerate(meta.kc_rows)}

    joints_rows, dth_rows, dbe_rows, dsc_rows = [], [], [], []
    for k in range(K):
        if k in vi:
            i = vi[k]
            for a_ in range(3):
                joints_rows.append(vp[(i, a_)])
                dbe_rows.append(lane(M_vb, i * NB, (i + 1) * NB, a_))
                dsc_rows.append((vp[(i, a_)]
                                 - npc["wsum"][i] * rel0[a_]) * inv_s)
        else:
            jsl = meta.cidx[ci[k]]
            for a_ in range(3):
                joints_rows.append(p[a_][jsl:jsl + 1])
                dbe_rows.append(lane(M_cb, ci[k] * NB,
                                     (ci[k] + 1) * NB, a_))
                dsc_rows.append((p[a_][jsl:jsl + 1] - rel0[a_]) * inv_s)

    dth_atoms = {}
    for k in range(K):
        if k in vi:
            i = vi[k]
            ucol = col(("u", i))
            Pm = P_slot(i)                             # (9(J-1), 3B)
            for A in range(3):
                for a_ in range(3):
                    atom = (sum(Grot[a_][d][A] * Yd[(i, d)]
                                for d in range(3))
                            + ucol * Gt[a_][A])        # (J, B)
                    pc = sum(
                        lane(Pm, (r * 3 + c) * (J - 1),
                             (r * 3 + c) * (J - 1) + J - 1,
                             a_) * dR[r][c][A][1:]
                        for r in range(3) for c in range(3))
                    dth_atoms[(A, k, a_)] = jnp.concatenate(
                        [atom[:1], atom[1:] + pc], axis=0)
        else:
            jsl = meta.cidx[ci[k]]
            ancj = col(("ancj", ci[k]))
            for A in range(3):
                for a_ in range(3):
                    pj = [p[d][jsl:jsl + 1] for d in range(3)]
                    dth_atoms[(A, k, a_)] = ancj * (
                        sum(Grot[a_][d][A] * pj[d] for d in range(3))
                        + Gt[a_][A])
    dth_rows = [dth_atoms[(A, k, a_)] for A in range(3)
                for k in range(K) for a_ in range(3)]

    return jnp.concatenate(
        joints_rows + dth_rows + dbe_rows + dsc_rows, axis=0)


def _unpack_out(out_T, meta: _Meta):
    """(B, out_rows) -> (joints, dth, dbetas, dscale) batched blocks."""
    J, K, NB = meta.J, meta.K, meta.NB
    B = out_T.shape[0]
    o = 0
    joints = out_T[:, o:o + K * 3].reshape(B, K, 3)
    o += K * 3
    dth = out_T[:, o:o + 3 * K * 3 * J].reshape(B, 3, K, 3, J)
    dth = dth.transpose(0, 4, 1, 2, 3).reshape(B, J * 3, K, 3)
    o += 3 * K * 3 * J
    dbe = out_T[:, o:o + K * 3 * NB].reshape(B, K, 3, NB)
    dbe = dbe.transpose(0, 3, 1, 2)                    # (B, NB, K, 3)
    o += K * 3 * NB
    dsc = out_T[:, o:o + K * 3].reshape(B, 1, K, 3)
    return joints, dth, dbe, dsc


def _pallas_fn(tables: _Tables, Bp: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    meta = tables.meta
    R = out_rows(meta)
    J, NB = meta.J, meta.NB
    nb = Bp // _LANES

    def kernel(th_ref, be_ref, sc_ref, fold_ref, cp_ref, ccb_ref,
               cvbw_ref, cvbp_ref, sm_ref, mt_ref, out_ref):
        out_ref[:] = _core(th_ref[:], be_ref[:], sc_ref[:],
                           fold_ref[:], cp_ref[:], ccb_ref[:],
                           cvbw_ref[:], cvbp_ref[:], sm_ref[:],
                           mt_ref[:], meta)

    def lanes_spec(rows):
        return pl.BlockSpec((rows, _LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            lanes_spec(3 * J), lanes_spec(NB), lanes_spec(1),
            const_spec(tables.fold_p.shape),
            const_spec(tables.c_p.shape),
            const_spec(tables.c_cb.shape),
            const_spec(tables.c_vb_w.shape),
            const_spec(tables.c_vb_p.shape),
            const_spec(tables.smalls.shape),
            const_spec(tables.mats.shape),
        ],
        out_specs=lanes_spec(R),
        out_shape=jax.ShapeDtypeStruct((R, Bp), jnp.float32),
        interpret=interpret,
    )


def joint_jacobian_batched(jm: JointModel, theta: jnp.ndarray,
                           betas: jnp.ndarray, scale: jnp.ndarray,
                           interpret: bool = False):
    """Batched analytic joint Jacobian via the fused kernel.

    theta: (B, J*3) axis-angle, (j, c) element order; betas (B, NB);
    scale (B,).  Returns ``(joints (B, K, 3) WITHOUT transl, blocks)``
    with blocks matching `joint_jacobian`'s per-group contract plus a
    leading batch axis.
    """
    tables = _build_tables(jm)
    meta = tables.meta
    J, K, NB = meta.J, meta.K, meta.NB
    B = theta.shape[0]
    Bp = ((B + _LANES - 1) // _LANES) * _LANES

    thT = theta.astype(jnp.float32).reshape(B, J, 3) \
        .transpose(2, 1, 0).reshape(3 * J, B)
    beT = betas.astype(jnp.float32).T
    scT = scale.astype(jnp.float32).reshape(1, B)
    if Bp != B:
        thT = jnp.pad(thT, ((0, 0), (0, Bp - B)))
        beT = jnp.pad(beT, ((0, 0), (0, Bp - B)))
        scT = jnp.pad(scT, ((0, 0), (0, Bp - B)), constant_values=1.0)

    out = _pallas_fn(tables, Bp, interpret)(
        thT, beT, scT, tables.fold_p, tables.c_p, tables.c_cb,
        tables.c_vb_w, tables.c_vb_p, tables.smalls, tables.mats)
    joints, dth, dbe, dsc = _unpack_out(out.T[:B], meta)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    blocks = {
        "orient": dth[:, :3],
        "pose": dth[:, 3:],
        "betas": dbe,
        "transl": jnp.broadcast_to(eye3[None, :, None, :],
                                   (B, 3, K, 3)),
        "scale": dsc,
    }
    return joints, blocks


def kernel_ok(jm: JointModel) -> bool:
    """Kernel preconditions: plain chain (smpl/smpllsp), fused fold
    present, concrete (non-tracer) constants."""
    if jm.model_type not in ("smpl", "smpllsp") or jm.fold is None:
        return False
    return not isinstance(jm.chain_mask, jax.core.Tracer)


# Production default ON: chip-validated 2026-08-20 (CLAUDE.md rule —
# no kernel default without a chip compile+run).  Paired chip evidence
# (tools/bench_joint_kernel.py, B=128, jaxpr-verified paths):
# joint_jacobian 1296 -> 571 us (2.27x), analytic r+J+JtJ 1551 -> 783
# (1.98x), classic LM step 1612 -> 958 (1.68x); exactness vs the XLA
# closed form 3.4e-7 max rel (reassociation class); Mosaic compile
# 7.8 s.  `MVSF_JOINT_KERNEL=0` reverts for A/B.
_DEFAULT_ON = True


def use_kernel() -> bool:
    v = os.environ.get("MVSF_JOINT_KERNEL", "")
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    # Default ON only on the TPU backend: off-TPU the kernels would
    # run in interpret mode, which is both slower than the XLA closed
    # forms and inflates compiled graphs enough to crash the CPU
    # backend compiler inside batched while_loops (r5).  CPU exactness
    # tests opt in explicitly via MVSF_JOINT_KERNEL=1.
    return _DEFAULT_ON and jax.default_backend() == "tpu"


def make_joint_jacobian_auto(jm: JointModel):
    """`custom_vmap` wrapper (theta, betas, scale) -> (joints, blocks),
    joints WITHOUT transl: unbatched calls use the XLA closed form
    (`models/joint_jac.py`), vmapped calls collapse onto one fused
    kernel invocation over the whole batch."""
    from jax.custom_batching import custom_vmap

    from ..models.joint_jac import joint_jacobian
    from ..models.smpl import SMPLParams

    def xla_one(theta, betas, scale):
        params = SMPLParams(
            betas=betas, global_orient=theta[:3],
            body_pose=jnp.zeros((theta.shape[0] - 3,), theta.dtype),
            transl=jnp.zeros((3,), theta.dtype), scale=scale)
        return joint_jacobian(jm, params, theta[3:])

    @custom_vmap
    def auto(theta, betas, scale):
        return xla_one(theta, betas, scale)

    @auto.def_vmap
    def _rule(axis_size, in_batched, theta, betas, scale):
        tb, bb, sb = in_batched
        if not tb:
            theta = jnp.broadcast_to(theta, (axis_size,) + theta.shape)
        if not bb:
            betas = jnp.broadcast_to(betas, (axis_size,) + betas.shape)
        if not sb:
            scale = jnp.broadcast_to(scale, (axis_size,) + scale.shape)
        # Off-TPU (CPU tests, demo runs) the kernel runs in interpret
        # mode — same values, no Mosaic.  The chip path compiles.
        j, blk = joint_jacobian_batched(
            jm, theta, betas, scale,
            interpret=jax.default_backend() != "tpu")
        return (j, blk), (True, {k: True for k in blk})

    return auto
