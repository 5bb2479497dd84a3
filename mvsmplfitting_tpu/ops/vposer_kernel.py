"""Fused VPoser decoder-Jacobian tail (Pallas, round-5 phase 2).

`vposer.decode_jac`'s cost splits (chip, B=128, dispatch-corrected):
the MLP matmul chain is ~free on the MXU, but the 6D->matrix->
axis-angle tail differentiated per joint (`jax.jacfwd` of a small
graph, 23 joints x 6 columns) lowers to ~15 separate elementwise
kernels — ~290 us of pure launch latency per LM iteration.  This
module keeps the MLP matmuls in XLA (where they are already free) and
runs the WHOLE tail — forward + its 6 JVP columns + the composition
with the MLP Jacobian — as one Pallas program in the same
lane=batch / sublane=joint layout as `ops/joint_kernel.py`.

Exactness: the tail derivative is the same `jax.jvp` AD of the shared
`sixd_to_matrix`/`matrix_to_axis_angle` graph (quirks included),
traced INSIDE the kernel body — tested against `vposer.decode_jac` to
fp32 reassociation tolerance (`tests/test_joint_kernel.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import vposer as V

_LANES = 128


def _mlp_head(w: V.VPoserWeights, z: jnp.ndarray):
    """Batched MLP forward + factored Jacobian (pure XLA matmuls).

    z: (B, 32) -> o (B, 138), Do (B, 138, 32) — identical math to
    `vposer.decode_jac`'s D1/D2/Do chain, batched.
    """
    h1p = z @ w.dec_fc1_w + w.dec_fc1_b
    g1 = jnp.where(h1p >= 0, 1.0, 0.2)
    h1 = jnp.where(h1p >= 0, h1p, 0.2 * h1p)
    h2p = h1 @ w.dec_fc2_w + w.dec_fc2_b
    g2 = jnp.where(h2p >= 0, 1.0, 0.2)
    h2 = jnp.where(h2p >= 0, h2p, 0.2 * h2p)
    o = h2 @ w.dec_out_w + w.dec_out_b                  # (B, 138)
    D1 = g1[:, :, None] * w.dec_fc1_w.T[None]           # (B, 512, 32)
    T2 = jnp.einsum("hk,bkz->bhz", w.dec_fc2_w.T, D1)
    D2 = g2[:, :, None] * T2
    Do = jnp.einsum("ok,bkz->boz", w.dec_out_w.T, D2)   # (B, 138, 32)
    return o, Do


def _atan(u):
    """Branchless fp32 arctan (Mosaic carries no atan/atan2 primitive).

    |u| <= 1 by an odd degree-11 minimax polynomial (max abs err
    ~2e-7); |u| > 1 via atan(u) = pi/2 - atan(1/u).  Infinity-safe
    (1/inf = 0 -> pi/2), which covers atan2(st, w->0).  Under jvp the
    polynomial differentiates to ~1/(1+u^2), matching AD through
    XLA's atan2 to the same tolerance class.
    """
    au = jnp.abs(u)
    big = au > 1.0
    x = jnp.where(big, 1.0 / jnp.maximum(au, 1.0), jnp.minimum(au, 1.0))
    x2 = x * x
    p = jnp.asarray(-0.0117212, x.dtype)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347,
              0.99997726):
        p = p * x2 + c
    a = x * p
    a = jnp.where(big, 0.5 * jnp.pi - a, a)
    return jnp.where(u < 0, -a, a)


def _tail6(cols):
    """The 6D -> matrix -> axis-angle tail on (NJ, B) atoms — the SAME
    algebra as `ops/rotations.sixd_to_matrix` +
    `matrix_to_axis_angle` (quirks included: 1e-12 norm floors, 1e-6
    Shepperd pivot floor, argmax-first tie-breaking, the 1e-30 /
    small-angle-2v conventions), restructured so B stays on the lane
    axis throughout.  Returns [aa_x, aa_y, aa_z] atoms."""
    a1 = [cols[0], cols[2], cols[4]]
    a2 = [cols[1], cols[3], cols[5]]
    n1 = jnp.sqrt(a1[0] * a1[0] + a1[1] * a1[1] + a1[2] * a1[2])
    b1 = [x / jnp.maximum(n1, 1e-12) for x in a1]
    dot = b1[0] * a2[0] + b1[1] * a2[1] + b1[2] * a2[2]
    b2u = [a2[i] - dot * b1[i] for i in range(3)]
    n2 = jnp.sqrt(b2u[0] * b2u[0] + b2u[1] * b2u[1] + b2u[2] * b2u[2])
    b2 = [x / jnp.maximum(n2, 1e-12) for x in b2u]
    b3 = [b1[1] * b2[2] - b1[2] * b2[1],
          b1[2] * b2[0] - b1[0] * b2[2],
          b1[0] * b2[1] - b1[1] * b2[0]]
    # R columns are [b1 b2 b3]
    m = [[b1[r], b2[r], b3[r]] for r in range(3)]

    t_w = 1.0 + m[0][0] + m[1][1] + m[2][2]
    t_x = 1.0 + m[0][0] - m[1][1] - m[2][2]
    t_y = 1.0 - m[0][0] + m[1][1] - m[2][2]
    t_z = 1.0 - m[0][0] - m[1][1] + m[2][2]

    def ssqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-6))

    sw = ssqrt(t_w)
    q_w = [sw, (m[2][1] - m[1][2]) / sw, (m[0][2] - m[2][0]) / sw,
           (m[1][0] - m[0][1]) / sw]
    sx = ssqrt(t_x)
    q_x = [(m[2][1] - m[1][2]) / sx, sx, (m[0][1] + m[1][0]) / sx,
           (m[0][2] + m[2][0]) / sx]
    sy = ssqrt(t_y)
    q_y = [(m[0][2] - m[2][0]) / sy, (m[0][1] + m[1][0]) / sy, sy,
           (m[1][2] + m[2][1]) / sy]
    sz = ssqrt(t_z)
    q_z = [(m[1][0] - m[0][1]) / sz, (m[0][2] + m[2][0]) / sz,
           (m[1][2] + m[2][1]) / sz, sz]

    # argmax-equivalent cascade (first max wins, like jnp.argmax)
    is_w = (t_w >= t_x) & (t_w >= t_y) & (t_w >= t_z)
    is_x = (~is_w) & (t_x >= t_y) & (t_x >= t_z)
    is_y = (~is_w) & (~is_x) & (t_y >= t_z)
    q = [0.5 * jnp.where(is_w, q_w[i],
                         jnp.where(is_x, q_x[i],
                                   jnp.where(is_y, q_y[i], q_z[i])))
         for i in range(4)]
    qn = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                  + q[3] * q[3])
    q = [x / qn for x in q]

    w, v = q[0], q[1:]
    sin_sq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    st = jnp.sqrt(jnp.maximum(sin_sq, 0.0))
    # Sign-folded atan2 (`quaternion_to_axis_angle`): with st >= 0,
    # where(w<0, atan2(-st,-w), atan2(st,w)) == atan(st/w) with the
    # w->0 limit pi/2*sign — Mosaic has no atan2 primitive, so the
    # kernel carries its own fp32 minimax atan (max err ~2e-7,
    # inside the comparison tolerance vs XLA's atan2).
    two_theta = 2.0 * _atan(st / w)
    k = jnp.where(sin_sq > 0.0,
                  two_theta / jnp.maximum(st, 1e-30), 2.0)
    return [v[i] * k for i in range(3)]


def _tail_core(o6T, DoT, NJ):
    """(6*NJ, B) 6D rows (c-major) + (6*32*NJ, B) MLP-Jacobian rows
    ((c, Z)-major) -> packed (3*NJ + 3*32*NJ, B) [aa rows (a, j);
    D rows (a, Z, j)]."""
    cols = [o6T[c * NJ:(c + 1) * NJ] for c in range(6)]
    aa = _tail6(cols)                                  # 3 x (NJ, B)
    # 6 JVP columns of the same graph (the jacfwd the XLA path runs),
    # traced inside the kernel so every op fuses.
    zero = [jnp.zeros_like(c) for c in cols]
    Jt = []                                            # [c6] -> 3 atoms
    for c6 in range(6):
        tan = list(zero)
        tan[c6] = jnp.ones_like(cols[c6])
        _, dt = jax.jvp(lambda *cs: _tail6(list(cs)), tuple(cols),
                        tuple(tan))
        Jt.append(dt)

    d_rows = []
    for a in range(3):
        for Z in range(32):
            acc = Jt[0][a] * DoT[Z * NJ:Z * NJ + NJ]
            for c6 in range(1, 6):
                acc = acc + (Jt[c6][a]
                             * DoT[(c6 * 32 + Z) * NJ:
                                   (c6 * 32 + Z) * NJ + NJ])
            d_rows.append(acc)
    return jnp.concatenate(aa + d_rows, axis=0)


def _tail_pallas(NJ, Bp, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 3 * NJ + 3 * 32 * NJ

    def kernel(o6_ref, do_ref, out_ref):
        out_ref[:] = _tail_core(o6_ref[:], do_ref[:], NJ)

    def lanes_spec(rows):
        return pl.BlockSpec((rows, _LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(Bp // _LANES,),
        in_specs=[lanes_spec(6 * NJ), lanes_spec(6 * 32 * NJ)],
        out_specs=lanes_spec(R),
        out_shape=jax.ShapeDtypeStruct((R, Bp), jnp.float32),
        interpret=interpret,
    )


def decode_jac_batched(w: V.VPoserWeights, z: jnp.ndarray,
                       interpret: bool = False):
    """Batched `vposer.decode_jac`: z (B, 32) -> (body_pose (B, 69),
    D (B, 69, 32)).  MLP matmuls in XLA; tail + composition fused."""
    NJ = V.NUM_JOINTS
    B = z.shape[0]
    Bp = ((B + _LANES - 1) // _LANES) * _LANES

    o, Do = _mlp_head(w, z.astype(jnp.float32))
    # (B, NJ, 6) -> rows (c, j); (B, NJ, 6, 32) -> rows (c, Z, j)
    o6T = o.reshape(B, NJ, 6).transpose(2, 1, 0).reshape(6 * NJ, B)
    DoT = Do.reshape(B, NJ, 6, 32).transpose(2, 3, 1, 0) \
        .reshape(6 * 32 * NJ, B)
    if Bp != B:
        o6T = jnp.pad(o6T, ((0, 0), (0, Bp - B)))
        DoT = jnp.pad(DoT, ((0, 0), (0, Bp - B)))

    out = _tail_pallas(NJ, Bp, interpret)(o6T, DoT)[:, :B]
    aa = out[:3 * NJ].reshape(3, NJ, B).transpose(2, 1, 0) \
        .reshape(B, NJ * 3)
    D = out[3 * NJ:].reshape(3, 32, NJ, B).transpose(3, 2, 0, 1) \
        .reshape(B, NJ * 3, 32)
    return aa, D


def make_decode_jac_auto(w: V.VPoserWeights):
    """`custom_vmap` wrapper: unbatched -> `vposer.decode_jac` (XLA);
    vmapped -> the fused batched form."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def auto(z):
        return V.decode_jac(w, z)

    @auto.def_vmap
    def _rule(axis_size, in_batched, z):
        if not in_batched[0]:
            z = jnp.broadcast_to(z, (axis_size,) + z.shape)
        aa, D = decode_jac_batched(
            w, z, interpret=jax.default_backend() != "tpu")
        return (aa, D), (True, True)

    return auto


def weights_ok(w) -> bool:
    return (w is not None
            and not isinstance(w.dec_fc1_w, jax.core.Tracer))
