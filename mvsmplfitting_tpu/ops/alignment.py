"""Similarity alignment (Umeyama) between point sets, jit/vmap friendly.

Matches the behavior of the reference's modified skimage umeyama
(`code/utils/umeyama.py:16-110`) including its two quirks, because the
initializer's output feeds directly into the fit being compared:

* the returned rotation is chosen between R and R with the first two
  columns negated, whichever has lower alignment residual (the
  reference's "wrong rotation in some unknown condition" workaround,
  `umeyama.py:84-108`);
* the translation is always computed from the *column-flipped* rotation
  (the reference flips in place through a numpy view before computing
  the translation).

Implemented branch-free on top of `jnp.linalg.svd` so a whole batch of
frames initializes in one compiled call.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray,
            estimate_scale: bool = True
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Least-squares similarity transform src -> dst.

    Args:
      src: (M, 3) source points (rest-pose model joints).
      dst: (M, 3) destination points (triangulated joints).

    Returns:
      (rot (3, 3), trans (3,), scale ()) with
      ``dst ~= scale * rot @ src + trans``.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    num, dim = src.shape[0], src.shape[1]

    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_d = src - src_mean
    dst_d = dst - dst_mean

    A = (dst_d.T @ src_d) / num
    U, S, Vt = jnp.linalg.svd(A)

    # Reflection handling: d = diag(1, 1, sign(det A)).
    neg = jnp.linalg.det(A) < 0
    d = jnp.ones((dim,), src.dtype).at[dim - 1].set(
        jnp.where(neg, -1.0, 1.0))
    # sic: the reference's full-rank branch computes U @ diag(d) @ V.T
    # where its `V` is numpy's *already transposed* Vh
    # (`umeyama.py:62,80`) — i.e. U d Vh^T, NOT the Kabsch U d Vh.
    # This is the very bug its column-flip workaround below compensates
    # for; reproduced exactly so initial guesses match the reference.
    rot_full = (U * d[None, :]) @ Vt.T
    # Rank-deficient branch (`umeyama.py:66-75`): rank == dim-1 uses the
    # proper Kabsch form (U @ Vh, sign-corrected via det(U)det(Vh)).
    # Rank via numpy matrix_rank's default tolerance.
    eps = jnp.finfo(src.dtype).eps
    tol = S[0] * dim * eps
    rank = jnp.sum(S > tol)
    det_uv = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d_neg = jnp.ones((dim,), src.dtype).at[dim - 1].set(-1.0)
    rot_def = jnp.where(det_uv > 0, U @ Vt, (U * d_neg[None, :]) @ Vt)
    rot0 = jnp.where(rank == dim - 1, rot_def, rot_full)

    scale = jnp.where(
        jnp.asarray(estimate_scale),
        (S @ d) / src_d.var(axis=0).sum(),
        jnp.ones((), src.dtype))

    # Candidate rotations: as-is, and with the first two columns negated.
    rot1 = rot0.at[:, :2].multiply(-1.0)

    def residual(rot):
        t = dst_mean - scale * (rot @ src_mean)
        moved = scale * (src @ rot.T) + t
        return jnp.linalg.norm(moved - dst)

    take_flipped = residual(rot0) > residual(rot1)
    rot = jnp.where(take_flipped, rot1, rot0)
    # sic: the reference computes the final translation after flipping a
    # numpy *view* of T in place, so it always uses the flipped rotation
    # regardless of which candidate won (`umeyama.py:102-108`).
    trans = dst_mean - scale * (rot1 @ src_mean)
    return rot, trans, scale
