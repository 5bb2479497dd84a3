"""Pre/post-processing for the detection frontend, batched jnp.

Numerics match the reference exactly where outputs feed the pipeline:
* `letterbox` — YOLOX's ratio-preserving top-left resize with 114 pad
  (`yolox/data/data_augment.py:189-211`); raw 0-255 BGR, no mean.
* `bbox_to_center_scale` / `crop_affine` — AlphaPose's aspect-clipped,
  1.25x-padded isotropic crop (`utils/bbox.py:197-226`,
  `utils/transforms.py:762-803`, rot=0 path), as a batched bilinear
  gather instead of per-box cv2.warpAffine.
* `heatmap_to_coords` — argmax + 0.25-px gradient-sign refinement +
  inverse bbox transform (`utils/transforms.py:555-589,710-736`),
  vectorized over (boxes, joints).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def letterbox(img: np.ndarray, input_hw: Tuple[int, int] = (800, 1440),
              pad_value: float = 114.0) -> Tuple[np.ndarray, float]:
    """Resize keeping aspect, pad bottom/right. Returns (out, ratio).

    img: (H, W, 3) uint8/float (BGR to match reference checkpoints).
    """
    import cv2

    ih, iw = input_hw
    h, w = img.shape[:2]
    r = min(ih / h, iw / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = cv2.resize(img, (nw, nh),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32)
    out = np.full((ih, iw, 3), pad_value, np.float32)
    out[:nh, :nw] = resized
    return out, r


def bbox_to_center_scale(xyxy: np.ndarray, aspect_ratio: float = 0.75,
                         scale_mult: float = 1.25
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Boxes (M, 4) -> centers (M, 2), scales (M, 2) (w, h in pixels)."""
    xyxy = np.asarray(xyxy, np.float32)
    w = xyxy[:, 2] - xyxy[:, 0]
    h = xyxy[:, 3] - xyxy[:, 1]
    cx = xyxy[:, 0] + 0.5 * w
    cy = xyxy[:, 1] + 0.5 * h
    wide = w > aspect_ratio * h
    h = np.where(wide, w / aspect_ratio, h)
    w = np.where(~wide & (w < aspect_ratio * h), h * aspect_ratio, w)
    scale = np.stack([w, h], -1) * scale_mult
    return np.stack([cx, cy], -1), scale


def crop_affine(img: jnp.ndarray, centers: jnp.ndarray,
                scales: jnp.ndarray,
                out_hw: Tuple[int, int] = (256, 192)) -> jnp.ndarray:
    """Batched isotropic crops with bilinear sampling.

    img: (H, W, 3) float; centers (M, 2); scales (M, 2).
    Returns (M, out_h, out_w, 3).  Matches cv2.warpAffine with the
    reference's rot=0 affine (isotropic dst_w/src_w scale about the
    center) and constant-0 border.
    """
    oh, ow = out_hw
    H, W = img.shape[0], img.shape[1]

    def one(center, scale):
        ratio = scale[0] / ow                        # src px per dst px
        xs = (jnp.arange(ow) - ow * 0.5) * ratio + center[0]
        ys = (jnp.arange(oh) - oh * 0.5) * ratio + center[1]
        xg, yg = jnp.meshgrid(xs, ys)                # (oh, ow)

        x0 = jnp.floor(xg)
        y0 = jnp.floor(yg)
        fx = (xg - x0)[..., None]
        fy = (yg - y0)[..., None]

        def pix(yi, xi):
            inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            return jnp.where(inb[..., None], img[yc, xc], 0.0)

        return ((1 - fx) * (1 - fy) * pix(y0, x0) +
                fx * (1 - fy) * pix(y0, x0 + 1) +
                (1 - fx) * fy * pix(y0 + 1, x0) +
                fx * fy * pix(y0 + 1, x0 + 1))

    return jax.vmap(one)(centers, scales)


# numpy on purpose — a module-level jnp constant would initialize the
# XLA backend at import (breaks jax.distributed.initialize ordering).
ALPHAPOSE_MEAN = np.asarray([0.406, 0.457, 0.480],
                            np.float32)  # RGB (`simple_transform.py:98-100`)


def normalize_crops(crops: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB crops -> mean-subtracted (the reference's only norm)."""
    return crops - ALPHAPOSE_MEAN


def heatmap_to_coords(hms: jnp.ndarray, centers: jnp.ndarray,
                      scales: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    """Decode heatmaps (M, h, w, J) -> image coords (M, J, 2) + conf.

    centers/scales describe each crop's source box (already
    aspect-clipped & padded), so the inverse transform is the isotropic
    scale back about the box center (`transforms.py:710-714`).
    """
    M, h, w, J = hms.shape
    hm = jnp.transpose(hms, (0, 3, 1, 2))            # (M, J, h, w)
    flat = hm.reshape(M, J, -1)
    idx = jnp.argmax(flat, axis=-1)
    maxval = jnp.max(flat, axis=-1)
    px = (idx % w).astype(jnp.float32)
    py = (idx // w).astype(jnp.float32)

    # Quarter-pixel refinement by gradient sign (guarded to interior).
    pxi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    pyi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)

    def gather(hmj, yy, xx):
        return hmj[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]

    g = jax.vmap(jax.vmap(gather))
    dx = (g(hm, pyi, pxi + 1) - g(hm, pyi, pxi - 1))
    dy = (g(hm, pyi + 1, pxi) - g(hm, pyi - 1, pxi))
    interior = ((pxi > 1) & (pxi < w - 1) & (pyi > 1) & (pyi < h - 1))
    px = px + jnp.where(interior, jnp.sign(dx) * 0.25, 0.0)
    py = py + jnp.where(interior, jnp.sign(dy) * 0.25, 0.0)

    # Zero out non-positive maxima like `get_max_pred` (`:732-735`).
    mask = (maxval > 0).astype(jnp.float32)
    px = px * mask
    py = py * mask

    ratio = (scales[:, 0] / w)[:, None]              # (M, 1)
    x_img = (px - w * 0.5) * ratio + centers[:, 0:1]
    y_img = (py - h * 0.5) * ratio + centers[:, 1:2]
    return jnp.stack([x_img, y_img], axis=-1), maxval


def heatmap_to_coords_integral(hms: jnp.ndarray, centers: jnp.ndarray,
                               scales: jnp.ndarray,
                               norm_type: str = "softmax"
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integral-regression (soft-argmax) decode — the reference's
    `heatmap_to_coord_simple_regress` variant (`transforms.py:591-691`):
    normalize each heatmap, take the coordinate expectation, map the
    normalized prediction back through the same isotropic bbox
    transform.  Used by integral-loss model configs.
    """
    M, h, w, J = hms.shape
    hm = jnp.transpose(hms, (0, 3, 1, 2)).reshape(M, J, -1)
    if norm_type == "softmax":
        norm = jax.nn.softmax(hm, axis=-1)
        # Reference confidence for softmax norm is 1.0 per joint
        # (`_integral_tensor`, `transforms.py:656-660`).
        conf = jnp.ones((M, J), hms.dtype)
    else:  # sigmoid normalization
        norm = jax.nn.sigmoid(hm)
        # max of the sigmoid map BEFORE sum-normalization.
        conf = jnp.max(norm, axis=-1)
    p = norm / jnp.maximum(norm.sum(-1, keepdims=True), 1e-9)

    idx = jnp.arange(h * w)
    ix = (idx % w).astype(jnp.float32)
    iy = (idx // w).astype(jnp.float32)
    # (x_norm + 0.5) * w with x_norm = E[ix]/w - 0.5 cancels exactly to
    # E[ix] — no half-pixel offset (`transforms.py:628-631,676-681`).
    px = jnp.sum(p * ix, axis=-1)                    # (M, J)
    py = jnp.sum(p * iy, axis=-1)

    ratio = (scales[:, 0] / w)[:, None]
    x_img = (px - w * 0.5) * ratio + centers[:, 0:1]
    y_img = (py - h * 0.5) * ratio + centers[:, 1:2]
    return jnp.stack([x_img, y_img], axis=-1), conf


# Pairs of laterally-symmetric joints swapped under a horizontal flip.
# The reference's predictor exposes ONE list — the COCO-17 pairs
# (`alphapose_core/alphapose_core.py:249-253`) — and uses it even for
# the 26-joint halpe model (pairs beyond joint 16 are simply not
# swapped); reproduced as the default for checkpoint parity.
COCO_FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8),
                   (9, 10), (11, 12), (13, 14), (15, 16))
HALPE26_FLIP_PAIRS = COCO_FLIP_PAIRS + ((20, 21), (22, 23), (24, 25))
# MPII's 16-joint set (`alphapose/datasets/mpii.py:36-40`).  All of the
# reference's dataset classes are COCO-format json wrappers differing
# only in joint count + these pair tables; the COCO train/eval datasets
# here are joint-count generic, so pairs are the only per-set constant.
MPII16_FLIP_PAIRS = ((0, 5), (1, 4), (2, 3),
                     (10, 15), (11, 14), (12, 13))


def flip_pairs_for(num_joints: int, fmt=None):
    """Flip-pair table by format name or joint count.

    The reference carries these on its 15 dataset classes
    (`alphapose/datasets/*.py: joint_pairs`); the full family —
    halpe-68/136, coco-wholebody-133, hands — lives in the skeleton
    registry (`viz/skeletons.py`) and is resolved here for training
    augmentation and flip-test ensembling.  Narrower tables on wider
    heatmaps are legitimate (the reference's predictor uses the
    COCO-17 pairs on its 26-joint model); pairs that would index past
    the heatmap's channel axis are rejected up front instead of
    IndexError-ing mid-stream.
    """
    from ..viz.skeletons import skeleton_for
    pairs = skeleton_for(num_joints, fmt).flip_pairs
    top = max((max(a, b) for a, b in pairs), default=-1)
    if top >= num_joints:
        raise ValueError(
            f"format {fmt!r} flip pairs reach joint {top}; the model "
            f"outputs only {num_joints} joints")
    return pairs


def flip_heatmap(hms: jnp.ndarray, joint_pairs=COCO_FLIP_PAIRS,
                 shift: bool = True) -> jnp.ndarray:
    """Un-flip heatmaps predicted on horizontally-mirrored crops
    (`alphapose/utils/transforms.py:491-523`): flip the width axis,
    swap each symmetric joint pair's channels, then (shift=True) shift
    one pixel right — duplicating column 0 — to compensate the flip's
    half-pixel asymmetry before averaging with the unflipped pass.

    hms: (B, Hm, Wm, J) NHWC (torch's NCHW width flip == axis 2 here).

    Parity note: the reference's shift is an overlapping in-place copy
    (`out[..., 1:] = out[..., :-1]`, `transforms.py:519-523`) — UB on
    overlap: on CPU torch it cascades (smears column 0 across the whole
    row); on the CUDA tensors it actually runs on, the parallel copy
    approximates the intended one-pixel shift.  We implement the
    intended shift; the shift=False path is golden-tested bit-exact.
    """
    out = hms[:, :, ::-1, :]
    J = hms.shape[-1]
    perm = np.arange(J)
    for a, b in joint_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    out = out[..., jnp.asarray(perm)]
    if shift:
        out = jnp.concatenate([out[:, :, :1, :], out[:, :, :-1, :]],
                              axis=2)
    return out
