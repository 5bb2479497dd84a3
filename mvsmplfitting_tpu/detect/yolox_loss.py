"""YOLOX training losses with static-shape SimOTA assignment.

TPU-native rebuild of the reference's training-loss branch:
`yolox/models/yolo_head.py:255-425` (``get_losses``), `:440-535`
(``get_assignments``), `:537-628` (``get_in_boxes_info``), `:630-660`
(``dynamic_k_matching``), `yolox/models/losses.py:10-53` (``IOUloss``)
and `yolox/utils/boxes.py:75-98` (``bboxes_iou``).

The reference compacts candidate anchors with boolean indexing and
Python-loops ground truths per image on the host — shapes change every
step, which would retrace under XLA.  Here every stage is a fixed-shape
masked tensor op:

- labels are ``(N, MAXG, 5)`` rows ``[cls, cx, cy, w, h]``; all-zero
  rows are padding (the reference's ``nlabel`` rule, `yolo_head.py:276`);
- the SimOTA cost lives on the full ``(G, A)`` grid — non-candidate
  anchors and padded gts carry a ``1e9`` sentinel on top of the
  reference's own ``100000.0`` center-gate penalty, so the rank-based
  dynamic-k selection (``argsort(argsort(cost)) < k``) picks exactly the
  anchors the reference's per-gt ``topk`` would;
- the whole assignment vmaps over the batch and jits.

Verified against the reference's own torch ``get_losses`` in
`tests/test_train.py` (golden, random inputs).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Cost sentinel for anchors/gts SimOTA must never select.  The
# reference's largest legitimate cost component is the 100000.0
# center-gate penalty plus O(100) bce/iou terms, so 1e9 dominates.
_BIG = 1e9


def anchor_info(input_hw: Tuple[int, int],
                strides: Sequence[int] = (8, 16, 32),
                dtype=jnp.float32):
    """Per-anchor (x_shift, y_shift, stride), flattened over all levels.

    Matches the torch head's ``x_shifts``/``y_shifts``/
    ``expanded_strides`` accumulation (`yolo_head.py:170-186,221-236`):
    shifts are grid coordinates (not yet scaled by stride).
    """
    h, w = input_hw
    xs, ys, ss = [], [], []
    for s in strides:
        hs, ws = h // s, w // s
        yy, xx = jnp.meshgrid(jnp.arange(hs), jnp.arange(ws), indexing="ij")
        xs.append(xx.reshape(-1))
        ys.append(yy.reshape(-1))
        ss.append(jnp.full((hs * ws,), s))
    return (jnp.concatenate(xs).astype(dtype),
            jnp.concatenate(ys).astype(dtype),
            jnp.concatenate(ss).astype(dtype))


def bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogitsLoss(reduction='none') (`yolo_head.py:91`)."""
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _bce_probs(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.binary_cross_entropy`` on probabilities, with its
    log-clamp at -100 (`yolo_head.py:503-505` cls cost)."""
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(t * logp + (1.0 - t) * log1mp)


def pairwise_iou_xywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(G, 4) x (A, 4) center-format IoU — ``bboxes_iou(..., xyxy=False)``
    (`yolox/utils/boxes.py:75-98`; note: NO eps in the union)."""
    tl = jnp.maximum(a[:, None, :2] - a[:, None, 2:] / 2,
                     b[None, :, :2] - b[None, :, 2:] / 2)
    br = jnp.minimum(a[:, None, :2] + a[:, None, 2:] / 2,
                     b[None, :, :2] + b[None, :, 2:] / 2)
    area_a = jnp.prod(a[:, 2:], axis=1)
    area_b = jnp.prod(b[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=2).astype(a.dtype)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
             loss_type: str = "iou") -> jnp.ndarray:
    """Elementwise matched-pair IoU loss — ``IOUloss(reduction='none')``
    (`yolox/models/losses.py:10-53`; eps 1e-16 in the union here, unlike
    the pairwise assignment IoU)."""
    tl = jnp.maximum(pred[:, :2] - pred[:, 2:] / 2,
                     target[:, :2] - target[:, 2:] / 2)
    br = jnp.minimum(pred[:, :2] + pred[:, 2:] / 2,
                     target[:, :2] + target[:, 2:] / 2)
    area_p = jnp.prod(pred[:, 2:], axis=1)
    area_g = jnp.prod(target[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, axis=1) * en
    iou = area_i / (area_p + area_g - area_i + 1e-16)
    if loss_type == "iou":
        return 1.0 - iou ** 2
    if loss_type == "giou":
        c_tl = jnp.minimum(pred[:, :2] - pred[:, 2:] / 2,
                           target[:, :2] - target[:, 2:] / 2)
        c_br = jnp.maximum(pred[:, :2] + pred[:, 2:] / 2,
                           target[:, :2] + target[:, 2:] / 2)
        area_c = jnp.prod(c_br - c_tl, axis=1)
        # The reference subtracts area_i (not the union) here —
        # reproduced as-is (`losses.py:45`).
        giou = iou - (area_c - area_i) / jnp.maximum(area_c, 1e-16)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(f"unknown iou loss type {loss_type!r}")


def _in_boxes_info(gt_boxes, gt_valid, x_shifts, y_shifts, strides,
                   img_hw):
    """``get_in_boxes_info`` (`yolo_head.py:537-628`) on the full (G, A)
    grid.  Returns (fg_candidate (A,), in_box (G,A), in_center (G,A))."""
    xc = (x_shifts + 0.5) * strides            # anchor centers, px
    yc = (y_shifts + 0.5) * strides
    gx, gy = gt_boxes[:, 0:1], gt_boxes[:, 1:2]
    gw, gh = gt_boxes[:, 2:3], gt_boxes[:, 3:4]

    b_l = xc[None, :] - (gx - 0.5 * gw)
    b_r = (gx + 0.5 * gw) - xc[None, :]
    b_t = yc[None, :] - (gy - 0.5 * gh)
    b_b = (gy + 0.5 * gh) - yc[None, :]
    in_box = (jnp.minimum(jnp.minimum(b_l, b_r),
                          jnp.minimum(b_t, b_b)) > 0.0)
    in_box &= gt_valid[:, None]

    # Fixed-radius center gate; gt centers clipped to the image
    # (`yolo_head.py:594-599`).
    r = 2.5
    h, w = img_hw
    cgx = jnp.clip(gx, 0.0, float(w))
    cgy = jnp.clip(gy, 0.0, float(h))
    c_l = xc[None, :] - (cgx - r * strides[None, :])
    c_r = (cgx + r * strides[None, :]) - xc[None, :]
    c_t = yc[None, :] - (cgy - r * strides[None, :])
    c_b = (cgy + r * strides[None, :]) - yc[None, :]
    in_ctr = (jnp.minimum(jnp.minimum(c_l, c_r),
                          jnp.minimum(c_t, c_b)) > 0.0)
    in_ctr &= gt_valid[:, None]

    fg_candidate = jnp.any(in_box, axis=0) | jnp.any(in_ctr, axis=0)
    return fg_candidate, in_box, in_ctr


def simota_assign(bbox_pred, obj_logit, cls_logit, labels, x_shifts,
                  y_shifts, strides, img_hw):
    """One image's SimOTA assignment (``get_assignments`` +
    ``dynamic_k_matching``, `yolo_head.py:440-535,630-660`) with static
    shapes.

    Args:
      bbox_pred:  (A, 4) decoded center-xywh boxes in input pixels.
      obj_logit:  (A,)   objectness logits.
      cls_logit:  (A, C) class logits.
      labels:     (G, 5) ``[cls, cx, cy, w, h]``; zero rows = padding.

    Returns dict with ``fg`` (A,) bool, ``matched_gt`` (A,) int32,
    ``pred_iou`` (A,), ``num_fg`` and ``num_gt`` scalars.
    """
    G = labels.shape[0]
    num_classes = cls_logit.shape[-1]
    gt_valid = jnp.sum(labels, axis=1) > 0          # nlabel rule
    gt_boxes = labels[:, 1:5]
    gt_cls = labels[:, 0].astype(jnp.int32)

    fg_cand, in_box, in_ctr = _in_boxes_info(
        gt_boxes, gt_valid, x_shifts, y_shifts, strides, img_hw)
    both = in_box & in_ctr

    ious = pairwise_iou_xywh(gt_boxes, bbox_pred)           # (G, A)
    iou_cost = -jnp.log(ious + 1e-8)

    # cls cost: BCE(sqrt(sigmoid(cls) * sigmoid(obj)), one-hot), summed
    # over classes (`yolo_head.py:498-506`).
    p = jnp.sqrt(jax.nn.sigmoid(cls_logit) *
                 jax.nn.sigmoid(obj_logit)[:, None])        # (A, C)
    onehot = jax.nn.one_hot(gt_cls, num_classes,
                            dtype=bbox_pred.dtype)          # (G, C)
    cls_cost = (_bce_probs(p[None, :, :], onehot[:, None, :])
                .sum(axis=-1))                              # (G, A)

    cost = (cls_cost + 3.0 * iou_cost
            + 100000.0 * (~both)
            + _BIG * (~fg_cand)[None, :]
            + _BIG * (~gt_valid)[:, None])

    # dynamic k: sum of top-10 candidate IoUs, truncated, >= 1
    # (`yolo_head.py:633-639`).  Padding non-candidates with IoU 0
    # leaves the sum identical to the reference's compacted topk.
    iou_for_k = jnp.where(gt_valid[:, None] & fg_cand[None, :], ious, 0.0)
    k_cand = min(10, iou_for_k.shape[1])
    topk = jax.lax.top_k(iou_for_k, k_cand)[0]
    dynamic_k = jnp.clip(topk.sum(axis=1).astype(jnp.int32), 1, None)

    # per-gt "k lowest-cost anchors" as a rank threshold.
    ranks = jnp.argsort(jnp.argsort(cost, axis=1), axis=1)
    match = (ranks < dynamic_k[:, None]) & (cost < 1e8)

    # conflict resolution: anchors claimed by >1 gt keep only the
    # cheapest gt (`yolo_head.py:646-650`).
    n_match = match.sum(axis=0)
    cost_valid = jnp.where(gt_valid[:, None], cost, jnp.inf)
    best_gt = jnp.argmin(cost_valid, axis=0)                # (A,)
    only_best = jax.nn.one_hot(best_gt, G, dtype=bool).T    # (G, A)
    match = jnp.where(n_match[None, :] > 1, only_best & match.any(0),
                      match)

    fg = match.any(axis=0)
    matched_gt = jnp.argmax(match, axis=0).astype(jnp.int32)
    pred_iou = (match * ious).sum(axis=0)
    return {
        "fg": fg,
        "matched_gt": matched_gt,
        "pred_iou": pred_iou,
        "num_fg": fg.sum(),
        "num_gt": gt_valid.sum(),
    }


def yolox_losses(decoded, labels, input_hw,
                 strides: Sequence[int] = (8, 16, 32),
                 origin_reg=None, use_l1: bool = False,
                 iou_type: str = "iou"):
    """Batch YOLOX training loss — ``get_losses`` (`yolo_head.py:255-425`).

    Args:
      decoded:    (N, A, 5+C) decoded boxes + obj/cls LOGITS (the
                  ``YOLOX(train_outputs=True)`` output).
      labels:     (N, MAXG, 5) ``[cls, cx, cy, w, h]``, zero rows pad.
      origin_reg: (N, A, 4) raw reg predictions (for the L1 branch).

    Returns dict: total / iou / obj / cls / l1 losses and fg ratio,
    with the reference's ``reg_weight=5.0`` and the shared
    ``num_fg = max(total fg, 1)`` normalizer.
    """
    bbox_pred = decoded[..., :4]
    obj_logit = decoded[..., 4]
    cls_logit = decoded[..., 5:]
    num_classes = cls_logit.shape[-1]
    x_shifts, y_shifts, stride_arr = anchor_info(
        input_hw, strides, dtype=decoded.dtype)

    assign = jax.vmap(
        lambda b, o, c, l: simota_assign(b, o, c, l, x_shifts, y_shifts,
                                         stride_arr, input_hw)
    )(bbox_pred, obj_logit, cls_logit, labels)

    fg = assign["fg"]                                        # (N, A)
    matched = assign["matched_gt"]                           # (N, A)
    pred_iou = assign["pred_iou"]
    num_fg = jnp.maximum(fg.sum().astype(decoded.dtype), 1.0)
    num_gts = jnp.maximum(assign["num_gt"].sum().astype(decoded.dtype),
                          1.0)

    take = jax.vmap(lambda l, m: l[m])                       # gt gather
    reg_target = take(labels[..., 1:5], matched)             # (N, A, 4)
    gt_cls = take(labels[..., 0].astype(jnp.int32)[..., None],
                  matched)[..., 0]                           # (N, A)

    fgf = fg.astype(decoded.dtype)
    loss_iou = (iou_loss(bbox_pred.reshape(-1, 4),
                         reg_target.reshape(-1, 4), iou_type)
                .reshape(fg.shape) * fgf).sum() / num_fg
    loss_obj = bce_with_logits(obj_logit, fgf).sum() / num_fg
    cls_target = (jax.nn.one_hot(gt_cls, num_classes,
                                 dtype=decoded.dtype)
                  * pred_iou[..., None])
    loss_cls = (bce_with_logits(cls_logit, cls_target)
                * fgf[..., None]).sum() / num_fg

    if use_l1:
        if origin_reg is None:
            raise ValueError("use_l1 requires origin_reg")
        # get_l1_target (`yolo_head.py:428-434`).
        l1_t = jnp.stack([
            reg_target[..., 0] / stride_arr - x_shifts,
            reg_target[..., 1] / stride_arr - y_shifts,
            jnp.log(reg_target[..., 2] / stride_arr + 1e-8),
            jnp.log(reg_target[..., 3] / stride_arr + 1e-8),
        ], axis=-1)
        loss_l1 = (jnp.abs(origin_reg - l1_t)
                   * fgf[..., None]).sum() / num_fg
    else:
        loss_l1 = jnp.asarray(0.0, decoded.dtype)

    reg_weight = 5.0
    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total": total,
        "iou": reg_weight * loss_iou,
        "obj": loss_obj,
        "cls": loss_cls,
        "l1": loss_l1,
        "fg_ratio": num_fg / num_gts,   # clamped num_fg, as the reference
        "num_fg": num_fg,
    }
