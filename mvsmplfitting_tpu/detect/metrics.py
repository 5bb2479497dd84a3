"""Pose-estimation evaluation metrics: heatmap PCK and OKS keypoint AP.

Rebuild of the reference's eval yardsticks
(`alphapose_core/alphapose/utils/metrics.py`):

* `heatmap_pck` == `calc_accuracy` (`metrics.py:125-152`): argmax the
  predicted and label heatmaps (`transforms.py:739-759`), normalize
  distances by (W, H)/10, count the fraction under threshold 0.5 per
  joint (joints whose label coords are <= 1 are invisible and
  excluded, `metrics.py:231-243`), then average over joints that had
  any visible sample.
* `keypoint_oks` / `keypoint_map`: OKS-based AP. The reference defers
  to pycocotools (`evaluate_mAP`, `metrics.py:64-119`) which is not in
  this environment, so the COCO OKS formula and the 0.50:0.05:0.95 AP
  protocol (greedy score-ordered matching per image) are implemented
  natively — same math, no external dep.

Numpy on purpose: this is offline eval, not the fitting hot path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# COCO keypoint per-joint falloff constants (k_i = 2 * sigma_i).
COCO_SIGMAS = np.asarray([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089], np.float32)


def max_preds(heatmaps: np.ndarray):
    """Argmax decode of (N, J, H, W) heatmaps -> ((N, J, 2) xy, maxvals).

    Matches `transforms.py:739-759` (zeroed where the max is <= 0).
    """
    N, J, _, W = heatmaps.shape
    flat = heatmaps.reshape(N, J, -1)
    idx = np.argmax(flat, 2)
    maxvals = np.max(flat, 2)[..., None]
    preds = np.stack([idx % W, idx // W], -1).astype(np.float32)
    preds *= (maxvals > 0.0)
    return preds, maxvals


def _pck_from_coords(preds: np.ndarray, labels: np.ndarray,
                     norm: np.ndarray, thr: float = 0.5) -> float:
    """`calc_dist` + `dist_acc` + joint averaging (`metrics.py:140-152,
    229-252`): visible = label x AND y > 1."""
    visible = (labels[..., 0] > 1) & (labels[..., 1] > 1)   # (N, J)
    d = np.linalg.norm((preds - labels) / norm[:, None, :], axis=-1)
    acc_sum, cnt = 0.0, 0
    for j in range(preds.shape[1]):
        vis = visible[:, j]
        if vis.sum() > 0:
            acc_sum += float((d[vis, j] < thr).mean())
            cnt += 1
    return acc_sum / cnt if cnt else 0.0


def heatmap_pck(pred_hms: np.ndarray, label_hms: np.ndarray,
                thr: float = 0.5) -> float:
    """PCK between two heatmap batches — `calc_accuracy` parity."""
    pred_hms = np.asarray(pred_hms)
    label_hms = np.asarray(label_hms)
    H, W = pred_hms.shape[2], pred_hms.shape[3]
    preds, _ = max_preds(pred_hms)
    labels, _ = max_preds(label_hms)
    norm = np.ones((pred_hms.shape[0], 2)) * np.asarray([W, H]) / 10
    return _pck_from_coords(preds, labels, norm, thr)


def keypoint_oks(pred: np.ndarray, gt: np.ndarray, area: float,
                 vis: Optional[np.ndarray] = None,
                 sigmas: Optional[np.ndarray] = None) -> float:
    """COCO object-keypoint-similarity of one (J, 2) prediction."""
    sigmas = COCO_SIGMAS if sigmas is None else np.asarray(sigmas)
    if vis is None:
        vis = np.ones(gt.shape[0], bool)
    if vis.sum() == 0:
        return 0.0
    d2 = np.sum((pred - gt) ** 2, -1)
    k2 = (2 * sigmas) ** 2
    e = d2 / (2 * max(area, 1e-9) * k2)
    return float(np.mean(np.exp(-e[vis])))


def keypoint_map(predictions: Sequence[dict], groundtruths: Sequence[dict],
                 sigmas: Optional[np.ndarray] = None,
                 thresholds: Optional[np.ndarray] = None) -> float:
    """OKS mean AP over thresholds 0.50:0.05:0.95.

    Args:
      predictions: per-image dicts {"keypoints": (K, J, 2),
        "scores": (K,)}.
      groundtruths: per-image dicts {"keypoints": (M, J, 2),
        "areas": (M,), optional "vis": (M, J) bool}.

    Greedy matching: predictions sorted by score; each matches its
    highest-OKS unmatched GT if OKS >= threshold (pycocotools
    protocol, minus the size-stratified variants).
    """
    if thresholds is None:
        thresholds = np.arange(0.5, 1.0, 0.05)

    # Per-threshold match flags across the whole dataset.
    all_scores = []
    all_matches = {t: [] for t in thresholds}
    total_gt = 0
    for pred, gt in zip(predictions, groundtruths):
        kps = np.asarray(pred["keypoints"], np.float32)   # (K, J, 2)
        scores = np.asarray(pred.get("scores",
                                     np.ones(len(kps))), np.float32)
        gkps = np.asarray(gt["keypoints"], np.float32)
        areas = np.asarray(gt.get("areas", np.ones(len(gkps))),
                           np.float32)
        viss = gt.get("vis")
        total_gt += len(gkps)

        order = np.argsort(-scores)
        oks_mat = np.zeros((len(kps), len(gkps)))
        for i in range(len(kps)):
            for m in range(len(gkps)):
                v = None if viss is None else np.asarray(viss[m])
                oks_mat[i, m] = keypoint_oks(kps[i], gkps[m],
                                             float(areas[m]), v, sigmas)
        for t in thresholds:
            used = np.zeros(len(gkps), bool)
            for i in order:
                best, best_m = t, -1
                for m in range(len(gkps)):
                    if not used[m] and oks_mat[i, m] >= best:
                        best, best_m = oks_mat[i, m], m
                matched = best_m >= 0
                if matched:
                    used[best_m] = True
                all_matches[t].append(matched)
        all_scores.extend(scores[order])

    if total_gt == 0 or not all_scores:
        return 0.0

    # 101-point interpolated AP per threshold, averaged.
    order = np.argsort(-np.asarray(all_scores))
    aps = []
    for t in thresholds:
        tp = np.asarray(all_matches[t], float)[order]
        fp = 1.0 - tp
        ctp, cfp = np.cumsum(tp), np.cumsum(fp)
        recall = ctp / total_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            p = precision[recall >= r]
            ap += (p.max() if len(p) else 0.0) / 101
        aps.append(ap)
    return float(np.mean(aps))
