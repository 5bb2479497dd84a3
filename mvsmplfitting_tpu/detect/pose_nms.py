"""Parametric pose NMS (AlphaPose pPose-NMS) — numpy, body variant.

Faithful restatement of `alphapose_core/alphapose/utils/pPose_nms.py`
`pose_nms_body` (`:242-330`) with the same constants (`:13-19`):
greedy highest-score pick, candidates eliminated when the parametric
similarity exceeds gamma or >= matchThreds keypoints fall within the
reference distance (PCK match), then score-weighted merging of the
eliminated cluster (`p_merge_fast`, `:533-570`).  Off by default in the
demo predictor (`alphapose_core.py:35-37`), provided for multi-person
scenes with overlapping detections.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

DELTA1 = 1.0
MU = 1.7
DELTA2 = 2.65
GAMMA = 22.48
SCORE_THRESH = 0.3
MATCH_THRESH = 5
ALPHA = 0.1


def _parametric_distance(pick: int, preds: np.ndarray,
                         scores: np.ndarray) -> np.ndarray:
    """Similarity of every pose to the picked one (`:573-610`)."""
    dist = np.linalg.norm(preds[pick][None] - preds, axis=2)  # (n, K)
    mask = dist <= 1
    score_dists = np.zeros_like(dist)
    pick_scores = scores[pick][None]                           # (1, K)
    sd = np.tanh(pick_scores / DELTA1) * np.tanh(scores / DELTA1)
    score_dists[mask] = sd[mask]
    point_dist = np.exp(-dist / DELTA2)
    return score_dists.sum(axis=1) + MU * point_dist.sum(axis=1)


def _pck_match(pick: int, preds: np.ndarray,
               ref_dist: float) -> np.ndarray:
    dist = np.linalg.norm(preds[pick][None] - preds, axis=2)
    return (dist / min(ref_dist, 7) <= 1).sum(axis=1)


def _merge(ref_pose: np.ndarray, cluster_preds: np.ndarray,
           cluster_scores: np.ndarray, ref_dist: float
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Score-weighted cluster merge (`p_merge_fast`)."""
    dist = np.linalg.norm(ref_pose[None] - cluster_preds, axis=2)
    mask = dist <= min(ref_dist, 15)
    masked = cluster_scores * mask
    denom = masked.sum(axis=0)
    denom = np.where(denom > 0, denom, 1e-9)
    normed = masked / denom
    pose = (cluster_preds * normed[..., None]).sum(axis=0)
    score = (cluster_scores * normed).sum(axis=0)
    return pose, score


def pose_nms(boxes: np.ndarray, box_scores: np.ndarray,
             poses: np.ndarray, pose_scores: np.ndarray,
             area_thresh: float = 0.0
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run pPose-NMS over detections of one image.

    Args:
      boxes: (n, 4) xyxy; box_scores: (n,);
      poses: (n, K, 2); pose_scores: (n, K).

    Returns:
      (kept boxes (m, 4), merged poses (m, K, 2), merged scores (m, K)).
    """
    n = poses.shape[0]
    if n == 0:
        return boxes, poses, pose_scores
    pose_scores = np.where(pose_scores == 0, 1e-5, pose_scores)

    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ref_dists = ALPHA * np.maximum(widths, heights)
    human_scores = pose_scores.mean(axis=1)

    alive = np.ones(n, bool)
    picks: List[int] = []
    merge_sets: List[np.ndarray] = []
    while alive.any():
        ids = np.flatnonzero(alive)
        local_pick = int(np.argmax(human_scores[ids]))
        pick = ids[local_pick]
        picks.append(pick)

        simi = _parametric_distance(local_pick, poses[ids],
                                    pose_scores[ids])
        matches = _pck_match(local_pick, poses[ids],
                             float(ref_dists[pick]))
        delete = (simi > GAMMA) | (matches >= MATCH_THRESH)
        if not delete.any():
            delete = np.zeros(len(ids), bool)
            delete[local_pick] = True
        merge_sets.append(ids[delete])
        alive[ids[delete]] = False

    out_boxes, out_poses, out_scores = [], [], []
    for pick, cluster in zip(picks, merge_sets):
        if pose_scores[pick].max() < SCORE_THRESH:
            continue
        pose, score = _merge(poses[pick], poses[cluster],
                             pose_scores[cluster],
                             float(ref_dists[pick]))
        if score.max() < SCORE_THRESH:
            continue
        xmin, ymin = pose.min(axis=0)
        xmax, ymax = pose.max(axis=0)
        if 1.5 ** 2 * (xmax - xmin) * (ymax - ymin) < area_thresh:
            continue
        out_boxes.append(boxes[pick])
        out_poses.append(pose)
        out_scores.append(score)

    if not out_poses:
        return (np.zeros((0, 4), np.float32),
                np.zeros((0,) + poses.shape[1:], np.float32),
                np.zeros((0, poses.shape[1]), np.float32))
    return (np.stack(out_boxes), np.stack(out_poses),
            np.stack(out_scores))
