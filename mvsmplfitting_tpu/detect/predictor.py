"""Detection-frontend orchestration: images -> per-person 2D keypoints.

The TPU redesign of `code/keypoint_predict.py`: instead of per-image,
per-box Python loops through two GPU models, the whole camera set runs
as two batched jit calls (detector on letterboxed frames, pose net on
gathered crops), with only NMS and JSON writing on the host.  Output
keypoint JSONs are byte-compatible with the reference's format, so the
fitting stage consumes them unchanged.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.keypoints import save_keypoints_json
from .fastpose import FastPose
from .preprocess import (COCO_FLIP_PAIRS, bbox_to_center_scale,
                         crop_affine, flip_heatmap, heatmap_to_coords,
                         letterbox, normalize_crops)
from .yolox import YOLOX, postprocess_boxes


def cast_floats(tree, dtype):
    """Cast every float leaf (params + batch stats) to ``dtype``."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree)


def _make_apply(model, compute_dtype):
    """jitted apply, optionally running the net in a reduced compute
    dtype (bf16 doubles MXU throughput on TPU; the reference's fp16
    `.half()` analogue, `yolox/yolox.py:41-44`).  Inputs are cast in,
    outputs cast back to float32; decode/NMS stay fp32 on the host
    side."""
    if compute_dtype is None:
        return jax.jit(model.apply)

    def apply(params, x):
        out = model.apply(params, x.astype(compute_dtype))
        return jax.tree_util.tree_map(
            lambda o: o.astype(jnp.float32), out)
    return jax.jit(apply)


class PersonDetector:
    """YOLOX-X person detector (reference: `yolox/yolox.py:19-224`).

    ``compute_dtype=jnp.bfloat16`` runs the conv graph on the MXU's
    bf16 path (2x fp32 peak) — the TPU counterpart of the reference's
    ``fp16=True`` predictor mode.
    """

    def __init__(self, params=None, input_hw: Tuple[int, int] = (800, 1440),
                 conf_thresh: float = 0.1, nms_thresh: float = 0.45,
                 seed: int = 0, depth_mul: float = 1.33,
                 width_mul: float = 1.25, compute_dtype=None):
        self.model = YOLOX(input_hw=input_hw, depth_mul=depth_mul,
                           width_mul=width_mul)
        self.input_hw = input_hw
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh
        if params is None:
            dummy = jnp.zeros((1, *input_hw, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if compute_dtype is not None:
            params = cast_floats(params, compute_dtype)
        self.params = params
        self._apply = _make_apply(self.model, compute_dtype)

    def detect_batch(self, imgs: Sequence[np.ndarray]) -> List[np.ndarray]:
        """BGR uint8 images -> list of (M_i, 5) xyxy+score person boxes."""
        batch, ratios = [], []
        for img in imgs:
            padded, r = letterbox(img, self.input_hw)
            batch.append(padded)
            ratios.append(r)
        decoded = self._apply(self.params,
                              jnp.asarray(np.stack(batch)))
        out = []
        for dec, r in zip(np.asarray(decoded), ratios):
            boxes = postprocess_boxes(dec, self.conf_thresh,
                                      self.nms_thresh)
            boxes[:, :4] /= r
            out.append(boxes)
        return out


class PoseEstimator:
    """FastPose heatmap keypoints (reference:
    `alphapose_core/alphapose_core.py:19-226`)."""

    def __init__(self, params=None, num_joints: int = 26,
                 input_hw: Tuple[int, int] = (256, 192),
                 seed: int = 0, batch: int = 80,
                 use_pose_nms: bool = False, compute_dtype=None,
                 flip_test: bool = False,
                 joint_pairs=COCO_FLIP_PAIRS, model=None):
        self.model = model or FastPose(num_joints=num_joints)
        self.input_hw = input_hw
        self.batch = batch
        # Parametric pose NMS, off by default like the reference demo
        # (`alphapose_core.py:35-37`); enable for crowded scenes.
        self.use_pose_nms = use_pose_nms
        # Flip-test ensembling, also off by default (`:35-37`): each
        # chunk runs [crops; mirror(crops)], the mirrored heatmaps are
        # un-flipped/pair-swapped/shifted and averaged in
        # (`alphapose_core.py:85-91`).
        self.flip_test = flip_test
        self.joint_pairs = tuple(joint_pairs)
        if params is None:
            dummy = jnp.zeros((1, *input_hw, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if compute_dtype is not None:
            params = cast_floats(params, compute_dtype)
        self.params = params
        self._apply = _make_apply(self.model, compute_dtype)

    def estimate(self, img_rgb01: np.ndarray,
                 boxes_xyxy: np.ndarray) -> np.ndarray:
        """Image ([0,1] RGB) + boxes (M, 4) -> keypoints (M, J, 3)."""
        if len(boxes_xyxy) == 0:
            return np.zeros((0, self.model.num_joints, 3), np.float32)
        ih, iw = self.input_hw
        centers, scales = bbox_to_center_scale(
            boxes_xyxy[:, :4], aspect_ratio=iw / ih)
        crops = crop_affine(jnp.asarray(img_rgb01),
                            jnp.asarray(centers), jnp.asarray(scales),
                            self.input_hw)
        hms = []
        for i in range(0, crops.shape[0], self.batch):
            chunk = normalize_crops(crops[i:i + self.batch])
            if self.flip_test:
                n = chunk.shape[0]
                hm = self._apply(self.params, jnp.concatenate(
                    [chunk, chunk[:, :, ::-1, :]], axis=0))
                hm = 0.5 * (hm[:n] + flip_heatmap(hm[n:],
                                                  self.joint_pairs))
            else:
                hm = self._apply(self.params, chunk)
            hms.append(hm)
        hms = jnp.concatenate(hms, axis=0)
        coords, conf = heatmap_to_coords(hms, jnp.asarray(centers),
                                         jnp.asarray(scales))
        coords = np.asarray(coords)
        conf = np.asarray(conf)
        if self.use_pose_nms and coords.shape[0] > 1:
            from .pose_nms import pose_nms
            scores = (boxes_xyxy[:, 4] if boxes_xyxy.shape[1] > 4
                      else np.ones(len(boxes_xyxy), np.float32))
            _, coords, conf = pose_nms(
                np.asarray(boxes_xyxy[:, :4], np.float32), scores,
                coords, conf)
        return np.concatenate(
            [coords, conf[..., None]], axis=-1).astype(np.float32)


class KeypointPipeline:
    """Detector + pose net + JSON writer (= `keypoint_predict.py`)."""

    def __init__(self, detector: Optional[PersonDetector] = None,
                 pose: Optional[PoseEstimator] = None):
        self.detector = detector or PersonDetector()
        self.pose = pose or PoseEstimator()

    def process_images(self, img_paths: Sequence[str],
                       keyp_root: str, serial: str,
                       cam_names: Sequence[str]) -> None:
        """Run detection + pose per view, write OpenPose JSONs."""
        import cv2

        imgs = [cv2.imread(p) for p in img_paths]
        boxes_per_view = self.detector.detect_batch(imgs)
        for cam, path, img, boxes in zip(cam_names, img_paths, imgs,
                                         boxes_per_view):
            rgb01 = img[:, :, ::-1].astype(np.float32) / 255.0
            kps = self.pose.estimate(rgb01, boxes)     # (P, J, 3)
            stem = os.path.splitext(os.path.basename(path))[0]
            out = os.path.join(keyp_root, serial, cam,
                               stem + "_keypoints.json")
            save_keypoints_json(out, kps)
