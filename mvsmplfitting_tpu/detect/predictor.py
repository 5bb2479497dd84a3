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


class SmplPoseEstimator:
    """HybrIK-style direct SMPL regression from person crops.

    The model side of the reference's SMPL streaming demo
    (`alphapose_core/alphapose/utils/writer_smpl.py` +
    `models/simple3dposeSMPLWithCam.py`): each box is cropped, the
    Simple3DPoseSMPLCam net regresses a 29-joint uvd skeleton, shape,
    twists and a weak-perspective camera, and the analytical
    twist-and-swing IK (`models/hybrik.py`) poses the SMPL body.  All
    people across a frame run as one batched jit call; IK + LBS are a
    second vmapped jit.
    """

    def __init__(self, params=None, assets=None,
                 input_hw: Tuple[int, int] = (256, 256),
                 seed: int = 0, batch: int = 16,
                 focal_length: float = 1000.0, depth_factor: float = 2.0,
                 compute_dtype=None):
        from ..models.assets import synthetic_smpl
        from ..models.hybrik import forward_rotmats, hybrik_ik
        from .hybrik import Simple3DPoseSMPLCam, uvd_to_xyz

        ih, iw = input_hw
        self.model = Simple3DPoseSMPLCam(
            width_dim=iw // 4, height_dim=ih // 4,
            focal_length=focal_length, input_size=float(ih),
            depth_factor=depth_factor)
        self.input_hw = input_hw
        self.batch = batch
        self.focal_length = focal_length
        self.depth_factor = depth_factor
        # The real SMPL pkl is license-gated; the synthetic body keeps
        # shapes/semantics (swap in `load_smpl(...)` assets for output
        # meshes that are actual human bodies).
        self.assets = assets if assets is not None else synthetic_smpl()
        self.faces = np.asarray(self.assets.faces)
        if params is None:
            dummy = jnp.zeros((1, *input_hw, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        if compute_dtype is not None:
            params = cast_floats(params, compute_dtype)
        self.params = params
        self._apply = _make_apply(self.model, compute_dtype)

        assets_ = self.assets

        def _bodies(uvd, phis, betas, cam):
            xyz, root = uvd_to_xyz(uvd, cam, focal_length,
                                   float(ih), depth_factor)
            skel = xyz * depth_factor            # root-relative meters

            def one(sk, ph, be):
                # cos/sin twists are normalized before use
                # (`simple3dposeSMPLWithCam.py` HybrIK layer contract).
                ph = ph / jnp.clip(
                    jnp.linalg.norm(ph, axis=-1, keepdims=True), 1e-8)
                rots = hybrik_ik(assets_, sk, be, ph)
                verts, _ = forward_rotmats(assets_, be, rots)
                return verts

            return jax.vmap(one)(skel, phis, betas), xyz, root

        self._bodies = jax.jit(_bodies)

    def estimate(self, img_rgb01: np.ndarray, boxes_xyxy: np.ndarray):
        """Image ([0,1] RGB) + boxes (M, >=4) -> per-person dict.

        Returns keys (shapes for M people, V template verts):
          ``keypoints`` (M, 29, 2) image-space uv joints — the
          reference's width-only crop scaling (`writer_smpl.py:108-114`;
          exact for its square crops), ``kp_score`` (M, 29, 1) =
          ``1 - maxvals`` (quirk at `:116`), ``pred_xyz_jts`` (M, 24, 3)
          root-relative joints in the model's depth_factor-normalized
          units — the reference's writer dumps `pred_xyz_jts_24`
          verbatim (`writer_smpl.py:109`), so the JSON unit matches;
          multiply by ``self.depth_factor`` for meters —,
          ``verts`` (M, V, 3) camera-frame
          meshes, ``proposal_score`` (M,) =
          mean(kp) + box + 1.25*max(kp) (`:131`), plus ``centers`` /
          ``scales`` of the crops.
        """
        J = self.model.num_joints
        if len(boxes_xyxy) == 0:
            z = np.zeros
            return {"keypoints": z((0, J, 2), np.float32),
                    "kp_score": z((0, J, 1), np.float32),
                    "pred_xyz_jts": z((0, 24, 3), np.float32),
                    "verts": z((0, len(self.assets.v_template), 3),
                               np.float32),
                    "proposal_score": z((0,), np.float32),
                    "centers": z((0, 2), np.float32),
                    "scales": z((0, 2), np.float32)}
        ih, iw = self.input_hw
        centers, scales = bbox_to_center_scale(
            boxes_xyxy[:, :4], aspect_ratio=iw / ih)
        crops = crop_affine(jnp.asarray(img_rgb01),
                            jnp.asarray(centers), jnp.asarray(scales),
                            self.input_hw)
        outs = []
        for i in range(0, crops.shape[0], self.batch):
            chunk = normalize_crops(crops[i:i + self.batch])
            outs.append(self._apply(self.params, chunk))
        out = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        verts, xyz, root = self._bodies(
            out["pred_uvd_jts"], out["pred_phi"], out["pred_shape"],
            out["pred_camera"])

        uvd = np.asarray(out["pred_uvd_jts"])
        kp_score = 1.0 - np.asarray(out["maxvals"])
        # Width-only scaling of BOTH axes (`writer_smpl.py:112-114`).
        uv_img = (uvd[:, :, :2] * scales[:, None, 0:1]
                  + centers[:, None, :])
        box_score = (boxes_xyxy[:, 4]
                     if boxes_xyxy.shape[1] > 4
                     else np.ones(len(boxes_xyxy), np.float32))
        proposal = (kp_score.mean((1, 2)) + box_score
                    + 1.25 * kp_score.max((1, 2)))
        verts_cam = np.asarray(verts) + np.asarray(root)[:, None, :]
        return {"keypoints": uv_img.astype(np.float32),
                "kp_score": kp_score.astype(np.float32),
                "pred_xyz_jts": np.asarray(xyz)[:, :24
                                                ].astype(np.float32),
                "verts": verts_cam.astype(np.float32),
                "proposal_score": proposal.astype(np.float32),
                "centers": centers.astype(np.float32),
                "scales": scales.astype(np.float32)}


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
