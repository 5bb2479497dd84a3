"""Streaming detection: video/webcam/image-dir sources -> keypoints.

The reference's streaming infra
(`alphapose_core/alphapose/utils/detector.py`, `file_detector.py`,
`webcam_detector.py`, `writer.py`) is a stack of torch multiprocessing
queues feeding per-frame GPU calls.  On TPU the natural shape is
chunked batching: frames accumulate into fixed-size batches, the
detector runs one jitted call per chunk, and the pose net batches all
crops — the host only decodes/draws/writes.

`run_stream` is the `DetectionLoader`+`DataWriter` pipeline in one
call: source -> PersonDetector -> PoseEstimator -> per-frame OpenPose
JSONs (the writer contract the fitting data layer consumes) and an
optional annotated video.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def frame_source(src, max_frames: int = 0
                 ) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_idx, BGR uint8) from a video file, a webcam index,
    or a directory of images.

    - str path to a directory -> sorted image files
      (`file_detector.py` semantics);
    - str path to a video file -> cv2.VideoCapture frames;
    - int -> live camera index (`webcam_detector.py`).
    """
    import cv2

    if isinstance(src, str) and os.path.isdir(src):
        names = sorted(n for n in os.listdir(src)
                       if n.lower().endswith((".jpg", ".jpeg", ".png",
                                              ".bmp")))
        for i, n in enumerate(names):
            if max_frames and i >= max_frames:
                return
            img = cv2.imread(os.path.join(src, n))
            if img is not None:
                yield i, img
        return

    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise IOError(f"cannot open stream {src!r}")
    try:
        i = 0
        while True:
            if max_frames and i >= max_frames:
                return
            ok, img = cap.read()
            if not ok:
                return
            yield i, img
            i += 1
    finally:
        cap.release()


def open_video_writer(path: str, fps: float, size_wh):
    """cv2.VideoWriter with mp4v -> MJPG/avi fallback (the writer
    role of `alphapose/utils/writer.py`); raises if neither codec
    opens instead of silently dropping every frame."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, tuple(size_wh))
    if not writer.isOpened():
        writer = cv2.VideoWriter(
            os.path.splitext(path)[0] + ".avi",
            cv2.VideoWriter_fourcc(*"MJPG"), fps, tuple(size_wh))
    if not writer.isOpened():
        raise IOError(f"no video codec available for {path!r}")
    return writer


def parse_source(src: str):
    """CLI video-source string -> frame_source arg (digit = webcam)."""
    return int(src) if isinstance(src, str) and src.isdigit() else src


def run_stream(src, detector=None, pose=None, *,
               out_json_dir: Optional[str] = None,
               out_video: Optional[str] = None,
               serial: str = "stream", chunk: int = 4,
               max_frames: int = 0, fps: float = 30.0,
               draw: bool = True,
               results_dir: Optional[str] = None,
               results_form: Optional[str] = None,
               for_eval: bool = False) -> int:
    """Detect + pose every frame of ``src``; write per-frame OpenPose
    JSONs (`<out_json_dir>/<serial>/<%06d>_keypoints.json`, the
    `writer.py` role) and optionally an annotated video.
    ``results_dir`` additionally writes the reference's aggregated
    results file (`pose_nms.write_results_json`; ``results_form``
    None/"cmu"/"open", ``for_eval`` numeric COCO image ids).

    Returns the number of frames processed.
    """
    from ..data.keypoints import save_keypoints_json
    from ..viz.overlay import draw_keypoints
    from .predictor import PersonDetector, PoseEstimator

    detector = detector or PersonDetector()
    pose = pose or PoseEstimator()

    writer = None
    n = 0
    pending = []  # [(idx, img)]
    all_results = []

    def flush():
        nonlocal writer, n
        if not pending:
            return
        boxes_per = detector.detect_batch([im for _, im in pending])
        for (idx, img), boxes in zip(pending, boxes_per):
            rgb01 = img[:, :, ::-1].astype(np.float32) / 255.0
            kps = pose.estimate(rgb01, boxes)        # (P, J, 3)
            if out_json_dir is not None:
                save_keypoints_json(
                    os.path.join(out_json_dir, serial,
                                 f"{idx:06d}_keypoints.json"), kps)
            if results_dir is not None:
                frame_res = []
                for k in range(len(kps)):
                    s = kps[k, :, 2]
                    b = (boxes[k] if k < len(boxes)
                         else np.zeros(5, np.float32))
                    bs = float(b[4]) if len(b) > 4 else 1.0
                    frame_res.append({
                        "keypoints": kps[k, :, :2],
                        "kp_score": s,
                        # `writer.py:update` proposal formula
                        "proposal_score": float(s.mean() + bs
                                                + 1.25 * s.max()),
                        "box": [float(b[0]), float(b[1]),
                                float(b[2] - b[0]),
                                float(b[3] - b[1])],
                        "idx": k,
                    })
                all_results.append(
                    {"imgname": f"{idx:06d}.jpg",
                     "result": frame_res})
            if out_video is not None:
                frame = img.copy()
                if draw:
                    for person in kps:
                        draw_keypoints(frame, person)
                if writer is None:
                    h, w = frame.shape[:2]
                    writer = open_video_writer(out_video, fps, (w, h))
                writer.write(frame)
            n += 1
        pending.clear()

    try:
        for idx, img in frame_source(src, max_frames):
            pending.append((idx, img))
            if len(pending) >= chunk:
                flush()
        flush()
    finally:
        if writer is not None:
            writer.release()
    if results_dir is not None:
        from .pose_nms import write_results_json
        write_results_json(all_results, results_dir,
                           form=results_form, for_eval=for_eval)
    return n


def run_stream_smpl(src, detector=None, smpl=None, *,
                    out_json: Optional[str] = None,
                    out_video: Optional[str] = None,
                    chunk: int = 4, max_frames: int = 0,
                    fps: float = 30.0, render: bool = True,
                    draw_skeleton: bool = False) -> int:
    """Streaming direct SMPL regression (the reference's
    `DataWriterSMPL`, `alphapose_core/alphapose/utils/writer_smpl.py`):
    detect people per frame, regress SMPL bodies with the HybrIK net,
    write one aggregated results JSON (the `write_json` role, same
    per-person keys: keypoints / pred_xyz_jts / kp_score /
    proposal_score / box / crop_box) and an overlay video with every
    frame's meshes composited in one globally depth-sorted render
    (`vis_frame_smpl` role, via our software rasterizer).

    Returns the number of frames processed.
    """
    import json

    from ..viz.overlay import render_multiperson_overlay
    from ..viz.skeletons import vis_frame
    from .predictor import PersonDetector, SmplPoseEstimator

    detector = detector or PersonDetector()
    smpl = smpl or SmplPoseEstimator()
    f0 = smpl.focal_length
    in_h = float(smpl.input_hw[0])

    writer = None
    n = 0
    pending = []
    results = []

    def flush():
        nonlocal writer, n
        if not pending:
            return
        boxes_per = detector.detect_batch([im for _, im in pending])
        for (idx, img), boxes in zip(pending, boxes_per):
            rgb01 = img[:, :, ::-1].astype(np.float32) / 255.0
            out = smpl.estimate(rgb01, boxes)
            im_name = f"{idx:06d}.jpg"
            frame_res = []
            for k in range(len(out["proposal_score"])):
                b = boxes[k]
                cx, cy = out["centers"][k]
                sw, sh = out["scales"][k]
                frame_res.append({
                    "keypoints": out["keypoints"][k].tolist(),
                    "pred_xyz_jts": out["pred_xyz_jts"][k].tolist(),
                    "kp_score": out["kp_score"][k].tolist(),
                    "proposal_score": float(out["proposal_score"][k]),
                    "bbox_score": float(b[4]) if len(b) > 4 else 1.0,
                    "idx": k,
                    # xywh, like `writer_smpl.py:134-137`
                    "box": [float(b[0]), float(b[1]),
                            float(b[2] - b[0]), float(b[3] - b[1])],
                    "crop_box": [float(cx - sw / 2), float(cy - sh / 2),
                                 float(sw), float(sh)],
                })
            results.append({"imgname": im_name, "result": frame_res})

            if out_video is not None:
                frame = img.copy()
                P = len(out["verts"])
                if P and render:
                    h, w = frame.shape[:2]
                    cimg = np.array([w / 2.0, h / 2.0])
                    # Each person's weak-persp camera (f_p, crop
                    # center) is folded into ONE global pinhole
                    # (f0, image center) by an exact per-person
                    # shear X' = X*f_p/f0 + Z*(c_p - c_img)/f0 —
                    # depths are untouched, so the global
                    # depth-sorted pass keeps inter-person
                    # occlusion correct.
                    sheared = []
                    for k in range(P):
                        v = out["verts"][k].astype(np.float64)
                        fp = f0 * out["scales"][k][0] / in_h
                        off = (out["centers"][k] - cimg) / f0
                        xy = (v[:, :2] * (fp / f0)
                              + v[:, 2:3] * off[None, :])
                        sheared.append(
                            np.concatenate([xy, v[:, 2:3]], axis=1))
                    frame = render_multiperson_overlay(
                        frame, sheared, smpl.faces, np.eye(3),
                        np.zeros(3), np.array([f0, f0]), cimg)
                if draw_skeleton:
                    for k in range(P):
                        vis_frame(frame, out["keypoints"][k],
                                  out["kp_score"][k][:, 0], fast=True)
                if writer is None:
                    h, w = frame.shape[:2]
                    writer = open_video_writer(out_video, fps, (w, h))
                writer.write(frame)
            n += 1
        pending.clear()

    try:
        for idx, img in frame_source(src, max_frames):
            pending.append((idx, img))
            if len(pending) >= chunk:
                flush()
        flush()
    finally:
        if writer is not None:
            writer.release()
    if out_json is not None:
        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(results, f)
    return n
