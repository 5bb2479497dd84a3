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


def run_stream(src, detector=None, pose=None, *,
               out_json_dir: Optional[str] = None,
               out_video: Optional[str] = None,
               serial: str = "stream", chunk: int = 4,
               max_frames: int = 0, fps: float = 30.0,
               draw: bool = True) -> int:
    """Detect + pose every frame of ``src``; write per-frame OpenPose
    JSONs (`<out_json_dir>/<serial>/<%06d>_keypoints.json`, the
    `writer.py` role) and optionally an annotated video.

    Returns the number of frames processed.
    """
    import cv2

    from ..data.keypoints import save_keypoints_json
    from ..viz.overlay import draw_keypoints
    from .predictor import PersonDetector, PoseEstimator

    detector = detector or PersonDetector()
    pose = pose or PoseEstimator()

    writer = None
    n = 0
    pending = []  # [(idx, img)]

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
            if out_video is not None:
                frame = img.copy()
                if draw:
                    for person in kps:
                        draw_keypoints(frame, person)
                if writer is None:
                    h, w = frame.shape[:2]
                    os.makedirs(os.path.dirname(out_video) or ".",
                                exist_ok=True)
                    writer = cv2.VideoWriter(
                        out_video, cv2.VideoWriter_fourcc(*"mp4v"),
                        fps, (w, h))
                    if not writer.isOpened():
                        writer = cv2.VideoWriter(
                            os.path.splitext(out_video)[0] + ".avi",
                            cv2.VideoWriter_fourcc(*"MJPG"), fps,
                            (w, h))
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
    return n
