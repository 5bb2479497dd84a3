"""Video export of per-frame overlays (reference:
`module_utils.py:621`'s cv2 video writer)."""

from __future__ import annotations

import os
from typing import Sequence


def export_video(frame_paths: Sequence[str], out_path: str,
                 fps: float = 30.0) -> None:
    """Stitch overlay jpgs into an mp4 (falls back to avi/MJPG when the
    mp4v codec is unavailable in the cv2 build)."""
    import cv2

    if not frame_paths:
        raise ValueError("no frames to export")
    first = cv2.imread(frame_paths[0])
    h, w = first.shape[:2]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    if not writer.isOpened():
        out_path = os.path.splitext(out_path)[0] + ".avi"
        writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    try:
        for p in frame_paths:
            img = cv2.imread(p)
            if img is None:
                continue
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            writer.write(img)
    finally:
        writer.release()
