"""Detection-frontend pipeline e2e smoke: images -> keypoint JSONs.

Runs the full detect -> crop -> pose -> JSON path with tiny
randomly-initialized networks (the real checkpoints are external
downloads); validates orchestration and the JSON interface, not
detection quality.
"""

import json
import os

import numpy as np
import pytest


def test_pipeline_writes_openpose_json(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")

    from mvsmplfitting_tpu.detect.predictor import (
        KeypointPipeline, PersonDetector, PoseEstimator,
    )

    # Tiny nets for CPU speed; same architecture.
    det = PersonDetector(input_hw=(64, 96), conf_thresh=1e-6,
                         depth_mul=0.33, width_mul=0.25)
    pose = PoseEstimator(input_hw=(64, 48))

    # Synthesize a frame with a bright blob (content is irrelevant).
    img_dir = tmp_path / "images" / "0000" / "Camera00"
    os.makedirs(img_dir)
    img = (rng.uniform(0, 255, size=(120, 160, 3))).astype(np.uint8)
    cv2.imwrite(str(img_dir / "00001.jpg"), img)

    pipeline = KeypointPipeline(det, pose)
    keyp_root = str(tmp_path / "keypoints")
    pipeline.process_images([str(img_dir / "00001.jpg")], keyp_root,
                            "0000", ["Camera00"])

    out = os.path.join(keyp_root, "0000", "Camera00",
                       "00001_keypoints.json")
    assert os.path.exists(out)
    with open(out) as f:
        data = json.load(f)
    assert "people" in data
    for person in data["people"]:
        kp = np.asarray(person["pose_keypoints_2d"]).reshape(-1, 3)
        assert kp.shape[0] == 26      # halpe26 joints
        assert np.isfinite(kp).all()

    # The fitting data layer reads it back (17-joint truncation).
    from mvsmplfitting_tpu.data.keypoints import read_keypoints_json
    people = read_keypoints_json(out)
    for p in people:
        assert p.shape == (17, 3)
