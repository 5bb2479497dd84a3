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


class TestStream:
    """Streaming sources + writer (`detect/stream.py` — the
    file/webcam detector + DataWriter surface)."""

    def _tiny(self):
        from mvsmplfitting_tpu.detect.predictor import (PersonDetector,
                                                        PoseEstimator)
        det = PersonDetector(input_hw=(64, 96), conf_thresh=1e-6,
                             depth_mul=0.33, width_mul=0.25)
        pose = PoseEstimator(input_hw=(64, 48), num_joints=17)
        return det, pose

    def test_directory_source(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mvsmplfitting_tpu.detect.stream import frame_source
        d = tmp_path / "imgs"
        os.makedirs(d)
        for i in range(3):
            cv2.imwrite(str(d / f"f{i}.jpg"),
                        rng.integers(0, 255, (40, 50, 3), np.uint8))
        frames = list(frame_source(str(d)))
        assert [i for i, _ in frames] == [0, 1, 2]
        assert frames[0][1].shape == (40, 50, 3)
        assert len(list(frame_source(str(d), max_frames=2))) == 2

    def test_video_stream_end_to_end(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mvsmplfitting_tpu.detect.stream import run_stream

        vid = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"),
                            10.0, (64, 48))
        assert w.isOpened()
        for _ in range(5):
            w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
        w.release()

        det, pose = self._tiny()
        out_json = str(tmp_path / "kp")
        out_video = str(tmp_path / "out.mp4")
        n = run_stream(vid, det, pose, out_json_dir=out_json,
                       out_video=out_video, chunk=2, max_frames=4)
        assert n == 4
        jsons = sorted(os.listdir(os.path.join(out_json, "stream")))
        assert jsons == [f"{i:06d}_keypoints.json" for i in range(4)]
        with open(os.path.join(out_json, "stream", jsons[0])) as f:
            data = json.load(f)
        assert "people" in data
        vids = [p for p in os.listdir(tmp_path)
                if p.startswith("out.")]
        assert vids  # mp4 or the MJPG fallback


class TestStreamSmpl:
    """`run_stream_smpl` = the reference's DataWriterSMPL pipeline
    (`alphapose/utils/writer_smpl.py`): HybrIK regression per box,
    aggregated results JSON, mesh-overlay video."""

    def test_smpl_stream_end_to_end(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mvsmplfitting_tpu.detect.predictor import (
            PersonDetector, SmplPoseEstimator,
        )
        from mvsmplfitting_tpu.detect.stream import run_stream_smpl

        d = tmp_path / "imgs"
        os.makedirs(d)
        for i in range(2):
            cv2.imwrite(str(d / f"f{i}.jpg"),
                        rng.integers(0, 255, (48, 64, 3), np.uint8))
        det = PersonDetector(input_hw=(64, 96), conf_thresh=0.3,
                             depth_mul=0.33, width_mul=0.25)
        smpl = SmplPoseEstimator(input_hw=(64, 64))
        oj = str(tmp_path / "smpl-results.json")
        ov = str(tmp_path / "out.mp4")
        n = run_stream_smpl(str(d), det, smpl, out_json=oj,
                            out_video=ov, chunk=2, draw_skeleton=True)
        assert n == 2
        res = json.load(open(oj))
        assert [r["imgname"] for r in res] == ["000000.jpg",
                                               "000001.jpg"]
        for r in res:
            for person in r["result"]:
                # the DataWriterSMPL result contract
                # (`writer_smpl.py:122-137`)
                kp = np.asarray(person["keypoints"])
                assert kp.shape == (29, 2) and np.isfinite(kp).all()
                assert np.asarray(person["pred_xyz_jts"]).shape == (24, 3)
                assert np.asarray(person["kp_score"]).shape == (29, 1)
                assert len(person["box"]) == 4
                assert len(person["crop_box"]) == 4
                # proposal_score = mean + bbox + 1.25*max
                s = np.asarray(person["kp_score"])
                expect = (s.mean() + person["bbox_score"]
                          + 1.25 * s.max())
                assert abs(person["proposal_score"] - expect) < 1e-5
        assert [p for p in os.listdir(tmp_path) if p.startswith("out.")]

    def test_zero_boxes_frame(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mvsmplfitting_tpu.detect.predictor import SmplPoseEstimator

        smpl = SmplPoseEstimator(input_hw=(64, 64))
        out = smpl.estimate(
            rng.uniform(0, 1, (48, 64, 3)).astype(np.float32),
            np.zeros((0, 5), np.float32))
        assert out["keypoints"].shape == (0, 29, 2)
        assert out["verts"].shape[0] == 0


class TestResultsJson:
    def _fake_results(self, np_mod, J=26):
        rng = np_mod.random.default_rng(3)
        res = []
        for f in range(2):
            people = []
            for k in range(2):
                people.append({
                    "keypoints": rng.uniform(0, 100, (J, 2)),
                    "kp_score": rng.uniform(0.1, 1.0, (J, 1)),
                    # f32-rounded like the real pipeline's numpy/torch
                    # float32 score (the reference wraps it in a
                    # float32 tensor)
                    "proposal_score": float(np.float32(
                        rng.uniform(1, 3))),
                    "box": [1.0, 2.0, 30.0, 40.0],
                    "idx": k,
                })
            res.append({"imgname": f"img_{f:012d}.jpg",
                        "result": people})
        return res

    # for_eval x cmu/open is excluded: the REFERENCE itself crashes
    # there (`pPose_nms.py:745` calls .split on the int image id) —
    # an unreachable combination upstream; ours str()s the id.
    @pytest.mark.parametrize("form,for_eval",
                             [(None, False), (None, True),
                              ("cmu", False), ("open", False)])
    def test_golden_vs_reference_write_json(self, tmp_path, form,
                                            for_eval):
        """Byte-level parity of the aggregated results file against
        the reference's own `write_json` (`pPose_nms.py:659-749`) on
        identical inputs."""
        import sys
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            import torch
            from alphapose.utils.pPose_nms import write_json
        except Exception as e:
            pytest.skip(f"reference write_json unavailable: {e}")

        from mvsmplfitting_tpu.detect.pose_nms import write_results_json

        res = self._fake_results(np)
        ours_dir = tmp_path / "ours"
        ref_dir = tmp_path / "ref"
        os.makedirs(ref_dir)
        write_results_json(res, str(ours_dir), form=form,
                           for_eval=for_eval)
        # reference iterates torch tensors
        tres = [{"imgname": r["imgname"],
                 "result": [{**h,
                             "keypoints": torch.from_numpy(
                                 h["keypoints"]),
                             "kp_score": torch.from_numpy(
                                 h["kp_score"]),
                             "proposal_score": torch.tensor(
                                 [h["proposal_score"]])}
                            for h in r["result"]]}
                for r in res]
        write_json(tres, str(ref_dir), form=form, for_eval=for_eval)

        ours = json.load(open(ours_dir / "alphapose-results.json"))
        want = json.load(open(ref_dir / "alphapose-results.json"))
        assert ours == want
        if form in ("cmu", "open"):
            o = sorted(os.listdir(ours_dir / "sep-json"))
            w = sorted(os.listdir(ref_dir / "sep-json"))
            assert o == w
            for name in o:
                assert (json.load(open(ours_dir / "sep-json" / name))
                        == json.load(open(ref_dir / "sep-json"
                                          / name)))

    def test_stream_writes_results_json(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from mvsmplfitting_tpu.detect.stream import run_stream

        d = tmp_path / "imgs"
        os.makedirs(d)
        for i in range(2):
            cv2.imwrite(str(d / f"f{i}.jpg"),
                        rng.integers(0, 255, (48, 64, 3), np.uint8))
        det, pose = TestStream()._tiny()
        rd = str(tmp_path / "res")
        n = run_stream(str(d), det, pose, results_dir=rd, chunk=2)
        assert n == 2
        data = json.load(open(os.path.join(
            rd, "alphapose-results.json")))
        for entry in data:
            assert set(entry) >= {"image_id", "category_id",
                                  "keypoints", "score", "box", "idx"}
            assert len(entry["keypoints"]) % 3 == 0
