"""Eval metrics: PCK golden vs the reference's calc_accuracy + OKS AP.

Parity target: `alphapose_core/alphapose/utils/metrics.py` (PCK via
heatmap argmax, `metrics.py:125-152`) and the COCO OKS/AP protocol its
`evaluate_mAP` delegates to pycocotools for.
"""

import sys

import numpy as np
import pytest

from mvsmplfitting_tpu.detect.metrics import (
    heatmap_pck, keypoint_map, keypoint_oks, max_preds,
)


def _gauss_heatmaps(coords, H, W, sigma=1.5):
    """(N, J, 2) peak coords -> (N, J, H, W) gaussian heatmaps."""
    yy, xx = np.mgrid[0:H, 0:W]
    out = np.zeros((coords.shape[0], coords.shape[1], H, W), np.float32)
    for n in range(coords.shape[0]):
        for j in range(coords.shape[1]):
            x, y = coords[n, j]
            out[n, j] = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) /
                               (2 * sigma ** 2))
    return out


class TestPCK:
    def test_known_displacements(self, rng):
        """Peaks displaced by < and > thr*norm score 1 resp. 0."""
        H, W = 40, 30
        gt = rng.uniform(8, 20, size=(4, 3, 2)).astype(np.float32)
        # norm = (W, H)/10 = (3, 4); thr 0.5 -> normalized dist < 0.5
        near = gt + np.asarray([1.0, 0.0])      # dist 1/3 < 0.5
        far = gt + np.asarray([0.0, 8.0])       # dist 2.0 > 0.5
        assert heatmap_pck(_gauss_heatmaps(near, H, W),
                           _gauss_heatmaps(gt, H, W)) == 1.0
        assert heatmap_pck(_gauss_heatmaps(far, H, W),
                           _gauss_heatmaps(gt, H, W)) == 0.0

    def test_golden_vs_reference(self, rng):
        """Bit-for-bit against the reference's calc_accuracy."""
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            from alphapose.utils.metrics import calc_accuracy
        except Exception as e:         # pragma: no cover
            pytest.skip(f"reference metrics unavailable: {e}")

        H, W = 16, 12
        preds = rng.standard_normal((3, 5, H, W)).astype(np.float32)
        labels = rng.standard_normal((3, 5, H, W)).astype(np.float32)
        # Positive labels so some joints count as visible.
        labels[0, :2] += 3.0

        want = calc_accuracy(torch.from_numpy(preds),
                             torch.from_numpy(labels))
        got = heatmap_pck(preds, labels)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_max_preds_golden_vs_reference(self, rng):
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            from alphapose.utils.transforms import get_max_pred_batch
        except Exception as e:         # pragma: no cover
            pytest.skip(f"reference transforms unavailable: {e}")
        hm = rng.standard_normal((2, 4, 9, 7)).astype(np.float32)
        want_p, want_v = get_max_pred_batch(hm)
        got_p, got_v = max_preds(hm)
        np.testing.assert_array_equal(got_p, want_p)
        np.testing.assert_array_equal(got_v, want_v)


class TestOKS:
    def test_perfect_prediction_is_one(self, rng):
        gt = rng.uniform(0, 100, (17, 2)).astype(np.float32)
        assert keypoint_oks(gt, gt, area=2500.0) == pytest.approx(1.0)

    def test_decays_with_distance(self, rng):
        gt = rng.uniform(0, 100, (17, 2)).astype(np.float32)
        a = keypoint_oks(gt + 1.0, gt, area=2500.0)
        b = keypoint_oks(gt + 5.0, gt, area=2500.0)
        assert 0 < b < a < 1

    def test_map_perfect_and_mismatched(self, rng):
        gt = rng.uniform(20, 80, (2, 17, 2)).astype(np.float32)
        gts = [{"keypoints": gt, "areas": np.asarray([2500.0, 2500.0])}]
        perfect = [{"keypoints": gt.copy(),
                    "scores": np.asarray([0.9, 0.8])}]
        assert keypoint_map(perfect, gts) == pytest.approx(1.0)

        junk = [{"keypoints": gt + 300.0,
                 "scores": np.asarray([0.9, 0.8])}]
        assert keypoint_map(junk, gts) == pytest.approx(0.0)

    def test_map_half_detected(self, rng):
        gt = rng.uniform(20, 80, (2, 17, 2)).astype(np.float32)
        gts = [{"keypoints": gt, "areas": np.asarray([2500.0, 2500.0])}]
        half = [{"keypoints": np.stack([gt[0], gt[1] + 500.0]),
                 "scores": np.asarray([0.9, 0.8])}]
        m = keypoint_map(half, gts)
        assert 0.2 < m < 0.6       # one of two GT matched -> AP ~ 0.5


class TestIntegralPCK:
    """`integral_pck` == the reference's `calc_integral_accuracy`
    (`metrics.py:156-225`).  The reference function is CUDA-only
    (`torch.cuda.comm.broadcast`), so behavior is pinned with
    constructed cases instead of a golden import."""

    def _hm(self, J, H, W, peaks, sharp=50.0):
        """Sharp logit peaks at integer (x, y) per joint."""
        hm = np.zeros((1, J, H, W), np.float32)
        for j, (x, y) in enumerate(peaks):
            hm[0, j, y, x] = sharp
        return hm

    def test_perfect_prediction(self):
        from mvsmplfitting_tpu.detect.metrics import integral_pck
        H = W = 16
        peaks = [(4, 8), (12, 3), (7, 7)]
        hm = self._hm(3, H, W, peaks)
        # normalized labels: u = x/W - 0.5 (so (u+0.5)*W == x)
        lab = np.asarray([[x / W - 0.5, y / H - 0.5]
                          for x, y in peaks]).reshape(1, -1)
        msk = np.ones_like(lab)
        assert integral_pck(hm, lab, msk) == pytest.approx(1.0)

    def test_wrong_prediction_and_mask(self):
        from mvsmplfitting_tpu.detect.metrics import integral_pck
        H = W = 16
        hm = self._hm(2, H, W, [(4, 8), (2, 2)])
        # joint 0 label far away (> size/10 * 0.5 = 0.8 px norm dist),
        # joint 1 masked out -> excluded entirely.
        lab = np.asarray([[12 / W - 0.5, 12 / H - 0.5],
                          [10 / W - 0.5, 10 / H - 0.5]]).reshape(1, -1)
        msk = np.asarray([[1.0, 1.0, 0.0, 0.0]])
        assert integral_pck(hm, lab, msk) == pytest.approx(0.0)

    def test_3d_and_sigmoid(self):
        from mvsmplfitting_tpu.detect.metrics import integral_pck
        H = W = D = 8
        J = 2
        # background at -50: sigmoid(0) = 0.5 would spread half a unit
        # of mass on EVERY voxel and pull the expectation to the center
        hm = np.full((1, J * D, H, W), -50.0, np.float32)
        peaks = [(2, 3, 4), (6, 1, 2)]           # (x, y, z)
        for j, (x, y, z) in enumerate(peaks):
            hm[0, j * D + z, y, x] = 50.0
        lab = np.asarray([[x / W - 0.5, y / H - 0.5, z / D - 0.5]
                          for x, y, z in peaks]).reshape(1, -1)
        msk = np.ones_like(lab)
        for nt in ("softmax", "sigmoid"):
            assert integral_pck(hm, lab, msk, output_3d=True,
                                norm_type=nt) == pytest.approx(1.0)


class TestBoxMap:
    """Native detection mAP — the reference's `evaluate_mAP`
    bbox branch (pycocotools) rebuilt; protocol checks on
    hand-countable cases."""

    def test_iou_pairwise(self):
        from mvsmplfitting_tpu.detect.metrics import box_iou_xyxy
        a = np.asarray([[0, 0, 10, 10]], np.float32)
        b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15],
                        [20, 20, 30, 30]], np.float32)
        iou = box_iou_xyxy(a, b)[0]
        np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0],
                                   atol=1e-6)

    def test_perfect_and_miss(self):
        from mvsmplfitting_tpu.detect.metrics import box_map
        gt = [{"boxes": np.asarray([[0, 0, 10, 10], [20, 0, 40, 30]],
                                   np.float32)}]
        perfect = [{"boxes": gt[0]["boxes"].copy(),
                    "scores": np.asarray([0.9, 0.8])}]
        assert box_map(perfect, gt) == pytest.approx(1.0)
        junk = [{"boxes": gt[0]["boxes"] + 100.0,
                 "scores": np.asarray([0.9, 0.8])}]
        assert box_map(junk, gt) == pytest.approx(0.0)

    def test_class_aware_matching(self):
        from mvsmplfitting_tpu.detect.metrics import box_map
        boxes = np.asarray([[0, 0, 10, 10], [20, 0, 30, 10]],
                           np.float32)
        gt = [{"boxes": boxes, "classes": np.asarray([0, 1])}]
        right = [{"boxes": boxes, "scores": np.asarray([0.9, 0.8]),
                  "classes": np.asarray([0, 1])}]
        assert box_map(right, gt) == pytest.approx(1.0)
        # Same boxes, classes swapped: wrong class can't match -> 0.
        wrong = [{"boxes": boxes, "scores": np.asarray([0.9, 0.8]),
                  "classes": np.asarray([1, 0])}]
        assert box_map(wrong, gt) == pytest.approx(0.0)

    def test_iou_sweep_partial_credit(self):
        from mvsmplfitting_tpu.detect.metrics import box_map
        gt = [{"boxes": np.asarray([[0, 0, 10, 10]], np.float32)}]
        # IoU 10*8/(100+80-80) = 0.8: matches at t<=0.8, misses above
        # -> 7 of 10 thresholds.
        shifted = [{"boxes": np.asarray([[0, 2, 10, 10]], np.float32),
                    "scores": np.asarray([0.9])}]
        m = box_map(shifted, gt)
        assert m == pytest.approx(0.7, abs=0.01)

    def test_mask_iou_reference_semantics(self):
        from mvsmplfitting_tpu.detect.metrics import mask_iou
        a = np.zeros((4, 4)); a[:2] = 1.0
        b = np.zeros((4, 4)); b[1:3] = 1.0
        assert mask_iou(a, b) == pytest.approx(4.0 / 12.0)
        # batched: mean of per-sample IoUs
        batch_p = np.stack([a, a]); batch_t = np.stack([a, b])
        assert mask_iou(batch_p, batch_t) == pytest.approx(
            (1.0 + 4.0 / 12.0) / 2)


class TestCocoIO:
    """COCO file contracts + native mAP (the reference defers these to
    pycocotools, `metrics.py:64-119`, unavailable here)."""

    def _write_gt(self, path, gt, rng):
        import json
        anns = []
        for m in range(gt.shape[0]):
            kp = np.concatenate(
                [gt[m], 2 * np.ones((gt.shape[1], 1), np.float32)],
                axis=1)
            anns.append({"image_id": 7, "id": m + 1, "category_id": 1,
                         "keypoints": kp.reshape(-1).tolist(),
                         "area": 2500.0})
        with open(path, "w") as f:
            json.dump({"annotations": anns}, f)

    def test_round_trip_and_perfect_map(self, rng, tmp_path):
        from mvsmplfitting_tpu.detect.coco_io import (
            evaluate_coco_map, load_coco_annotations, load_coco_results,
            save_coco_results,
        )

        gt = rng.uniform(20, 80, (2, 17, 2)).astype(np.float32)
        ann = str(tmp_path / "gt.json")
        self._write_gt(ann, gt, rng)

        loaded = load_coco_annotations(ann)
        assert set(loaded) == {7}
        np.testing.assert_allclose(loaded[7]["keypoints"], gt)
        assert loaded[7]["vis"].all()

        res = str(tmp_path / "res.json")
        save_coco_results(res, [7], [gt.copy()],
                          [np.asarray([0.9, 0.8])])
        back = load_coco_results(res)
        np.testing.assert_allclose(back[7]["keypoints"], gt, atol=1e-3)

        assert evaluate_coco_map(ann, res) == pytest.approx(1.0)
        # Unmatched detections -> 0.
        save_coco_results(res, [7], [gt + 500.0],
                          [np.asarray([0.9, 0.8])])
        assert evaluate_coco_map(ann, res) == pytest.approx(0.0)

    def test_missing_image_counts_against_recall(self, rng, tmp_path):
        from mvsmplfitting_tpu.detect.coco_io import evaluate_coco_map

        gt = rng.uniform(20, 80, (1, 17, 2)).astype(np.float32)
        ann = str(tmp_path / "gt.json")
        self._write_gt(ann, gt, rng)
        # Empty results dict: no detections anywhere.
        assert evaluate_coco_map(ann, {}) == pytest.approx(0.0)

    def test_fp_on_annotation_free_listed_image(self, rng, tmp_path):
        """Detections on a listed but annotation-free image are false
        positives (pycocotools evaluates every GT-listed image); images
        absent from the GT json are ignored."""
        import json

        from mvsmplfitting_tpu.detect.coco_io import evaluate_coco_map

        gt = rng.uniform(20, 80, (1, 17, 2)).astype(np.float32)
        kp = np.concatenate(
            [gt[0], 2 * np.ones((17, 1), np.float32)], axis=1)
        ann = str(tmp_path / "gt.json")
        with open(ann, "w") as f:
            json.dump({
                "images": [{"id": 7, "file_name": "a.jpg"},
                           {"id": 8, "file_name": "b.jpg"}],
                "annotations": [{"image_id": 7, "id": 1,
                                 "category_id": 1, "area": 2500.0,
                                 "keypoints": kp.reshape(-1).tolist()}],
            }, f)

        perfect = {7: {"keypoints": gt.copy(),
                       "scores": np.asarray([0.8])}}
        assert evaluate_coco_map(ann, perfect) == pytest.approx(1.0)

        # A HIGHER-scored spurious detection on the empty image 8
        # outranks the TP in the PR sweep -> mAP drops.
        with_fp = {**perfect,
                   8: {"keypoints": gt + 300.0,
                       "scores": np.asarray([0.95])}}
        assert evaluate_coco_map(ann, with_fp) < 0.75

        # Image 99 is not in the GT json at all: ignored, mAP stays 1.
        outside = {**perfect,
                   99: {"keypoints": gt + 300.0,
                        "scores": np.asarray([0.95])}}
        assert evaluate_coco_map(ann, outside) == pytest.approx(1.0)
