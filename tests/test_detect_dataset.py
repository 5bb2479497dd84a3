"""COCO-style eval dataset: batching, padding, crop geometry."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mvsmplfitting_tpu.detect.dataset import CocoPoseEvalDataset  # noqa


def _workspace(tmp_path, rng, n_boxes=5):
    img_root = str(tmp_path / "imgs")
    os.makedirs(img_root)
    # Two images: one blue-ish, one green-ish, with a white box patch.
    anns = []
    images = []
    for img_id, color in ((1, (255, 0, 0)), (2, (0, 255, 0))):
        img = np.zeros((120, 160, 3), np.uint8)
        img[:] = color
        img[40:80, 60:100] = 255
        name = f"img_{img_id}.jpg"
        cv2.imwrite(os.path.join(img_root, name), img)
        images.append({"id": img_id, "file_name": name})
    for k in range(n_boxes):
        anns.append({"image_id": 1 + (k % 2), "id": k + 1,
                     "category_id": 1,
                     "bbox": [55.0, 35.0, 50.0, 50.0],
                     "score": 0.9})
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return ann_path, img_root


class TestCocoPoseEvalDataset:
    def test_batching_and_padding(self, tmp_path, rng):
        ann, root = _workspace(tmp_path, rng, n_boxes=5)
        ds = CocoPoseEvalDataset(ann, root, input_size=(64, 48),
                                 batch_size=4)
        assert len(ds) == 5
        batches = list(ds)
        assert len(batches) == 2
        b0, b1 = batches
        assert b0.crops.shape == (4, 64, 48, 3)
        assert b0.valid.sum() == 4 and b1.valid.sum() == 1
        assert (b1.crops[1:] == 0).all()          # padded rows empty
        assert set(b0.image_ids[b0.valid > 0]) <= {1, 2}

    def test_crop_centered_on_box(self, tmp_path, rng):
        ann, root = _workspace(tmp_path, rng, n_boxes=1)
        ds = CocoPoseEvalDataset(ann, root, input_size=(64, 48),
                                 batch_size=1)
        b = next(iter(ds))
        # The white patch fills the box -> crop center is white-ish.
        center_px = b.crops[0, 32, 24]
        assert (center_px > 0.9).all(), center_px
        np.testing.assert_allclose(b.centers[0], [80.0, 60.0], atol=1.0)

    def test_detection_results_list_input(self, tmp_path, rng):
        """Detection-results lists have no images table: the loader
        falls back to COCO's 012d file naming; missing images leave
        the row invalid instead of crashing."""
        ann, root = _workspace(tmp_path, rng, n_boxes=1)
        # Provide image 1 under the 012d fallback name; image 2 absent.
        import shutil
        shutil.copy(os.path.join(root, "img_1.jpg"),
                    os.path.join(root, f"{1:012d}.jpg"))
        det_path = str(tmp_path / "det.json")
        with open(det_path, "w") as f:
            json.dump([
                {"image_id": 1, "bbox": [55.0, 35.0, 50.0, 50.0],
                 "score": 0.7},
                {"image_id": 2, "bbox": [55.0, 35.0, 50.0, 50.0],
                 "score": 0.6},
            ], f)
        ds = CocoPoseEvalDataset(det_path, root, input_size=(64, 48),
                                 batch_size=2)
        b = next(iter(ds))
        assert b.valid.tolist() == [1.0, 0.0]
        assert b.scores[0] == pytest.approx(0.7)
        assert b.scores[1] == 0.0