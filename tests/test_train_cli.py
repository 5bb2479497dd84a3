"""Pose-training surface: COCO train dataset -> augment -> targets ->
CLI driver end to end (tiny synthetic COCO workspace)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def coco_ws(tmp_path_factory):
    """Synthetic COCO GT: 6 images, one annotated person each."""
    import cv2
    root = tmp_path_factory.mktemp("coco_ws")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    images, anns = [], []
    J = 17
    for i in range(6):
        H, W = 120, 90
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i, "file_name": name,
                       "width": W, "height": H})
        kp = np.zeros((J, 3), np.float32)
        kp[:, 0] = rng.uniform(15, 75, J)
        kp[:, 1] = rng.uniform(15, 105, J)
        kp[:, 2] = (rng.uniform(0, 1, J) > 0.2) * 2
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 70, 100],
                     "keypoints": [float(v) for v in kp.ravel()],
                     "num_keypoints": int((kp[:, 2] > 0).sum())})
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    ann_path = root / "gt.json"
    with open(ann_path, "w") as f:
        json.dump(gt, f)
    return str(ann_path), str(img_dir)


class TestTrainDataset:
    def test_batches_shapes_and_targets(self, coco_ws):
        from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset
        ann, img_root = coco_ws
        ds = CocoPoseTrainDataset(ann, img_root, input_size=(64, 48),
                                  heatmap_size=(16, 12), batch_size=3,
                                  seed=1)
        assert len(ds) == 2 and ds.num_joints == 17
        batches = list(ds)
        assert len(batches) == 2
        b = batches[0]
        assert b["image"].shape == (3, 64, 48, 3)
        assert b["target"].shape == (3, 16, 12, 17)
        assert b["target_weight"].shape == (3, 17)
        # visible joints produce unit-peak gaussians
        assert b["target"].max() == pytest.approx(1.0, abs=1e-5)
        # weights only where visible (and in-window)
        assert set(np.unique(b["target_weight"])) <= {0.0, 1.0}

    def test_epochs_reshuffle(self, coco_ws):
        from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset
        ann, img_root = coco_ws
        ds = CocoPoseTrainDataset(ann, img_root, input_size=(64, 48),
                                  heatmap_size=(16, 12), batch_size=6,
                                  seed=2)
        a = next(iter(ds))["image"]
        b = next(iter(ds))["image"]
        # augmentation draws differ between epochs
        assert not np.allclose(a, b)


class TestTrainCLI:
    def test_two_steps_end_to_end(self, coco_ws, tmp_path):
        from mvsmplfitting_tpu.cli.train_pose import main
        ann, img_root = coco_ws
        out = str(tmp_path / "run")
        # 128x96: ResNet50 downsamples 32x, three deconvs upsample 8x
        # -> 32x24 heatmaps (the input must be stride-32 divisible)
        main(["--ann", ann, "--img_root", img_root,
              "--model", "simplepose", "--num_joints", "17",
              "--input_size", "128x96", "--heatmap_size", "32x24",
              "--batch", "3", "--epochs", "2", "--max_steps", "2",
              "--deconv", "32,32,32", "--lr", "1e-3",
              "--out", out])
        assert os.path.exists(os.path.join(out, "last.npz"))
        assert os.path.exists(os.path.join(out, "ema.npz"))
        lines = open(os.path.join(out, "train_metrics.jsonl")).read()
        assert "loss" in lines
