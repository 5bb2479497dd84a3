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

    def test_integral_targets_mode(self, coco_ws):
        """loss_type='integral' yields L1JointRegression's contract:
        normalized coords + per-coordinate weights."""
        from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset
        ann, img_root = coco_ws
        ds = CocoPoseTrainDataset(ann, img_root, input_size=(64, 48),
                                  heatmap_size=(16, 12), batch_size=3,
                                  seed=1, loss_type="integral")
        b = next(iter(ds))
        assert b["image"].shape == (3, 64, 48, 3)
        assert b["target"].shape == (3, 34)
        assert b["target_weight"].shape == (3, 34)
        vis = b["target_weight"] > 0
        # visible coords are normalized to [-0.5, 0.5]
        assert np.abs(b["target"][vis]).max() <= 0.5 + 1e-6
        # x and y weights are duplicated per joint
        w = b["target_weight"].reshape(3, 17, 2)
        np.testing.assert_array_equal(w[..., 0], w[..., 1])

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

    def test_integral_loss_end_to_end(self, coco_ws, tmp_path):
        from mvsmplfitting_tpu.cli.train_pose import main
        ann, img_root = coco_ws
        out = str(tmp_path / "irun")
        main(["--ann", ann, "--img_root", img_root,
              "--model", "simplepose", "--num_joints", "17",
              "--input_size", "128x96", "--heatmap_size", "32x24",
              "--batch", "3", "--epochs", "1", "--max_steps", "2",
              "--deconv", "32,32,32", "--loss_type", "integral",
              "--out", out])
        assert os.path.exists(os.path.join(out, "last.npz"))


@pytest.fixture(scope="module")
def coco_det_ws(tmp_path_factory):
    """Synthetic COCO instances GT: 8 images, 1-3 boxes each."""
    import cv2
    root = tmp_path_factory.mktemp("coco_det_ws")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(7)
    images, anns = [], []
    aid = 0
    for i in range(8):
        H, W = 100, 140
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        name = f"d{i}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i, "file_name": name,
                       "width": W, "height": H})
        for _ in range(int(rng.integers(1, 4))):
            x = float(rng.uniform(0, W - 30))
            y = float(rng.uniform(0, H - 30))
            w = float(rng.uniform(15, 30))
            h = float(rng.uniform(15, 30))
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [x, y, w, h], "iscrowd": 0,
                         "area": w * h})
            aid += 1
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    ann_path = root / "gt.json"
    with open(ann_path, "w") as f:
        json.dump(gt, f)
    return str(ann_path), str(img_dir)


class TestDetTrainDataset:
    def test_mosaic_batches(self, coco_det_ws):
        from mvsmplfitting_tpu.detect.dataset import CocoDetTrainDataset
        ann, img_root = coco_det_ws
        ds = CocoDetTrainDataset(ann, img_root, input_hw=(64, 64),
                                 batch_size=4, max_labels=20, seed=3)
        assert len(ds) == 2 and ds.num_classes == 1
        b = next(iter(ds))
        assert b["image"].shape == (4, 64, 64, 3)
        assert b["labels"].shape == (4, 20, 5)
        assert b["image"].max() > 1.5          # 0-255 scale
        # cxcywh rows: any real label has positive w/h
        real = b["labels"][b["labels"][:, :, 3] > 0]
        assert (real[:, 4] > 0).all()

    def test_no_aug_mode(self, coco_det_ws):
        from mvsmplfitting_tpu.detect.dataset import CocoDetTrainDataset
        ann, img_root = coco_det_ws
        ds = CocoDetTrainDataset(ann, img_root, input_hw=(64, 64),
                                 batch_size=4, max_labels=20,
                                 mosaic=False, seed=3)
        b = next(iter(ds))
        assert b["image"].shape == (4, 64, 64, 3)
        # letterbox: boxes stay inside the canvas
        real = b["labels"][b["labels"][:, :, 3] > 0]
        assert (real[:, 1] <= 64).all() and (real[:, 2] <= 64).all()


class TestYoloxTrainCLI:
    def test_two_steps_end_to_end(self, coco_det_ws, tmp_path):
        from mvsmplfitting_tpu.cli.train_yolox import main
        ann, img_root = coco_det_ws
        out = str(tmp_path / "yrun")
        main(["--ann", ann, "--img_root", img_root,
              "--depth", "0.33", "--width", "0.125",
              "--input_size", "64x64", "--batch", "2",
              "--epochs", "1", "--max_steps", "2",
              "--max_labels", "20", "--out", out,
              "--val_ann", ann, "--eval_interval", "1"])
        assert os.path.exists(os.path.join(out, "last.npz"))
        assert os.path.exists(os.path.join(out, "ema.npz"))
        lines = open(os.path.join(out, "train_metrics.jsonl")).read()
        assert "num_fg" in lines
        # validation ran: a val_box_map record (random net -> ~0 mAP,
        # but the metric must be computed and finite)
        import json as _json
        vals = [_json.loads(ln)["val_box_map"]
                for ln in lines.splitlines()
                if "val_box_map" in ln]
        assert vals and all(0.0 <= v <= 1.0 for v in vals)


class TestFormatTrainCLI:
    def test_halpe136_format_end_to_end(self, tmp_path):
        """--format halpe136: 136-joint training with the registry's
        flip pairs + half-body ids through the real driver."""
        import cv2

        from mvsmplfitting_tpu.cli.train_pose import main
        img_dir = tmp_path / "images"
        os.makedirs(img_dir)
        rng = np.random.default_rng(0)
        J = 136
        images, anns = [], []
        for i in range(3):
            H, W = 120, 90
            cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                        rng.integers(0, 255, (H, W, 3), np.uint8))
            images.append({"id": i, "file_name": f"im{i}.jpg",
                           "width": W, "height": H})
            kp = np.zeros((J, 3), np.float32)
            kp[:, 0] = rng.uniform(15, 75, J)
            kp[:, 1] = rng.uniform(15, 105, J)
            kp[:, 2] = 2
            anns.append({"id": i, "image_id": i, "category_id": 1,
                         "bbox": [10, 10, 70, 100],
                         "keypoints": [float(v) for v in kp.ravel()],
                         "num_keypoints": J})
        ann = str(tmp_path / "gt.json")
        with open(ann, "w") as f:
            json.dump({"images": images, "annotations": anns,
                       "categories": [{"id": 1, "name": "person"}]}, f)
        out = str(tmp_path / "run")
        main(["--ann", ann, "--img_root", str(img_dir),
              "--model", "simplepose", "--num_joints", "136",
              "--format", "halpe136",
              "--input_size", "128x96", "--heatmap_size", "32x24",
              "--batch", "3", "--epochs", "1", "--max_steps", "1",
              "--deconv", "32,32,32", "--out", out])
        assert os.path.exists(os.path.join(out, "last.npz"))


class TestConcatDataset:
    def test_merged_annotation_files_with_width_cap(self, tmp_path):
        """Two GT files with different joint counts (26 and 136)
        concatenate into one 26-joint pool — the reference's
        ConcatDataset + halpe_coco_wholebody `keypoints[:J*3]`
        truncation rule (`halpe_coco_wholebody_26.py:118,189`)."""
        import cv2

        from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset

        rng = np.random.default_rng(0)
        anns, roots = [], []
        for src, J in enumerate((26, 136)):
            d = tmp_path / f"set{src}"
            os.makedirs(d / "images")
            images, annos = [], []
            for i in range(2):
                cv2.imwrite(str(d / "images" / f"im{i}.jpg"),
                            rng.integers(0, 255, (60, 50, 3), np.uint8))
                images.append({"id": i, "file_name": f"im{i}.jpg",
                               "width": 50, "height": 60})
                kp = np.zeros((J, 3), np.float32)
                kp[:, 0] = rng.uniform(5, 45, J)
                kp[:, 1] = rng.uniform(5, 55, J)
                kp[:, 2] = 2
                annos.append({"id": i, "image_id": i, "category_id": 1,
                              "bbox": [5, 5, 40, 50],
                              "keypoints": [float(v)
                                            for v in kp.ravel()],
                              "num_keypoints": J})
            ann = d / "gt.json"
            with open(ann, "w") as f:
                json.dump({"images": images, "annotations": annos,
                           "categories": [{"id": 1,
                                           "name": "person"}]}, f)
            anns.append(str(ann))
            roots.append(str(d / "images"))

        ds = CocoPoseTrainDataset(anns, roots, (64, 48), (16, 12),
                                  batch_size=4, num_joints=26, seed=1)
        assert len(ds.entries) == 4 and ds.num_joints == 26
        assert {e["src"] for e in ds.entries} == {0, 1}
        batch = next(iter(ds))
        assert batch["image"].shape == (4, 64, 48, 3)
        assert batch["target"].shape == (4, 16, 12, 26)
        assert batch["image"].any()   # both sources' images loaded

    def test_pad_narrow_gt_to_width(self, tmp_path):
        """17-joint GT padded to 26 with zero visibility."""
        import cv2

        from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset

        rng = np.random.default_rng(0)
        d = tmp_path / "set"
        os.makedirs(d / "images")
        cv2.imwrite(str(d / "images" / "im0.jpg"),
                    rng.integers(0, 255, (60, 50, 3), np.uint8))
        kp = np.ones((17, 3), np.float32) * 10
        gt = {"images": [{"id": 0, "file_name": "im0.jpg",
                          "width": 50, "height": 60}],
              "annotations": [{"id": 0, "image_id": 0, "category_id": 1,
                               "bbox": [5, 5, 40, 50],
                               "keypoints": [float(v)
                                             for v in kp.ravel()],
                               "num_keypoints": 17}],
              "categories": [{"id": 1, "name": "person"}]}
        with open(d / "gt.json", "w") as f:
            json.dump(gt, f)
        ds = CocoPoseTrainDataset(str(d / "gt.json"),
                                  str(d / "images"), (64, 48), (16, 12),
                                  batch_size=1, num_joints=26)
        e = ds.entries[0]
        assert e["joints"].shape == (26, 2)
        assert e["vis"][:17].all() and not e["vis"][17:].any()
