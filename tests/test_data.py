"""Data layer tests: JSON/pkl/obj IO, dataset walking, config loading.

Fixtures: the bundled demo data at /root/reference/data (read-only) and
the reference's own YAML config, which must load unmodified.
"""

import os
import pickle

import numpy as np
import pytest

from mvsmplfitting_tpu.config import dump_config, load_config
from mvsmplfitting_tpu.data.dataset import FittingDataset, _jpeg_size
from mvsmplfitting_tpu.data.keypoints import (
    read_keypoints_json, save_keypoints_json,
)
from mvsmplfitting_tpu.data.results import (
    FitOutputs, load_result_pkl, save_obj, save_result_pkl,
    zero_extremities,
)


class TestKeypointsIO:
    def test_demo_json_truncates_to_17(self, demo_data_dir):
        path = os.path.join(demo_data_dir,
                            "keypoints/0000/Camera00/00001_keypoints.json")
        people = read_keypoints_json(path)
        assert len(people) == 1
        assert people[0].shape == (17, 3)

    def test_round_trip(self, tmp_path, rng):
        kps = rng.uniform(0, 100, size=(2, 26, 3)).astype(np.float32)
        out = str(tmp_path / "kp" / "x_keypoints.json")
        save_keypoints_json(out, kps)
        back = read_keypoints_json(out, num_body_joints=26)
        assert len(back) == 2
        np.testing.assert_allclose(back[0], kps[0], rtol=1e-6)


class TestDataset:
    def test_walks_demo(self, demo_data_dir):
        ds = FittingDataset(demo_data_dir)
        assert len(ds) == 1
        frame = ds[0]
        assert frame.serial == "0000"
        assert frame.keypoints.shape == (6, 1, 17, 3)
        assert frame.view_mask.sum() == 6
        assert frame.img_hw == (1536, 2048)

    def test_jpeg_size(self, demo_data_dir):
        p = os.path.join(demo_data_dir, "images/0000/Camera00/00001.jpg")
        assert _jpeg_size(p) == (1536, 2048)


class TestResults:
    def test_zero_extremities(self, rng):
        pose = rng.standard_normal(69).astype(np.float32)
        out = zero_extremities(pose)
        assert (out[18:24] == 0).all()
        assert (out[27:33] == 0).all()
        assert (out[57:] == 0).all()
        assert (out[:18] == pose[:18]).all()

    def test_pkl_round_trip_protocol2(self, tmp_path, rng):
        out = FitOutputs(
            betas=rng.standard_normal(10),
            global_orient=rng.standard_normal(3),
            transl=rng.standard_normal(3),
            scale=np.asarray(1.2),
            body_pose=rng.standard_normal(69),
            pose_embedding=rng.standard_normal(32),
            loss=12.5)
        path = str(tmp_path / "r" / "000.pkl")
        saved = save_result_pkl(path, out)
        back = load_result_pkl(path)
        assert back["pose"].shape == (1, 72)
        np.testing.assert_allclose(back["pose"][:, :3],
                                   saved["global_orient"])
        assert back["loss"] == 12.5
        # protocol 2 (python2-compatible like the reference).
        with open(path, "rb") as f:
            assert f.read(2)[0] == 0x80 and True

    def test_obj_writer(self, tmp_path):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.asarray([[0, 1, 2]])
        path = str(tmp_path / "m" / "000.obj")
        save_obj(path, verts, faces)
        lines = open(path).read().strip().splitlines()
        assert lines[0].startswith("v ")
        assert lines[-1] == "f 1 2 3"


class TestConfig:
    def test_loads_reference_yaml_unmodified(self):
        ref = "/root/reference/cfg_files/fit_smpl.yaml"
        if not os.path.exists(ref):
            pytest.skip("reference config unavailable")
        cfg = load_config(ref)
        assert cfg.model_type == "smpllsp"
        assert cfg.body_pose_prior_weights == (404.0, 404.0, 57.4, 4.78)
        assert cfg.shape_weights == (100.0, 50.0, 10.0, 5.0)
        assert cfg.coll_loss_weights == (0.0, 0.0, 1000.0, 4500.0)
        assert cfg.optim_type == "lbfgsls"
        assert cfg.rho == 100.0
        assert cfg.use_vposer is True
        assert cfg.fix_scale is False

    def test_dump_and_reload(self, tmp_path):
        cfg = load_config(None, model_type="smpl", rho=50)
        path = str(tmp_path / "conf.yaml")
        dump_config(cfg, path)
        cfg2 = load_config(path)
        assert cfg2.model_type == "smpl"
        assert cfg2.rho == 50.0


class TestNativeLoader:
    def test_native_matches_python(self, demo_data_dir):
        from mvsmplfitting_tpu.data import native
        if not native.available():
            pytest.skip("native loader not built (make -C native)")
        paths = [os.path.join(
            demo_data_dir,
            f"keypoints/0000/Camera{i:02d}/00001_keypoints.json")
            for i in range(6)] + [None]
        kp, people = native.parse_keypoints_batch(paths, max_people=2,
                                                  num_joints=17)
        assert list(people) == [1] * 6 + [-1]
        for v in range(6):
            ref = read_keypoints_json(paths[v])[0]
            np.testing.assert_allclose(kp[v, 0], ref, rtol=1e-6)


class TestDataEdgeCases:
    def _make_tree(self, tmp_path, with_keyp=(True, False)):
        """Two cameras, one frame; keypoints present only per flag."""
        import json

        from PIL import Image

        for v, has in enumerate(with_keyp):
            cam = f"Camera{v:02d}"
            img_dir = tmp_path / "images" / "0007" / cam
            os.makedirs(img_dir, exist_ok=True)
            Image.new("RGB", (32, 24)).save(str(img_dir / "00001.jpg"))
            if has:
                kp_dir = tmp_path / "keypoints" / "0007" / cam
                os.makedirs(kp_dir, exist_ok=True)
                people = [{"pose_keypoints_2d":
                           list(np.arange(51, dtype=float))}]
                with open(kp_dir / "00001_keypoints.json", "w") as f:
                    json.dump({"version": 1.1, "people": people}, f)
        return str(tmp_path)

    def test_missing_view_masked(self, tmp_path):
        root = self._make_tree(tmp_path, with_keyp=(True, False))
        ds = FittingDataset(root)
        frame = ds[0]
        np.testing.assert_array_equal(frame.view_mask, [1.0, 0.0])
        assert (frame.keypoints[1] == 0).all()   # padded

    def test_no_keypoints_at_all(self, tmp_path):
        root = self._make_tree(tmp_path, with_keyp=(False, False))
        ds = FittingDataset(root)
        frame = ds[0]
        assert frame.view_mask.sum() == 0

    def test_multiple_people_padded(self, tmp_path):
        import json

        from PIL import Image

        img_dir = tmp_path / "images" / "0008" / "Camera00"
        os.makedirs(img_dir)
        Image.new("RGB", (32, 24)).save(str(img_dir / "00001.jpg"))
        kp_dir = tmp_path / "keypoints" / "0008" / "Camera00"
        os.makedirs(kp_dir)
        people = [{"pose_keypoints_2d": [float(i)] * 51}
                  for i in range(3)]
        with open(kp_dir / "00001_keypoints.json", "w") as f:
            json.dump({"people": people}, f)
        ds = FittingDataset(str(tmp_path), max_people=2)
        frame = ds[0]
        assert frame.keypoints.shape[1] == 2     # clamped to max_people
        np.testing.assert_array_equal(frame.person_mask[0], [1.0, 1.0])

    def test_empty_people_list(self, tmp_path):
        import json

        from PIL import Image

        img_dir = tmp_path / "images" / "0009" / "Camera00"
        os.makedirs(img_dir)
        Image.new("RGB", (32, 24)).save(str(img_dir / "00001.jpg"))
        kp_dir = tmp_path / "keypoints" / "0009" / "Camera00"
        os.makedirs(kp_dir)
        with open(kp_dir / "00001_keypoints.json", "w") as f:
            json.dump({"people": []}, f)
        ds = FittingDataset(str(tmp_path))
        frame = ds[0]
        assert frame.view_mask.sum() == 0
