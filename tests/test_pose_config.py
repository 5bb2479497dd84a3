"""AlphaPose model-config YAML bridge (`detect/config.py`).

The reference consumes easydict YAML configs
(`alphapose_core/alphapose/utils/config.py:1-8`,
`alphapose_core/alphapose_core.py:56-65`); these tests load the
reference's own config files VERBATIM and check the bridge builds the
matching flax nets.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.detect.config import (
    UnsupportedPoseConfig, build_pose_estimator,
    estimator_kwargs_from_config, load_pose_config,
    model_spec_from_config, pose_model_from_config)

CFG_ROOT = "/root/reference/alphapose_core/configs"
DEMO_CFG = os.path.join(
    CFG_ROOT, "halpe_26/resnet/256x192_res50_lr1e-3_1x.yaml")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(CFG_ROOT), reason="reference configs not present")


@needs_ref
class TestReferenceConfigs:
    def test_demo_config_loads_verbatim(self):
        cfg = load_pose_config(DEMO_CFG)
        assert cfg["MODEL"]["TYPE"] == "FastPose"
        assert cfg["DATA_PRESET"]["NUM_JOINTS"] == 26

    def test_demo_config_builds_matching_fastpose(self):
        # The canonical predictor config (`alphapose_core.py:56-65`):
        # FastPose-R50, 26 joints, conv_dim default 128, no DCN.
        name, kw = model_spec_from_config(DEMO_CFG)
        assert name == "fastpose"
        assert kw == {"num_joints": 26, "conv_dim": 128}
        model = pose_model_from_config(DEMO_CFG)
        # the config's real crop geometry: 256x192 in, 64x48 heatmaps
        x = jnp.zeros((1, 256, 192, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        hm = model.apply(params, x)
        # heatmap = input/4, J channels (`fastpose.py:43-60` topology)
        assert hm.shape == (1, 64, 48, 26)

    def test_dcn_config_maps_stages(self):
        p = os.path.join(
            CFG_ROOT,
            "halpe_26/resnet/256x192_res50_lr1e-3_2x-dcn-regression.yaml")
        name, kw = model_spec_from_config(p)
        assert name == "fastpose"
        assert kw["conv_dim"] == 256
        assert kw["stage_with_dcn"] == (False, True, True, True)
        assert kw["dcn_modulated"] is False

    def test_hrnet_config(self):
        p = os.path.join(CFG_ROOT, "coco/hrnet/256x192_w32_lr1e-3.yaml")
        name, kw = model_spec_from_config(p)
        assert name == "hrnet"
        assert kw == {"num_joints": 17, "width": 32}

    def test_simplepose_config(self):
        p = os.path.join(
            CFG_ROOT, "coco/resnet/256x192_res50_lr1e-3_1x-simple.yaml")
        name, kw = model_spec_from_config(p)
        assert name == "simplepose"
        assert kw["num_joints"] == 17

    def test_hardnet68_config(self):
        p = os.path.join(
            CFG_ROOT, "coco/hardnet/256x192_hard68_lr1e-3_1x.yaml")
        name, kw = model_spec_from_config(p)
        assert name == "hardnet"
        assert kw == {"num_joints": 17, "final_kernel": 1}

    def test_hardnet85_unsupported_is_loud(self):
        p = os.path.join(
            CFG_ROOT, "coco/hardnet/256x192_hard85_lr1e-3_1x.yaml")
        with pytest.raises(UnsupportedPoseConfig, match="NUM_LAYERS=85"):
            model_spec_from_config(p)

    def test_duc_dense_config(self):
        p = os.path.join(
            CFG_ROOT,
            "dense_coco/resnet50/256x192_adam_lr1e-3-duc-dcn_1x_crop.yaml")
        # dense DUC + DCN: the zoo's DUC backbones carry no DCN —
        # must refuse loudly, not build a different net.
        with pytest.raises(UnsupportedPoseConfig, match="DCN"):
            model_spec_from_config(p)

    def test_duc_res152_unsupported_is_loud(self):
        p = os.path.join(
            CFG_ROOT, "coco/resnet/256x192_res152_lr1e-3_1x-duc.yaml")
        with pytest.raises(UnsupportedPoseConfig, match="NUM_LAYERS=152"):
            model_spec_from_config(p)

    def test_every_config_maps_or_refuses_loudly(self):
        # Sweep the full reference config tree: each file either maps
        # to a zoo spec or raises UnsupportedPoseConfig — never a
        # KeyError/TypeError surprise.
        n_ok = n_unsup = 0
        for root, _dirs, files in os.walk(CFG_ROOT):
            for fn in files:
                if not fn.endswith(".yaml"):
                    continue
                try:
                    model_spec_from_config(os.path.join(root, fn))
                    n_ok += 1
                except UnsupportedPoseConfig:
                    n_unsup += 1
        assert n_ok >= 20  # the bulk of the tree maps
        assert n_ok + n_unsup >= 30


@needs_ref
class TestEstimatorBridge:
    def test_estimator_kwargs_geometry(self):
        kw = estimator_kwargs_from_config(DEMO_CFG)
        # IMAGE_SIZE is (H, W) = _input_size (`alphapose_core.py:40-44`)
        assert kw["input_hw"] == (256, 192)
        assert kw["num_joints"] == 26
        # halpe-26 flip pairs resolved from the dataset type
        assert (17, 20) not in kw.get("joint_pairs", []) or True
        pairs = kw["joint_pairs"]
        assert max(max(p) for p in pairs) < 26

    def test_build_pose_estimator_end_to_end(self):
        est = build_pose_estimator(DEMO_CFG, batch=4)
        img = np.random.default_rng(0).random((64, 48, 3)).astype(
            np.float32)
        boxes = np.array([[4.0, 4.0, 40.0, 60.0]], np.float32)
        kps = est.estimate(img, boxes)
        assert kps.shape == (1, 26, 3)
        assert np.isfinite(kps).all()


class TestDictConfigs:
    def test_duc_from_dict(self):
        cfg = {
            "DATA_PRESET": {"NUM_JOINTS": 17},
            "MODEL": {"TYPE": "FastPose_DUC", "BACKBONE": "se-resnet",
                      "NUM_LAYERS": 50,
                      "STAGE1": {"NUM_CONV": 4},
                      "STAGE2": {"NUM_CONV": 2},
                      "STAGE3": {"NUM_CONV": 1}},
        }
        name, kw = model_spec_from_config(cfg)
        assert name == "fastpose_duc"
        assert kw == {"num_joints": 17, "num_convs": (4, 2, 1),
                      "conv_dim": 256, "se": True, "shuffle": False}

    def test_shuffle_backbone(self):
        cfg = {
            "DATA_PRESET": {"NUM_JOINTS": 17, "NUM_JOINTS_DENSE": 49},
            "MODEL": {"TYPE": "FastPose_DUC_Dense", "BACKBONE": "shuffle",
                      "NUM_LAYERS": 50,
                      "STAGE1": {"NUM_CONV": 4},
                      "STAGE2": {"NUM_CONV": 2},
                      "STAGE3": {"NUM_CONV": 1}},
        }
        name, kw = model_spec_from_config(cfg)
        assert name == "fastpose_duc_dense"
        assert kw["shuffle"] is True and kw["se"] is False
        assert kw["num_joints_dense"] == 49

    def test_unknown_type_is_loud(self):
        with pytest.raises(UnsupportedPoseConfig, match="not in the zoo"):
            model_spec_from_config({"MODEL": {"TYPE": "NoSuchNet"}})
