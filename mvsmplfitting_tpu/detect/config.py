"""AlphaPose model-config YAML bridge.

The reference builds its pose nets from easydict-wrapped YAML files
(`alphapose_core/alphapose/utils/config.py:1-8`, consumed by
`alphapose_core/alphapose_core.py:56-65`: ``cfg.MODEL`` selects the
net via the SPPE registry and ``cfg.DATA_PRESET`` fixes crop/heatmap
geometry).  This module accepts those `configs/**/*.yaml` files
verbatim and maps them onto the flax zoo (`detect/zoo.py`) and the
`PoseEstimator` wrapper — so a user of the reference can point at the
same config file (e.g.
`configs/halpe_26/resnet/256x192_res50_lr1e-3_1x.yaml`) and get the
matching TPU net.

Key consumption parity (reference `models/*.py` ``cfg[...]`` reads):

- ``MODEL.TYPE``        — registry name (`builder.py:21-27`)
- ``MODEL.NUM_LAYERS``  — backbone depth (`fastpose.py:28-34`)
- ``MODEL.CONV_DIM``    — head width, default 128 (`fastpose.py:19-22`)
- ``MODEL.DCN`` / ``MODEL.STAGE_WITH_DCN`` — deformable stages
  (`fastpose.py:23-29`)
- ``MODEL.BACKBONE``    — 'se-resnet' | 'shuffle' | resnet
  (`fastpose_duc.py:21-28`)
- ``MODEL.STAGE{1,2,3}.NUM_CONV`` — DUC depths (`fastpose_duc.py:51-53`)
- ``MODEL.STAGE{2,3,4}.NUM_CHANNELS`` — HRNet widths (`hrnet.py`)
- ``DATA_PRESET.NUM_JOINTS`` / ``NUM_JOINTS_DENSE`` / ``IMAGE_SIZE`` /
  ``HEATMAP_SIZE`` — head size + crop geometry
  (`simple_transform.py:84-102`)

Unsupported combinations (a backbone depth the zoo does not carry)
raise `UnsupportedPoseConfig` with the exact missing piece instead of
silently building a different net.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import yaml

from .zoo import build_pose_model

__all__ = [
    "UnsupportedPoseConfig", "load_pose_config", "model_spec_from_config",
    "pose_model_from_config", "estimator_kwargs_from_config",
    "build_pose_estimator",
]


class UnsupportedPoseConfig(ValueError):
    """A reference config names a net variant the zoo does not carry."""


def load_pose_config(path_or_dict) -> Dict[str, Any]:
    """Reference YAML (`utils/config.py:update_config`) -> plain dict."""
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict) as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict) or "MODEL" not in cfg:
        raise ValueError(f"{path_or_dict}: not an AlphaPose model config "
                         "(no MODEL section)")
    return cfg


def _dcn_kwargs(model: Dict[str, Any]) -> Dict[str, Any]:
    if "DCN" not in model:
        return {}
    return {
        "stage_with_dcn": tuple(bool(b) for b in model["STAGE_WITH_DCN"]),
        "dcn_modulated": bool(model["DCN"].get("MODULATED", False)),
    }


def _require_layers(model: Dict[str, Any], supported: Tuple[int, ...],
                    what: str) -> int:
    n = int(model.get("NUM_LAYERS", supported[0]))
    if n not in supported:
        raise UnsupportedPoseConfig(
            f"{what}: NUM_LAYERS={n} backbone not in the zoo "
            f"(supported: {supported})")
    return n


def model_spec_from_config(cfg) -> Tuple[str, Dict[str, Any]]:
    """Config -> (zoo name, kwargs) for `build_pose_model`."""
    cfg = load_pose_config(cfg)
    model = cfg["MODEL"]
    preset = cfg.get("DATA_PRESET", {})
    num_joints = int(preset.get("NUM_JOINTS", 17))
    mtype = str(model.get("TYPE", "FastPose"))
    key = mtype.lower()

    if key == "fastpose":
        _require_layers(model, (50,), mtype)
        kw: Dict[str, Any] = {"num_joints": num_joints,
                              "conv_dim": int(model.get("CONV_DIM", 128))}
        kw.update(_dcn_kwargs(model))
        return "fastpose", kw

    if key in ("fastpose_duc", "fastpose_duc_dense"):
        _require_layers(model, (50,), mtype)
        if "DCN" in model:
            raise UnsupportedPoseConfig(
                f"{mtype}: the zoo's DUC backbones do not carry DCN "
                "stages (use MODEL.TYPE FastPose for DCN configs)")
        backbone = str(model.get("BACKBONE", "resnet"))
        kw = {
            "num_joints": num_joints,
            "num_convs": tuple(int(model[f"STAGE{i}"]["NUM_CONV"])
                               for i in (1, 2, 3)),
            "conv_dim": int(model.get("CONV_DIM", 256)),
            "se": backbone == "se-resnet",
            "shuffle": backbone == "shuffle",
        }
        if key == "fastpose_duc_dense":
            kw["num_joints_dense"] = int(
                preset.get("NUM_JOINTS_DENSE", 136))
        return key, kw

    if key == "simplepose":
        _require_layers(model, (50,), mtype)
        return "simplepose", {"num_joints": num_joints}

    if key == "posehighresolutionnet":
        width = int(model["STAGE2"]["NUM_CHANNELS"][0])
        return "hrnet", {"num_joints": num_joints, "width": width}

    if key == "hardnetpose":
        _require_layers(model, (68,), mtype)
        return "hardnet", {
            "num_joints": num_joints,
            "final_kernel": int(model.get("FINAL_CONV_KERNEL", 1))}

    raise UnsupportedPoseConfig(f"MODEL.TYPE {mtype!r} not in the zoo")


def pose_model_from_config(cfg):
    """Config (path or dict) -> flax module, reference-equivalent."""
    name, kw = model_spec_from_config(cfg)
    return build_pose_model(name, **kw)


# DATASET.*.TYPE -> skeleton-registry format names (viz/skeletons.py);
# used to pick flip-pair tables for flip-test / training augmentation.
_DATASET_FORMATS = {
    "halpe_26": "halpe26", "halpe_26_det": "halpe26",
    "halpe_136": "halpe136", "halpe_136_det": "halpe136",
    "halpe_coco_wholebody_136": "halpe136",
    "halpe_68_noface": "halpe68", "halpe_68_noface_det": "halpe68",
    "coco_wholebody": "coco_wholebody133",
    "coco_wholebody_det": "coco_wholebody133",
    "mscoco": "coco17", "mscoco_det": "coco17",
}


def estimator_kwargs_from_config(cfg) -> Dict[str, Any]:
    """Config -> `PoseEstimator` kwargs (net + crop geometry +
    flip pairs).  IMAGE_SIZE is (H, W) like the reference's
    `_input_size` (`alphapose_core.py:40-44`)."""
    cfg = load_pose_config(cfg)
    preset = cfg.get("DATA_PRESET", {})
    num_joints = int(preset.get("NUM_JOINTS", 17))
    kw: Dict[str, Any] = {
        "model": pose_model_from_config(cfg),
        "num_joints": num_joints,
        "input_hw": tuple(int(v) for v in
                          preset.get("IMAGE_SIZE", (256, 192))),
    }
    dtype = str(cfg.get("DATASET", {}).get("TRAIN", {})
                .get("TYPE", "")).lower()
    fmt = _DATASET_FORMATS.get(dtype)
    if fmt is not None:
        from .preprocess import flip_pairs_for
        try:
            kw["joint_pairs"] = flip_pairs_for(num_joints, fmt)
        except (KeyError, ValueError):
            pass  # keep the predictor's COCO-17 default quirk
    return kw


def build_pose_estimator(cfg, params=None, **overrides):
    """One-stop: reference YAML -> ready `PoseEstimator`.

    `overrides` pass through to the wrapper (flip_test, batch,
    compute_dtype, use_pose_nms, ...).
    """
    from .predictor import PoseEstimator
    kw = estimator_kwargs_from_config(cfg)
    kw.update(overrides)
    return PoseEstimator(params, **kw)


def reference_config_path(*parts: str) -> str:
    """Join a path under the reference's `alphapose_core/configs/`
    tree if present (test/dev convenience)."""
    root = "/root/reference/alphapose_core/configs"
    p = os.path.join(root, *parts)
    return p
