"""Pose-model factory — the reference's `MODEL.TYPE` registry
(`alphapose/models/builder.py:12-46` + `utils/registry.py`) as one
plain function over the flax zoo.  Extra kwargs pass straight to the
module (conv_dim, deconv_filters, width, ...).
"""

from __future__ import annotations

from .fastpose import FastPose
from .fastpose_duc import FastPoseDUC, FastPoseDUCDense
from .hardnet import HarDNetPose
from .hrnet import PoseHRNet
from .simplepose import SimplePose

POSE_MODELS = {
    "fastpose": FastPose,
    "simplepose": SimplePose,
    "hrnet": PoseHRNet,
    "hardnet": HarDNetPose,
    "fastpose_duc": FastPoseDUC,
    "fastpose_duc_dense": FastPoseDUCDense,
}


def build_pose_model(name: str, num_joints: int = 17, **kwargs):
    """'fastpose' | 'simplepose' | 'hrnet' | 'hardnet' |
    'fastpose_duc' | 'fastpose_duc_dense' -> flax module."""
    key = name.lower().replace("-", "_")
    if key not in POSE_MODELS:
        raise ValueError(
            f"unknown pose model {name!r}; one of {sorted(POSE_MODELS)}")
    return POSE_MODELS[key](num_joints=num_joints, **kwargs)
