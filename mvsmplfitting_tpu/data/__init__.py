"""Data layer: dataset walking, keypoint/camera IO, result writers."""

from .keypoints import (
    read_keypoints_json,
    read_joints3d_json,
    save_keypoints_json,
)
from .dataset import FittingDataset, FrameData, frame_to_observations
from .results import FitOutputs, save_result_pkl, load_result_pkl, save_obj
