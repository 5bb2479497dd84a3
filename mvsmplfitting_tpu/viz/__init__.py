"""Visualization: mesh overlays and keypoint drawing."""

from .overlay import render_mesh_overlay, save_overlays, draw_keypoints
from .skeletons import SKELETONS, SkeletonSpec, skeleton_for, vis_frame
