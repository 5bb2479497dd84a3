"""Detection frontend: person detector + heatmap pose estimator.

JAX/Flax re-designs of the reference's two preprocessing networks —
YOLOX-X person detection (`yolox/`) and FastPose(SE-ResNet50) 2D
keypoints (`alphapose_core/`) — as batched NHWC inference graphs that
jit once and stream whole camera batches through the MXU, instead of
the reference's per-image Python loops.  Weights convert from the
reference's torch checkpoints (`convert.py`); tests run shape/numerics
with random initialization since the checkpoints are external
downloads (`README.md:18-22`).
"""

from .yolox import YOLOX, decode_outputs, postprocess_boxes
from .fastpose import FastPose
from .simplepose import SimplePose
from .hrnet import PoseHRNet
from .hardnet import HarDNetPose
from .pose_nms import pose_nms, write_results_json
from .preprocess import (
    letterbox, bbox_to_center_scale, crop_affine, heatmap_to_coords,
    heatmap_to_coords_integral,
)
from .predictor import (KeypointPipeline, PersonDetector, PoseEstimator,
                        SmplPoseEstimator)
from .roi_align import roi_align, align_transform, clip_aspect_ratio
from .deform_conv import deform_conv2d, dcn_offset_mask_split
from .hybrik import Simple3DPoseSMPLCam, integral_uvd, uvd_to_xyz
from .metrics import (box_iou_xyxy, box_map, heatmap_pck, integral_pck,
                      keypoint_map, keypoint_oks, mask_iou)
from .fastpose_duc import FastPoseDUC, FastPoseDUCDense
from .coco_io import (evaluate_coco_map, load_coco_annotations,
                      load_coco_results, save_coco_results)
from .dataset import (CocoDetTrainDataset, CocoPoseEvalDataset,
                      CocoPoseTrainDataset, PoseEvalBatch)
from .zoo import POSE_MODELS, build_pose_model
from .deform_pool import (DeformRoIPoolingPack,
                          ModulatedDeformRoIPoolingPack, deform_roi_pool)
from .stream import frame_source, run_stream, run_stream_smpl
