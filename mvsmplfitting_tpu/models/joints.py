"""Joint-set definitions: extra surface keypoints and annotation mappings.

The vertex indices and joint orderings are public SMPL-family constants
(same values the reference uses — `code/smplx/vertex_ids.py:23-70`,
`code/utils/utils.py:441-466`); the mapping itself is a plain gather.
"""

from __future__ import annotations

import numpy as np

# SMPL / SMPL-H surface-vertex ids for face keypoints (nose, eyes, ears) and
# optional feet / hand-tip keypoints.
VERTEX_IDS = {
    "smplh": {
        "nose": 332,
        "reye": 6260,
        "leye": 2800,
        "rear": 4071,
        "lear": 583,
        "rthumb": 6191,
        "rindex": 5782,
        "rmiddle": 5905,
        "rring": 6016,
        "rpinky": 6133,
        "lthumb": 2746,
        "lindex": 2319,
        "lmiddle": 2445,
        "lring": 2556,
        "lpinky": 2673,
        "LBigToe": 3216,
        "LSmallToe": 3226,
        "LHeel": 3387,
        "RBigToe": 6617,
        "RSmallToe": 6624,
        "RHeel": 6787,
    },
    "smplx": {
        "nose": 9120,
        "reye": 9929,
        "leye": 9448,
        "rear": 616,
        "lear": 6,
        "rthumb": 8079,
        "rindex": 7669,
        "rmiddle": 7794,
        "rring": 7905,
        "rpinky": 8022,
        "lthumb": 5361,
        "lindex": 4933,
        "lmiddle": 5058,
        "lring": 5169,
        "lpinky": 5286,
        "LBigToe": 5770,
        "LSmallToe": 5780,
        "LHeel": 8846,
        "RBigToe": 8463,
        "RSmallToe": 8474,
        "RHeel": 8635,
    },
}

# SMPL kinematic tree (24 joints); parents[0] = -1 (root).
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)

# Shared 22-joint body tree (SMPL joints 0-21) used by SMPL-H / SMPL-X.
_BODY22 = SMPL_PARENTS[:22]

# Per-hand finger chains: 5 fingers x 3 joints, each chain rooted at the
# wrist (public SMPL-H/SMPL-X kinematic tables).
def _hand(parent_wrist: int, start: int):
    out = []
    for f in range(5):
        out += [parent_wrist, start + 3 * f, start + 3 * f + 1]
    return tuple(out)


# SMPL-H: 22 body + 15 left-hand + 15 right-hand = 52 joints.
SMPLH_PARENTS = _BODY22 + _hand(20, 22) + _hand(21, 37)

# SMPL-X: 22 body + jaw + leye + reye (all children of head 15) +
# 15 + 15 hand joints = 55.
SMPLX_PARENTS = _BODY22 + (15, 15, 15) + _hand(20, 25) + _hand(21, 40)


def parents_for_model(model_type: str):
    if model_type in ("smpl", "smpllsp"):
        return SMPL_PARENTS
    if model_type == "smplh":
        return SMPLH_PARENTS
    if model_type == "smplx":
        return SMPLX_PARENTS
    raise ValueError(f"Unknown model type: {model_type}")


NUM_SMPL_JOINTS = 24
NUM_BODY_JOINTS = 23
NUM_BETAS = 10


def extra_joint_ids(
    vertex_id_set: str = "smplh",
    use_feet_keypoints: bool = False,
    use_hands: bool = False,
) -> np.ndarray:
    """Surface-vertex indices appended after the regressed joints.

    Default (demo) configuration appends only the 5 face keypoints,
    matching `vertex_joint_selector.py:29-77`.
    """
    ids = VERTEX_IDS[vertex_id_set]
    out = [ids["nose"], ids["leye"], ids["reye"], ids["lear"], ids["rear"]]
    if use_feet_keypoints:
        out += [ids["LBigToe"], ids["LSmallToe"], ids["LHeel"],
                ids["RBigToe"], ids["RSmallToe"], ids["RHeel"]]
    if use_hands:
        for hand in "lr":
            for tip in ["thumb", "index", "middle", "ring", "pinky"]:
                out.append(ids[hand + tip])
    return np.asarray(out, dtype=np.int32)


def model_to_annotation(model_type: str, pose_format: str) -> np.ndarray:
    """Gather indices mapping model joints -> annotation joint order.

    Annotation orders (indices into the post-selector joint list):
      coco17 (model_type=smpl):    Nose LEye REye LEar REar LS RS LE RE LW RW
                                   LH RH LK RK LA RA
      lsp14  (model_type=smpllsp): same annotation order, LSP-regressed body
      coco25 (model_type=smplx):   OpenPose BODY_25
    """
    if pose_format == "coco17":
        if model_type not in ("smpl", "smplh"):
            raise ValueError(f"coco17 requires smpl/smplh, got {model_type}")
        # Extras (face keypoints) are appended after the model's chain
        # joints; body joint ids 0-21 are shared across the family.
        nb = len(parents_for_model(model_type))
        return np.array(
            [nb, nb + 1, nb + 2, nb + 3, nb + 4,
             16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8],
            dtype=np.int32,
        )
    if pose_format == "lsp14":
        if model_type != "smpllsp":
            raise ValueError(f"lsp14 requires smpllsp, got {model_type}")
        return np.array(
            [14, 15, 16, 17, 18, 9, 8, 10, 7, 11, 6, 3, 2, 4, 1, 5, 0],
            dtype=np.int32,
        )
    if pose_format == "coco25":
        if model_type != "smplx":
            raise ValueError(f"coco25 requires smplx, got {model_type}")
        return np.array(
            [55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 56, 57, 58,
             59, 60, 61, 62, 63, 64, 65],
            dtype=np.int32,
        )
    raise ValueError(f"Unknown pose format: {pose_format}")


def pose_format_for_model(model_type: str) -> str:
    """Default annotation format per model type (`code/init.py:60-69`)."""
    if model_type == "smpllsp":
        return "lsp14"
    if model_type == "smplx":
        return "coco25"
    return "coco17"


def default_joint_weights(num_joints: int, pose_format: str,
                          use_hip: bool = True) -> np.ndarray:
    """Per-joint data-term weights.

    Ones everywhere, except hips (annotation indices 11, 12) are zeroed when
    the model cannot represent the annotated hips (non-LSP regressor or
    use_hip=False) — `data_parser.py:338-358`.
    """
    w = np.ones(num_joints, dtype=np.float32)
    if pose_format != "lsp14" or not use_hip:
        w[11] = 0.0
        w[12] = 0.0
    return w
