"""Keypoint-adjustment re-optimization (the reference's GUI round,
programmatic).

The reference's `adjustment: true` pops a cv2 window to hand-edit 2D
keypoints and pose (`code/utils/utils.py:61-226,504-890`), then reruns
one optimization round with the final stage's weights
(`non_linear_solver.py:213-270`).  A GUI is out of scope for a TPU
service; the same capability lands as an API: supply edited
observations (and optionally nudged parameters) and get a re-optimized
fit that warm-starts from the previous solution.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..models.camera import Camera
from ..models.smpl import SMPLParams
from . import energy as E
from .energy import Observations
from .stages import FitConfig, FitResult, default_stages, run_stage


def refit_with_observations(cfg: FitConfig, assets, cam: Camera,
                            new_obs: Observations,
                            prev: FitResult,
                            vposer_w=None, gmm=None,
                            img_height: float = 1080.0,
                            params_override: Optional[SMPLParams] = None
                            ) -> FitResult:
    """One extra optimization round against edited keypoints.

    Mirrors the post-adjustment solve: final-stage weights only,
    warm-started from the previous result (`non_linear_solver.py:
    219-270`).  `params_override` supports the GUI's direct pose/shape
    nudging before the solve.
    """
    spec = cfg.spec
    params = params_override if params_override is not None else \
        prev.params
    x = E.pack(spec, params, prev.z if spec.use_vposer else None)

    weights = default_stages(cfg, jnp.asarray(img_height, jnp.float32))[-1]
    x, loss = run_stage(cfg, assets, cam, new_obs, weights, vposer_w,
                        gmm, x)

    params, z = E.unpack(spec, x)
    if spec.use_vposer:
        from ..models import vposer as vposer_lib
        body_pose = vposer_lib.decode(vposer_w, z)
    else:
        body_pose = params.body_pose
        z = prev.z
    return FitResult(params=params, z=z, body_pose=body_pose, loss=loss,
                     stage_losses=jnp.stack([loss]))
