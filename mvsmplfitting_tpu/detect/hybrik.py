"""HybrIK-style 3D pose + SMPL regressor (Simple3DPoseSMPLCam), NHWC.

Rebuild of `alphapose_core/alphapose/models/simple3dposeSMPLWithCam.py`
(the one pose-zoo model round 1 left out).  Architecture
(`simple3dposeSMPLWithCam.py:32-127,186-253`):

* ResNet backbone (50 by default) -> (H/32, W/32, 2048) features;
* 3 x ConvTranspose(k4 s2)+BN+ReLU (filters 256/256/256) then a 1x1
  conv to `num_joints * depth_dim` channels — a 3D heatmap volume;
* softmax-normalized integral decode to per-joint (u, v, d) in
  [-0.5, 0.5] (`:219-238`);
* an FC head (1024-1024) off the pooled backbone features regressing
  shape deltas (+ mean shape), 23 twist (cos, sin) pairs, and a weak-
  perspective camera (scale, tx, ty) added to init (0.9, 0, 0)
  (`:240-253`);
* camera back-projection of the uvd skeleton to root-relative metric
  xyz (`:284-322`).

The reference cannot instantiate this model as shipped (its SMPL_layer
import is commented out and the pkl/regressor files are absent), so
parity here is arithmetic: the decode/back-projection math is asserted
against a straightforward numpy transliteration of the cited lines, and
the IK stage (`models/hybrik.py`) is validated by round-trip.  Dropout
is inference-mode (identity), as in the zoo's eval path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, ResBottleneck, batch_norm
from .simplepose import ResNet50


class Simple3DPoseSMPLCam(nn.Module):
    num_joints: int = 29
    depth_dim: int = 64
    height_dim: int = 64
    width_dim: int = 48
    deconv_filters: Tuple[int, int, int] = (256, 256, 256)
    focal_length: float = 1000.0
    input_size: float = 256.0
    depth_factor: float = 2.0     # bbox_3d_shape[2] * 1e-3

    @nn.compact
    def __call__(self, x, init_shape=None):
        """x: (N, H, W, 3) -> dict of uvd joints, shape, phis, camera.

        `init_shape`: (10,) mean shape added to the regressed deltas
        (the reference loads `h36m_mean_beta.npy`; zeros by default).
        """
        N = x.shape[0]
        feat = ResNet50(name="preact")(x)           # (N, h, w, 2048)

        y = feat
        for i, f in enumerate(self.deconv_filters):
            y = nn.ConvTranspose(f, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 name=f"deconv{i + 1}")(y)
            y = batch_norm(self, name=f"bn{i + 1}")(y)
            y = nn.relu(y)
        y = nn.Conv(self.num_joints * self.depth_dim, (1, 1),
                    use_bias=True, name="final")(y)  # (N, H, W, J*D)

        # NHWC -> the reference's (N, J, D*H*W) flattening order (its
        # channel dim interleaves J then D: `final_layer` outputs
        # J*depth channels in NCHW; reshape (N, J, D, H, W)).
        H, W = y.shape[1], y.shape[2]
        vol = y.transpose(0, 3, 1, 2).reshape(
            N, self.num_joints, self.depth_dim, H, W)
        uvd, maxvals = integral_uvd(vol, self.width_dim,
                                    self.height_dim, self.depth_dim)

        # FC head on globally pooled backbone features (`:240-253`).
        xc = jnp.mean(feat, axis=(1, 2))
        xc = nn.Dense(1024, name="fc1")(xc)
        xc = nn.Dense(1024, name="fc2")(xc)
        delta_shape = nn.Dense(10, name="decshape")(xc)
        pred_phi = nn.Dense(23 * 2, name="decphi")(xc).reshape(N, 23, 2)
        init_cam = jnp.asarray([0.9, 0.0, 0.0])
        pred_cam = nn.Dense(3, name="deccam")(xc) + init_cam

        shape0 = (jnp.zeros((10,)) if init_shape is None else init_shape)
        return {
            "pred_uvd_jts": uvd,                    # (N, J, 3)
            "pred_shape": delta_shape + shape0,
            "pred_phi": pred_phi,
            "pred_camera": pred_cam,
            "maxvals": maxvals,
        }


def integral_uvd(vol: jnp.ndarray, width_dim: int, height_dim: int,
                 depth_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax integral decode of a (N, J, D, H, W) heatmap volume.

    Reference `simple3dposeSMPLWithCam.py:211-238`: global softmax per
    joint, expectation along each axis, normalized to [-0.5, 0.5].
    Returns (uvd (N, J, 3), maxvals (N, J, 1)).
    """
    N, J = vol.shape[:2]
    flat = vol.reshape(N, J, -1)
    heat = jax.nn.softmax(flat, axis=2)
    maxvals = jnp.max(heat, axis=2, keepdims=True)
    heat = heat.reshape(N, J, depth_dim, vol.shape[3], vol.shape[4])

    hm_x = heat.sum((2, 3))                         # (N, J, W)
    hm_y = heat.sum((2, 4))                         # (N, J, H)
    hm_z = heat.sum((3, 4))                         # (N, J, D)
    rx = jnp.arange(hm_x.shape[-1], dtype=jnp.float32)
    ry = jnp.arange(hm_y.shape[-1], dtype=jnp.float32)
    rz = jnp.arange(hm_z.shape[-1], dtype=jnp.float32)
    cx = (hm_x * rx).sum(-1) / float(width_dim) - 0.5
    cy = (hm_y * ry).sum(-1) / float(height_dim) - 0.5
    cz = (hm_z * rz).sum(-1) / float(depth_dim) - 0.5
    return jnp.stack([cx, cy, cz], axis=-1), maxvals


def uvd_to_xyz(uvd: jnp.ndarray, pred_camera: jnp.ndarray,
               focal_length: float = 1000.0, input_size: float = 256.0,
               depth_factor: float = 2.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uvd ([-0.5, 0.5]^3) -> root-relative xyz + camera root.

    The no-bbox branch of `simple3dposeSMPLWithCam.py:284-322`:
    weak-perspective camera (scale, tx, ty); camDepth = f / (s * size);
    xy_meter = (uv * size / f) * (d * depth_factor + camDepth) - t_xy;
    output xyz normalized by depth_factor, root-relative.

    Returns (xyz (N, J, 3) in depth_factor units, cam_root (N, 3) m).
    """
    cam_scale = pred_camera[:, :1][:, None]          # (N, 1, 1)
    cam_trans = pred_camera[:, 1:][:, None]          # (N, 1, 2)
    cam_depth = focal_length / (input_size * cam_scale + 1e-9)

    z = uvd[..., 2:]                                 # (N, J, 1)
    xy_m = ((uvd[..., :2] * input_size / focal_length) *
            (z * depth_factor + cam_depth) - cam_trans)
    xyz = jnp.concatenate([xy_m / depth_factor, z], axis=-1)
    root = xyz[:, 0, :] * depth_factor
    root = root.at[:, 2].add(cam_depth[:, 0, 0])
    return xyz - xyz[:, :1], root
