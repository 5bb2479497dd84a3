"""Pinhole cameras: projection and parameter file IO.

The projection matches the reference's `PerspectiveCamera.forward`
(`code/camera.py:93-117`): world point -> [R|t] -> perspective divide ->
focal scale + principal point.  Here cameras are plain arrays batched on a
leading view axis, so projecting into all views is one vmapped einsum —
the per-view Python loop the reference runs disappears into one fused op
that shards over the `cameras` mesh axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Camera:
    """A batch of V pinhole cameras."""

    rotation: jnp.ndarray     # (V, 3, 3) world->cam
    translation: jnp.ndarray  # (V, 3)
    focal: jnp.ndarray        # (V, 2)  fx, fy
    center: jnp.ndarray       # (V, 2)  cx, cy

    @property
    def num_views(self) -> int:
        return self.rotation.shape[0]

    def extrinsic(self) -> jnp.ndarray:
        """(V, 4, 4) homogeneous world->cam matrices."""
        V = self.num_views
        bottom = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]]), (V, 1, 1))
        top = jnp.concatenate(
            [self.rotation, self.translation[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def intrinsic(self) -> jnp.ndarray:
        """(V, 3, 3) K matrices."""
        V = self.num_views
        K = jnp.zeros((V, 3, 3), self.focal.dtype)
        K = K.at[:, 0, 0].set(self.focal[:, 0])
        K = K.at[:, 1, 1].set(self.focal[:, 1])
        K = K.at[:, 0, 2].set(self.center[:, 0])
        K = K.at[:, 1, 2].set(self.center[:, 1])
        K = K.at[:, 2, 2].set(1.0)
        return K


def project_points(cam: Camera, points: jnp.ndarray) -> jnp.ndarray:
    """Project world points into every view.

    Args:
      points: (..., 3) world-space points.

    Returns:
      (V, ..., 2) pixel coordinates per view.
    """
    # Unrolled 3-term multiply-add instead of einsum: a batched tiny
    # dot_general is a separate kernel on chip while elementwise chains
    # fuse into the surrounding graph (docs/BENCH_NOTES.md r4) — this
    # projection sits inside every residual/Jacobian evaluation.
    rot = cam.rotation.reshape(
        (cam.num_views,) + (1,) * (points.ndim - 1) + (3, 3))
    cam_pts = (sum(rot[..., b] * points[None, ..., b, None]
                   for b in range(3))
               + cam.translation.reshape(
                   (cam.num_views,) + (1,) * (points.ndim - 1) + (3,)))
    xy = cam_pts[..., :2] / cam_pts[..., 2:3]
    shape = (cam.num_views,) + (1,) * (points.ndim - 1) + (2,)
    return xy * cam.focal.reshape(shape) + cam.center.reshape(shape)


def load_cameras_txt(path: str, dtype=jnp.float32) -> Camera:
    """Parse the reference's camera text format (`utils.py:352-394`).

    Per camera: an index line, 3 rows of K, a distortion line (ignored),
    3 rows of [R|t].  Row length distinguishes K rows (3 numbers) from
    extrinsic rows (4 numbers).
    """
    k_rows, e_rows = [], []
    with open(path) as f:
        for line in f:
            words = line.split()
            if len(words) == 3:
                k_rows.append([float(w) for w in words])
            elif len(words) == 4:
                e_rows.append([float(w) for w in words])
    if not k_rows or not e_rows:
        raise ValueError(f"No cameras parsed from {path}")
    K = np.asarray(k_rows, np.float64).reshape(-1, 3, 3)
    E = np.asarray(e_rows, np.float64).reshape(-1, 3, 4)
    assert K.shape[0] == E.shape[0], "camera file K/extrinsic count mismatch"
    return Camera(
        rotation=jnp.asarray(E[:, :, :3], dtype),
        translation=jnp.asarray(E[:, :, 3], dtype),
        focal=jnp.asarray(np.stack([K[:, 0, 0], K[:, 1, 1]], -1), dtype),
        center=jnp.asarray(K[:, :2, 2], dtype),
    )


def get_rot_trans(campose, photoscan: bool = False):
    """Split 4x4 camera poses into (translations, rotations) lists
    (`code/utils/module_utils.py:327-338`; also `utils.py` — used by
    `init.py:106`).  ``photoscan=True`` inverts each pose first — the
    reference's adapter for Agisoft-convention extrinsics stored as
    camera-to-world.
    """
    trans, rot = [], []
    for cam_pose in campose:
        if photoscan:
            cam_pose = np.linalg.inv(cam_pose)
        trans.append(cam_pose[:3, 3])
        rot.append(cam_pose[:3, :3])
    return trans, rot


def save_cameras_txt(path: str, cam: Camera) -> None:
    """Write cameras back in the same text format."""
    K = np.asarray(cam.intrinsic())
    R = np.asarray(cam.rotation)
    t = np.asarray(cam.translation)
    with open(path, "w") as f:
        for v in range(cam.num_views):
            f.write(f"{v}\n")
            for row in K[v]:
                f.write(" ".join(str(x) for x in row) + " \n")
            f.write("0 0\n")
            for i in range(3):
                f.write(" ".join(str(x) for x in R[v, i]) +
                        f" {t[v, i]} \n")
            f.write("\n")
