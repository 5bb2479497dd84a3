"""Device mesh construction and sharding layouts."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAMES_AXIS = "frames"
CAMERAS_AXIS = "cameras"


@dataclass(frozen=True)
class MeshLayout:
    """How physical devices map to the logical (frames, cameras) grid."""

    frames: int
    cameras: int

    @property
    def total(self) -> int:
        return self.frames * self.cameras


def make_mesh(layout: Optional[MeshLayout] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (frames, cameras) mesh over the available devices.

    Default layout: all devices on the `frames` axis (pure frame
    batching — the highest-throughput configuration whenever there are
    more frames than devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    if layout is None:
        layout = MeshLayout(frames=len(devices), cameras=1)
    if layout.total != len(devices):
        raise ValueError(
            f"mesh layout {layout} needs {layout.total} devices, "
            f"got {len(devices)}")
    grid = np.asarray(devices).reshape(layout.frames, layout.cameras)
    return Mesh(grid, (FRAMES_AXIS, CAMERAS_AXIS))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading frame-batch axis over the frames mesh axis."""
    return NamedSharding(mesh, P(FRAMES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
