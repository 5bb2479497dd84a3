"""Multi-host initialization and mesh helpers.

The reference's only distributed code is unused torch.distributed
scaffolding in YOLOX training (`yolox/utils/dist.py:37-255`).  Here the
multi-host story is the standard JAX one: `jax.distributed.initialize`
per host, one global device set, a (frames, cameras) mesh spanning
hosts.  The fitting collectives (psum of tiny normal-equation blocks)
ride ICI within a slice and DCN across hosts; frame shards never
communicate at all, so cross-host traffic per LM iteration is bounded
by the ~n^2/2 floats of the shared blocks (see camera_shard.py /
schur.py).

For single-host development and CI, `simulate_hosts` documents the
virtual-device recipe the test suite uses
(`XLA_FLAGS=--xla_force_host_platform_device_count=N`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import MeshLayout, make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-op when single-process.

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize()


def global_mesh(cameras_axis: int = 1):
    """Mesh over ALL devices (across hosts): frames gets the rest."""
    n = len(jax.devices())
    if n % cameras_axis:
        raise ValueError(f"{n} devices not divisible by cameras axis "
                         f"{cameras_axis}")
    return make_mesh(MeshLayout(frames=n // cameras_axis,
                                cameras=cameras_axis))


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global frame batch this process should load.

    Data loading is per-host: each process reads only the frames its
    devices own (frames axis is the leading batch dimension).
    """
    p = jax.process_index()
    n = jax.process_count()
    per = global_batch // n
    return slice(p * per, (p + 1) * per)


SIMULATE_HOSTS_RECIPE = (
    "env XLA_FLAGS=--xla_force_host_platform_device_count=8 "
    "JAX_PLATFORMS=cpu python ...  # 8 virtual devices, one process"
)
