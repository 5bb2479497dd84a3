"""Parallel layer: device meshes, batched fitting, sharded solvers.

The reference has no distributed fitting at all (its only collective
code is unused YOLOX training scaffolding, `yolox/utils/dist.py`).
Here parallelism is first-class:

* `frames` mesh axis — batches of independent per-frame fits, the TPU
  analogue of data parallelism for this workload (replaces the
  reference's frame `for` loop, `main.py:32`);
* `cameras` mesh axis — per-view residual blocks of one fit computed on
  different devices, with the Gauss-Newton normal equations assembled by
  `psum` over the axis (the tensor-parallel analogue: the reduced
  quantity is the J^T J of shared body parameters);
* multi-host: the same mesh spans hosts via `jax.distributed`;
  collectives ride ICI within a slice, DCN across hosts.
"""

from .mesh import make_mesh, frames_sharding, MeshLayout
from .batched import batched_fit_frames, BatchedFitInputs
from .camera_shard import camera_sharded_fit, sharded_triangulate
from .schur import schur_sequence_fit
from .distributed import (global_mesh, init_distributed,
                          process_local_batch_slice)
