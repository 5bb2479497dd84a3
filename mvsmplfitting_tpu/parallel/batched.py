"""Frame-batched fitting sharded over the `frames` mesh axis.

A batch of frames is one vmapped fit program; the batch axis is sharded
across devices with `NamedSharding`, so XLA runs each device's shard of
frames locally with zero communication (the fits are independent — the
embarrassingly-parallel axis the reference leaves on the table by
looping frames in Python, `main.py:32`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fitting.energy import Observations
from ..fitting.initialize import init_guess
from ..fitting.stages import FitConfig, FitResult, fit_frame
from ..models.camera import Camera
from .mesh import FRAMES_AXIS


class BatchedFitInputs(NamedTuple):
    """Stacked per-frame inputs (leading axis = frames)."""

    obs: Observations        # arrays (B, V, ...)
    img_height: jnp.ndarray  # (B,)


def _shard_batch(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P(FRAMES_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def batched_fit_frames(cfg: FitConfig, assets, cam: Camera,
                       batch: BatchedFitInputs,
                       vposer_w=None, gmm=None,
                       mesh: Optional[Mesh] = None,
                       est_scale: bool = True,
                       donate: bool = False) -> FitResult:
    """Initialize and fit a whole batch of frames in one jitted program.

    The initializer (triangulation + umeyama) runs vmapped inside the
    same program, so a frame batch goes host->device once and comes back
    once.  With `mesh`, the batch axis is sharded over `frames`.
    """

    def one_frame(obs: Observations, h):
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask,
                           est_scale=est_scale)
        return fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                         vposer_w=vposer_w, gmm=gmm, img_height=h)

    fit = jax.vmap(one_frame)
    if mesh is not None:
        batch = _shard_batch(batch, mesh)
        out_sh = NamedSharding(mesh, P(FRAMES_AXIS))
        fit = jax.jit(fit, out_shardings=out_sh)
    else:
        fit = jax.jit(fit)
    return fit(batch.obs, batch.img_height)
