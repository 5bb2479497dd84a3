"""Staged annealing fit: the reference's 4-stage schedule as one program.

The reference loops 4 weight stages in Python, rebuilding the optimizer
each time (`non_linear_solver.py:156-211`).  Here the stage loop is a
compile-time unroll inside one jitted function: same parameter vector
threaded through all stages, per-stage weights baked from the config
(`cfg_files/fit_smpl.yaml:40-59`), solver either Levenberg-Marquardt
(primary) or strong-Wolfe L-BFGS (parity).  The whole thing vmaps over a
batch of frames — the TPU replacement for the reference's per-frame
Python loop (`main.py:32`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.camera import Camera
from ..models.priors import GMMPrior
from ..models.smpl import SMPLAssets, SMPLParams
from ..models.vposer import VPoserWeights
from . import energy as E
from .energy import EnergySpec, Observations, StageWeights
from .gradient import GradientOptions, gradient_fit
from .lbfgs import LBFGSOptions, lbfgs_fit
from .lm import LMOptions, lm_fit, lm_fit_staged

# Demo schedule (`cfg_files/fit_smpl.yaml:40-59`): per-stage
# (body_pose_weight, shape_weight, coll_loss_weight); data weight is
# 500 / image_height for every stage (`non_linear_solver.py:150`) and
# bending = 3.17 * pose (`non_linear_solver.py:178-179`).
DEFAULT_POSE_WEIGHTS = (404.0, 404.0, 57.4, 4.78)
DEFAULT_SHAPE_WEIGHTS = (100.0, 50.0, 10.0, 5.0)
DEFAULT_COLL_WEIGHTS = (0.0, 0.0, 1000.0, 4500.0)


@struct.dataclass
class FitConfig:
    """Static fit configuration (jit-key fields only)."""

    spec: EnergySpec = struct.field(pytree_node=False, default=EnergySpec())
    solver: str = struct.field(pytree_node=False, default="lm")
    pose_weights: Tuple[float, ...] = struct.field(
        pytree_node=False, default=DEFAULT_POSE_WEIGHTS)
    shape_weights: Tuple[float, ...] = struct.field(
        pytree_node=False, default=DEFAULT_SHAPE_WEIGHTS)
    coll_weights: Tuple[float, ...] = struct.field(
        pytree_node=False, default=DEFAULT_COLL_WEIGHTS)
    lm: LMOptions = struct.field(pytree_node=False, default=LMOptions())
    lbfgs: LBFGSOptions = struct.field(
        pytree_node=False, default=LBFGSOptions())
    grad: GradientOptions = struct.field(
        pytree_node=False, default=GradientOptions())
    # Fused mode: all stages in ONE while_loop (lm_fit_staged).  Same
    # math, but measured ~25% slower than the unrolled stages (XLA
    # constant-folds per-stage weights in the unrolled form) with no
    # compile-time win — kept as an option, default off.  Auto-disabled
    # for the L-BFGS solver and mixed collision stages.
    fused: bool = struct.field(pytree_node=False, default=False)
    # Sequence mode: non-start frames skip stages 0-1 and run stage 2 at
    # 0.15x pose weight (`non_linear_solver.py:156-162`).
    is_seq: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class FitResult:
    params: SMPLParams
    z: jnp.ndarray            # (32,) pose embedding (zeros if no vposer)
    body_pose: jnp.ndarray    # (69,) decoded/direct body pose
    loss: jnp.ndarray         # final scalar energy
    stage_losses: jnp.ndarray  # (num_stages,)


def default_stages(cfg: FitConfig, img_height: jnp.ndarray,
                   seq_start: bool = True) -> Sequence[StageWeights]:
    """Materialize the per-stage weights for one frame."""
    data_w = 500.0 / img_height
    stages = []
    for i, (pw, sw, cw) in enumerate(zip(
            cfg.pose_weights, cfg.shape_weights, cfg.coll_weights)):
        if cfg.is_seq and not seq_start:
            if i < 2:
                continue
            if i == 2:
                pw = pw * 0.15
        stages.append(StageWeights.make(data=data_w, pose=pw, shape=sw,
                                        coll=cw))
    return stages


def stage_weights_table(cfg: FitConfig, img_height,
                        seq_start: bool = True) -> StageWeights:
    """Stages stacked on a leading axis (for `lax.scan` over stages)."""
    stages = default_stages(cfg, jnp.asarray(img_height, jnp.float32),
                            seq_start)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def run_stage(cfg: FitConfig, assets: SMPLAssets, cam: Camera,
              obs: Observations, weights: StageWeights,
              vposer_w: Optional[VPoserWeights], gmm: Optional[GMMPrior],
              x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One annealing stage from x; returns (x_new, final energy)."""
    spec = cfg.spec
    mask = E.free_mask(spec)

    if cfg.solver == "lm":
        def res_fn(xv):
            return E.residuals(spec, assets, cam, obs, weights, vposer_w,
                               gmm, xv)

        jac_fn = None
        if (cfg.lm.jac == "analytic" and E.analytic_jac_ok(spec, assets)
                and not (spec.interpenetration and weights.coll_on)):
            def jac_fn(xv):
                return E.residual_jacobian(spec, assets, cam, obs,
                                           weights, vposer_w, gmm, xv)
        x_new, _ = lm_fit(res_fn, x, mask, cfg.lm, jac_fn=jac_fn)
        # Report the true scalar energy (incl. non-LSQ constants like the
        # GMM -log w term) so losses are comparable across solvers.
        loss = E.total_energy(spec, assets, cam, obs, weights, vposer_w,
                              gmm, x_new)
    else:
        def fg(xv):
            return jax.value_and_grad(
                lambda q: E.total_energy(spec, assets, cam, obs, weights,
                                         vposer_w, gmm, q))(xv)
        if cfg.solver in ("adam", "rmsprop", "sgd"):
            opts = cfg.grad
            if opts.optim_type != cfg.solver:
                opts = opts.replace(optim_type=cfg.solver)
            x_new, loss = gradient_fit(fg, x, mask, opts)
        else:  # "lbfgs" / "lbfgsls" (parity solver)
            x_new, loss = lbfgs_fit(fg, x, mask, cfg.lbfgs)
    return x_new, loss


def fit_frame(cfg: FitConfig, assets: SMPLAssets, cam: Camera,
              obs: Observations,
              init_params: SMPLParams, init_z: jnp.ndarray,
              vposer_w: Optional[VPoserWeights] = None,
              gmm: Optional[GMMPrior] = None,
              img_height: float = 1080.0,
              seq_start: bool = True) -> FitResult:
    """Fit one frame through the full annealing schedule.

    Pure function of arrays — jit it once, `vmap` it over a frame batch,
    `shard_map` it over a mesh (see `parallel/`).
    """
    spec = cfg.spec
    x = E.pack(spec, init_params, init_z if spec.use_vposer else None)

    stages = default_stages(cfg, jnp.asarray(img_height, jnp.float32),
                            seq_start)
    # Collision stages only differ when the energy actually computes
    # collision; with interpenetration off, coll_on is dead code and
    # must not block fusing (the demo config's (0,0,1000,4500) weights
    # otherwise disable the fused path for nothing).
    use_fused = (cfg.fused and cfg.solver == "lm" and
                 (not spec.interpenetration or
                  len({w.coll_on for w in stages}) == 1))
    if use_fused:
        if not spec.interpenetration:
            # coll_on is a static pytree field; normalize the dead flag
            # so the per-stage trees share one structure for stacking.
            stages = [s.replace(coll_on=False) for s in stages]
        table = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
        mask = E.free_mask(spec)

        def res(xv, w):
            return E.residuals(spec, assets, cam, obs, w, vposer_w,
                               gmm, xv)

        jac_fn = None
        if (cfg.lm.jac == "analytic" and E.analytic_jac_ok(spec, assets)
                and not any(s.coll_on and spec.interpenetration
                            for s in stages)):
            def jac_fn(xv, w):
                return E.residual_jacobian(spec, assets, cam, obs, w,
                                           vposer_w, gmm, xv)
        x, losses_arr = lm_fit_staged(res, x, mask, table, len(stages),
                                      cfg.lm, jac_fn=jac_fn)
        stage_losses = [losses_arr[i] for i in range(len(stages))]
        # Report the final scalar energy (matches the unrolled path,
        # incl. non-LSQ constants like the GMM -log w offset).
        stage_losses[-1] = E.total_energy(
            spec, assets, cam, obs, stages[-1], vposer_w, gmm, x)
    else:
        stage_losses = []
        for weights in stages:
            x, loss = run_stage(cfg, assets, cam, obs, weights,
                                vposer_w, gmm, x)
            stage_losses.append(loss)

    params, z = E.unpack(spec, x)
    if spec.use_vposer:
        from ..models import vposer as vposer_lib
        body_pose = vposer_lib.decode(vposer_w, z)
    else:
        body_pose = params.body_pose
        z = jnp.zeros((E.LATENT_DIM,), x.dtype)
    return FitResult(params=params, z=z, body_pose=body_pose,
                     loss=stage_losses[-1],
                     stage_losses=jnp.stack(stage_losses))
