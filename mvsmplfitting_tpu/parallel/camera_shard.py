"""Camera-axis-sharded Gauss-Newton fitting (shard_map + psum).

One frame's energy is a sum of per-view residual blocks plus priors.
Sharding the *views* of each frame over the `cameras` mesh axis, each
device computes the Jacobian block of its local views only; the
Gauss-Newton normal equations of the shared body parameters are then
assembled with a single `psum` of (J^T J, J^T r, loss) over the axis —
~n*(n+1)/2 + n + 1 floats for n ~ 50 unknowns, a trivially small
all-reduce that rides ICI.  The parameter update is computed redundantly
on every shard (replicated tiny solve), which costs nothing and avoids a
broadcast.

Combined with the `frames` axis (independent frame shards, no
communication), this is the full 2-D mesh decomposition of multi-view
bundle-adjustment-style fitting: the structural analogue of
data-parallel x tensor-parallel for this workload.  Nothing like it
exists in the reference (single device, views looped in Python —
`code/utils/fitting.py:296-299`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fitting import energy as E
from ..fitting.energy import EnergySpec, Observations, StageWeights
from ..fitting.initialize import init_guess
from ..fitting.lm import LMOptions
from ..fitting.stages import FitConfig, FitResult, default_stages
from ..models.camera import Camera
from .mesh import CAMERAS_AXIS, FRAMES_AXIS


def _local_camera(cam: Camera) -> Camera:
    return cam  # already a per-shard slice inside shard_map


def _lm_sharded(cfg: FitConfig, assets, vposer_w, gmm,
                cam_l: Camera, obs_l: Observations,
                weights: StageWeights, x0: jnp.ndarray,
                max_iters_cap: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LM minimization with camera-sharded normal-equation assembly.

    Runs inside `shard_map`; `cam_l` / `obs_l` hold this shard's views.
    ``max_iters_cap`` optionally replaces the static ``opts.max_iters``
    bound with a TRACED iteration cap, so different budgets (a fast
    smoke and a converged parity run) share one compiled program
    instead of recompiling the whole sharded fit per budget.
    """
    spec = cfg.spec
    opts = cfg.lm
    mask = E.free_mask(spec)
    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def data_res(x):
        # 2D rows of the local views only; the (view-independent) 3D
        # rows go into the replicated block below, else every camera
        # shard's psum would count them once each.
        return E.data_residuals(spec, assets, cam_l, obs_l, weights,
                                vposer_w, x, include_3d=False)

    def prior_res(x):
        rows = [E.prior_residuals(spec, weights, gmm, vposer_w, x)]
        if spec.use_3d and obs_l.gt3d is not None:
            rows.append(E.joints3d_residuals(spec, assets, obs_l,
                                             weights, vposer_w, x))
        return jnp.concatenate(rows)

    def loss_of(x):
        rd = data_res(x)
        rp = prior_res(x)
        return (jax.lax.psum(jnp.sum(rd * rd), CAMERAS_AXIS) +
                jnp.sum(rp * rp))

    use_analytic = (opts.jac == "analytic"
                    and E.analytic_jac_ok(spec, assets)
                    and not spec.interpenetration)

    def analytic_rJ(x):
        """(r, J) pairs for the local 2D rows and the replicated
        prior/3D rows — deep blocks via the closed-form chain/decoder
        Jacobians (`energy._analytic_core`), replicated per shard like
        the solve; only the cheap shallow row tails differ per shard."""
        (joints, djoints, z_in, dz, body_pose, dbp, betas, dbe) = \
            E._analytic_core(spec, assets, vposer_w, x)

        rd, lin_d = jax.linearize(
            lambda j: E._data_rows_from_joints(
                spec, cam_l, obs_l, weights, j, include_3d=False),
            joints)
        Jd = jax.vmap(lin_d)(djoints).T

        def prior_rows(j, zz, bp, be):
            rows = [E._prior_rows_core(spec, weights, gmm, zz, bp, be)]
            if spec.use_3d and obs_l.gt3d is not None:
                w3 = obs_l.conf3d[:, None] * weights.data
                from ..ops.robust import gmof_residual
                rows.append((w3 * gmof_residual(obs_l.gt3d - j,
                                                spec.rho)).reshape(-1))
            return jnp.concatenate(rows)

        rp, lin_p = jax.linearize(prior_rows, joints, z_in, body_pose,
                                  betas)
        Jp = jax.vmap(lin_p)(djoints, dz, dbp, dbe).T
        return rd, Jd, rp, Jp

    def step(state):
        x, loss, lam, it, done = state
        if use_analytic:
            rd, Jd, rp, Jp = analytic_rJ(x)
            Jd = Jd * mask[None, :]
            Jp = Jp * mask[None, :]
        else:
            rd, lin_d = jax.linearize(data_res, x)
            Jd = jax.vmap(lin_d)(eye).T * mask[None, :]
            rp, lin_p = jax.linearize(prior_res, x)
            Jp = jax.vmap(lin_p)(eye).T * mask[None, :]
        blocks = (Jd.T @ Jd, Jd.T @ rd)
        JtJ_d, g_d = jax.lax.psum(blocks, CAMERAS_AXIS)

        JtJ = JtJ_d + Jp.T @ Jp
        g = g_d + Jp.T @ rp

        diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
        A = JtJ + lam * jnp.diag(diag) + 1e-12 * eye
        # No LU: XLA's LU lowering is a sequential latency chain (see
        # lm._solve_spd; measured +37% chol / +90% schulz on the solo
        # fit).  The solve is replicated per shard either way.
        from ..fitting.lm import _solve_spd
        dx = -_solve_spd(A, g, opts.linsolve, opts.schulz_iters) * mask

        new_x = x + dx
        new_loss = loss_of(new_x)
        accept = jnp.isfinite(new_loss) & (new_loss < loss)
        x = jnp.where(accept, new_x, x)
        loss_out = jnp.where(accept, new_loss, loss)
        lam = jnp.clip(jnp.where(accept, lam * opts.lambda_down,
                                 lam * opts.lambda_up),
                       opts.min_lambda, opts.max_lambda)
        rel = jnp.abs(loss - new_loss) / jnp.maximum(
            jnp.maximum(jnp.abs(loss), jnp.abs(new_loss)), 1.0)
        done = done | (accept & (rel <= opts.ftol)) | \
            (jnp.max(jnp.abs(g)) < opts.gtol)
        return (x, loss_out, lam, it + 1, done)

    iter_bound = (opts.max_iters if max_iters_cap is None
                  else max_iters_cap)

    def cond(state):
        return (state[3] < iter_bound) & ~state[4]

    init = (x0, loss_of(x0), jnp.asarray(opts.init_lambda, x0.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    x, loss, *_ = jax.lax.while_loop(cond, step, init)
    return x, loss


def sharded_triangulate(cam_l: Camera, gt2d: jnp.ndarray,
                        conf: jnp.ndarray, view_mask: jnp.ndarray,
                        axis_name: str = CAMERAS_AXIS) -> jnp.ndarray:
    """Confidence-weighted DLT triangulation with the views sharded
    over ``axis_name`` (call inside `shard_map`): each shard builds the
    3x3 normal-equation blocks of its local views, one psum assembles
    them, and the tiny solve is computed redundantly per shard.

    Bit-identical (mod reduction order) to the single-device
    `ops.triangulate.triangulate` (reference `recompute3D.py:22-62`).
    Args are the LOCAL view slices: gt2d (Vl, K, 2), conf (Vl, K),
    view_mask (Vl,).  Returns (K, 3).
    """
    from ..ops.triangulate import backproject_rays

    nr = backproject_rays(cam_l, gt2d)
    nmat = jnp.eye(3) - jnp.einsum("vka,vkb->vkab", nr, nr)
    rn = jnp.einsum("vba,vkbc->vkac", cam_l.rotation, nmat)
    w = (conf + 1e-6) * view_mask[:, None]
    AtA = jnp.einsum("vk,vkab,vbc->kac", w, rn, cam_l.rotation)
    Atb = jnp.einsum("vk,vkab,vb->ka", -w, rn, cam_l.translation)
    AtA, Atb = jax.lax.psum((AtA, Atb), axis_name)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def camera_sharded_fit(cfg: FitConfig, assets, cam: Camera,
                       obs: Observations, mesh: Mesh,
                       vposer_w=None, gmm=None,
                       img_height: float = 1080.0,
                       est_scale: bool = True,
                       max_iters_cap: Optional[jnp.ndarray] = None,
                       scan_stages: bool = False):
    """Fit a frame batch on a (frames, cameras) mesh.

    Args:
      obs: batched observations, arrays shaped (B, V, ...); B divisible
        by the frames axis, V by the cameras axis.
      max_iters_cap: optional traced per-stage iteration cap (replaces
        the static ``cfg.lm.max_iters`` while-loop bound; different
        budgets then reuse one compiled program).
      scan_stages: run the annealing stages as one `lax.scan` over a
        stacked weights table instead of a Python unroll — ~4x less
        graph to trace/compile (the dryrun/CI choice; the unrolled
        default lets XLA constant-fold per-stage weights, which
        measured ~10% faster on chip for the solo fit).

    Returns:
      (x (B, n) packed parameters, loss (B,)).
    """
    spec = cfg.spec
    stages = default_stages(cfg, jnp.asarray(img_height, jnp.float32))
    if scan_stages:
        # This path never evaluates the SDF term (no collision rows in
        # `_lm_sharded`), so the static coll_on flag is dead — normalize
        # it for a uniform pytree structure across the stacked stages.
        stages = [s.replace(coll_on=False) for s in stages]
        wtable = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    cap = (jnp.asarray(cfg.lm.max_iters, jnp.int32)
           if max_iters_cap is None
           else jnp.asarray(max_iters_cap, jnp.int32))

    obs_spec = Observations(
        gt2d=P(FRAMES_AXIS, CAMERAS_AXIS),
        conf=P(FRAMES_AXIS, CAMERAS_AXIS),
        view_mask=P(FRAMES_AXIS, CAMERAS_AXIS),
        joint_weights=P(FRAMES_AXIS),
        gt3d=None if obs.gt3d is None else P(FRAMES_AXIS),
        conf3d=None if obs.conf3d is None else P(FRAMES_AXIS))
    cam_spec = Camera(rotation=P(CAMERAS_AXIS),
                      translation=P(CAMERAS_AXIS),
                      focal=P(CAMERAS_AXIS), center=P(CAMERAS_AXIS))

    extra_in = ((jax.tree.map(lambda _: P(), wtable),)
                if scan_stages else ())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(cam_spec, obs_spec, P()) + extra_in,
        out_specs=(P(FRAMES_AXIS), P(FRAMES_AXIS)),
        check_vma=False)
    def run(cam_l: Camera, obs_l: Observations, cap_l, *wt):
        def one_frame(o: Observations):
            # Initialization needs all views: triangulation's 3x3 normal
            # equations are themselves psum-assembled across the axis.
            from ..ops.alignment import umeyama
            from ..ops.rotations import matrix_to_axis_angle
            from ..models.smpl import SMPLParams, rest_joints
            from ..fitting.initialize import torso_indices

            rest = rest_joints(assets)
            joints3d = sharded_triangulate(cam_l, o.gt2d, o.conf,
                                           o.view_mask)

            torso = torso_indices(assets.model_type)
            rot, trans, scale = umeyama(rest[torso], joints3d[torso],
                                        est_scale)
            params = SMPLParams(
                betas=jnp.zeros((assets.num_betas,)),
                global_orient=matrix_to_axis_angle(rot),
                body_pose=jnp.zeros((69,)), transl=trans, scale=scale)
            x = E.pack(spec, params,
                       jnp.zeros((E.LATENT_DIM,)) if spec.use_vposer
                       else None)

            if scan_stages:
                def stage_body(carry, w):
                    xc, _ = carry
                    xn, ln = _lm_sharded(cfg, assets, vposer_w, gmm,
                                         cam_l, o, w, xc, cap_l)
                    return (xn, ln), None
                (x, loss), _ = jax.lax.scan(
                    stage_body, (x, jnp.zeros(())), wt[0])
            else:
                loss = jnp.zeros(())
                for wts in stages:
                    x, loss = _lm_sharded(cfg, assets, vposer_w, gmm,
                                          cam_l, o, wts, x, cap_l)
            return x, loss

        return jax.vmap(one_frame)(obs_l)

    if scan_stages:
        return run(cam, obs, cap, wtable)
    return run(cam, obs, cap)
