"""Sequence fitting with shared shape via Schur-complement elimination.

The reference refits betas independently every frame; physically one
person has ONE shape, so the right sequence formulation couples a
shared (betas, scale) block against per-frame (z, orient, transl)
blocks.  The Gauss-Newton normal equations then have block-arrow
structure:

    [ A_1          B_1 ] [dx_1]   [g_1]
    [      ...     ...  ] [ ...] = [...]
    [          A_B B_B ] [dx_B]   [g_B]
    [ B_1^T ... B_B^T C ] [ ds ]   [h ]

Per-frame blocks A_f (38x38) invert locally; the shared system reduces
to the Schur complement S = C - sum_f B_f^T A_f^-1 B_f — an 11x11
solve whose sum is a `psum` over the frames mesh axis.  This is the
bundle-adjustment analogue of data-parallel training where the shared
shape plays the role of replicated parameters and the psum is the
gradient all-reduce (SURVEY.md section 2.6).

Everything is vmapped over the local frame shard and jitted as one
program; cross-device traffic per LM iteration is one psum of
(11x11 + 11 + 1) floats.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fitting import energy as E
from ..fitting.energy import EnergySpec, Observations, StageWeights
from ..fitting.lm import LMOptions
from ..fitting.stages import FitConfig, default_stages
from ..models.camera import Camera
from ..models.smpl import SMPLParams
from .mesh import FRAMES_AXIS

# Parameter split: shared = [betas (NB), scale (1)]; per-frame =
# [pose block (32 or 69), orient (3), transl (3)].


def split_dims(spec: EnergySpec) -> Tuple[int, int]:
    per_frame = E.pose_dim(spec) + 6
    shared = spec.num_betas + 1
    return per_frame, shared


def _assemble_x(spec: EnergySpec, xf: jnp.ndarray, xs: jnp.ndarray
                ) -> jnp.ndarray:
    """(per-frame, shared) -> the energy module's packed layout
    [pose, betas, orient, transl, scale]."""
    p = E.pose_dim(spec)
    nb = spec.num_betas
    return jnp.concatenate([
        xf[:p], xs[:nb], xf[p:p + 3], xf[p + 3:p + 6], xs[nb:nb + 1]])


def schur_sequence_fit(cfg: FitConfig, assets, cam: Camera,
                       obs: Observations,
                       init_params: SMPLParams, init_z: jnp.ndarray,
                       vposer_w=None, gmm=None,
                       img_height: float = 1080.0,
                       mesh: Optional[Mesh] = None):
    """Fit B frames with one shared (betas, scale).

    Args:
      obs: batched (B, V, ...) observations of one person over time.
      init_params / init_z: batched (B, ...) per-frame initial guesses;
        the shared block starts from frame 0's values.

    Returns:
      (params (B,...), z (B, 32), losses (B,), shared (NB+1,)).
    """
    spec = cfg.spec
    opts = cfg.lm
    nf, ns = split_dims(spec)
    stages = default_stages(cfg, jnp.asarray(img_height, jnp.float32))

    def make_residual(weights):
        def frame_residual(xf, xs, o):
            x = _assemble_x(spec, xf, xs)
            return E.residuals(spec, assets, cam, o, weights,
                               vposer_w, gmm, x)
        return frame_residual

    # Frame/shared column ids of the PACKED Jacobian (the analytic
    # path computes J on the packed layout; the block split is just a
    # column partition — `_assemble_x` inverted).
    p, nb = E.pose_dim(spec), spec.num_betas
    f_cols = jnp.asarray(list(range(p))
                         + list(range(p + nb, p + nb + 6)), jnp.int32)
    s_cols = jnp.asarray(list(range(p, p + nb)) + [p + nb + 6],
                         jnp.int32)
    use_analytic = (opts.jac == "analytic"
                    and E.analytic_jac_ok(spec, assets))

    def body(obs_l, xf0, xs0):
        """One shard's frames; xs replicated. Runs under shard_map or
        plain (mesh=None)."""

        def psum(v):
            if mesh is None:
                return v
            return jax.lax.psum(v, FRAMES_AXIS)

        def stage_solve(carry, weights):
            xf, xs = carry
            frame_residual = make_residual(weights)

            def lm_iter(state):
                xf, xs, loss, lam, it, done = state

                def per_frame(xf_f, o):
                    if use_analytic:
                        # Closed-form packed J (kernel-accelerated
                        # under the frames vmap, `ops/joint_kernel`);
                        # the frame/shared split is a column gather.
                        r, J = E.residual_jacobian(
                            spec, assets, cam, o, weights, vposer_w,
                            gmm, _assemble_x(spec, xf_f, xs))
                        Jf = J[:, f_cols]
                        Js = J[:, s_cols]
                    else:
                        r, lin = jax.linearize(
                            lambda a, b: frame_residual(a, b, o),
                            xf_f, xs)
                        Jf = jax.vmap(
                            lambda e: lin(e, jnp.zeros(ns)))(
                            jnp.eye(nf)).T
                        Js = jax.vmap(
                            lambda e: lin(jnp.zeros(nf), e))(
                            jnp.eye(ns)).T
                    A = Jf.T @ Jf
                    Bm = Jf.T @ Js
                    C = Js.T @ Js
                    gf = Jf.T @ r
                    h = Js.T @ r
                    return A, Bm, C, gf, h, jnp.sum(r * r)

                A, Bm, C, gf, h, losses = jax.vmap(per_frame)(xf, obs_l)

                # LM damping on both blocks.
                dA = jnp.maximum(
                    jnp.diagonal(A, axis1=-2, axis2=-1), 1e-8)
                A_d = A + lam * jax.vmap(jnp.diag)(dA)
                from ..fitting.lm import _spd_inv
                A_inv = jax.vmap(_spd_inv)(
                    A_d + 1e-12 * jnp.eye(nf)[None])

                C_sum = psum(jnp.sum(C, 0))
                h_sum = psum(jnp.sum(h, 0))
                # Schur complement of the shared block.
                BtAiB = psum(jnp.sum(
                    jnp.einsum("fij,fik,fkl->fjl", Bm, A_inv, Bm), 0))
                BtAig = psum(jnp.sum(
                    jnp.einsum("fij,fik,fk->fj", Bm, A_inv, gf), 0))
                dC = jnp.maximum(jnp.diagonal(C_sum), 1e-8)
                S = C_sum - BtAiB + lam * jnp.diag(dC) + \
                    1e-12 * jnp.eye(ns)
                from ..fitting.lm import _solve_spd
                ds = -_solve_spd(S, h_sum - BtAig, "chol")
                dxf = -jnp.einsum("fij,fj->fi", A_inv,
                                  gf + jnp.einsum("fij,j->fi", Bm, ds))

                # Respect fix_shape / fix_scale.
                smask = jnp.concatenate([
                    jnp.zeros(spec.num_betas) if spec.fix_shape
                    else jnp.ones(spec.num_betas),
                    jnp.zeros(1) if spec.fix_scale else jnp.ones(1)])
                ds = ds * smask

                new_xf = xf + dxf
                new_xs = xs + ds

                def loss_at(xf_, xs_):
                    r = jax.vmap(
                        lambda f, o: frame_residual(f, xs_, o))(
                            xf_, obs_l)
                    return psum(jnp.sum(r * r))

                total_new = loss_at(new_xf, new_xs)
                accept = jnp.isfinite(total_new) & (total_new < loss)
                xf = jnp.where(accept, new_xf, xf)
                xs = jnp.where(accept, new_xs, xs)
                loss_out = jnp.where(accept, total_new, loss)
                lam = jnp.clip(
                    jnp.where(accept, lam * opts.lambda_down,
                              lam * opts.lambda_up),
                    opts.min_lambda, opts.max_lambda)
                rel = jnp.abs(loss - total_new) / jnp.maximum(
                    jnp.maximum(jnp.abs(loss), jnp.abs(total_new)), 1.0)
                done = done | (accept & (rel <= opts.ftol))
                return (xf, xs, loss_out, lam, it + 1, done)

            def cond(state):
                return (state[4] < opts.max_iters) & ~state[5]

            r0 = jax.vmap(lambda f, o: frame_residual(f, xs, o))(
                xf, obs_l)
            loss0 = psum(jnp.sum(r0 * r0))
            init = (xf, xs, loss0,
                    jnp.asarray(opts.init_lambda),
                    jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
            xf, xs, loss, *_ = jax.lax.while_loop(cond, lm_iter, init)
            return (xf, xs), loss

        carry = (xf0, xs0)
        if len({w.coll_on for w in stages}) == 1:
            # All stages share the (static) collision gate: scan over
            # the stacked weights so the LM body is traced ONCE instead
            # of once per stage — measured 20.7 s -> single-stage-sized
            # trace+compile on the 8-device CPU mesh.
            table = jax.tree.map(lambda *xs_: jnp.stack(xs_), *stages)
            carry, _ = jax.lax.scan(
                lambda c, w: (stage_solve(c, w)[0], 0.0), carry, table)
        else:
            for w in stages:
                carry, _ = stage_solve(carry, w)
        xf, xs = carry

        # Per-frame final losses for reporting.
        final_residual = make_residual(stages[-1])
        per_losses = jax.vmap(
            lambda f, o: jnp.sum(final_residual(f, xs, o) ** 2))(
                xf, obs_l)
        return xf, xs, per_losses

    # Initial split of the packed parameters.
    p = E.pose_dim(spec)
    xf0 = jnp.concatenate([
        init_z if spec.use_vposer else init_params.body_pose,
        init_params.global_orient, init_params.transl], axis=-1)
    xs0 = jnp.concatenate([
        init_params.betas[0], init_params.scale[0][None]])

    if mesh is None:
        xf, xs, losses = body(obs, xf0, xs0)
    else:
        obs_spec = jax.tree.map(lambda _: P(FRAMES_AXIS), obs)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(obs_spec, P(FRAMES_AXIS), P()),
            out_specs=(P(FRAMES_AXIS), P(), P(FRAMES_AXIS)),
            check_vma=False)
        xf, xs, losses = fn(obs, xf0, xs0)

    B = xf.shape[0]
    betas = jnp.broadcast_to(xs[:spec.num_betas], (B, spec.num_betas))
    scale = jnp.broadcast_to(xs[spec.num_betas], (B,))
    params = SMPLParams(
        betas=betas,
        global_orient=xf[:, p:p + 3],
        body_pose=(jnp.zeros((B, 69)) if spec.use_vposer
                   else xf[:, :p]),
        transl=xf[:, p + 3:p + 6],
        scale=scale)
    z = xf[:, :p] if spec.use_vposer else jnp.zeros((B, 32))
    return params, z, losses, xs
