"""The multi-view SMPLify fitting energy, in two equivalent forms.

Scalar form (`total_energy`) reproduces the reference's `SMPLifyLoss`
(`code/utils/fitting.py:290-415`): GMoF-robustified, confidence-weighted
2D reprojection over all views, plus VPoser / GMM / L2 pose priors,
L2 shape prior, exponential bending prior, and optional 3D-joint and
interpenetration terms.  This is what the L-BFGS parity solver minimizes.

Residual form (`residuals`) restates the *identical* objective as a
least-squares vector (sum of squares == scalar form), which the primary
Gauss-Newton / Levenberg-Marquardt solver consumes: ~50 unknowns against
a few hundred residual rows, so the normal equations are tiny and the
cost is dominated by Jacobians of the SMPL forward — dense batched
matmuls that map straight onto the MXU, especially once vmapped over a
frame batch.

Differences from the reference are deliberate TPU-first choices:
* views are padded to a static count and masked (`view_mask`), instead
  of Python-level view dropping (`main.py:49-57`), keeping shapes static
  under jit;
* the ad-hoc outlier gates (GMM loss > 5e4 dropped, angle prior > 1e4
  dropped — `fitting.py:334-335,349-350`) become branch-free `where`
  masks with identical values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models import vposer as vposer_lib
from ..models.camera import Camera, project_points
from ..models.priors import GMMPrior, angle_prior_terms
from ..models.smpl import SMPLAssets, SMPLParams, smpl_forward
from ..ops.robust import gmof, gmof_residual

LATENT_DIM = vposer_lib.LATENT_DIM


@struct.dataclass
class Observations:
    """Per-frame fitting observations (static shapes; masked views)."""

    gt2d: jnp.ndarray          # (V, K, 2) 2D keypoints
    conf: jnp.ndarray          # (V, K) detection confidences
    view_mask: jnp.ndarray     # (V,) 1 for live views, 0 for padded
    joint_weights: jnp.ndarray  # (K,) per-joint data weights
    gt3d: Optional[jnp.ndarray] = None   # (K, 3) 3D joints
    conf3d: Optional[jnp.ndarray] = None  # (K,)


@struct.dataclass
class StageWeights:
    """Annealing-stage loss weights (`non_linear_solver.py:103-121`)."""

    data: jnp.ndarray     # the reference's data_weight = 500 / img_height
    pose: jnp.ndarray     # body_pose_weight
    shape: jnp.ndarray    # shape_weight
    bending: jnp.ndarray  # 3.17 * pose (`non_linear_solver.py:178-179`)
    coll: jnp.ndarray     # coll_loss_weight
    # Static: whether this stage evaluates the SDF term at all (the
    # reference's Python-level `coll_loss_weight.item() > 0` check,
    # `fitting.py:355`).  Differing values give different jit graphs, so
    # stages with/without collision cannot be stacked into one scan.
    coll_on: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def make(cls, data, pose, shape, bending=None, coll=0.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        if bending is None:
            bending = 3.17 * pose
        return cls(data=f(data), pose=f(pose), shape=f(shape),
                   bending=f(bending), coll=f(coll),
                   coll_on=bool(coll > 0))


@struct.dataclass
class EnergySpec:
    """Static configuration of the energy (hashable; part of jit key)."""

    use_vposer: bool = struct.field(pytree_node=False, default=True)
    fix_shape: bool = struct.field(pytree_node=False, default=False)
    fix_scale: bool = struct.field(pytree_node=False, default=False)
    use_3d: bool = struct.field(pytree_node=False, default=False)
    use_joints_conf: bool = struct.field(pytree_node=False, default=True)
    prior_type: str = struct.field(pytree_node=False, default="l2")
    rho: float = struct.field(pytree_node=False, default=100.0)
    num_betas: int = struct.field(pytree_node=False, default=10)
    # Interpenetration (SDF) term — `fitting.py:352-394`.
    interpenetration: bool = struct.field(pytree_node=False, default=False)
    coll_grid_size: int = struct.field(pytree_node=False, default=32)
    use_pallas_sdf: bool = struct.field(pytree_node=False, default=False)
    # SMPL-H/X optimizable blocks (0 / False = absent).  hand_dim is the
    # per-hand block size: the reference's `num_pca_comps=6`
    # (`body_models.py:424`), or 45 for raw axis-angle (use_pca=False).
    hand_dim: int = struct.field(pytree_node=False, default=0)
    num_expr: int = struct.field(pytree_node=False, default=0)
    opt_face: bool = struct.field(pytree_node=False, default=False)


# ---------------------------------------------------------------------------
# Flat parameter vector <-> structured params.
# Layout: [pose_block, betas(10), global_orient(3), transl(3), scale(1),
#          lhand(HD), rhand(HD), expression(NE), jaw(3), leye(3), reye(3)]
# where pose_block is z(32) with vposer or body_pose(69) without, and the
# tail blocks exist only when the spec enables them (SMPL-H/X).
# ---------------------------------------------------------------------------

def pose_dim(spec: EnergySpec) -> int:
    return LATENT_DIM if spec.use_vposer else 69


def extra_dims(spec: EnergySpec) -> int:
    """Total size of the SMPL-H/X tail blocks."""
    return (2 * spec.hand_dim + spec.num_expr +
            (9 if spec.opt_face else 0))


def num_unknowns(spec: EnergySpec) -> int:
    return pose_dim(spec) + spec.num_betas + 3 + 3 + 1 + extra_dims(spec)


def _tail_blocks(spec: EnergySpec, params: SMPLParams, dtype):
    """The enabled tail blocks from params (None behaves as zeros)."""
    out = []

    def blk(v, d):
        return v if v is not None else jnp.zeros((d,), dtype)

    if spec.hand_dim:
        out.append(blk(params.left_hand_pose, spec.hand_dim))
        out.append(blk(params.right_hand_pose, spec.hand_dim))
    if spec.num_expr:
        out.append(blk(params.expression, spec.num_expr))
    if spec.opt_face:
        out.append(blk(params.jaw_pose, 3))
        out.append(blk(params.leye_pose, 3))
        out.append(blk(params.reye_pose, 3))
    return out


def pack(spec: EnergySpec, params: SMPLParams,
         z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    block = z if spec.use_vposer else params.body_pose
    return jnp.concatenate([
        block, params.betas, params.global_orient, params.transl,
        params.scale[None]] + _tail_blocks(spec, params, block.dtype))


def unpack(spec: EnergySpec, x: jnp.ndarray
           ) -> Tuple[SMPLParams, Optional[jnp.ndarray]]:
    p = pose_dim(spec)
    nb = spec.num_betas
    block, betas = x[:p], x[p:p + nb]
    orient = x[p + nb:p + nb + 3]
    transl = x[p + nb + 3:p + nb + 6]
    scale = x[p + nb + 6]

    tail = {}
    o = p + nb + 7
    if spec.hand_dim:
        tail["left_hand_pose"] = x[o:o + spec.hand_dim]
        tail["right_hand_pose"] = x[o + spec.hand_dim:o + 2 * spec.hand_dim]
        o += 2 * spec.hand_dim
    if spec.num_expr:
        tail["expression"] = x[o:o + spec.num_expr]
        o += spec.num_expr
    if spec.opt_face:
        tail["jaw_pose"] = x[o:o + 3]
        tail["leye_pose"] = x[o + 3:o + 6]
        tail["reye_pose"] = x[o + 6:o + 9]

    if spec.use_vposer:
        return SMPLParams(betas=betas, global_orient=orient,
                          body_pose=jnp.zeros((69,), x.dtype),
                          transl=transl, scale=scale, **tail), block
    return SMPLParams(betas=betas, global_orient=orient, body_pose=block,
                      transl=transl, scale=scale, **tail), None


def free_mask(spec: EnergySpec) -> jnp.ndarray:
    """1 for optimized entries, 0 for frozen (fix_scale / fix_shape)."""
    p = pose_dim(spec)
    m = [jnp.ones((p,))]
    m.append(jnp.zeros((spec.num_betas,)) if spec.fix_shape
             else jnp.ones((spec.num_betas,)))
    m.append(jnp.ones((6,)))
    m.append(jnp.zeros((1,)) if spec.fix_scale else jnp.ones((1,)))
    if extra_dims(spec):
        m.append(jnp.ones((extra_dims(spec),)))
    return jnp.concatenate(m)


# ---------------------------------------------------------------------------
# Energy terms.
# ---------------------------------------------------------------------------

def _forward(spec: EnergySpec, assets: SMPLAssets,
             vposer_w: Optional[vposer_lib.VPoserWeights],
             x: jnp.ndarray, need_verts: bool = False):
    params, z = unpack(spec, x)
    if spec.use_vposer:
        body_pose = vposer_lib.decode(vposer_w, z)
    else:
        body_pose = params.body_pose
    if assets.joint_model is not None and not need_verts:
        # Reduced path: mapped joints without any 6890-vertex work
        # (exact algebra fold of LBS; see models/joint_model.py).
        from ..models.joint_model import joint_forward
        joints = joint_forward(assets.joint_model, params, body_pose)
        return params, z, body_pose, None, joints
    verts, joints = smpl_forward(assets, params, body_pose)
    return params, z, body_pose, verts, joints


def _data_weights(spec: EnergySpec, obs: Observations) -> jnp.ndarray:
    """(V, K) combined joint weights, masked over padded views."""
    w = obs.joint_weights[None, :]
    if spec.use_joints_conf:
        w = w * obs.conf
    return w * obs.view_mask[:, None]


def energy_terms(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
                 obs: Observations, weights: StageWeights,
                 vposer_w: Optional[vposer_lib.VPoserWeights],
                 gmm: Optional[GMMPrior], x: jnp.ndarray) -> dict:
    """All energy terms as a dict of scalars (see `total_energy`)."""
    need_verts = spec.interpenetration and weights.coll_on
    params, z, body_pose, verts, joints = _forward(
        spec, assets, vposer_w, x, need_verts=need_verts)

    proj = project_points(cam, joints)                    # (V, K, 2)
    diff = gmof(obs.gt2d - proj, spec.rho)                # (V, K, 2)
    w = _data_weights(spec, obs)                          # (V, K)
    joint_loss = jnp.sum(w[..., None] ** 2 * diff) * weights.data ** 2

    loss3d = jnp.zeros(())
    if spec.use_3d and obs.gt3d is not None:
        d3 = gmof(obs.gt3d - joints, spec.rho)
        loss3d = jnp.sum(obs.conf3d[:, None] ** 2 * d3) * weights.data ** 2

    if spec.use_vposer:
        pprior = jnp.sum(z * z) * weights.pose ** 2
    else:
        if spec.prior_type == "gmm":
            base = gmm.merged_nll(body_pose) * weights.pose ** 2
            # Outlier gate (`fitting.py:334-335`), branch-free.
            base = jnp.where(base > 5e4, 0.0, base)
        else:  # l2
            base = jnp.sum(body_pose ** 2) * weights.pose ** 2
        pprior = base + jnp.sum(body_pose ** 2) * (weights.pose * 4) ** 2

    shape_loss = jnp.zeros(())
    if not spec.fix_shape:
        shape_loss = jnp.sum(params.betas ** 2) * weights.shape ** 2

    angle = jnp.sum(angle_prior_terms(body_pose)) * weights.bending
    if not spec.use_vposer:
        angle = jnp.where(angle > 1e4, 0.0, angle)  # `fitting.py:349-350`

    coll = jnp.zeros(())
    if spec.interpenetration and weights.coll_on:
        from ..ops.sdf import collision_energy
        coll = collision_energy(verts, assets.faces, weights.coll,
                                spec.coll_grid_size, spec.use_pallas_sdf)

    # SMPL-H/X block priors (framework extension: the reference's smplx
    # fitting path is latently broken — `body_models_scale.py:622,935`
    # omit lbs()'s scale arg — so there is no reference schedule; these
    # follow smplify-x's structure: L2 on hand-PCA/face pose at the pose
    # weight, L2 on expression at the shape weight).
    extra = jnp.zeros(())
    if spec.hand_dim:
        extra = extra + (jnp.sum(params.left_hand_pose ** 2) +
                         jnp.sum(params.right_hand_pose ** 2)
                         ) * weights.pose ** 2
    if spec.num_expr:
        extra = extra + jnp.sum(params.expression ** 2) * weights.shape ** 2
    if spec.opt_face:
        extra = extra + (jnp.sum(params.jaw_pose ** 2) +
                         jnp.sum(params.leye_pose ** 2) +
                         jnp.sum(params.reye_pose ** 2)) * weights.pose ** 2

    return {"joint": joint_loss, "joint3d": loss3d, "pose_prior": pprior,
            "shape_prior": shape_loss, "angle_prior": angle,
            "collision": coll, "extra_prior": extra}


def total_energy(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
                 obs: Observations, weights: StageWeights,
                 vposer_w: Optional[vposer_lib.VPoserWeights],
                 gmm: Optional[GMMPrior], x: jnp.ndarray) -> jnp.ndarray:
    """Scalar fitting energy — the quantity the reference minimizes."""
    t = energy_terms(spec, assets, cam, obs, weights, vposer_w, gmm, x)
    return (t["joint"] + t["joint3d"] + t["pose_prior"] +
            t["shape_prior"] + t["angle_prior"] + t["collision"] +
            t["extra_prior"])


def data_residuals(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
                   obs: Observations, weights: StageWeights,
                   vposer_w: Optional[vposer_lib.VPoserWeights],
                   x: jnp.ndarray,
                   include_3d: bool = True) -> jnp.ndarray:
    """2D (and optional 3D) data-term residual rows.

    Separated from the priors so a camera-sharded solver can assemble
    per-view J^T J blocks with a `psum` over the cameras mesh axis and
    add the (replicated) prior blocks once.  `include_3d=False` lets
    that solver keep the (view-independent) 3D rows out of the psummed
    block — otherwise each camera shard would count them once.
    """
    params, z, body_pose, verts, joints = _forward(
        spec, assets, vposer_w, x)
    return _data_rows_from_joints(spec, cam, obs, weights, joints,
                                  include_3d)


def _data_rows_from_joints(spec: EnergySpec, cam: Camera,
                           obs: Observations, weights: StageWeights,
                           joints: jnp.ndarray,
                           include_3d: bool = True) -> jnp.ndarray:
    """Data rows given the mapped joints (the shallow tail of the
    residual graph — everything upstream of `joints` lives in
    `_forward`/`joint_jacobian`)."""
    proj = project_points(cam, joints)
    w = _data_weights(spec, obs) * weights.data           # (V, K)
    rows = [(w[..., None] * gmof_residual(obs.gt2d - proj, spec.rho)
             ).reshape(-1)]

    if include_3d and spec.use_3d and obs.gt3d is not None:
        w3 = obs.conf3d[:, None] * weights.data
        rows.append((w3 * gmof_residual(obs.gt3d - joints, spec.rho)
                     ).reshape(-1))
    return jnp.concatenate(rows)


def joints3d_residuals(spec: EnergySpec, assets: SMPLAssets,
                       obs: Observations, weights: StageWeights,
                       vposer_w, x: jnp.ndarray) -> jnp.ndarray:
    """Only the 3D-joint rows (view-independent); empty if unused."""
    if not (spec.use_3d and obs.gt3d is not None):
        return jnp.zeros((0,), x.dtype)
    _, _, _, _, joints = _forward(spec, assets, vposer_w, x)
    w3 = obs.conf3d[:, None] * weights.data
    return (w3 * gmof_residual(obs.gt3d - joints, spec.rho)).reshape(-1)


def _prior_rows_core(spec: EnergySpec, weights: StageWeights,
                     gmm: Optional[GMMPrior],
                     z: Optional[jnp.ndarray], body_pose: jnp.ndarray,
                     betas: jnp.ndarray) -> jnp.ndarray:
    """Prior rows as an explicit function of (z, body_pose, betas) —
    the shallow tail downstream of the VPoser decode, so the analytic
    Jacobian path (`residual_jacobian`) can chain d(body_pose)/dz
    through it without re-deriving the decoder."""
    rows = []
    if spec.use_vposer:
        rows.append(weights.pose * z)
    else:
        if spec.prior_type == "gmm":
            # Outlier gate (`fitting.py:334-335`): when the gated scalar
            # loss exceeds 5e4 the whole GMM term is dropped — zero the
            # rows so sum(r^2) keeps matching total_energy.  The gate
            # itself carries no gradient (the reference's is a Python
            # float check).
            base = gmm.merged_nll(body_pose) * weights.pose ** 2
            gate = jax.lax.stop_gradient(base <= 5e4)
            rows.append(jnp.where(gate, 1.0, 0.0) * weights.pose *
                        gmm.residuals(body_pose))
        else:
            rows.append(weights.pose * body_pose)
        rows.append(4.0 * weights.pose * body_pose)

    if not spec.fix_shape:
        rows.append(weights.shape * betas)

    # angle term: sum(exp(s*theta)^2) * w  ==  sum((sqrt(w) exp(s*theta))^2)
    angle_rows = (jnp.sqrt(weights.bending) *
                  jnp.sqrt(angle_prior_terms(body_pose)))
    if not spec.use_vposer:
        # Gate (`fitting.py:349-350`): angle term dropped above 1e4.
        total_angle = jnp.sum(angle_prior_terms(body_pose)) * \
            weights.bending
        gate = jax.lax.stop_gradient(total_angle <= 1e4)
        angle_rows = jnp.where(gate, 1.0, 0.0) * angle_rows
    rows.append(angle_rows)
    return jnp.concatenate(rows)


def prior_residuals(spec: EnergySpec, weights: StageWeights,
                    gmm: Optional[GMMPrior],
                    vposer_w: Optional[vposer_lib.VPoserWeights],
                    x: jnp.ndarray) -> jnp.ndarray:
    """Prior residual rows: pose (32 or 69 [+69]), shape (NB), bending (4).

    The GMM prior's -log-weight offset is locally constant and only
    enters the scalar form; its quadratic part is exact here.
    """
    params, z = unpack(spec, x)
    body_pose = (vposer_lib.decode(vposer_w, z) if spec.use_vposer
                 else params.body_pose)

    rows = [_prior_rows_core(spec, weights, gmm, z, body_pose,
                             params.betas)]

    # SMPL-H/X block priors (see energy_terms): L2 rows whose squares
    # reproduce the scalar extra_prior exactly.
    if spec.hand_dim:
        rows.append(weights.pose * params.left_hand_pose)
        rows.append(weights.pose * params.right_hand_pose)
    if spec.num_expr:
        rows.append(weights.shape * params.expression)
    if spec.opt_face:
        rows.append(weights.pose * params.jaw_pose)
        rows.append(weights.pose * params.leye_pose)
        rows.append(weights.pose * params.reye_pose)
    return jnp.concatenate(rows)


def residuals(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
              obs: Observations, weights: StageWeights,
              vposer_w: Optional[vposer_lib.VPoserWeights],
              gmm: Optional[GMMPrior], x: jnp.ndarray) -> jnp.ndarray:
    """Least-squares residual vector r with sum(r^2) == total_energy.

    Rows: 2D data (V*K*2, via the smooth `gmof_residual` so the robust
    kernel stays inside the least-squares structure), optional 3D data
    (K*3), the prior rows (`prior_residuals`), and — when the SDF term
    is active this stage — one collision row per person
    (w * sum(phi) / P, whose square is the reference's penalty).
    """
    rows = [data_residuals(spec, assets, cam, obs, weights, vposer_w, x),
            prior_residuals(spec, weights, gmm, vposer_w, x)]
    if spec.interpenetration and weights.coll_on:
        from ..ops.sdf import collision_sums
        params, z = unpack(spec, x)
        body_pose = (vposer_lib.decode(vposer_w, z) if spec.use_vposer
                     else params.body_pose)
        verts, _ = smpl_forward(assets, params, body_pose)
        s = collision_sums(verts, assets.faces, spec.coll_grid_size,
                           spec.use_pallas_sdf)
        rows.append(weights.coll * s / s.shape[0])
    return jnp.concatenate(rows)


def analytic_jac_ok(spec: EnergySpec, assets: SMPLAssets) -> bool:
    """True when `residual_jacobian` covers this energy exactly:
    a reduced joint model with a plain chain pose (smpl/smpllsp), no
    SMPL-H/X tail blocks, and no collision rows (per-stage collision is
    gated separately by the caller — see `stages.run_stage`)."""
    return (assets.joint_model is not None
            and assets.model_type in ("smpl", "smpllsp")
            and extra_dims(spec) == 0)


def residual_jacobian(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
                      obs: Observations, weights: StageWeights,
                      vposer_w: Optional[vposer_lib.VPoserWeights],
                      gmm: Optional[GMMPrior], x: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(r, J) == (`residuals(x)`, its Jacobian), without per-column AD
    through the body model.

    The LM iteration is latency-bound on the ~50 forward-mode tangent
    chains through rodrigues + the kinematic tree (97% of the
    linearize, docs/BENCH_NOTES.md r4).  Here the deep part of the
    Jacobian comes in closed form from `models.joint_jac.joint_jacobian`
    (batched einsums over primal chain quantities) and the VPoser
    decoder Jacobian from `vposer.decode_jac` (two matmuls); only the
    *shallow* row tails (projection/gmof, prior rows) are linearized,
    whose tangent columns are nearly free.  Valid when
    `analytic_jac_ok` holds and collision rows are inactive; exactness
    vs `jax.linearize` of `residuals` is tested in
    `tests/test_joint_jac.py`.
    """
    (joints, djoints, z_in, dz, body_pose, dbp, betas, dbe) = \
        _analytic_core(spec, assets, vposer_w, x)

    # All residual rows as ONE shallow graph in (joints, z, body_pose,
    # betas); its tangent columns are nearly free (+63 us for all 49 on
    # chip) and a single graph avoids duplicating the row-op chain.
    def rows(j, zz, bp, be):
        return jnp.concatenate([
            _data_rows_from_joints(spec, cam, obs, weights, j),
            _prior_rows_core(spec, weights, gmm, zz, bp, be)])

    r, lin = jax.linearize(rows, joints, z_in, body_pose, betas)
    J = jax.vmap(lin)(djoints, dz, dbp, dbe).T             # (m, n)
    return r, J


def _analytic_core(spec: EnergySpec, assets: SMPLAssets,
                   vposer_w, x: jnp.ndarray):
    """Deep (view-independent) half of the analytic Jacobian: the
    mapped joints, their packed-column tangents, and the tangent inputs
    of the shallow row maps.  Shared by `residual_jacobian` and the
    camera-sharded solver (`parallel/camera_shard.py`), whose row maps
    differ (local 2D rows + replicated prior/3D rows) but whose deep
    blocks are identical and replicated."""
    from ..models.joint_jac import joint_jacobian

    n = x.shape[0]
    p = pose_dim(spec)
    nb = spec.num_betas
    params, z = unpack(spec, x)

    jm = assets.joint_model
    from ..ops import joint_kernel

    if spec.use_vposer:
        from ..ops import vposer_kernel
        if (joint_kernel.use_kernel()
                and vposer_kernel.weights_ok(vposer_w)):
            # Fused decoder tail (ops/vposer_kernel.py): the MLP
            # matmuls stay XLA (already ~free on the MXU); the
            # 6D->aa tail + its 6 JVP columns + the MLP-Jacobian
            # composition run as one Pallas program under the
            # production vmap instead of ~15 launch-latency kernels.
            body_pose, D_z = vposer_kernel.make_decode_jac_auto(
                vposer_w)(z)
        else:
            body_pose, D_z = vposer_lib.decode_jac(vposer_w, z)
    else:
        body_pose = params.body_pose
        D_z = None
    if joint_kernel.use_kernel() and joint_kernel.kernel_ok(jm):
        # Fused Pallas path (ops/joint_kernel.py): under the production
        # vmapped fit this collapses the ~15-einsum joint-Jacobian graph
        # into ONE kernel over the whole batch; unbatched calls fall
        # back to the XLA closed form inside the same wrapper.
        need = (len(jm.parents) - 1) * 3
        bp_full = body_pose
        if bp_full.shape[-1] < need:
            bp_full = jnp.concatenate(
                [bp_full, jnp.zeros((need - bp_full.shape[-1],),
                                    bp_full.dtype)])
        theta = jnp.concatenate([params.global_orient, bp_full])
        joints, blk = joint_kernel.make_joint_jacobian_auto(jm)(
            theta, params.betas, params.scale)
        joints = joints + params.transl
    else:
        joints, blk = joint_jacobian(jm, params, body_pose)

    # d joints / d x, one (K, 3) tangent per packed column, in the
    # pack() layout [pose block (p), betas, orient(3), transl(3), scale].
    cp = body_pose.shape[0]
    if spec.use_vposer:
        block_cols = jnp.einsum("qkc,qZ->Zkc", blk["pose"][:cp], D_z)
    else:
        block_cols = blk["pose"][:cp]
    djoints = jnp.concatenate([
        block_cols, blk["betas"], blk["orient"], blk["transl"],
        blk["scale"]], axis=0)                             # (n, K, 3)

    z_in = z if spec.use_vposer else jnp.zeros((1,), x.dtype)
    dz = jnp.zeros((n,) + z_in.shape, x.dtype)
    dbp = jnp.zeros((n, cp), x.dtype)
    if spec.use_vposer:
        dz = dz.at[:p].set(jnp.eye(p, dtype=x.dtype))
        dbp = dbp.at[:p].set(D_z.T)
    else:
        dbp = dbp.at[:p].set(jnp.eye(p, dtype=x.dtype)[:, :cp])
    dbe = jnp.zeros((n, nb), x.dtype).at[p:p + nb].set(
        jnp.eye(nb, dtype=x.dtype))
    return joints, djoints, z_in, dz, body_pose, dbp, params.betas, dbe


def reprojection_error_px(spec: EnergySpec, assets: SMPLAssets, cam: Camera,
                          obs: Observations,
                          vposer_w, x: jnp.ndarray) -> jnp.ndarray:
    """Confidence-weighted mean 2D reprojection error in pixels (metric)."""
    _, _, _, _, joints = _forward(spec, assets, vposer_w, x)
    proj = project_points(cam, joints)
    err = jnp.linalg.norm(obs.gt2d - proj, axis=-1)       # (V, K)
    w = _data_weights(spec, obs)
    return jnp.sum(w * err) / jnp.maximum(jnp.sum(w), 1e-9)
