"""Training infrastructure for the detection stack (TPU-native).

Rebuilds the reference's training scaffolding the XLA way:

- EMA of all float model state — ``yolox/utils/ema.py:29-69``
  (``ModelEMA``: ramped decay ``d = decay * (1 - exp(-updates/2000))``
  over parameters AND buffers), here one pure pytree op.
- LR schedules — ``yolox/utils/lr_scheduler.py:97-150`` (``cos``,
  ``warmcos``, ``yoloxwarmcos`` with quadratic warmup + no-aug floor)
  plus AlphaPose's epoch-milestone step decay (``LR_FACTOR``/
  ``LR_STEP`` in `configs/halpe_26/resnet/256x192_res50_lr1e-3_1x.yaml`),
  all as jit-friendly pure functions of the iteration.
- Optimizer factory — YOLOX's SGD(momentum 0.9, nesterov) with weight
  decay on matrix/conv weights only (BN scale + biases excluded, the
  torch param-group split), AlphaPose's adam/rmsprop, via optax.
- Heatmap targets + masked MSE criterion — AlphaPose's
  ``SimpleTransform._target_generator``
  (`alphapose/utils/presets/simple_transform.py:126-164`: sigma-3
  window, truncating ``int(x + 0.5)`` center rounding, weight zeroed
  when the window misses the map) vectorized over joints, and the
  ``MSELoss`` criterion from the train configs applied through the
  target-weight mask.
- Data parallelism: train steps are pure jitted functions; sharding the
  batch axis over a `jax.sharding.Mesh` makes XLA insert the gradient
  all-reduce, and BatchNorm batch statistics are computed over the
  GLOBAL batch (the program is semantically global under SPMD) — the
  built-in equivalent of ``yolox/utils/allreduce_norm.py:59-103`` and
  torch's DDP hooks, with nothing to call.
- Checkpointing — flat .npz pytree snapshots
  (``yolox/utils/checkpoint.py`` save/resume surface).

BatchNorm train/eval switching rides the `batch_stats` mutability flag
(see ``detect/blocks.py:batch_norm``): the same converted-checkpoint
models train without any API change.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .yolox_loss import yolox_losses


# ---------------------------------------------------------------------------
# EMA (`yolox/utils/ema.py:29-69`)

def ema_decay(updates, base_decay: float = 0.9999):
    """Ramped decay ``d = decay * (1 - exp(-updates / 2000))``."""
    return base_decay * (1.0 - jnp.exp(-updates / 2000.0))


def ema_update(ema_tree, new_tree, updates, base_decay: float = 0.9999):
    """One EMA step over every float leaf (params and batch stats)."""
    d = ema_decay(updates, base_decay)

    def upd(e, v):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return d * e + (1.0 - d) * v
        return e   # non-float state is never EMA'd (`ema.py:66`)
    return jax.tree_util.tree_map(upd, ema_tree, new_tree)


# ---------------------------------------------------------------------------
# LR schedules (`yolox/utils/lr_scheduler.py:97-150`)

def cos_lr(lr: float, total_iters: int, iters):
    return lr * 0.5 * (1.0 + jnp.cos(math.pi * iters / total_iters))


def warm_cos_lr(lr: float, total_iters: int, warmup_total_iters: int,
                warmup_lr_start: float, iters):
    warm = ((lr - warmup_lr_start) * iters / float(warmup_total_iters)
            + warmup_lr_start)
    cos = lr * 0.5 * (1.0 + jnp.cos(
        math.pi * (iters - warmup_total_iters)
        / (total_iters - warmup_total_iters)))
    return jnp.where(iters <= warmup_total_iters, warm, cos)


def yolox_warm_cos_lr(lr: float, min_lr_ratio: float, total_iters: int,
                      warmup_total_iters: int, warmup_lr_start: float,
                      no_aug_iter: int, iters):
    """Quadratic warmup -> cosine -> flat ``min_lr`` tail."""
    min_lr = lr * min_lr_ratio
    warm = ((lr - warmup_lr_start)
            * (iters / float(warmup_total_iters)) ** 2 + warmup_lr_start)
    cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(
        math.pi * (iters - warmup_total_iters)
        / (total_iters - warmup_total_iters - no_aug_iter)))
    out = jnp.where(iters <= warmup_total_iters, warm, cos)
    return jnp.where(iters >= total_iters - no_aug_iter, min_lr, out)


def multistep_lr(lr: float, milestones: Sequence[int], factor: float,
                 iters):
    """AlphaPose epoch-step decay: ``lr * factor**(#milestones passed)``."""
    ms = jnp.asarray(milestones)
    n = jnp.sum(iters >= ms)
    return lr * factor ** n


def lr_schedule(name: str, lr: float, iters_per_epoch: int,
                total_epochs: int, *, warmup_epochs: int = 5,
                warmup_lr_start: Optional[float] = None,
                no_aug_epochs: int = 15, min_lr_ratio: float = 0.2,
                milestones: Sequence[int] = (50, 70),
                factor: float = 0.1) -> Callable[[Any], Any]:
    """Schedule factory mirroring ``LRScheduler._get_lr_func``
    (`lr_scheduler.py:36-95`); returns ``iters -> lr`` for optax."""
    total = iters_per_epoch * total_epochs
    if name == "cos":
        return lambda it: cos_lr(lr, total, it)
    if name == "warmcos":
        start = 1e-6 if warmup_lr_start is None else warmup_lr_start
        return lambda it: warm_cos_lr(
            lr, total, iters_per_epoch * warmup_epochs, start, it)
    if name == "yoloxwarmcos":
        start = 0.0 if warmup_lr_start is None else warmup_lr_start
        return lambda it: yolox_warm_cos_lr(
            lr, min_lr_ratio, total, iters_per_epoch * warmup_epochs,
            start, iters_per_epoch * no_aug_epochs, it)
    if name == "multistep":
        ms = [m * iters_per_epoch for m in milestones]
        return lambda it: multistep_lr(lr, ms, factor, it)
    raise ValueError(f"unknown lr schedule {name!r}")


# ---------------------------------------------------------------------------
# Optimizer factory

def _decay_mask(params):
    """YOLOX applies weight decay only to conv/linear weights — BN
    scale/bias and conv biases are exempt (the torch ``pg0/pg1/pg2``
    param-group split in yolox's exp code).  ndim >= 2 is exactly that
    split for flax params."""
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(name: str, learning_rate, params=None, *,
                   momentum: float = 0.9, weight_decay: float = 5e-4,
                   nesterov: bool = True) -> optax.GradientTransformation:
    """'sgd' (YOLOX training default), 'adam' (AlphaPose default,
    `TRAIN.OPTIMIZER` in its configs), or 'rmsprop'."""
    if name == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum,
                       nesterov=nesterov)
        if weight_decay:
            tx = optax.chain(
                optax.masked(optax.add_decayed_weights(weight_decay),
                             _decay_mask),
                tx)
        return tx
    if name == "adam":
        return optax.adam(learning_rate)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate)
    raise ValueError(f"unknown optimizer {name!r}")


# ---------------------------------------------------------------------------
# Heatmap targets + criterion (AlphaPose)

def heatmap_targets(joints_xy: jnp.ndarray, joints_vis: jnp.ndarray,
                    heatmap_hw: Tuple[int, int],
                    input_hw: Tuple[int, int], sigma: float = 2.0):
    """Gaussian heatmap targets — vectorized ``_target_generator``
    (`simple_transform.py:126-164`).

    joints_xy: (J, 2) pixel coords in the INPUT crop; joints_vis: (J,).
    Returns target (J, H, W) and target_weight (J, 1), with the
    reference's truncating ``int(x/stride + 0.5)`` center rounding and
    its fully-out-of-window weight-zero rule.
    """
    H, W = heatmap_hw
    stride_x = input_hw[1] / W
    stride_y = input_hw[0] / H
    tmp = int(sigma * 3)

    # python int() truncates toward zero — jnp.trunc matches.
    mu_x = jnp.trunc(joints_xy[:, 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints_xy[:, 1] / stride_y + 0.5)
    ul_x, ul_y = mu_x - tmp, mu_y - tmp
    br_x, br_y = mu_x + tmp + 1, mu_y + tmp + 1
    oob = (ul_x >= W) | (ul_y >= H) | (br_x < 0) | (br_y < 0)
    w = jnp.where(oob, 0.0, joints_vis)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.exp(-((xs[None, :] - mu_x[:, None]) ** 2)
                 / (2.0 * sigma ** 2))            # (J, W)
    gy = jnp.exp(-((ys[None, :] - mu_y[:, None]) ** 2)
                 / (2.0 * sigma ** 2))            # (J, H)
    in_x = (xs[None, :] >= ul_x[:, None]) & (xs[None, :] < br_x[:, None])
    in_y = (ys[None, :] >= ul_y[:, None]) & (ys[None, :] < br_y[:, None])
    g = (gy * in_y)[:, :, None] * (gx * in_x)[:, None, :]
    target = jnp.where((w > 0.5)[:, None, None], g, 0.0)
    return target, w[:, None]


def heatmap_targets_np(joints_xy, joints_vis, heatmap_hw, input_hw,
                       sigma: float = 2.0):
    """Numpy mirror of `heatmap_targets` for HOST dataloaders.

    Identical math (tested equal); the jnp version dispatched eagerly
    per sample would round-trip the TPU tunnel from inside the data
    loop — the data path must stay on the host.
    """
    import numpy as np

    H, W = heatmap_hw
    stride_x = input_hw[1] / W
    stride_y = input_hw[0] / H
    tmp = int(sigma * 3)
    joints_xy = np.asarray(joints_xy, np.float32)
    joints_vis = np.asarray(joints_vis, np.float32)

    mu_x = np.trunc(joints_xy[:, 0] / stride_x + 0.5)
    mu_y = np.trunc(joints_xy[:, 1] / stride_y + 0.5)
    ul_x, ul_y = mu_x - tmp, mu_y - tmp
    br_x, br_y = mu_x + tmp + 1, mu_y + tmp + 1
    oob = (ul_x >= W) | (ul_y >= H) | (br_x < 0) | (br_y < 0)
    w = np.where(oob, 0.0, joints_vis).astype(np.float32)

    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)
    gx = np.exp(-((xs[None, :] - mu_x[:, None]) ** 2)
                / (2.0 * sigma ** 2))
    gy = np.exp(-((ys[None, :] - mu_y[:, None]) ** 2)
                / (2.0 * sigma ** 2))
    in_x = (xs[None, :] >= ul_x[:, None]) & (xs[None, :] < br_x[:, None])
    in_y = (ys[None, :] >= ul_y[:, None]) & (ys[None, :] < br_y[:, None])
    g = (gy * in_y)[:, :, None] * (gx * in_x)[:, None, :]
    target = np.where((w > 0.5)[:, None, None], g, 0.0
                      ).astype(np.float32)
    return target, w[:, None]


# ---------------------------------------------------------------------------
# Integral-regression criterion (AlphaPose ``L1JointRegression``,
# `alphapose/models/criterion.py:13-97`, used by the `-regression`
# train configs and the 3D HybrIK-style nets)

def _integral_mul(p: jnp.ndarray) -> jnp.ndarray:
    """``p * arange(L)`` with the reference's SURROGATE backward
    (`IngetralCoordinate`, `criterion.py:13-44`): instead of the true
    gradient ``g * arange(L)``, backprop ``g * ±AMPLITUDE`` — -2 for
    bins left of the current expected coordinate, +2 at/right of it
    (and +2 everywhere if the coordinate overflows the axis).  A
    deliberate symmetric-gradient trick of the reference, kept for
    training parity."""
    return __integral_mul(p)


@jax.custom_vjp
def __integral_mul(p):
    return p * jnp.arange(p.shape[-1], dtype=p.dtype)


def _integral_mul_fwd(p):
    L = p.shape[-1]
    out = p * jnp.arange(L, dtype=p.dtype)
    return out, out.sum(-1, keepdims=True)     # expected coordinate


def _integral_mul_bwd(coord, g):
    L = g.shape[-1]
    w = jnp.arange(L, dtype=g.dtype)
    mask = jnp.where(w < coord, -1.0, 1.0)
    mask = jnp.where(coord > L, 1.0, mask)
    return (g * mask * 2.0,)


__integral_mul.defvjp(_integral_mul_fwd, _integral_mul_bwd)


def integral_coords(hms: jnp.ndarray, num_joints: int,
                    norm_type: str = "softmax",
                    output_3d: bool = False):
    """`_integral_tensor` (`transforms.py:651-689`) over NHWC heatmaps:
    normalize per joint (softmax / sigmoid + sum-normalize), marginal
    expectations through `_integral_mul`, normalized coords in
    [-0.5, 0.5] interleaved per joint.

    hms: (N, H, W, C) with C == J (2D) or C == J*D, D = C//J (3D).
    Returns (coords (N, J*dims), scores (N, J, 1)).
    """
    N, H, W, C = hms.shape
    J = num_joints
    D = C // J if output_3d else 1
    flat = jnp.transpose(hms, (0, 3, 1, 2)).reshape(N, J, -1)
    if norm_type == "softmax":
        norm = jax.nn.softmax(flat, axis=-1)
        scores = jnp.ones((N, J, 1), hms.dtype)
    else:
        norm = jax.nn.sigmoid(flat)
        scores = jnp.max(norm, axis=-1, keepdims=True)
    p = norm / jnp.maximum(norm.sum(-1, keepdims=True), 1e-12)
    vol = p.reshape(N, J, D, H, W)
    cx = _integral_mul(vol.sum((2, 3))).sum(-1, keepdims=True) / W - 0.5
    cy = _integral_mul(vol.sum((2, 4))).sum(-1, keepdims=True) / H - 0.5
    if output_3d:
        cz = (_integral_mul(vol.sum((3, 4))).sum(-1, keepdims=True)
              / D - 0.5)
        jts = jnp.concatenate([cx, cy, cz], axis=-1)
    else:
        jts = jnp.concatenate([cx, cy], axis=-1)
    return jts.reshape(N, -1), scores


def integral_l1_loss(pred_hms: jnp.ndarray, target: jnp.ndarray,
                     target_weight: jnp.ndarray,
                     norm_type: str = "softmax",
                     output_3d: bool = False,
                     size_average: bool = True) -> jnp.ndarray:
    """``weighted_l1_loss`` (`criterion.py:85-97`): masked |pred - gt|
    summed, / N when size_average.  target/target_weight: (N, J*dims)
    normalized coords + per-coordinate weights."""
    dims = 3 if output_3d else 2
    J = target.shape[-1] // dims
    jts, _ = integral_coords(pred_hms, J, norm_type, output_3d)
    out = jnp.abs(jts - target) * target_weight
    total = out.sum()
    return total / pred_hms.shape[0] if size_average else total


def integral_targets_np(joints_xy, joints_vis, input_hw):
    """``_integral_target_generator`` (`simple_transform.py:165-182`,
    minus its wholebody 2x-boost branches): normalized coords
    ``x/w - 0.5, y/h - 0.5`` interleaved per joint, visibility
    duplicated per coordinate."""
    import numpy as np

    joints_xy = np.asarray(joints_xy, np.float32)
    t = np.stack([joints_xy[:, 0] / input_hw[1] - 0.5,
                  joints_xy[:, 1] / input_hw[0] - 0.5], axis=-1)
    w = np.repeat(np.asarray(joints_vis, np.float32)[:, None], 2,
                  axis=1)
    return t.reshape(-1), w.reshape(-1)


def pose_heatmap_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      target_weight: jnp.ndarray) -> jnp.ndarray:
    """``0.5 * MSELoss(pred * mask, target * mask)`` — the masked MSE
    criterion the AlphaPose train configs select (``LOSS.TYPE:
    'MSELoss'``), mean over all elements.

    pred/target: (N, H, W, J) NHWC heatmaps; target_weight: (N, J).
    """
    m = target_weight[:, None, None, :]
    return 0.5 * jnp.mean((pred * m - target * m) ** 2)


# ---------------------------------------------------------------------------
# Train state + steps

class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Any                      # {'params': ..., 'batch_stats': ...}


def init_train_state(variables: Dict[str, Any],
                     tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
        ema={"params": params, "batch_stats": batch_stats})


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    tx: optax.GradientTransformation,
                    ema_base_decay: float = 0.9999) -> Callable:
    """Generic jitted train step.

    ``apply_fn(variables, batch, mutable)`` -> (outputs, mutated);
    ``loss_fn(outputs, batch)`` -> scalar (or (scalar, aux dict)).
    Shard the batch over a mesh axis and XLA data-parallelizes the
    whole step, gradient all-reduce included.
    """
    def step(state: TrainState, batch):
        def lfn(params):
            out, mut = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, ["batch_stats"])
            res = loss_fn(out, batch)
            loss, aux = res if isinstance(res, tuple) else (res, {})
            return loss, (mut.get("batch_stats", {}), aux)
        (loss, (new_bs, aux)), grads = jax.value_and_grad(
            lfn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        n = state.step + 1
        ema = ema_update(state.ema,
                         {"params": params, "batch_stats": new_bs},
                         n.astype(jnp.float32), ema_base_decay)
        return TrainState(params, new_bs, opt_state, n, ema), loss, aux
    return jax.jit(step)


def make_pose_train_step(model, tx, **kw) -> Callable:
    """Heatmap-MSE train step for any pose net in the zoo (batch:
    ``{'image': (N,h,w,3), 'target': (N,H,W,J), 'target_weight':
    (N,J)}``)."""
    def apply_fn(variables, batch, mutable):
        return model.apply(variables, batch["image"], mutable=mutable)

    def loss_fn(out, batch):
        return pose_heatmap_loss(out, batch["target"],
                                 batch["target_weight"])
    return make_train_step(apply_fn, loss_fn, tx, **kw)


def make_integral_train_step(model, tx, norm_type: str = "softmax",
                             output_3d: bool = False, **kw) -> Callable:
    """L1JointRegression train step (batch: ``{'image': (N,h,w,3),
    'target': (N,J*dims), 'target_weight': (N,J*dims)}`` — the
    integral-loss configs' contract)."""
    def apply_fn(variables, batch, mutable):
        return model.apply(variables, batch["image"], mutable=mutable)

    def loss_fn(out, batch):
        return integral_l1_loss(out, batch["target"],
                                batch["target_weight"],
                                norm_type=norm_type,
                                output_3d=output_3d)
    return make_train_step(apply_fn, loss_fn, tx, **kw)


def make_yolox_train_step(model, tx, input_hw, use_l1: bool = False,
                          **kw) -> Callable:
    """SimOTA train step (batch: ``{'image': (N,h,w,3), 'labels':
    (N,MAXG,5)}``).  ``model`` must be built with
    ``train_outputs=True``."""
    def apply_fn(variables, batch, mutable):
        return model.apply(variables, batch["image"], mutable=mutable)

    def loss_fn(out, batch):
        decoded, origin_reg = out
        losses = yolox_losses(decoded, batch["labels"], input_hw,
                              origin_reg=origin_reg, use_l1=use_l1)
        return losses["total"], losses
    return make_train_step(apply_fn, loss_fn, tx, **kw)


def hybrik_smpl_loss(out, batch, assets=None, depth_factor: float = 2.0,
                     w_uvd: float = 1.0, w_beta: float = 1.0,
                     w_twist: float = 0.01, w_theta: float = 0.01):
    """HybrIK SMPL training criterion over the `3d_data_w_smpl` target
    dict (`augment3d.hybrik_train_sample`, matching the reference's
    `simple_transform_3d_smpl.py:490-514` output contract).

    The reference ships the target transform but no criterion (its
    HybrIK trainer lives upstream), so this follows the published
    L1LossDimSMPL structure: weighted L1 on the 29-joint integral uvd,
    L1 on beta gated by smpl_weight, weighted L1 on the 23 (cos, sin)
    twists, and — when SMPL ``assets`` are given — weighted L1 on the
    24 joint quaternions produced by running the analytic
    twist-and-swing IK (`models/hybrik.py`) on the predicted skeleton,
    i.e. theta supervision THROUGH the differentiable IK.  Weighted
    terms normalize by the live weight mass so sparse visibility does
    not rescale the loss.
    """
    from .hybrik import uvd_to_xyz

    N = out["pred_uvd_jts"].shape[0]

    def wl1(pred, target, w):
        return (jnp.sum(jnp.abs(pred - target) * w)
                / jnp.maximum(jnp.sum(w), 1.0))

    l_uvd = wl1(out["pred_uvd_jts"].reshape(N, -1),
                batch["target_uvd_29"], batch["target_weight_29"])
    l_beta = wl1(out["pred_shape"], batch["target_beta"],
                 batch["target_smpl_weight"])
    l_twist = wl1(out["pred_phi"], batch["target_twist"],
                  batch["target_twist_weight"])
    total = w_uvd * l_uvd + w_beta * l_beta + w_twist * l_twist
    aux = {"loss_uvd": l_uvd, "loss_beta": l_beta,
           "loss_twist": l_twist}

    if assets is not None:
        from ..models.hybrik import hybrik_ik
        from ..ops.rotations import matrix_to_quaternion

        xyz, _ = uvd_to_xyz(out["pred_uvd_jts"], out["pred_camera"],
                            depth_factor=depth_factor)
        skel = xyz[:, :24] * depth_factor           # metres
        rots = jax.vmap(lambda s, b, p: hybrik_ik(assets, s, b, p))(
            skel, out["pred_shape"], out["pred_phi"])   # (N, 24, 3, 3)
        quat = jax.vmap(jax.vmap(matrix_to_quaternion))(rots)
        quat = quat.reshape(N, 96)
        tgt = batch["target_theta"]
        # q and -q are the same rotation; compare in the target's
        # hemisphere per joint.
        sign = jnp.sign(jnp.sum(
            (quat * tgt).reshape(N, 24, 4), axis=-1, keepdims=True))
        quat = (quat.reshape(N, 24, 4)
                * jnp.where(sign == 0, 1.0, sign)).reshape(N, 96)
        l_theta = wl1(quat, tgt, batch["target_theta_weight"]
                      * batch["target_smpl_weight"])
        total = total + w_theta * l_theta
        aux["loss_theta"] = l_theta
    return total, aux


def make_hybrik_train_step(model, tx, assets=None,
                           depth_factor: float = 2.0, **kw) -> Callable:
    """HybrIK train step (batch = stacked `hybrik_train_sample` dicts).
    Pass SMPL ``assets`` to add theta-through-IK supervision."""
    def apply_fn(variables, batch, mutable):
        return model.apply(variables, batch["image"], mutable=mutable)

    def loss_fn(out, batch):
        return hybrik_smpl_loss(out, batch, assets=assets,
                                depth_factor=depth_factor)
    return make_train_step(apply_fn, loss_fn, tx, **kw)


# ---------------------------------------------------------------------------
# Checkpointing (`yolox/utils/checkpoint.py` surface)

def save_checkpoint(path: str, tree) -> None:
    """Flat .npz snapshot of any pytree (params/EMA/opt state)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    np.savez(path, **out)


def load_checkpoint(path: str, template):
    """Restore into the structure of ``template``."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tmpl in flat:
        arr = data[jax.tree_util.keystr(kp)]
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
