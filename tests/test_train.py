"""Training-infrastructure tests.

Golden comparisons against the reference's own torch code:
- `yolox/models/yolo_head.py:255-425` ``get_losses`` (full SimOTA)
- `yolox/utils/lr_scheduler.py:97-150` schedule math
- `yolox/utils/ema.py:29-69` ``ModelEMA``
- `alphapose/utils/presets/simple_transform.py:126-164` heatmap targets

plus behavioral tests: BN train/eval switching via `batch_stats`
mutability, loss decrease over train steps, data-parallel step parity
on the 8-device mesh, and checkpoint round-trip.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mvsmplfitting_tpu.detect.blocks import ConvBnAct, batch_norm
from mvsmplfitting_tpu.detect.train import (
    TrainState, cos_lr, ema_update, heatmap_targets, init_train_state,
    load_checkpoint, lr_schedule, make_optimizer, make_pose_train_step,
    make_train_step, make_yolox_train_step, multistep_lr,
    pose_heatmap_loss, save_checkpoint, warm_cos_lr, yolox_warm_cos_lr,
)
from mvsmplfitting_tpu.detect.yolox import YOLOX
from mvsmplfitting_tpu.detect.yolox_loss import (
    anchor_info, bce_with_logits, iou_loss, pairwise_iou_xywh,
    simota_assign, yolox_losses,
)


def _stub_torch_deps():
    sys.path.insert(0, "/root/reference")
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _L()
        sys.modules["loguru"] = loguru
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.batched_nms = lambda *a, **k: None
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop


HW = (32, 48)                 # tiny image; strides (8, 16) -> A=30
STRIDES = (8, 16)


def _random_problem(rng, batch=3, maxg=4, num_classes=3):
    """Decoded preds + padded labels with 2/1/0 valid gts per image."""
    h, w = HW
    A = sum((h // s) * (w // s) for s in STRIDES)
    cx = rng.uniform(0, w, (batch, A, 1)).astype(np.float32)
    cy = rng.uniform(0, h, (batch, A, 1)).astype(np.float32)
    wh = rng.uniform(2, 24, (batch, A, 2)).astype(np.float32)
    logits = rng.normal(0, 1, (batch, A, 1 + num_classes)).astype(
        np.float32)
    decoded = np.concatenate([cx, cy, wh, logits], axis=-1)
    origin_reg = rng.normal(0, 1, (batch, A, 4)).astype(np.float32)

    labels = np.zeros((batch, maxg, 5), np.float32)
    nvalid = [2, 1, 0]
    for b in range(batch):
        for g in range(nvalid[b % 3]):
            labels[b, g] = [
                rng.integers(0, num_classes),
                rng.uniform(8, w - 8), rng.uniform(8, h - 8),
                rng.uniform(6, 24), rng.uniform(6, 24)]
    return decoded, origin_reg, labels


class TestYoloxLossGolden:
    """Full get_losses parity against the reference torch head."""

    @pytest.fixture(scope="class")
    def torch_head(self):
        _stub_torch_deps()
        torch = pytest.importorskip("torch")
        from yolox.models.yolo_head import YOLOXHead as TorchHead
        head = TorchHead(num_classes=3, width=0.25,
                         strides=list(STRIDES),
                         in_channels=[256, 512])
        head.use_l1 = True
        return torch, head

    def test_losses_match(self, torch_head):
        torch, head = torch_head
        rng = np.random.default_rng(0)
        decoded, origin_reg, labels = _random_problem(rng)
        h, w = HW

        xs, ys, ss = anchor_info(HW, STRIDES)
        # reference wants per-level (1, A_level) tensors
        sizes = [(h // s) * (w // s) for s in STRIDES]
        x_sh, y_sh, e_st, origin_l = [], [], [], []
        off = 0
        for s, n in zip(STRIDES, sizes):
            x_sh.append(torch.tensor(np.asarray(xs)[None, off:off + n]))
            y_sh.append(torch.tensor(np.asarray(ys)[None, off:off + n]))
            e_st.append(torch.full((1, n), float(s)))
            origin_l.append(torch.tensor(origin_reg[:, off:off + n]))
            off += n

        ref = head.get_losses(
            torch.zeros((3, 3, h, w)), x_sh, y_sh, e_st,
            torch.tensor(labels), torch.tensor(decoded), origin_l,
            torch.float32)
        ref_total, ref_iou, ref_obj, ref_cls, ref_l1, ref_fg = [
            float(v) for v in ref]

        ours = yolox_losses(jnp.asarray(decoded), jnp.asarray(labels),
                            HW, STRIDES, origin_reg=jnp.asarray(
                                origin_reg), use_l1=True)
        np.testing.assert_allclose(float(ours["iou"]), ref_iou,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ours["obj"]), ref_obj,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ours["cls"]), ref_cls,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ours["l1"]), ref_l1, rtol=1e-4)
        np.testing.assert_allclose(float(ours["total"]), ref_total,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ours["fg_ratio"]), ref_fg,
                                   rtol=1e-4)

    def test_losses_match_more_seeds(self, torch_head):
        torch, head = torch_head
        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            decoded, origin_reg, labels = _random_problem(rng)
            h, w = HW
            xs, ys, _ = anchor_info(HW, STRIDES)
            sizes = [(h // s) * (w // s) for s in STRIDES]
            x_sh, y_sh, e_st, origin_l = [], [], [], []
            off = 0
            for s, n in zip(STRIDES, sizes):
                x_sh.append(torch.tensor(
                    np.asarray(xs)[None, off:off + n]))
                y_sh.append(torch.tensor(
                    np.asarray(ys)[None, off:off + n]))
                e_st.append(torch.full((1, n), float(s)))
                origin_l.append(torch.tensor(
                    origin_reg[:, off:off + n]))
                off += n
            ref = head.get_losses(
                torch.zeros((3, 3, h, w)), x_sh, y_sh, e_st,
                torch.tensor(labels), torch.tensor(decoded), origin_l,
                torch.float32)
            ours = yolox_losses(
                jnp.asarray(decoded), jnp.asarray(labels), HW, STRIDES,
                origin_reg=jnp.asarray(origin_reg), use_l1=True)
            np.testing.assert_allclose(float(ours["total"]),
                                       float(ref[0]), rtol=1e-4)

    def test_iou_loss_giou(self, torch_head):
        torch, _ = torch_head
        _stub_torch_deps()
        from yolox.models.losses import IOUloss
        rng = np.random.default_rng(4)
        pred = rng.uniform(1, 30, (16, 4)).astype(np.float32)
        tgt = rng.uniform(1, 30, (16, 4)).astype(np.float32)
        for ltype in ("iou", "giou"):
            ref = IOUloss(reduction="none", loss_type=ltype)(
                torch.tensor(pred), torch.tensor(tgt)).numpy()
            ours = np.asarray(iou_loss(jnp.asarray(pred),
                                       jnp.asarray(tgt), ltype))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_pairwise_iou(self, torch_head):
        torch, _ = torch_head
        from yolox.utils.boxes import bboxes_iou
        rng = np.random.default_rng(5)
        a = rng.uniform(1, 30, (5, 4)).astype(np.float32)
        b = rng.uniform(1, 30, (7, 4)).astype(np.float32)
        ref = bboxes_iou(torch.tensor(a), torch.tensor(b), False).numpy()
        ours = np.asarray(pairwise_iou_xywh(jnp.asarray(a),
                                            jnp.asarray(b)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestLRSchedules:
    @pytest.fixture(scope="class")
    def ref_sched(self):
        spec = importlib.util.spec_from_file_location(
            "ref_lr", "/root/reference/yolox/utils/lr_scheduler.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_cos(self, ref_sched):
        for it in (0, 10, 99, 500):
            np.testing.assert_allclose(
                float(cos_lr(0.01, 1000, it)),
                ref_sched.cos_lr(0.01, 1000, it), rtol=1e-6)

    def test_warm_cos(self, ref_sched):
        for it in (0, 3, 50, 51, 400, 999):
            np.testing.assert_allclose(
                float(warm_cos_lr(0.01, 1000, 50, 1e-6, it)),
                ref_sched.warm_cos_lr(0.01, 1000, 50, 1e-6, it),
                rtol=1e-5, atol=1e-9)   # ours computes in float32

    def test_yolox_warm_cos(self, ref_sched):
        for it in (0, 3, 50, 51, 400, 900, 999):
            np.testing.assert_allclose(
                float(yolox_warm_cos_lr(0.01, 0.05, 1000, 50, 0.0,
                                        100, it)),
                ref_sched.yolox_warm_cos_lr(0.01, 0.05, 1000, 50, 0.0,
                                            100, it), rtol=1e-6)

    def test_multistep(self):
        # AlphaPose LR_STEP [50, 70], LR_FACTOR 0.1
        assert np.isclose(float(multistep_lr(1e-3, [50, 70], 0.1, 10)),
                          1e-3)
        assert np.isclose(float(multistep_lr(1e-3, [50, 70], 0.1, 60)),
                          1e-4)
        assert np.isclose(float(multistep_lr(1e-3, [50, 70], 0.1, 80)),
                          1e-5, rtol=1e-5)

    def test_factory(self, ref_sched):
        f = lr_schedule("yoloxwarmcos", 0.01, iters_per_epoch=10,
                        total_epochs=100, warmup_epochs=5,
                        no_aug_epochs=15)
        sch = ref_sched.LRScheduler("yoloxwarmcos", 0.01, 10, 100,
                                    warmup_epochs=5, warmup_lr_start=0,
                                    no_aug_epochs=15, min_lr_ratio=0.2)
        for it in (0, 25, 50, 51, 500, 900):
            np.testing.assert_allclose(float(f(it)),
                                       sch.update_lr(it), rtol=1e-6)


class TestEMAGolden:
    def test_vs_torch_model_ema(self):
        _stub_torch_deps()
        torch = pytest.importorskip("torch")
        from yolox.utils.ema import ModelEMA

        tm = torch.nn.Sequential(torch.nn.Linear(3, 4),
                                 torch.nn.BatchNorm1d(4))
        ema = ModelEMA(tm, decay=0.999)

        ours = {k: jnp.asarray(v.detach().numpy())
                for k, v in tm.state_dict().items()
                if v.dtype.is_floating_point}
        for step in range(1, 4):
            with torch.no_grad():
                for p in tm.parameters():
                    p.add_(torch.randn_like(p) * 0.1)
                tm[1].running_mean.add_(0.05)
            ema.update(tm)
            new = {k: jnp.asarray(v.detach().numpy())
                   for k, v in tm.state_dict().items()
                   if v.dtype.is_floating_point}
            ours = ema_update(ours, new, jnp.asarray(float(step)),
                              base_decay=0.999)
        ref = ema.ema.state_dict()
        for k, v in ours.items():
            np.testing.assert_allclose(np.asarray(v),
                                       ref[k].detach().numpy(),
                                       rtol=1e-5, atol=1e-7)


def _ref_l1_joint_regression():
    """Import the reference's `L1JointRegression`
    (`alphapose/models/criterion.py`) with its registry/import chain
    stubbed (the module itself is CPU-safe)."""
    import importlib.util

    sys.path.insert(0, "/root/reference/alphapose_core")
    try:
        import alphapose.utils.transforms as T

        # criterion.py imports `alphapose_core.alphapose.utils.
        # transforms` absolutely; alias the chain onto the real module.
        for name in ("alphapose_core", "alphapose_core.alphapose",
                     "alphapose_core.alphapose.utils"):
            sys.modules.setdefault(name, types.ModuleType(name))
        sys.modules[
            "alphapose_core.alphapose.utils.transforms"] = T
        pkg = types.ModuleType("alphapose.models")
        pkg.__path__ = [
            "/root/reference/alphapose_core/alphapose/models"]
        sys.modules.setdefault("alphapose.models", pkg)
        builder = types.ModuleType("alphapose.models.builder")

        class _Reg:
            def register_module(self, m=None):
                return m if m is not None else (lambda x: x)
        builder.LOSS = _Reg()
        sys.modules["alphapose.models.builder"] = builder
        spec = importlib.util.spec_from_file_location(
            "alphapose.models.criterion",
            "/root/reference/alphapose_core/alphapose/models/"
            "criterion.py")
        crit = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(crit)
        return crit.L1JointRegression
    except Exception as e:                 # pragma: no cover
        pytest.skip(f"reference criterion unimportable: {e}")
    finally:
        sys.path.pop(0)


class TestIntegralCriterion:
    """`integral_l1_loss` vs the reference's own `L1JointRegression` —
    VALUE and input GRADIENT (the latter pins the `IngetralCoordinate`
    surrogate-backward quirk, `criterion.py:13-44`)."""

    @pytest.mark.parametrize("norm_type", ["softmax", "sigmoid"])
    def test_golden_value_and_grad_2d(self, norm_type):
        import torch

        from mvsmplfitting_tpu.detect.train import integral_l1_loss

        L1 = _ref_l1_joint_regression()
        ref = L1(OUTPUT_3D=False, NORM_TYPE=norm_type)
        rng = np.random.default_rng(0)
        N, J, H, W = 2, 5, 8, 6
        hm = rng.standard_normal((N, J, H, W)).astype(np.float32)
        gt = rng.uniform(-0.5, 0.5, (N, J * 2)).astype(np.float32)
        vis = (rng.uniform(0, 1, (N, J * 2)) > 0.3).astype(np.float32)

        t = torch.from_numpy(hm.copy()).requires_grad_(True)
        want = ref(t, torch.from_numpy(gt), torch.from_numpy(vis))
        want.backward()

        f = lambda x: integral_l1_loss(x, jnp.asarray(gt),  # noqa: E731
                                       jnp.asarray(vis),
                                       norm_type=norm_type)
        v, g = jax.value_and_grad(f)(
            jnp.asarray(np.transpose(hm, (0, 2, 3, 1))))
        np.testing.assert_allclose(float(v), float(want.detach()),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)),
            t.grad.numpy(), rtol=1e-4, atol=1e-6)

    def test_golden_3d(self):
        import torch

        from mvsmplfitting_tpu.detect.train import integral_l1_loss

        L1 = _ref_l1_joint_regression()
        ref = L1(OUTPUT_3D=True, NORM_TYPE="softmax")
        rng = np.random.default_rng(1)
        N, J, D, H, W = 2, 3, 4, 4, 6
        hm = rng.standard_normal((N, J * D, H, W)).astype(np.float32)
        gt = rng.uniform(-0.5, 0.5, (N, J * 3)).astype(np.float32)
        vis = np.ones((N, J * 3), np.float32)

        t = torch.from_numpy(hm.copy()).requires_grad_(True)
        want = ref(t, torch.from_numpy(gt), torch.from_numpy(vis))
        want.backward()

        f = lambda x: integral_l1_loss(x, jnp.asarray(gt),  # noqa: E731
                                       jnp.asarray(vis),
                                       output_3d=True)
        v, g = jax.value_and_grad(f)(
            jnp.asarray(np.transpose(hm, (0, 2, 3, 1))))
        np.testing.assert_allclose(float(v), float(want.detach()),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)),
            t.grad.numpy(), rtol=1e-4, atol=1e-6)

    def test_integral_targets_np(self):
        from mvsmplfitting_tpu.detect.train import integral_targets_np
        joints = np.asarray([[96.0, 64.0], [0.0, 256.0]])
        vis = np.asarray([1.0, 0.0])
        t, w = integral_targets_np(joints, vis, (256, 192))
        np.testing.assert_allclose(t, [0.0, -0.25, -0.5, 0.5])
        np.testing.assert_allclose(w, [1, 1, 0, 0])

    def test_train_step_learns(self):
        """An integral train step reduces the loss on a fixed batch."""
        from mvsmplfitting_tpu.detect.train import (
            init_train_state, make_integral_train_step, make_optimizer)

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                x = nn.Conv(8, (3, 3))(x)
                x = nn.relu(x)
                return nn.Conv(3, (1, 1))(x)   # J=3 heatmaps

        rng = np.random.default_rng(2)
        model = Tiny()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 12, 3)))
        tx = make_optimizer("adam", 1e-2)
        state = init_train_state(v, tx)
        step = make_integral_train_step(model, tx)
        batch = {
            "image": jnp.asarray(
                rng.uniform(0, 1, (4, 16, 12, 3)).astype(np.float32)),
            "target": jnp.asarray(
                rng.uniform(-0.4, 0.4, (4, 6)).astype(np.float32)),
            "target_weight": jnp.ones((4, 6), jnp.float32),
        }
        losses = []
        for _ in range(150):
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        # The ±2 surrogate gradient descends slowly but steadily.
        assert losses[-1] < losses[0] * 0.8, losses[::30]


class TestHeatmapTargets:
    def test_golden_vs_simple_transform(self):
        _stub_torch_deps()
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            import importlib as _il

            import alphapose.utils  # light __init__
            # stub the CUDA RoIAlign extension module
            ra = types.ModuleType("alphapose.utils.roi_align")
            ra.RoIAlign = object
            sys.modules.setdefault("alphapose.utils.roi_align", ra)
            # bypass the presets __init__ (pulls the 3D SMPL transform)
            pkg = types.ModuleType("alphapose.utils.presets")
            pkg.__path__ = ["/root/reference/alphapose_core/alphapose/"
                            "utils/presets"]
            sys.modules.setdefault("alphapose.utils.presets", pkg)
            mod = _il.import_module(
                "alphapose.utils.presets.simple_transform")
        except Exception as e:             # pragma: no cover
            pytest.skip(f"reference transform unimportable: {e}")
        st = object.__new__(mod.SimpleTransform)
        st._sigma = 2
        st._heatmap_size = np.array([64, 48])     # (H, W)
        st._feat_stride = np.array([4.0, 4.0])

        rng = np.random.default_rng(0)
        J = 17
        joints_3d = np.zeros((J, 3, 2), np.float32)
        joints_3d[:, 0, 0] = rng.uniform(-30, 230, J)   # x (some OOB)
        joints_3d[:, 1, 0] = rng.uniform(-30, 280, J)   # y
        joints_3d[:, 0, 1] = (rng.uniform(0, 1, J) > 0.2).astype(
            np.float32)
        ref_t, ref_w = st._target_generator(joints_3d.copy(), J)

        ours_t, ours_w = heatmap_targets(
            jnp.asarray(joints_3d[:, :2, 0]),
            jnp.asarray(joints_3d[:, 0, 1]),
            heatmap_hw=(64, 48), input_hw=(256, 192), sigma=2.0)
        np.testing.assert_allclose(np.asarray(ours_w)[:, 0],
                                   ref_w[:, 0, 0], atol=0)
        np.testing.assert_allclose(np.asarray(ours_t), ref_t,
                                   rtol=1e-5, atol=1e-6)

    def test_loss_masks_invisible(self):
        pred = jnp.ones((2, 8, 6, 3))
        tgt = jnp.zeros((2, 8, 6, 3))
        w = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
        loss = pose_heatmap_loss(pred, tgt, w)
        # only 2 visible joints of 6 contribute: 0.5 * (2*8*6)/(2*8*6*3)
        np.testing.assert_allclose(float(loss), 0.5 * 2.0 / 6.0,
                                   rtol=1e-6)


class _ToyPose(nn.Module):
    """Minimal conv-BN net exercising the shared train-mode BN path."""
    num_joints: int = 3

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(8, 3, 2, act="relu", name="c1")(x)
        x = nn.ConvTranspose(8, (4, 4), strides=(2, 2), padding="SAME",
                             name="up")(x)
        x = batch_norm(self, name="bn_up")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_joints, (1, 1), name="final")(x)


def _toy_batch(rng, n=4, hw=(16, 12), J=3):
    img = rng.normal(0, 1, (n, *hw, 3)).astype(np.float32)
    joints = rng.uniform(0, hw[1], (n, J, 2)).astype(np.float32)
    t, w = jax.vmap(lambda j: heatmap_targets(
        j, jnp.ones((J,)), hw, hw, sigma=1.0))(jnp.asarray(joints))
    return {"image": jnp.asarray(img),
            "target": jnp.transpose(t, (0, 2, 3, 1)),
            "target_weight": w[..., 0]}


class TestTrainSteps:
    def test_bn_trains_only_when_mutable(self):
        model = _ToyPose()
        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (2, 16, 12, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        # immutably applied -> inference BN, stats untouched
        y1 = model.apply(variables, x)
        # mutable batch_stats -> train-mode BN, stats move
        y2, mut = model.apply(variables, x, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(b, a)
                   for b, a in zip(before, after))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_pose_loss_decreases(self):
        rng = np.random.default_rng(1)
        model = _ToyPose()
        batch = _toy_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch["image"])
        tx = make_optimizer("adam", 1e-2)
        state = init_train_state(variables, tx)
        step = make_pose_train_step(model, tx)
        losses = []
        for _ in range(12):
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses
        assert int(state.step) == 12

    def test_dp_step_matches_single_device(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mvsmplfitting_tpu.parallel.mesh import MeshLayout, make_mesh
        mesh8 = make_mesh(MeshLayout(frames=8, cameras=1))
        rng = np.random.default_rng(2)
        model = _ToyPose()
        batch = _toy_batch(rng, n=8)
        variables = model.init(jax.random.PRNGKey(0), batch["image"])
        tx = make_optimizer("sgd", 1e-2, weight_decay=1e-4)
        step = make_train_step(
            lambda v, b, m: model.apply(v, b["image"], mutable=m),
            lambda out, b: pose_heatmap_loss(out, b["target"],
                                             b["target_weight"]),
            tx)
        s0 = init_train_state(variables, tx)
        _, loss_single, _ = step(s0, batch)

        shard = NamedSharding(mesh8, P("frames"))
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), batch)
        s1 = init_train_state(variables, tx)
        new_state, loss_dp, _ = step(s1, sharded)
        # cross-device reduction order differs; float32-level agreement
        np.testing.assert_allclose(float(loss_dp), float(loss_single),
                                   rtol=1e-4)
        # params after the step agree too (gradient all-reduce worked)
        for a, b in zip(jax.tree_util.tree_leaves(
                step(s0, batch)[0].params),
                jax.tree_util.tree_leaves(new_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_yolox_train_step_runs(self):
        rng = np.random.default_rng(3)
        hw = (64, 96)   # stride-32 divisible (the PAFPN needs it)
        model = YOLOX(num_classes=2, depth_mul=0.33, width_mul=0.125,
                      input_hw=hw, train_outputs=True)
        img = jnp.asarray(rng.normal(0, 1, (2, *hw, 3)).astype(
            np.float32))
        variables = model.init(jax.random.PRNGKey(0), img)
        labels = np.zeros((2, 3, 5), np.float32)
        labels[0, 0] = [0, 48, 32, 24, 20]
        labels[0, 1] = [1, 72, 40, 16, 16]
        labels[1, 0] = [1, 24, 20, 12, 12]
        tx = make_optimizer("sgd", lr_schedule(
            "yoloxwarmcos", 0.01, 10, 30), weight_decay=5e-4)
        step = make_yolox_train_step(model, tx, hw, use_l1=True)
        state = init_train_state(variables, tx)
        batch = {"image": img, "labels": jnp.asarray(labels)}
        state, loss, aux = step(state, batch)
        assert np.isfinite(float(loss))
        assert float(aux["num_fg"]) >= 3.0   # every gt got anchors
        state, loss2, _ = step(state, batch)
        assert np.isfinite(float(loss2))

    def test_ema_ramp_and_checkpoint_roundtrip(self, tmp_path):
        tree = {"a": jnp.ones((2, 2)), "b": jnp.zeros((3,)),
                "n": jnp.asarray(7, jnp.int32)}
        new = {"a": jnp.full((2, 2), 2.0), "b": jnp.ones((3,)),
               "n": jnp.asarray(9, jnp.int32)}
        out = ema_update(tree, new, jnp.asarray(1.0), base_decay=0.9999)
        d = 0.9999 * (1 - np.exp(-1 / 2000))
        np.testing.assert_allclose(np.asarray(out["a"]),
                                   d * 1 + (1 - d) * 2, rtol=1e-6)
        assert int(out["n"]) == 7            # non-float untouched

        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(p, out)
        back = load_checkpoint(p, out)
        for k in out:
            np.testing.assert_allclose(np.asarray(back[k]),
                                       np.asarray(out[k]))

    def test_simota_no_gt_image(self):
        """Zero-gt images produce no foreground and a finite loss."""
        rng = np.random.default_rng(6)
        decoded, origin_reg, labels = _random_problem(rng)
        labels[:] = 0.0
        out = yolox_losses(jnp.asarray(decoded), jnp.asarray(labels),
                           HW, STRIDES,
                           origin_reg=jnp.asarray(origin_reg),
                           use_l1=True)
        assert float(out["num_fg"]) == 1.0   # clamped
        assert np.isfinite(float(out["total"]))
        assert float(out["iou"]) == 0.0


class TestHeatmapTargetsNp:
    def test_numpy_mirror_matches_jnp(self):
        """`heatmap_targets_np` (host dataloader path) must equal the
        golden-tested jnp `heatmap_targets` bit for bit."""
        from mvsmplfitting_tpu.detect.train import (heatmap_targets,
                                                    heatmap_targets_np)
        rng = np.random.default_rng(0)
        for _ in range(5):
            J = int(rng.integers(3, 20))
            j = rng.uniform(-30, 280, (J, 2)).astype(np.float32)
            v = (rng.uniform(0, 1, J) > 0.3).astype(np.float32)
            tj, wj = heatmap_targets(jnp.asarray(j), jnp.asarray(v),
                                     (64, 48), (256, 192), 2.0)
            tn, wn = heatmap_targets_np(j, v, (64, 48), (256, 192),
                                        2.0)
            np.testing.assert_allclose(np.asarray(tj), tn, atol=1e-6)
            np.testing.assert_allclose(np.asarray(wj), wn, atol=0)
