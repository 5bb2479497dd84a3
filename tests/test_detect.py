"""Detection-frontend tests: shapes, decode numerics, crop/heatmap
round trips, and (when the reference torch code imports) activation
parity of the YOLOX graph against a randomly-initialized torch build.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.detect.blocks import pixel_shuffle
from mvsmplfitting_tpu.detect.fastpose import FastPose
from mvsmplfitting_tpu.detect.preprocess import (
    bbox_to_center_scale, crop_affine, heatmap_to_coords, letterbox,
)
from mvsmplfitting_tpu.detect.yolox import (
    YOLOX, decode_outputs, nms_xyxy, postprocess_boxes,
)

SMALL_HW = (64, 96)  # tiny input for fast CPU tests (stride-32 clean)


class TestYOLOX:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        # Small multipliers for test speed; architecture is identical.
        model = YOLOX(depth_mul=0.33, width_mul=0.25, input_hw=SMALL_HW)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *SMALL_HW, 3)))
        return model, params

    def test_output_shape(self, model_and_params):
        model, params = model_and_params
        out = model.apply(params, jnp.zeros((2, *SMALL_HW, 3)))
        h, w = SMALL_HW
        anchors = sum((h // s) * (w // s) for s in (8, 16, 32))
        assert out.shape == (2, anchors, 6)

    def test_decode_grid_offsets(self):
        # raw xy=0, wh=0 at every anchor must decode to grid*stride
        # centers with wh == stride.
        h, w = 32, 32
        anchors = sum((h // s) * (w // s) for s in (8, 16, 32))
        raw = np.zeros((1, anchors, 6), np.float32)
        dec = np.asarray(decode_outputs(jnp.asarray(raw), (h, w)))
        assert dec[0, 0, 0] == 0.0 and dec[0, 0, 1] == 0.0
        assert dec[0, 1, 0] == 8.0          # second anchor of stride 8
        assert dec[0, 0, 2] == 8.0          # wh = exp(0)*stride
        assert dec[0, -1, 2] == 32.0        # last level stride 32

    def test_nms(self):
        boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                            [50, 50, 60, 60]], np.float32)
        scores = np.asarray([0.9, 0.8, 0.7], np.float32)
        keep = nms_xyxy(boxes, scores, 0.45)
        assert keep == [0, 2]

    def test_postprocess_dual_band(self):
        # The reference vstacks the >=0.46 band on top of the
        # [thres, 0.46) band (`yolox/yolox.py:54-66`): ALL boxes above
        # conf_thresh survive, high band ordered first.
        dec = np.zeros((3, 6), np.float32)
        dec[:, :2] = [[10, 10], [100, 100], [200, 200]]
        dec[:, 2:4] = 10
        dec[:, 5] = 1.0
        dec[:, 4] = [0.9, 0.2, 0.05]
        out = postprocess_boxes(dec, conf_thresh=0.1)
        assert out.shape[0] == 2           # 0.05 below conf_thresh
        np.testing.assert_allclose(out[:, 4], [0.9, 0.2], rtol=1e-5)
        # No high-conf: the whole band is kept.
        dec[:, 4] = [0.3, 0.2, 0.05]
        out = postprocess_boxes(dec, conf_thresh=0.1)
        assert out.shape[0] == 2
        np.testing.assert_allclose(sorted(out[:, 4]), [0.2, 0.3],
                                   rtol=1e-5)


class TestFastPose:
    def test_output_shape(self):
        model = FastPose(num_joints=26)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 256, 192, 3)))
        out = model.apply(params, jnp.zeros((2, 256, 192, 3)))
        assert out.shape == (2, 64, 48, 26)

    def test_pixel_shuffle_matches_torch(self, rng):
        import torch

        x = rng.standard_normal((2, 4, 5, 16)).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        want = torch.pixel_shuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestBf16Path:
    """compute_dtype=bf16 (the MXU fast path / reference fp16 analogue)
    must agree with fp32 at the decision level."""

    def test_pose_estimator_bf16_close(self):
        from mvsmplfitting_tpu.detect.predictor import PoseEstimator
        r = np.random.default_rng(0)
        img = r.uniform(0, 1, (160, 224, 3)).astype(np.float32)
        pe32 = PoseEstimator(num_joints=17, input_hw=(64, 48), batch=8)
        pe16 = PoseEstimator(params=pe32.params, num_joints=17,
                             input_hw=(64, 48), batch=8,
                             compute_dtype=jnp.bfloat16)
        boxes = np.asarray([[20., 20., 120., 140.]], np.float32)
        k32 = pe32.estimate(img, boxes)
        k16 = pe16.estimate(img, boxes)
        assert k16.dtype == np.float32
        # random weights: argmax peaks may shift a pixel or two
        assert np.abs(k32[..., :2] - k16[..., :2]).max() < 8.0

    def test_detector_bf16_runs(self):
        from mvsmplfitting_tpu.detect.predictor import PersonDetector
        r = np.random.default_rng(1)
        img = r.integers(0, 255, (100, 150, 3), np.uint8)
        det = PersonDetector(input_hw=(64, 96), depth_mul=0.33,
                             width_mul=0.25,
                             compute_dtype=jnp.bfloat16)
        boxes = det.detect_batch([img])[0]
        assert boxes.dtype == np.float32 or boxes.size == 0
        assert np.isfinite(boxes).all()


class TestPreprocess:
    def test_letterbox_ratio_and_pad(self, rng):
        img = (rng.uniform(0, 255, size=(100, 50, 3))).astype(np.uint8)
        out, r = letterbox(img, (64, 64))
        assert out.shape == (64, 64, 3)
        np.testing.assert_allclose(r, 0.64)
        # Padded region is 114.
        assert (out[:, 40:] == 114.0).all()

    def test_center_scale_aspect_clip(self):
        centers, scales = bbox_to_center_scale(
            np.asarray([[0, 0, 30, 100]]), aspect_ratio=0.75)
        np.testing.assert_allclose(centers[0], [15, 50])
        # Width clipped up to 0.75 * h, then 1.25 padding.
        np.testing.assert_allclose(scales[0], [75 * 1.25, 100 * 1.25])

    def test_crop_affine_identity_center(self, rng):
        img = rng.uniform(0, 1, size=(64, 48, 3)).astype(np.float32)
        centers = np.asarray([[24.0, 32.0]], np.float32)
        scales = np.asarray([[48.0, 64.0]], np.float32)
        out = np.asarray(crop_affine(jnp.asarray(img),
                                     jnp.asarray(centers),
                                     jnp.asarray(scales), (64, 48)))
        np.testing.assert_allclose(out[0], img, atol=1e-5)

    def test_heatmap_decode_peak(self):
        hm = np.zeros((1, 64, 48, 3), np.float32)
        hm[0, 20, 10, 0] = 1.0
        hm[0, 20, 11, 0] = 0.5   # gradient pulls +x
        hm[0, 40, 30, 1] = 1.0
        centers = np.asarray([[100.0, 200.0]], np.float32)
        scales = np.asarray([[96.0, 128.0]], np.float32)
        coords, conf = heatmap_to_coords(jnp.asarray(hm),
                                         jnp.asarray(centers),
                                         jnp.asarray(scales))
        coords = np.asarray(coords)
        ratio = 96.0 / 48
        np.testing.assert_allclose(
            coords[0, 0], [(10.25 - 24) * ratio + 100,
                           (20 - 32) * ratio + 200], atol=1e-4)
        assert float(conf[0, 2]) == 0.0  # empty heatmap -> conf 0


class TestTorchParity:
    """Activation parity against the reference torch YOLOX graph."""

    @pytest.fixture(scope="class")
    def torch_yolox(self):
        sys.path.insert(0, "/root/reference")
        try:
            import types

            if "loguru" not in sys.modules:  # stub: only logging is used
                loguru = types.ModuleType("loguru")

                class _L:
                    def __getattr__(self, name):
                        return lambda *a, **k: None

                loguru.logger = _L()
                sys.modules["loguru"] = loguru
            if "torchvision" not in sys.modules:
                # Only `torchvision.ops.batched_nms` is referenced by
                # utility modules pulled in via package __init__.
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
            import torch
            from yolox.models.yolox import YOLOX as TorchYOLOX
            from yolox.models.yolo_pafpn import YOLOPAFPN
            from yolox.models.yolo_head import YOLOXHead
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference torch yolox unavailable: {e}")
        depth, width = 0.33, 0.25
        backbone = YOLOPAFPN(depth, width)
        head = YOLOXHead(1, width)
        model = TorchYOLOX(backbone, head)
        model.eval()
        model.head.decode_in_inference = False
        return model

    def test_yolox_matches_torch_random_weights(self, torch_yolox, rng):
        import torch

        from mvsmplfitting_tpu.detect.torch_import import (
            yolox_params_from_module,
        )

        model = YOLOX(depth_mul=0.33, width_mul=0.25, input_hw=SMALL_HW)
        variables = yolox_params_from_module(torch_yolox, depth_mul=0.33)

        img = rng.uniform(0, 255, size=(1, *SMALL_HW, 3)
                          ).astype(np.float32)
        with torch.no_grad():
            want = torch_yolox(
                torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

        from mvsmplfitting_tpu.detect.yolox import YOLOPAFPN as FlaxFPN
        from mvsmplfitting_tpu.detect.yolox import YOLOXHead as FlaxHead
        import flax.linen as fnn

        class RawYOLOX(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                feats = FlaxFPN(0.33, 0.25, name="fpn")(x)
                return FlaxHead(1, 0.25, name="head")(feats)

        got = np.asarray(RawYOLOX().apply(variables, jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_fastpose_matches_torch_random_weights(self, rng):
        """Build the reference's SEResnet+DUC stack in torch (random
        weights, skipping the torchvision-pretrained load in
        `fastpose.py:33-40`), convert, compare activations."""
        # Load the layer modules as a synthetic package: importing the
        # real `alphapose.models` package pulls in its full model zoo
        # (torchvision downloads, self-imports via `alphapose_core.*`).
        try:
            import importlib.util
            import types

            import torch
            import torch.nn as tnn

            layers_dir = ("/root/reference/alphapose_core/alphapose/"
                          "models/layers")
            pkg = types.ModuleType("apx_layers")
            pkg.__path__ = [layers_dir]
            sys.modules.setdefault("apx_layers", pkg)

            def load(name):
                spec = importlib.util.spec_from_file_location(
                    f"apx_layers.{name}", f"{layers_dir}/{name}.py")
                mod = importlib.util.module_from_spec(spec)
                sys.modules[f"apx_layers.{name}"] = mod
                spec.loader.exec_module(mod)
                return mod

            load("SE_module")
            SEResnet = load("SE_Resnet").SEResnet
            TorchDUC = load("DUC").DUC
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference alphapose unavailable: {e}")

        class TorchFastPose(tnn.Module):
            def __init__(self, num_joints=26):
                super().__init__()
                self.preact = SEResnet("resnet50")
                self.suffle1 = tnn.PixelShuffle(2)
                self.duc1 = TorchDUC(512, 1024, upscale_factor=2)
                self.duc2 = TorchDUC(256, 512, upscale_factor=2)
                self.conv_out = tnn.Conv2d(128, num_joints, 3, 1, 1)

            def forward(self, x):
                x = self.preact(x)
                x = self.suffle1(x)
                x = self.duc1(x)
                x = self.duc2(x)
                return self.conv_out(x)

        torch.manual_seed(0)
        tmodel = TorchFastPose()
        tmodel.eval()

        from mvsmplfitting_tpu.detect.torch_import import (
            fastpose_params_from_module,
        )

        variables = fastpose_params_from_module(tmodel)
        img = rng.uniform(-1, 1, size=(1, 64, 48, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(img).permute(0, 3, 1, 2)
                          ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(FastPose(num_joints=26).apply(
            variables, jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


class TestPoseNMS:
    def test_duplicates_merged(self, rng):
        from mvsmplfitting_tpu.detect.pose_nms import pose_nms

        K = 26
        base = rng.uniform(100, 200, size=(K, 2)).astype(np.float32)
        poses = np.stack([base, base + rng.normal(scale=1.0, size=(K, 2)),
                          base + 300.0])  # two dups + one far person
        scores = np.full((3, K), 0.9, np.float32)
        scores[1] *= 0.8
        boxes = np.asarray([[90, 90, 210, 210]] * 2 +
                           [[390, 390, 510, 510]], np.float32)
        out_boxes, out_poses, out_scores = pose_nms(
            boxes, np.ones(3, np.float32), poses, scores)
        assert out_poses.shape[0] == 2
        # Merged pose stays near the originals.
        d = np.linalg.norm(out_poses[0] - base, axis=1).mean()
        assert d < 2.0

    def test_low_scores_dropped(self):
        from mvsmplfitting_tpu.detect.pose_nms import pose_nms

        poses = np.zeros((1, 26, 2), np.float32) + 50
        scores = np.full((1, 26), 0.05, np.float32)  # < SCORE_THRESH
        boxes = np.asarray([[0, 0, 100, 100]], np.float32)
        b, p, s = pose_nms(boxes, np.ones(1), poses, scores)
        assert p.shape[0] == 0


class TestIntegralDecode:
    def test_peak_recovery(self):
        from mvsmplfitting_tpu.detect.preprocess import (
            heatmap_to_coords_integral,
        )

        hm = np.full((1, 64, 48, 2), -10.0, np.float32)
        hm[0, 20, 10, 0] = 10.0     # sharp peak -> expectation ~ argmax
        hm[0, 40, 30, 1] = 10.0
        centers = np.asarray([[100.0, 200.0]], np.float32)
        scales = np.asarray([[96.0, 128.0]], np.float32)
        coords, conf = heatmap_to_coords_integral(
            jnp.asarray(hm), jnp.asarray(centers), jnp.asarray(scales))
        ratio = 2.0
        # Sharp peak -> expectation ~= argmax; no half-pixel offset
        # ((x_norm + 0.5) * w cancels exactly, `transforms.py:628-631`).
        np.testing.assert_allclose(
            np.asarray(coords[0, 0]),
            [(10 - 24) * ratio + 100, (20 - 32) * ratio + 200],
            atol=0.1)
        # softmax norm -> confidence 1.0 (`_integral_tensor`).
        np.testing.assert_allclose(float(conf[0, 0]), 1.0)


class TestSimplePose:
    def test_output_shape(self):
        from mvsmplfitting_tpu.detect.simplepose import SimplePose

        m = SimplePose(num_joints=17)
        # Stride-32-divisible input: output is input/4 like the torch
        # SimplePose (non-divisible widths round up at the backbone).
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        out = m.apply(p, jnp.zeros((2, 64, 64, 3)))
        assert out.shape == (2, 16, 16, 17)

    def test_deconv_matches_torch(self, rng):
        import torch
        import flax.linen as fnn

        x = rng.standard_normal((1, 6, 5, 8)).astype(np.float32)
        tc = torch.nn.ConvTranspose2d(8, 4, 4, 2, 1, bias=False)
        w = tc.weight.detach().numpy()
        with torch.no_grad():
            want = tc(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()
        fl = fnn.ConvTranspose(4, (4, 4), strides=(2, 2),
                               padding="SAME", use_bias=False)
        kern = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
        got = fl.apply({"params": {"kernel": jnp.asarray(kern)}},
                       jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestHRNet:
    def test_output_shape_and_finite(self):
        from mvsmplfitting_tpu.detect.hrnet import PoseHRNet

        m = PoseHRNet(num_joints=17, width=8,      # narrow for CPU speed
                      stage_modules=(1, 1, 1))
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        out = m.apply(p, jnp.ones((2, 64, 64, 3)))
        assert out.shape == (2, 16, 16, 17)
        assert np.isfinite(np.asarray(out)).all()

    def test_branch_fusion_mixes_resolutions(self, rng):
        """A perturbation confined to the lowest-resolution branch must
        reach the high-resolution output (fuse layers work)."""
        from mvsmplfitting_tpu.detect.hrnet import PoseHRNet

        m = PoseHRNet(num_joints=4, width=8, stage_modules=(1, 1, 1))
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        a = m.apply(p, jnp.zeros((1, 64, 64, 3)))
        # Bias the deepest transition conv; output must change.
        import flax
        flat = flax.traverse_util.flatten_dict(p["params"])
        key = ("t3_b3", "conv", "kernel")
        flat[key] = flat[key] + 1.0
        p2 = dict(p)
        p2["params"] = flax.traverse_util.unflatten_dict(flat)
        b = m.apply(p2, jnp.zeros((1, 64, 64, 3)))
        # zero input -> conv of zeros is zero; bias the stem instead
        # if nothing changes on zeros, use ones input:
        a1 = m.apply(p, jnp.ones((1, 64, 64, 3)))
        b1 = m.apply(p2, jnp.ones((1, 64, 64, 3)))
        assert float(jnp.abs(a1 - b1).max()) > 1e-6


class TestHarDNet:
    def test_link_recursion_matches_reference_tables(self):
        from mvsmplfitting_tpu.detect.hardnet import HarDBlock

        # HarDNet-68 base-block output channels, per the reference's
        # `channels = [64, 124, 328, 654]` table (`hardnet.py:429`).
        assert HarDBlock.out_ch(64, 14, 1.7, 8) == 124

    def test_output_shape_and_finite(self):
        from mvsmplfitting_tpu.detect.hardnet import HarDNetPose

        m = HarDNetPose(num_joints=17)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        out = m.apply(p, jnp.ones((2, 128, 128, 3)))
        assert out.shape == (2, 32, 32, 17)       # input / 4
        assert np.isfinite(np.asarray(out)).all()


class TestFlipTest:
    def test_flip_heatmap_matches_reference_torch(self, rng):
        """Golden: NHWC flip_heatmap == the reference's torch
        `flip_heatmap(..., shift=True)` (`transforms.py:491-523`)."""
        import sys
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            import torch
            from alphapose.utils.transforms import (
                flip_heatmap as ref_flip)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference transforms unavailable: {e}")
        finally:
            sys.path.pop(0)

        from mvsmplfitting_tpu.detect.preprocess import (
            COCO_FLIP_PAIRS, flip_heatmap)

        hm = rng.standard_normal((2, 17, 8, 6)).astype(np.float32)
        pairs = [list(p) for p in COCO_FLIP_PAIRS]
        # shift=False: well-defined in torch -> exact golden.
        want = ref_flip(torch.from_numpy(hm.copy()), pairs,
                        shift=False).numpy()
        got = np.asarray(flip_heatmap(
            jnp.asarray(np.transpose(hm, (0, 2, 3, 1))), shift=False))
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)),
                                   want, atol=1e-6)
        # shift=True in the reference is an overlapping in-place copy
        # (UB; cascades on CPU torch — see the flip_heatmap parity
        # note).  Check OUR shift implements the intended semantics:
        # column k reads pre-shift column k-1, column 0 unchanged.
        ours = np.asarray(flip_heatmap(
            jnp.asarray(np.transpose(hm, (0, 2, 3, 1))), shift=True))
        np.testing.assert_allclose(ours[:, :, 1:, :], got[:, :, :-1, :],
                                   atol=1e-6)
        np.testing.assert_allclose(ours[:, :, 0, :], got[:, :, 0, :],
                                   atol=1e-6)

    def test_pose_estimator_flip_test(self, rng):
        """flip_test=True runs the doubled-batch ensembling path
        (`alphapose_core.py:85-91`) and still returns (M, J, 3)."""
        from mvsmplfitting_tpu.detect.predictor import PoseEstimator

        est = PoseEstimator(num_joints=17, input_hw=(64, 48),
                            flip_test=True, batch=4)
        img = rng.uniform(0, 1, (100, 80, 3)).astype(np.float32)
        boxes = np.asarray([[10, 10, 60, 90], [20, 5, 75, 95]],
                           np.float32)
        kps = est.estimate(img, boxes)
        assert kps.shape == (2, 17, 3)
        assert np.isfinite(kps).all()
        # the ensemble differs from the single-pass prediction
        est.flip_test = False
        kps_single = est.estimate(img, boxes)
        assert not np.allclose(kps, kps_single)


class TestHRNetTorchParity:
    def test_full_graph_matches_torch_random_weights(self, rng):
        """Build the reference's PoseHighResolutionNet (random weights
        + randomized BN running stats), convert the state_dict with
        `convert_hrnet_sd`, compare full-graph activations."""
        import importlib.util
        import types

        import torch

        models_dir = ("/root/reference/alphapose_core/alphapose/"
                      "models")
        pkg = types.ModuleType("apx_models")
        pkg.__path__ = [models_dir]
        sys.modules.setdefault("apx_models", pkg)
        builder = types.ModuleType("apx_models.builder")

        class _Reg:
            @staticmethod
            def register_module(cls):
                return cls

        builder.SPPE = _Reg()
        sys.modules["apx_models.builder"] = builder
        try:
            spec = importlib.util.spec_from_file_location(
                "apx_models.hrnet", f"{models_dir}/hrnet.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules["apx_models.hrnet"] = mod
            spec.loader.exec_module(mod)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference hrnet unavailable: {e}")

        W = 32
        cfg = {
            "PRESET": {"NUM_JOINTS": 17},
            "FINAL_CONV_KERNEL": 1,
            "PRETRAINED_LAYERS": ["*"],
            "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [4, 4],
                       "NUM_CHANNELS": [W, 2 * W],
                       "FUSE_METHOD": "SUM"},
            "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [4, 4, 4],
                       "NUM_CHANNELS": [W, 2 * W, 4 * W],
                       "FUSE_METHOD": "SUM"},
            "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [4, 4, 4, 4],
                       "NUM_CHANNELS": [W, 2 * W, 4 * W, 8 * W],
                       "FUSE_METHOD": "SUM"},
        }
        torch.manual_seed(0)
        tm = mod.PoseHighResolutionNet(**cfg)
        # Randomize BN running stats so a stats-mapping bug shows up.
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import convert_hrnet_sd
        from mvsmplfitting_tpu.detect.hrnet import PoseHRNet

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_hrnet_sd(sd))
        got = np.asarray(PoseHRNet(num_joints=17, width=W).apply(
            variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestSimplePoseTorchParity:
    def test_full_graph_matches_torch_random_weights(self, rng):
        """Reference ResNet-50 (`layers/Resnet.py`) + the exact
        `_make_deconv_layer` stack + final conv, random weights +
        randomized BN stats, converted with `convert_simplepose_sd`."""
        import importlib.util
        import types

        import torch
        import torch.nn as tnn

        path = ("/root/reference/alphapose_core/alphapose/models/"
                "layers/Resnet.py")
        spec = importlib.util.spec_from_file_location("apx_resnet",
                                                      path)
        rmod = importlib.util.module_from_spec(spec)
        sys.modules["apx_resnet"] = rmod
        spec.loader.exec_module(rmod)

        J, D = 17, 64   # narrow deconvs for speed

        class TSimplePose(tnn.Module):
            """`simplepose.py:13-60` minus the torchvision pretrained
            download (zero egress here); same child names."""

            def __init__(self):
                super().__init__()
                self.preact = rmod.ResNet("resnet50")
                self.deconv_layers = tnn.Sequential(
                    tnn.ConvTranspose2d(2048, D, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(D), tnn.ReLU(True),
                    tnn.ConvTranspose2d(D, D, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(D), tnn.ReLU(True),
                    tnn.ConvTranspose2d(D, D, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(D), tnn.ReLU(True))
                self.final_layer = tnn.Conv2d(D, J, 1)

            def forward(self, x):
                return self.final_layer(
                    self.deconv_layers(self.preact(x)))

        torch.manual_seed(0)
        tm = TSimplePose()
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import \
            convert_simplepose_sd
        from mvsmplfitting_tpu.detect.simplepose import SimplePose

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_simplepose_sd(sd))
        got = np.asarray(SimplePose(
            num_joints=J, deconv_filters=(D, D, D)).apply(
            variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestHarDNetTorchParity:
    def test_full_graph_matches_torch_random_weights(self, rng):
        """Load the reference's `hardnet.py` standalone (builder/layers
        stubbed), build HarDNetPose-68 with random weights + randomized
        BN stats, convert with `convert_hardnet_sd`, compare the full
        graph — including the align_corners=True decoder resizes."""
        import importlib.util
        import types

        import torch

        models_dir = ("/root/reference/alphapose_core/alphapose/"
                      "models")
        pkg = types.ModuleType("apx_hn")
        pkg.__path__ = [models_dir]
        sys.modules["apx_hn"] = pkg
        builder = types.ModuleType("apx_hn.builder")

        class _Reg:
            @staticmethod
            def register_module(cls):
                return cls

        builder.SPPE = _Reg()
        sys.modules["apx_hn.builder"] = builder
        layers_pkg = types.ModuleType("apx_hn.layers")
        layers_pkg.__path__ = [models_dir + "/layers"]
        sys.modules["apx_hn.layers"] = layers_pkg
        for stub in ("Resnet", "SE_Resnet", "ShuffleResnet"):
            m = types.ModuleType(f"apx_hn.layers.{stub}")
            for cls in ("ResNet", "SEResnet", "ShuffleResnet"):
                setattr(m, cls, object)
            sys.modules[f"apx_hn.layers.{stub}"] = m
        try:
            spec = importlib.util.spec_from_file_location(
                "apx_hn.hardnet", f"{models_dir}/hardnet.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules["apx_hn.hardnet"] = mod
            spec.loader.exec_module(mod)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference hardnet unavailable: {e}")

        cfg = {"DOWN_RATIO": 4, "TRT": False, "NUM_LAYERS": 68,
               "PRESET": {"NUM_JOINTS": 17}, "FINAL_CONV_KERNEL": 1}
        torch.manual_seed(0)
        tm = mod.HarDNetPose(**cfg)
        g = torch.Generator().manual_seed(1)
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.2 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        tm.eval()

        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)
                      ).permute(0, 2, 3, 1).numpy()

        from mvsmplfitting_tpu.detect.convert import convert_hardnet_sd
        from mvsmplfitting_tpu.detect.hardnet import HarDNetPose

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_hardnet_sd(sd))
        got = np.asarray(HarDNetPose(num_joints=17).apply(
            variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
