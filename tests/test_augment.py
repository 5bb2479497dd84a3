"""Augmentation tests: goldens against the reference's affine/flip/
mosaic-window code and invariants for the stochastic pipelines."""

import importlib.util
import sys
import types

import numpy as np
import pytest

from mvsmplfitting_tpu.detect.augment import (
    COCO17_FLIP_PAIRS, PoseAugConfig, apply_affine, augment_hsv,
    box_candidates, flip_joints, get_affine_transform,
    half_body_center_scale, labels_to_padded, mirror_boxes,
    mosaic4, mosaic_window, pose_train_sample, random_affine,
    warp_affine, yolox_train_sample)


def _ref_transforms():
    sys.path.insert(0, "/root/reference/alphapose_core")
    try:
        from alphapose.utils import transforms as T
        return T
    except Exception as e:             # pragma: no cover
        pytest.skip(f"reference transforms unavailable: {e}")


class TestAffineGolden:
    def test_get_affine_transform_matches_reference(self):
        T = _ref_transforms()
        rng = np.random.default_rng(0)
        for _ in range(12):
            center = rng.uniform(20, 200, 2).astype(np.float32)
            scale = rng.uniform(40, 300, 2).astype(np.float32)
            rot = float(rng.uniform(-80, 80))
            out = [192, 256]
            for inv in (0, 1):
                want = T.get_affine_transform(center.copy(),
                                              scale.copy(), rot, out,
                                              inv=inv)
                got = get_affine_transform(center, scale, rot, out,
                                           inv=bool(inv))
                np.testing.assert_allclose(got, want, rtol=1e-4,
                                           atol=1e-3)

    def test_apply_affine_matches_reference(self):
        T = _ref_transforms()
        trans = get_affine_transform([100, 80], [150, 200], 30.0,
                                     [192, 256])
        pts = np.random.default_rng(1).uniform(0, 200, (7, 2))
        got = apply_affine(pts, trans)
        want = np.stack([T.affine_transform(p, trans) for p in pts])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_flip_joints_matches_reference(self):
        T = _ref_transforms()
        rng = np.random.default_rng(2)
        J = 17
        j3d = np.zeros((J, 3, 2), np.float32)
        j3d[:, 0, 0] = rng.uniform(0, 192, J)
        j3d[:, 1, 0] = rng.uniform(0, 256, J)
        vis = (rng.uniform(0, 1, J) > 0.3).astype(np.float32)
        j3d[:, 0, 1] = j3d[:, 1, 1] = vis
        want = T.flip_joints_3d(j3d.copy(), 192,
                                [list(p) for p in COCO17_FLIP_PAIRS])
        got_j, got_v = flip_joints(j3d[:, :2, 0], vis, 192)
        np.testing.assert_allclose(got_j[:, 0], want[:, 0, 0],
                                   atol=1e-5)
        np.testing.assert_allclose(got_j[:, 1], want[:, 1, 0],
                                   atol=1e-5)
        np.testing.assert_allclose(got_v, want[:, 0, 1], atol=0)

    def test_warp_affine_roundtrip(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (64, 48, 3)).astype(np.float32)
        trans = get_affine_transform([24, 32], [48, 64], 0.0, [48, 64])
        out = warp_affine(img, trans, [48, 64])
        # identity-scale crop about the center reproduces the image
        np.testing.assert_allclose(out[8:-8, 8:-8], img[8:-8, 8:-8],
                                   atol=1e-3)


class TestHalfBody:
    def _ref(self):
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            import importlib as _il

            import alphapose.utils  # noqa: F401
            ra = types.ModuleType("alphapose.utils.roi_align")
            ra.RoIAlign = object
            sys.modules.setdefault("alphapose.utils.roi_align", ra)
            pkg = types.ModuleType("alphapose.utils.presets")
            pkg.__path__ = ["/root/reference/alphapose_core/alphapose/"
                            "utils/presets"]
            sys.modules.setdefault("alphapose.utils.presets", pkg)
            mod = _il.import_module(
                "alphapose.utils.presets.simple_transform")
        except Exception as e:         # pragma: no cover
            pytest.skip(f"reference transform unimportable: {e}")
        st = object.__new__(mod.SimpleTransform)
        st.num_joints = 17
        st.upper_body_ids = list(range(11))
        st.lower_body_ids = list(range(11, 17))
        st._aspect_ratio = 0.75
        st.pixel_std = 1
        return st

    def test_forced_lower_branch_matches_reference(self):
        """Only lower-body joints visible -> branch is deterministic in
        both implementations; centers/scales must agree exactly."""
        st = self._ref()
        rng = np.random.default_rng(4)
        joints = rng.uniform(0, 200, (17, 2)).astype(np.float32)
        vis = np.zeros(17, np.float32)
        vis[11:16] = 1.0                  # 5 lower joints, 0 upper
        j3d = np.stack([joints, joints], axis=2)
        want_c, want_s = st.half_body_transform(
            joints, vis[:, None].repeat(1, 1))
        got = half_body_center_scale(np.random.default_rng(0), joints,
                                     vis)
        assert got is not None
        np.testing.assert_allclose(got[0], want_c, rtol=1e-6)
        np.testing.assert_allclose(got[1], want_s, rtol=1e-6)

    def test_forced_upper_branch_matches_reference(self):
        """Fewer than 3 lower joints visible -> upper either way."""
        st = self._ref()
        rng = np.random.default_rng(5)
        joints = rng.uniform(0, 200, (17, 2)).astype(np.float32)
        vis = np.zeros(17, np.float32)
        vis[:8] = 1.0                     # 8 upper, 0 lower
        want_c, want_s = st.half_body_transform(joints, vis[:, None])
        got = half_body_center_scale(np.random.default_rng(0), joints,
                                     vis)
        assert got is not None
        np.testing.assert_allclose(got[0], want_c, rtol=1e-6)
        np.testing.assert_allclose(got[1], want_s, rtol=1e-6)

    def test_too_few_returns_none(self):
        joints = np.zeros((17, 2), np.float32)
        vis = np.zeros(17, np.float32)
        vis[0] = 1.0
        assert half_body_center_scale(np.random.default_rng(0),
                                      joints, vis) is None


class TestPoseTrainSample:
    def test_no_aug_config_matches_plain_crop(self):
        """scale_factor 0 / rot 0 / no flip reduces to the inference
        crop transform; joints land where apply_affine puts them."""
        from mvsmplfitting_tpu.detect.preprocess import (
            bbox_to_center_scale)
        rng = np.random.default_rng(6)
        img = rng.uniform(0, 255, (120, 90, 3)).astype(np.float32)
        bbox = np.asarray([10, 15, 80, 110], np.float32)
        joints = rng.uniform(15, 80, (17, 2)).astype(np.float32)
        vis = np.ones(17, np.float32)
        cfg = PoseAugConfig(scale_factor=0.0, rot_factor=0.0,
                            flip=False, prob_half_body=-1.0,
                            input_hw=(64, 48))
        crop, j_t, v_t = pose_train_sample(
            np.random.default_rng(0), img, bbox, joints, vis, cfg)
        assert crop.shape == (64, 48, 3)
        c, s = bbox_to_center_scale(bbox[None], aspect_ratio=0.75)
        trans = get_affine_transform(c[0], s[0], 0.0, (48, 64))
        np.testing.assert_allclose(j_t, apply_affine(joints, trans),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(v_t, vis)

    def test_stochastic_runs_and_shapes(self):
        rng = np.random.default_rng(7)
        img = rng.uniform(0, 255, (120, 90, 3)).astype(np.float32)
        bbox = np.asarray([10, 15, 80, 110], np.float32)
        joints = rng.uniform(15, 80, (17, 2)).astype(np.float32)
        vis = (rng.uniform(0, 1, 17) > 0.2).astype(np.float32)
        cfg = PoseAugConfig(input_hw=(64, 48), prob_half_body=0.5)
        for seed in range(8):
            crop, j_t, v_t = pose_train_sample(
                np.random.default_rng(seed), img, bbox, joints, vis,
                cfg)
            assert crop.shape == (64, 48, 3)
            assert np.isfinite(j_t).all()
            assert set(np.unique(v_t)) <= {0.0, 1.0}


class TestMosaic:
    def test_window_matches_reference(self):
        spec = importlib.util.spec_from_file_location(
            "ref_mosaic_stub", "/dev/null")
        # import just get_mosaic_coordinate by executing its source
        src = open("/root/reference/yolox/data/datasets/"
                   "mosaicdetection.py").read()
        ns = {}
        fn_src = src[src.index("def get_mosaic_coordinate"):
                     src.index("class MosaicDetection")]
        exec(fn_src, ns)                 # pure arithmetic, no imports
        ref_fn = ns["get_mosaic_coordinate"]
        rng = np.random.default_rng(8)
        for _ in range(50):
            ih, iw = 64, 96
            xc = int(rng.uniform(0.5 * iw, 1.5 * iw))
            yc = int(rng.uniform(0.5 * ih, 1.5 * ih))
            w = int(rng.uniform(20, iw))
            h = int(rng.uniform(20, ih))
            for i in range(4):
                want = ref_fn(None, i, xc, yc, w, h, ih, iw)
                got = mosaic_window(i, xc, yc, w, h, ih, iw)
                assert got[0] == tuple(want[0]), (i, got, want)
                assert got[1] == tuple(want[1]), (i, got, want)

    def test_mosaic4_composition(self):
        rng = np.random.default_rng(9)
        hw = (64, 96)
        imgs = [np.full((50, 70, 3), 40.0 * (i + 1), np.float32)
                for i in range(4)]
        labels = [np.asarray([[5, 5, 30, 30, 0]], np.float32)
                  for _ in range(4)]
        canvas, lab = mosaic4(rng, imgs, labels, hw)
        assert canvas.shape == (128, 192, 3)
        # every surviving label obeys the border filters
        if lab.size:
            assert (lab[:, 0] < 192).all() and (lab[:, 2] > 0).all()
            assert (lab[:, 1] < 128).all() and (lab[:, 3] > 0).all()

    def test_random_affine_filters_and_bounds(self):
        rng = np.random.default_rng(10)
        img = np.full((128, 192, 3), 60.0, np.float32)
        targets = np.asarray([[20, 20, 80, 90, 0],
                              [100, 40, 150, 110, 1],
                              [0, 0, 1, 1, 0]], np.float32)
        out, kept = random_affine(rng, img, targets,
                                  out_hw=(64, 96))
        assert out.shape == (64, 96, 3)
        if kept.size:
            assert (kept[:, 0] < 96).all() and (kept[:, 2] > 0).all()
        # the degenerate 1x1 box never survives box_candidates
        assert not any((kept[:, 2] - kept[:, 0] < 2) if kept.size
                       else [])

    def test_box_candidates_reference_rule(self):
        b1 = np.asarray([[0, 0, 50, 50], [0, 0, 50, 50]],
                        np.float32).T
        b2 = np.asarray([[0, 0, 40, 40], [0, 0, 1, 40]], np.float32).T
        keep = box_candidates(b1, b2)
        assert keep.tolist() == [True, False]   # thin box fails wh_thr

    def test_hsv_and_mirror(self):
        rng = np.random.default_rng(11)
        img = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
        out = augment_hsv(rng, img)
        assert out.shape == img.shape
        assert out.min() >= -1e-3 and out.max() <= 255.0 + 1e-3
        # the value clip must BIND on bright pixels when the gain draw
        # is > 1 (the reference's uint8 LUT saturates at 255); sweep
        # seeds so both gain signs occur.
        bright = np.full((8, 8, 3), 250.0, np.float32)
        for seed in range(16):
            o = augment_hsv(np.random.default_rng(seed), bright)
            assert o.max() <= 255.0 + 1e-3, seed

        boxes = np.asarray([[4, 5, 20, 25, 0]], np.float32)
        m_img, m_boxes = mirror_boxes(np.random.default_rng(1), img,
                                      boxes, prob=1.1)
        np.testing.assert_allclose(m_img, img[:, ::-1])
        np.testing.assert_allclose(m_boxes[0, :4], [48 - 20, 5,
                                                    48 - 4, 25])

    def test_labels_to_padded(self):
        lab = np.asarray([[10, 20, 30, 60, 2]], np.float32)
        out = labels_to_padded(lab, 4)
        assert out.shape == (4, 5)
        np.testing.assert_allclose(out[0], [2, 20, 40, 20, 40])
        assert (out[1:] == 0).all()

    def test_full_pipeline_feeds_loss(self):
        """mosaic -> affine -> hsv -> mirror -> padded labels that the
        SimOTA loss consumes without NaNs."""
        import jax.numpy as jnp

        from mvsmplfitting_tpu.detect.yolox_loss import yolox_losses
        rng = np.random.default_rng(12)
        hw = (64, 96)
        imgs = [rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
                for _ in range(4)]
        labels = [np.asarray([[10, 10, 50, 50, 0]], np.float32)
                  for _ in range(4)]
        img, padded = yolox_train_sample(rng, imgs, labels, hw,
                                         max_labels=10)
        assert img.shape == (64, 96, 3)
        assert padded.shape == (10, 5)
        A = sum((hw[0] // s) * (hw[1] // s) for s in (8, 16, 32))
        decoded = np.concatenate([
            rng.uniform(0, 96, (1, A, 1)).astype(np.float32),
            rng.uniform(0, 64, (1, A, 1)).astype(np.float32),
            rng.uniform(2, 30, (1, A, 2)).astype(np.float32),
            rng.normal(0, 1, (1, A, 2)).astype(np.float32)], axis=-1)
        out = yolox_losses(jnp.asarray(decoded),
                           jnp.asarray(padded[None]), hw)
        assert np.isfinite(float(out["total"]))


class _ReplayRng:
    """np.random.Generator stand-in replaying scripted draws, so our
    mixup consumes EXACTLY the values the patched reference drew."""

    def __init__(self, uniforms, ints):
        self.uniforms = list(uniforms)
        self.ints = list(ints)

    def uniform(self, *a, **k):
        return self.uniforms.pop(0)

    def integers(self, *a, **k):
        return self.ints.pop(0)


class TestMixupGolden:
    """Golden: our `mixup` vs the reference's
    `MosaicDetection.mixup` (`mosaicdetection.py:162-241`) with
    identical scripted randomness on identical float images."""

    def _reference_mixup(self, monkeypatch, origin_img, origin_labels,
                         cp_img, cp_labels, input_dim, uniforms, ints):
        import random as _random
        sys.path.insert(0, "/root/reference")
        # Stub the reference's unused heavy deps (absent in this env)
        # and bypass yolox/data/__init__.py (which drags in
        # pycocotools via MOTDataset) with synthetic package modules so
        # only mosaicdetection + its actual deps execute.
        for name, attrs in (("torchvision", {}),
                            ("thop", {"profile":
                                      lambda *a, **k: (0, 0)})):
            if name not in sys.modules:
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
        if "loguru" not in sys.modules:
            loguru = types.ModuleType("loguru")

            class _L:
                def __getattr__(self, name):
                    return lambda *a, **k: None

            loguru.logger = _L()
            sys.modules["loguru"] = loguru
        for name in ("yolox", "yolox.data", "yolox.data.datasets"):
            if name not in sys.modules:
                pkg = types.ModuleType(name)
                pkg.__path__ = ["/root/reference/"
                                + name.replace(".", "/")]
                sys.modules[name] = pkg
        try:
            import importlib
            MosaicDetection = importlib.import_module(
                "yolox.data.datasets.mosaicdetection").MosaicDetection
        except Exception as e:              # pragma: no cover
            pytest.skip(f"reference yolox unimportable: {e}")
        finally:
            sys.path.pop(0)

        class _Stub:
            def __len__(self):
                return 1

            def load_anno(self, i):
                return cp_labels

            def pull_item(self, i):
                return cp_img.copy(), cp_labels.copy(), None, None

        us, js = list(uniforms), list(ints)
        monkeypatch.setattr(_random, "uniform",
                            lambda *a, **k: us.pop(0))
        monkeypatch.setattr(_random, "randint",
                            lambda *a, **k: js.pop(0))
        md = MosaicDetection.__new__(MosaicDetection)
        md._dataset = _Stub()
        md.mixup_scale = (0.5, 1.5)
        return md.mixup(origin_img.copy(), origin_labels.copy(),
                        input_dim)

    def _case(self, monkeypatch, uniforms, ref_ints, our_ints):
        from mvsmplfitting_tpu.detect.augment import mixup
        rng = np.random.default_rng(13)
        hw = (96, 128)
        origin_img = rng.uniform(0, 255, (*hw, 3)).astype(np.float32)
        origin_labels = np.asarray(
            [[10, 12, 60, 70, 0, 0], [40, 5, 90, 88, 0, 1]],
            np.float32)
        cp_img = rng.uniform(0, 255, (80, 100, 3)).astype(np.float32)
        cp_labels = np.asarray(
            [[5, 8, 70, 60, 0, 0], [30, 30, 95, 75, 0, 1],
             [0, 0, 3, 3, 0, 2]],           # fails wh_thr=5
            np.float32)

        want_img, want_lab = self._reference_mixup(
            monkeypatch, origin_img, origin_labels, cp_img, cp_labels,
            hw, uniforms, ref_ints)
        got_img, got_lab = mixup(
            _ReplayRng(uniforms, our_ints), origin_img.copy(),
            origin_labels.copy(), cp_img, cp_labels, hw)

        assert got_lab.shape == np.asarray(want_lab).shape
        np.testing.assert_allclose(got_lab, want_lab, atol=1e-3)
        # image path crosses float64 (ref) vs float32 (ours) plus the
        # shared uint8 truncation; allow sub-LSB drift.
        np.testing.assert_allclose(got_img, want_img, atol=1.0)
        assert np.abs(got_img - want_img).mean() < 0.02
        return got_img, got_lab

    def test_upscale_flip_crop(self, monkeypatch):
        # jit=1.3 (padded larger than target in both dims -> y then x
        # offsets drawn), flip on (0.7 > 0.5).
        img, lab = self._case(monkeypatch, uniforms=[1.3, 0.7],
                              ref_ints=[0, 17, 9], our_ints=[17, 9])
        assert lab.shape[0] > 2          # co-sample labels appended

    def test_downscale_noflip_nocrop(self, monkeypatch):
        # jit=0.8 (canvas smaller than target -> no offsets), no flip.
        self._case(monkeypatch, uniforms=[0.8, 0.2],
                   ref_ints=[0], our_ints=[])

    def test_no_survivor_keeps_image(self, monkeypatch):
        """When every co-box fails the wh_thr=5 filter the reference
        returns the image UNBLENDED (`:228`); so must we."""
        from mvsmplfitting_tpu.detect.augment import mixup
        rng = np.random.default_rng(14)
        hw = (96, 128)
        origin_img = rng.uniform(0, 255, (*hw, 3)).astype(np.float32)
        origin_labels = np.asarray([[10, 12, 60, 70, 0]], np.float32)
        cp_img = rng.uniform(0, 255, (80, 100, 3)).astype(np.float32)
        tiny = np.asarray([[0, 0, 3, 3, 0]], np.float32)
        got_img, got_lab = mixup(_ReplayRng([0.8, 0.2], []),
                                 origin_img.copy(), origin_labels,
                                 cp_img, tiny, hw)
        np.testing.assert_array_equal(got_img, origin_img)
        np.testing.assert_array_equal(got_lab, origin_labels)

    def test_train_sample_with_mixup_feeds_loss(self):
        from mvsmplfitting_tpu.detect.augment import (
            labels_to_padded, yolox_train_sample)
        rng = np.random.default_rng(15)
        hw = (64, 96)
        imgs = [rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
                for _ in range(4)]
        labels = [np.asarray([[10, 10, 50, 50, 0]], np.float32)
                  for _ in range(4)]
        img, padded = yolox_train_sample(
            rng, imgs, labels, hw, max_labels=10,
            cp_image=imgs[0], cp_labels=labels[0])
        assert img.shape == (64, 96, 3)
        assert np.isfinite(img).all() and np.isfinite(padded).all()


def test_flip_joints_narrow_skeleton():
    """Pair tables wider than the skeleton are skipped, not an
    IndexError (joint-count-generic datasets, e.g. 5-joint toys)."""
    from mvsmplfitting_tpu.detect.augment import flip_joints
    j = np.asarray([[1.0, 2.0]] * 5, np.float32)
    v = np.ones(5, np.float32)
    out, vout = flip_joints(j, v, width=10)
    assert out.shape == (5, 2) and vout.shape == (5,)
    np.testing.assert_allclose(out[:, 0], 10 - 1 - 1.0)
