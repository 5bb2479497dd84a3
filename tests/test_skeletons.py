"""Skeleton registry golden tests.

The tables in `viz/skeletons.py` are data contracts of the public
keypoint formats; rather than importing the reference's torch/tkinter-
heavy modules, these tests AST-parse the reference sources
(`alphapose/utils/vis.py` limb/color tables, `alphapose/datasets/*.py`
flip pairs and lower-body ids) and assert our tables are exactly the
same constants.
"""

import ast
import os

import numpy as np
import pytest

from mvsmplfitting_tpu.viz import skeletons as sk

REF = "/root/reference/alphapose_core/alphapose"


def _eval_node(node, consts):
    if isinstance(node, (ast.Tuple, ast.List)):
        return tuple(_eval_node(e, consts) for e in node.elts)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        return consts[node.id]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_eval_node(node.operand, consts)
    raise ValueError(ast.dump(node))


def _collect(path, names):
    """All module/class/function-level assignments to ``names`` in the
    file, in source order, as tuples; plus ``return [...]`` bodies of
    functions named in ``names`` (the mpii property form)."""
    with open(path) as f:
        tree = ast.parse(f.read())
    consts, found = {}, []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                key = (t.id if isinstance(t, ast.Name)
                       else t.attr if isinstance(t, ast.Attribute)
                       else None)
                if key is None:
                    continue
                try:
                    val = _eval_node(node.value, consts)
                except (ValueError, KeyError):
                    continue
                if key in names:
                    found.append((key, val))
                elif key.isupper():        # color constants RED/BLUE/...
                    consts[key] = val
        if isinstance(node, ast.FunctionDef) and node.name in names:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Return) and sub.value is not None:
                    try:
                        found.append((node.name,
                                      _eval_node(sub.value, consts)))
                    except (ValueError, KeyError):
                        pass
    return found


needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not present")


@needs_ref
class TestGoldenTables:
    def test_flip_pairs_match_dataset_classes(self):
        cases = {
            "mscoco.py": sk.SKELETONS["coco17"].flip_pairs,
            "mpii.py": sk.MPII16_FLIP,
            "halpe_26.py": sk.HALPE26_FLIP,
            "halpe_68_noface.py": sk.HALPE68_FLIP,
            "halpe_136.py": sk.HALPE136_FLIP,
            "coco_wholebody.py": sk.WB133_FLIP,
        }
        for fname, ours in cases.items():
            got = _collect(os.path.join(REF, "datasets", fname),
                           {"joint_pairs"})
            assert got, fname
            assert got[0][1] == ours, fname

    def test_single_hand_has_no_flip_pairs(self):
        got = _collect(os.path.join(REF, "datasets", "single_hand.py"),
                       {"joint_pairs"})
        assert got[0][1] == () == sk.SKELETONS["hand21"].flip_pairs

    def test_lower_body_ids_match(self):
        for fname, ours in {
                "halpe_26.py": sk.SKELETONS["halpe26"].lower_body_ids,
                "halpe_136.py": sk.SKELETONS["halpe136"].lower_body_ids,
                "coco_wholebody.py":
                    sk.SKELETONS["coco_wholebody133"].lower_body_ids,
        }.items():
            got = _collect(os.path.join(REF, "datasets", fname),
                           {"lower_body_ids"})
            assert got and got[0][1] == ours, fname

    def test_limb_and_color_tables_match_vis(self):
        """Every spec's (limbs, point_colors, line_colors) equals one of
        the reference's inline `vis_frame` table triples exactly
        (`vis.py:289-432` declares one per joint count)."""
        path = os.path.join(REF, "utils", "vis.py")
        lp = [v for _, v in _collect(path, {"l_pair"})]
        pc = [v for _, v in _collect(path, {"p_color"})]
        lc = [v for _, v in _collect(path, {"line_color"})]
        for name in ("coco17", "mpii16", "halpe26", "halpe68",
                     "halpe136", "coco_wholebody133", "hand21"):
            spec = sk.SKELETONS[name]
            assert spec.limbs in lp, name
            assert spec.point_colors in pc, name
            if name != "hand21":   # single-hand declares no line_color
                assert spec.line_colors in lc, name


class TestSpecs:
    @pytest.mark.parametrize("name", list(sk.SKELETONS))
    def test_tables_well_formed(self, name):
        spec = sk.SKELETONS[name]
        top = spec.num_joints + (1 if spec.synthetic_neck else 0)
        if name == "hand21":          # vis table spans two hands
            top = 42
        for a, b in spec.limbs:
            assert 0 <= a < top and 0 <= b < top and a != b
        # flip table is a fixed-point-free involution
        perm = np.arange(spec.num_joints)
        for a, b in spec.flip_pairs:
            assert a != b
            perm[a], perm[b] = perm[b], perm[a]
        for a, b in spec.flip_pairs:
            assert perm[a] == b and perm[b] == a
        assert all(0 <= i < spec.num_joints
                   for i in spec.lower_body_ids)

    def test_lookup_by_count_and_name(self):
        assert sk.skeleton_for(136).name == "halpe136"
        assert sk.skeleton_for(133).name == "coco_wholebody133"
        assert sk.skeleton_for(16).name == "mpii16"
        assert sk.skeleton_for(17, "mpii16").name == "mpii16"
        assert sk.skeleton_for(999).name == "coco17"

    def test_flip_pairs_for_bridge(self):
        from mvsmplfitting_tpu.detect.preprocess import flip_pairs_for
        assert flip_pairs_for(68) == sk.HALPE68_FLIP
        assert flip_pairs_for(17, "mpii16") == sk.MPII16_FLIP


class TestVisFrame:
    @pytest.mark.parametrize("name", list(sk.SKELETONS))
    @pytest.mark.parametrize("fast", [True, False])
    def test_draws_every_format(self, name, fast, rng):
        pytest.importorskip("cv2")
        spec = sk.SKELETONS[name]
        n = 42 if name == "hand21" else spec.num_joints
        img = np.zeros((80, 80, 3), np.uint8)
        kp = rng.uniform(5, 75, (n, 2))
        scores = rng.uniform(0.5, 1.0, n)
        out = sk.vis_frame(img, kp, scores, fmt=name, fast=fast,
                           track_id=3 if fast else None,
                           box=(2, 2, 70, 70) if fast else None)
        assert out is img and img.any()

    def test_threshold_suppresses_everything(self):
        pytest.importorskip("cv2")
        img = np.zeros((40, 40, 3), np.uint8)
        kp = np.full((17, 2), 20.0)
        sk.vis_frame(img, kp, np.zeros(17), vis_thresh=0.5)
        assert not img.any()

    def test_nonfinite_keypoints_are_safe(self):
        pytest.importorskip("cv2")
        img = np.zeros((40, 40, 3), np.uint8)
        kp = np.full((26, 2), np.nan)
        kp[0] = (1e12, -1e12)
        sk.vis_frame(img, kp, np.ones(26))
        assert not img.any()


class TestFormatPlumbing:
    def test_aug_for_format_builds_registry_config(self):
        from mvsmplfitting_tpu.cli.train_pose import aug_for_format
        cfg = aug_for_format("halpe136", 136, (256, 192))
        assert cfg.flip_pairs == sk.HALPE136_FLIP
        # The reference's effective half-body split is ALWAYS
        # upper=(0..10): CustomDataset.__init__ shadows the class-
        # level per-format ids with instance attributes
        # (`datasets/custom.py:93-94`) and SimpleTransform reads the
        # instance — quirk reproduced.
        assert cfg.upper_body_ids == tuple(range(11))
        assert aug_for_format(None, 17, (256, 192)) is None
        with pytest.raises(SystemExit):
            aug_for_format("halpe136", 26, (256, 192))

    def test_136_joint_flip_through_real_augmentation(self):
        """flip_joints with the halpe-136 pairs is a label-consistent
        mirror: flipping twice restores the original labels."""
        from mvsmplfitting_tpu.detect.augment import flip_joints
        rng = np.random.default_rng(0)
        J, W = 136, 200
        joints = rng.uniform(0, W, (J, 2)).astype(np.float32)
        # all-visible: flip_joints keeps the reference's
        # `coords *= visibility` zeroing quirk, which is (by design)
        # not an involution for invisible joints
        vis = np.ones(J, np.float32)
        j1, v1 = flip_joints(joints, vis, W, sk.HALPE136_FLIP)
        j2, v2 = flip_joints(j1, v1, W, sk.HALPE136_FLIP)
        np.testing.assert_allclose(j2, joints, atol=1e-5)
        np.testing.assert_allclose(v2, vis)
        # the mirror actually moved unpaired x coords
        assert not np.allclose(j1[:, 0], joints[:, 0])

    def test_flip_heatmap_with_wholebody_pairs(self):
        """flip_heatmap with a 133-channel map + registry pairs is an
        involution (shift disabled)."""
        import jax.numpy as jnp

        from mvsmplfitting_tpu.detect.preprocess import flip_heatmap
        rng = np.random.default_rng(1)
        hm = jnp.asarray(rng.standard_normal((2, 8, 6, 133)),
                         jnp.float32)
        out = flip_heatmap(flip_heatmap(hm, sk.WB133_FLIP, shift=False),
                           sk.WB133_FLIP, shift=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(hm))


class TestGuards:
    def test_unknown_named_format_raises(self):
        with pytest.raises(ValueError, match="unknown skeleton"):
            sk.skeleton_for(26, "halpe-26")   # typo'd name

    def test_flip_pairs_reaching_past_heatmap_raise(self):
        from mvsmplfitting_tpu.detect.preprocess import flip_pairs_for
        with pytest.raises(ValueError, match="reach joint"):
            flip_pairs_for(26, "halpe136")
        # narrower-than-model tables are the reference predictor's
        # own behavior (COCO pairs on the halpe-26 net) — allowed
        assert flip_pairs_for(26, "coco17") == sk.SKELETONS[
            "coco17"].flip_pairs

    def test_mixed_width_concat_requires_num_joints(self, tmp_path):
        import json as _json

        from mvsmplfitting_tpu.detect.dataset import (
            CocoPoseTrainDataset)
        anns = []
        for src, J in enumerate((17, 26)):
            gt = {"images": [], "annotations": [
                {"id": 0, "image_id": 0, "category_id": 1,
                 "bbox": [0, 0, 10, 10],
                 "keypoints": [1.0] * (J * 3), "num_keypoints": J}],
                "categories": [{"id": 1, "name": "person"}]}
            p = tmp_path / f"gt{src}.json"
            with open(p, "w") as f:
                _json.dump(gt, f)
            anns.append(str(p))
        with pytest.raises(ValueError, match="mixed joint counts"):
            CocoPoseTrainDataset(anns, [str(tmp_path)] * 2)


@needs_ref
class TestPixelParity:
    """`vis_frame` output is PIXEL-IDENTICAL to the reference's own
    `vis_frame` on identical inputs (incl. its leaked-loop-variable
    limb-alpha quirk, `vis.py:513-516`, and int() truncation).  mpii16
    is excluded: the reference's 16-joint table is unreachable (its
    dispatch raises NotImplementedError for kp_num == 16)."""

    @pytest.mark.parametrize("fast", [False, True])
    @pytest.mark.parametrize("num_joints,fmt",
                             [(17, "coco17"), (26, "halpe26"),
                              (68, "halpe68"), (136, "halpe136"),
                              (133, "coco_wholebody133")])
    def test_matches_reference_vis_frame(self, num_joints, fmt, fast):
        import sys
        import types

        pytest.importorskip("cv2")
        sys.path.insert(0, "/root/reference/alphapose_core")
        try:
            import torch
            from alphapose.utils.vis import vis_frame as ref_slow
            from alphapose.utils.vis import vis_frame_fast as ref_fast
            ref_vis_frame = ref_fast if fast else ref_slow
        except Exception as e:
            pytest.skip(f"reference vis unavailable: {e}")

        rng = np.random.default_rng(5)
        for _ in range(3):
            img = rng.integers(0, 255, (120, 160, 3), np.uint8)
            people = [
                {"keypoints": torch.from_numpy(
                    rng.uniform(-5, 170,
                                (num_joints, 2)).astype(np.float32)),
                 "kp_score": torch.from_numpy(
                     rng.uniform(0, 1,
                                 (num_joints, 1)).astype(np.float32))}
                for _ in range(2)]
            opt = types.SimpleNamespace(tracking=False, showbox=False,
                                        pose_track=False)
            want = ref_vis_frame(
                img, {"result": [dict(p) for p in people]}, opt,
                [0.4] * num_joints)
            got = img.copy()
            for p in people:
                sk.vis_frame(got, p["keypoints"].numpy(),
                             p["kp_score"].numpy()[:, 0], fmt=fmt,
                             vis_thresh=0.4, fast=fast)
            np.testing.assert_array_equal(got, want)
