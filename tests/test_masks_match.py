"""Tests for the native COCO mask API, keypoint matching, crop
transforms, and sequence filters (`module_utils.py` tail parity)."""

import numpy as np
import pytest

from mvsmplfitting_tpu.detect.masks import (
    ann_to_mask, counts_to_string, merge_rles, poly_to_rle, rle_area,
    rle_decode, rle_encode, string_to_counts,
)
from mvsmplfitting_tpu.ops.match import match_people, pair_by_l2_distance


class TestRLECodec:
    def test_hand_computed_strings(self):
        # 2x2 all-zero mask: one 0-run of 4 -> varint '4' (4 + 48).
        assert rle_encode(np.zeros((2, 2), np.uint8))["counts"] == "4"
        # all-ones: [0, 4] -> '0' then '4'.
        assert rle_encode(np.ones((2, 2), np.uint8))["counts"] == "04"

    def test_roundtrip_random_masks(self):
        rng = np.random.default_rng(0)
        for shape in [(1, 1), (7, 11), (33, 5), (64, 64)]:
            mask = (rng.random(shape) > 0.4).astype(np.uint8)
            rle = rle_encode(mask)
            np.testing.assert_array_equal(rle_decode(rle), mask)
            assert rle_area(rle) == int(mask.sum())

    def test_delta_coding_roundtrip(self):
        # Counts beyond index 2 are delta-coded (maskApi's i > 2 rule);
        # include runs that force negative deltas and multi-chunk
        # varints.
        counts = [0, 100000, 3, 99997, 50, 1, 7, 2]
        s = counts_to_string(counts)
        np.testing.assert_array_equal(string_to_counts(s), counts)

    def test_uncompressed_counts_decode(self):
        rle = {"size": [3, 2], "counts": [1, 2, 3]}
        m = rle_decode(rle)
        # Column-major: flat = [0, 1, 1, 0, 0, 0].
        np.testing.assert_array_equal(
            m, np.array([[0, 0], [1, 0], [1, 0]], np.uint8))


class TestPolygon:
    def test_integer_rectangle_semantics(self):
        # pycocotools rasterizes [x0,y0 .. x1,y1] to pixels
        # [x0, x1-1] x [y0, y1-1].
        m = rle_decode(poly_to_rle([1, 1, 4, 1, 4, 3, 1, 3], 6, 6))
        expected = np.zeros((6, 6), np.uint8)
        expected[1:3, 1:4] = 1
        np.testing.assert_array_equal(m, expected)

    def test_winding_order_irrelevant(self):
        cw = poly_to_rle([1, 1, 4, 1, 4, 3, 1, 3], 6, 6)
        ccw = poly_to_rle([1, 1, 1, 3, 4, 3, 4, 1], 6, 6)
        np.testing.assert_array_equal(rle_decode(cw), rle_decode(ccw))

    def test_circle_area(self):
        t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
        r, c = 20.0, 32.0
        poly = np.stack([c + r * np.cos(t), c + r * np.sin(t)],
                        axis=1).reshape(-1)
        area = rle_area(poly_to_rle(poly, 64, 64))
        assert abs(area - np.pi * r * r) / (np.pi * r * r) < 0.02

    def test_out_of_bounds_polygon_clips(self):
        m = rle_decode(poly_to_rle([-5, -5, 3, -5, 3, 3, -5, 3], 8, 8))
        expected = np.zeros((8, 8), np.uint8)
        expected[:3, :3] = 1
        np.testing.assert_array_equal(m, expected)


class TestMergeAndDispatch:
    def test_union_of_disjoint_rects(self):
        a = poly_to_rle([0, 0, 2, 0, 2, 2, 0, 2], 8, 8)
        b = poly_to_rle([4, 4, 7, 4, 7, 7, 4, 7], 8, 8)
        u = merge_rles([a, b])
        assert rle_area(u) == rle_area(a) + rle_area(b)

    def test_intersection(self):
        a = poly_to_rle([0, 0, 4, 0, 4, 4, 0, 4], 8, 8)
        b = poly_to_rle([2, 2, 6, 2, 6, 6, 2, 6], 8, 8)
        i = merge_rles([a, b], intersect=True)
        assert rle_area(i) == 4  # 2x2 overlap

    def test_ann_to_mask_dispatch(self):
        # Polygon list (two parts merged), uncompressed RLE dict, and
        # compressed RLE dict all decode through one entry point
        # (module_utils.py:20-45 annToMask semantics).
        polys = [[0, 0, 2, 0, 2, 2, 0, 2], [4, 4, 7, 4, 7, 7, 4, 7]]
        m_poly = ann_to_mask(polys, 8, 8)
        assert m_poly.sum() == 4 + 9

        mask = (np.arange(64).reshape(8, 8) % 3 == 0).astype(np.uint8)
        rle = rle_encode(mask)
        np.testing.assert_array_equal(ann_to_mask(rle, 8, 8), mask)

        unc = rle_encode(mask, compress=False)
        np.testing.assert_array_equal(
            ann_to_mask({"counts": unc["counts"], "size": [8, 8]},
                        8, 8), mask)


class TestMatching:
    def _people(self):
        rng = np.random.default_rng(3)
        gt = rng.uniform(0, 500, (3, 17, 3))
        gt[..., 2] = 1.0
        # Predictions: permuted GT + small noise, plus one far outlier.
        perm = [2, 0, 1]
        pred = gt[perm] + rng.normal(0, 2.0, (3, 17, 3))
        pred[..., 2] = 0.9
        outlier = rng.uniform(5000, 6000, (1, 17, 3))
        outlier[..., 2] = 0.9
        return gt, np.concatenate([pred, outlier]), perm

    def test_pairwise_cost_shape_and_weighting(self):
        gt, pred, _ = self._people()
        idx = np.arange(17)
        loss = pair_by_l2_distance(pred, gt, idx, idx)
        assert loss.shape == (3, 4)
        # Zero-confidence predictions contribute zero cost.
        p0 = pred.copy()
        p0[..., 2] = 0.0
        assert np.allclose(pair_by_l2_distance(p0, gt, idx, idx), 0.0)

    def test_greedy_assignment_recovers_permutation(self):
        gt, pred, perm = self._people()
        idx = np.arange(17)
        matched, best = match_people(gt, pred, idx, idx)
        # pred[j] = gt[perm[j]] + noise, so GT row g matches the
        # prediction at the INVERSE permutation position.
        inv_perm = [perm.index(g) for g in range(len(perm))]
        assert best == inv_perm
        for m, b in zip(matched, best):
            np.testing.assert_array_equal(m, pred[b])

    def test_unmatched_gate_and_taken_sentinel(self):
        # One GT, one absurdly distant prediction -> None (gate >1e5),
        # and a second GT then re-selects the same taken column at the
        # 1e5 sentinel without exceeding the gate (reference behavior:
        # the gate tests the ORIGINAL loss, the sentinel is exactly
        # 1e5, so the second row matches the taken column).
        gt = np.zeros((2, 17, 3))
        gt[..., 2] = 1.0
        pred = np.full((1, 17, 3), 1e5)
        pred[..., 2] = 1.0
        idx = np.arange(17)
        matched, best = match_people(gt, pred, idx, idx)
        assert matched[0] is None and best[0] == 0
        assert best[1] == 0 and matched[1] is not None


class TestCropTransforms:
    def test_transform_point_roundtrip(self):
        from mvsmplfitting_tpu.ops.crop import transform_point
        center, scale, res = (120.0, 80.0), 1.2, (64, 64)
        pt = transform_point([100, 90], center, scale, res)
        back = transform_point(pt, center, scale, res, invert=True)
        # int truncation each way costs at most a couple of pixels.
        assert np.abs(np.asarray(back) - [100, 90]).max() <= 4

    def test_crop_extracts_centered_box(self):
        from mvsmplfitting_tpu.ops.crop import crop
        img = np.zeros((200, 200, 3))
        img[90:110, 90:110] = 1.0
        out = crop(img, (100, 100), 0.5, (64, 64))
        assert out.shape == (64, 64, 3)
        # The 20px box at the center of a 100px crop -> central ~13px
        # of 64; check center is foreground, corners background.
        assert out[32, 32, 0] > 0.5
        assert out[2, 2, 0] == 0.0

    def test_uncrop_inverts_crop_placement(self):
        from mvsmplfitting_tpu.ops.crop import crop, uncrop
        img = np.zeros((200, 200), np.uint8)
        img[90:110, 90:110] = 255
        c = crop(img, (100, 100), 0.5, (64, 64)).astype(np.uint8)
        back = uncrop(c, (100, 100), 0.5, (200, 200))
        inside = back[92:108, 92:108].mean()
        outside = back[:50, :50].mean()
        assert inside > 200 and outside == 0

    def test_rotated_crop_shape(self):
        from mvsmplfitting_tpu.ops.crop import crop
        img = np.random.default_rng(0).random((100, 100, 3))
        out = crop(img, (50, 50), 0.4, (32, 32), rot=30.0)
        assert out.shape == (32, 32, 3)


class TestCameraPose:
    def test_get_rot_trans_photoscan_inverts(self):
        from mvsmplfitting_tpu.models.camera import get_rot_trans
        from mvsmplfitting_tpu.ops.rotations import rodrigues
        import jax.numpy as jnp
        R = np.asarray(rodrigues(jnp.asarray([[0.2, -0.1, 0.4]])))[0]
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = [1.0, -2.0, 0.5]
        ts, rs = get_rot_trans([pose])
        np.testing.assert_allclose(rs[0], R)
        np.testing.assert_allclose(ts[0], [1.0, -2.0, 0.5])
        ts_i, rs_i = get_rot_trans([pose], photoscan=True)
        inv = np.linalg.inv(pose)
        np.testing.assert_allclose(rs_i[0], inv[:3, :3], atol=1e-6)
        np.testing.assert_allclose(ts_i[0], inv[:3, 3], atol=1e-6)


class TestFilters:
    def test_butterworth_smooths_and_keeps_dc(self):
        from mvsmplfitting_tpu.utils.filters import filter_butter
        t = np.arange(256)
        rng = np.random.default_rng(0)
        clean = np.stack([np.sin(2 * np.pi * t / 128),
                          0.5 + 0 * t], axis=1)
        noisy = clean + 0.2 * rng.standard_normal(clean.shape)
        sm = filter_butter(noisy)
        assert sm.shape == noisy.shape
        # Noise reduced, slow component preserved.
        assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()
        assert abs(sm[:, 1].mean() - 0.5) < 0.02

    def test_surface_project_truncation(self):
        import jax.numpy as jnp
        from mvsmplfitting_tpu.ops.geometry import surface_project
        verts = jnp.asarray([[0.1, -0.2, 4.0], [0.5, 0.5, 5.0]])
        K = jnp.asarray([[1000.0, 0, 320], [0, 1000.0, 240],
                         [0, 0, 1.0]])
        E = jnp.eye(4)
        m3d, m2d = surface_project(verts, E, K)
        np.testing.assert_allclose(np.asarray(m3d), np.asarray(verts),
                                   atol=1e-6)
        # x = 1000*0.1/4 + 320 = 345; y = 1000*-0.2/4 + 240 = 190
        np.testing.assert_array_equal(np.asarray(m2d[0]), [345, 190])
        np.testing.assert_array_equal(np.asarray(m2d[1]), [420, 340])

    def test_convert_world_coord_identity_and_rotation(self):
        import jax.numpy as jnp
        from mvsmplfitting_tpu.ops.geometry import convert_world_coord
        from mvsmplfitting_tpu.ops.rotations import rodrigues
        rng = np.random.default_rng(1)
        pose = jnp.asarray(0.3 * rng.standard_normal((2, 72)),
                           jnp.float32)
        trans = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)

        p1, t1 = convert_world_coord(pose, trans, jnp.eye(4))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(trans),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rodrigues(p1[:, :3])),
            np.asarray(rodrigues(pose[:, :3])), atol=1e-5)

        # A known extrinsic: world->cam rotation by 90deg about z plus
        # a shift; the camera->world conversion must invert it on the
        # global orientation and translation.
        aa = np.array([0, 0, np.pi / 2], np.float32)
        Rz = np.asarray(rodrigues(jnp.asarray(aa)[None]))[0]
        extri = np.eye(4, dtype=np.float32)
        extri[:3, :3] = Rz
        extri[:3, 3] = [1.0, 2.0, 3.0]
        p2, t2 = convert_world_coord(pose, trans, jnp.asarray(extri))
        inv = np.linalg.inv(extri)
        expect_t = trans @ inv[:3, :3].T + inv[:3, 3]
        np.testing.assert_allclose(np.asarray(t2), expect_t, atol=1e-5)
        R_new = np.asarray(rodrigues(p2[:, :3]))
        R_old = np.asarray(rodrigues(pose[:, :3]))
        np.testing.assert_allclose(
            R_new, np.einsum("ij,fjk->fik", inv[:3, :3], R_old),
            atol=1e-5)
