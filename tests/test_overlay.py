"""Renderer correctness: depth ordering, shading bounds, keypoints.

The reference validates its fits visually through pyrender overlays
(`code/utils/utils.py:876-882`); our painter's-algorithm rasterizer
(`viz/overlay.py`) is its stand-in, so its occlusion behavior is
asserted here rather than eyeballed.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mvsmplfitting_tpu.viz.overlay import (   # noqa: E402
    draw_keypoints, render_mesh_overlay,
)

# A camera looking down +z from the origin.
R = np.eye(3, dtype=np.float32)
T = np.zeros(3, np.float32)
F = np.asarray([100.0, 100.0], np.float32)
C = np.asarray([32.0, 32.0], np.float32)


def _img():
    return np.zeros((64, 64, 3), np.uint8)


def _two_quads(near_z=2.0, far_z=4.0):
    """Two overlapping quads; the near one is RED-ish via vertex order.

    Both project over the image center; the far quad is larger so its
    silhouette sticks out around the near one.
    """
    def quad(z, half):
        return np.asarray([[-half, -half, z], [half, -half, z],
                           [half, half, z], [-half, half, z]],
                          np.float32)
    near = quad(near_z, 0.2)
    far = quad(far_z, 1.0)
    verts = np.concatenate([near, far])
    faces = np.asarray([[0, 1, 2], [0, 2, 3],        # near quad
                        [4, 5, 6], [4, 6, 7]], np.int32)
    return verts, faces


class TestDepthOrdering:
    def test_near_face_occludes_far(self):
        verts, faces = _two_quads()
        img = _img()
        # Render the far quad alone -> its color at the center.
        far_only = render_mesh_overlay(
            img.copy(), verts, faces[2:], R, T, F, C,
            color=(1.0, 0.0, 0.0), alpha=1.0)
        both = render_mesh_overlay(
            img.copy(), verts, faces, R, T, F, C,
            color=(1.0, 0.0, 0.0), alpha=1.0)
        center_far = far_only[32, 32].astype(int)
        center_both = both[32, 32].astype(int)
        # The near quad (closer -> |n.v| same, but painted later) must
        # differ from the far-only render only if shading differs; the
        # decisive check: painting order. Near quad's shade equals
        # far's here (parallel planes), so instead check the near
        # quad's *silhouette*: pixels inside near quad but outside it
        # in far_only... use different colors per render.
        near_only = render_mesh_overlay(
            img.copy(), verts, faces[:2], R, T, F, C,
            color=(0.0, 1.0, 0.0), alpha=1.0)
        both_bicolor_far = render_mesh_overlay(
            img.copy(), verts, faces[2:], R, T, F, C,
            color=(1.0, 0.0, 0.0), alpha=1.0)
        both_bicolor = render_mesh_overlay(
            both_bicolor_far, verts, faces[:2], R, T, F, C,
            color=(0.0, 1.0, 0.0), alpha=1.0)
        # Center: near (channel 1) wins; inside far-only region the far
        # quad's channel-0 color remains.
        assert both_bicolor[32, 32, 1] > both_bicolor[32, 32, 0]
        far_px = both_bicolor[32 + 18, 32 + 18]   # inside far, not near
        assert far_px[0] > far_px[1]
        # And the single-mesh painter's render puts the NEAR quad last:
        # composite equals near-only inside the near silhouette.
        np.testing.assert_array_equal(both[30:35, 30:35],
                                      render_mesh_overlay(
                                          far_only, verts, faces[:2],
                                          R, T, F, C,
                                          color=(1.0, 0.0, 0.0),
                                          alpha=1.0)[30:35, 30:35])

    def test_behind_camera_faces_culled(self):
        verts, faces = _two_quads(near_z=-2.0, far_z=4.0)
        out = render_mesh_overlay(_img(), verts, faces, R, T, F, C,
                                  alpha=1.0)
        # Near quad is behind the camera -> only the far quad paints;
        # image is non-empty but center shows the far quad's shade.
        assert out.sum() > 0

    def test_golden_checksum_stable(self):
        """Pin the renderer output on a fixed scene (regression guard)."""
        verts, faces = _two_quads()
        out = render_mesh_overlay(_img(), verts, faces, R, T, F, C,
                                  alpha=0.9)
        mean = float(out.astype(np.float64).mean())
        nonzero = int((out.sum(axis=2) > 0).sum())
        # Far quad: +-25 px -> ~2500 px silhouette (near inside it).
        # Loose enough to survive cv2 AA differences across versions,
        # tight enough to catch projection/shading/order regressions.
        assert 2300 < nonzero < 2900, nonzero
        assert 90.0 < mean < 130.0, mean


class TestMultiPerson:
    def test_interperson_occlusion_global_sort(self):
        """Person 0 (near) listed FIRST must still occlude person 1
        (far) at the overlap — sequential per-person rendering would
        paint person 1 over it (`render_multiperson`,
        `utils.py:1030-1100`: one global depth sort)."""
        from mvsmplfitting_tpu.viz.overlay import (
            render_multiperson_overlay)

        def quad(z, half):
            return np.asarray([[-half, -half, z], [half, -half, z],
                               [half, half, z], [-half, half, z]],
                              np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        near, far = quad(2.0, 0.2), quad(4.0, 1.0)
        out = render_multiperson_overlay(
            _img(), [near, far], faces, R, T, F, C,
            colors=[(0.0, 1.0, 0.0), (1.0, 0.0, 0.0)], alpha=1.0)
        # center: the near person's (green) channel wins
        assert out[32, 32, 1] > out[32, 32, 0]
        # inside the far person's silhouette only: red
        assert out[50, 50, 0] > out[50, 50, 1]

    def test_empty_people_list(self):
        from mvsmplfitting_tpu.viz.overlay import (
            render_multiperson_overlay)
        img = _img()
        out = render_multiperson_overlay(img, [], np.zeros((0, 3), int),
                                         R, T, F, C)
        np.testing.assert_array_equal(out, img)


class TestKeypoints:
    def test_draw_respects_confidence(self):
        img = _img()
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = np.linspace(5, 60, 17)
        kp[:, 1] = 32
        kp[:, 2] = 1.0
        kp[0] = (5.0, 10.0, 0.0)  # invisible joint, its own row
        out = draw_keypoints(img.copy(), kp)
        assert out.sum() > 0
        # The invisible joint's location stays untouched (no circle,
        # and its incident edges (0,1)/(0,2) are skipped).
        assert out[10, 5].sum() == 0


class TestHalpe26:
    def test_halpe_edges_selected_by_joint_count(self):
        from mvsmplfitting_tpu.viz.overlay import HALPE26_EDGES
        assert max(max(e) for e in HALPE26_EDGES) == 25
        img = _img()
        kp = np.zeros((26, 3), np.float32)
        kp[:, 2] = 1.0
        # Place neck(18) and hip(19) on a vertical line; the halpe
        # spine edge (18, 19) must paint between them (no such edge in
        # the COCO17 table).
        kp[18] = (32, 10, 1.0)
        kp[19] = (32, 50, 1.0)
        out = draw_keypoints(img.copy(), kp)
        assert out[30, 32].sum() > 0     # mid-spine pixel painted


class TestDrawRobustness:
    def test_nonfinite_and_overflow_coords_skipped(self):
        from mvsmplfitting_tpu.viz.overlay import draw_keypoints
        img = np.zeros((32, 32, 3), np.uint8)
        kp = np.asarray([
            [np.nan, 5.0, 0.9],     # NaN -> skipped
            [1e12, -1e12, 0.9],     # int32 overflow -> skipped
            [10.0, 10.0, 0.9],      # valid -> drawn
            [20.0, 20.0, 0.05],     # low conf -> skipped
        ], np.float32)
        out = draw_keypoints(img, kp)
        assert out[10, 10].any()          # the valid point drew
        assert not out[20, 20].any()
