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


class TestReferenceGeometryAnchor:
    """External parity anchor for the mesh overlay (round-3 item):
    the reference validates fits by projecting vertices and rendering
    them over the image (`project_to_img` -> `cam(verts)`,
    `code/utils/utils.py:574-598,876-882`).  Here the reference's OWN
    torch `PerspectiveCamera` projects the pinned scene's vertices and
    our rasterized silhouette must contain them / match their splat
    silhouette — plus a committed golden image regression."""

    @pytest.fixture(scope="class")
    def scene(self):
        import jax.numpy as jnp

        from mvsmplfitting_tpu.models.assets import synthetic_smpl
        from mvsmplfitting_tpu.models.camera import load_cameras_txt
        from mvsmplfitting_tpu.models.smpl import (SMPLParams,
                                                   smpl_forward)
        assets = synthetic_smpl()
        params = SMPLParams(
            betas=jnp.asarray(np.zeros(10), jnp.float32),
            global_orient=jnp.asarray([0.1, 0.4, 0.0]),
            body_pose=jnp.zeros(69),
            transl=jnp.asarray([0.0, -0.1, 0.2]),
            scale=jnp.asarray(1.0))
        verts, _ = smpl_forward(assets, params, params.body_pose)
        verts = np.asarray(verts)
        cams = load_cameras_txt(
            "/root/reference/data/3DOH50K_Parameters.txt")
        Rr = np.asarray(cams.rotation)[0]
        t = np.asarray(cams.translation)[0]
        f = np.asarray(cams.focal)[0]
        H, W = 256, 192
        # The demo cameras sit meters away; recenter the principal
        # point on the body's projected centroid so it fills the crop
        # (both sides use the SAME intrinsics, so parity holds).
        cam_pts = verts @ Rr.T + t
        m = (cam_pts[:, :2] / cam_pts[:, 2:3]).mean(0) * f
        c = (np.asarray([W / 2.0, H / 2.0], np.float32)
             - m.astype(np.float32))
        faces = np.asarray(synthetic_smpl().faces)
        return verts, faces, Rr, t, f, c, (H, W)

    def _our_mask(self, scene):
        from mvsmplfitting_tpu.viz.overlay import render_mesh_overlay
        verts, faces, Rr, t, f, c, (H, W) = scene
        out = render_mesh_overlay(np.zeros((H, W, 3), np.uint8), verts,
                                  faces, Rr, t, f, c, alpha=1.0)
        return out, out.sum(axis=2) > 0

    def test_reference_projection_inside_silhouette(self, scene):
        import sys
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference/code")
        try:
            import camera as ref_camera
        except Exception as e:            # pragma: no cover
            pytest.skip(f"reference camera unavailable: {e}")
        finally:
            sys.path.pop(0)
        verts, faces, Rr, t, f, c, (H, W) = scene
        cam = ref_camera.create_camera(
            focal_length_x=float(f[0]), focal_length_y=float(f[1]),
            center=torch.tensor([[float(c[0]), float(c[1])]]),
            rotation=torch.from_numpy(Rr[None].astype(np.float32)),
            translation=torch.from_numpy(t[None].astype(np.float32)))
        with torch.no_grad():
            proj = cam(torch.from_numpy(
                verts[None].astype(np.float32))).numpy()[0]

        _, mask = self._our_mask(scene)
        pix = np.round(proj).astype(int)
        ib = ((pix[:, 0] >= 0) & (pix[:, 0] < W)
              & (pix[:, 1] >= 0) & (pix[:, 1] < H))
        assert ib.mean() > 0.99            # pinned scene fills the crop

        # (a) every reference-projected vertex (front AND back faces
        # both lie within the silhouette) must land on our mask, up to
        # one pixel of AA/rounding.
        dil = cv2.dilate(mask.astype(np.uint8),
                         np.ones((3, 3), np.uint8))
        inside = dil[pix[ib][:, 1], pix[ib][:, 0]] > 0
        assert inside.mean() > 0.995, float(inside.mean())

        # (b) the splat silhouette of the reference projections and our
        # rasterized mask describe the same shape (measured 0.944).
        splat = np.zeros((H, W), np.uint8)
        for x, y in pix[ib]:
            cv2.circle(splat, (int(x), int(y)), 2, 1, -1)
        splat = cv2.morphologyEx(splat, cv2.MORPH_CLOSE,
                                 np.ones((5, 5), np.uint8))
        inter = (splat.astype(bool) & mask).sum()
        union = (splat.astype(bool) | mask).sum()
        iou = inter / max(union, 1)
        assert iou > 0.88, float(iou)

    def test_golden_fixture_regression(self, scene):
        """Image-level regression against the committed render of the
        pinned scene (tests/fixtures/overlay_golden.png)."""
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "overlay_golden.png")
        assert os.path.exists(path), (
            "golden fixture missing — regenerate from the pinned "
            "scene and commit it")
        want = cv2.imread(path)
        got, _ = self._our_mask(scene)
        assert got.shape == want.shape
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        # tolerate cv2 AA drift across versions, catch geometry bugs
        assert diff.mean() < 2.0, float(diff.mean())
        assert (diff.max(axis=2) > 8).mean() < 0.02


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
