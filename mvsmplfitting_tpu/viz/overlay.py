"""Per-view mesh overlays (the reference's pyrender output, rebuilt).

The reference renders fitted meshes over every camera image with
pyrender (`code/utils/utils.py:876-882`, `Renderer` at `:892-1129`).
pyrender/trimesh/OpenGL are not available here, so this is a
self-contained painter's-algorithm rasterizer: project vertices with
the calibrated camera, depth-sort faces, Lambert-shade, fill with cv2,
alpha-composite over the image.  Output artifacts (per-view jpg
overlays + keypoint skeletons) match the reference's layout.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# COCO17 skeleton edges for keypoint drawing (`module_utils.py:543-572`).
COCO17_EDGES = (
    (0, 1), (0, 2), (1, 3), (2, 4), (5, 6), (5, 7), (7, 9), (6, 8),
    (8, 10), (5, 11), (6, 12), (11, 12), (11, 13), (13, 15), (12, 14),
    (14, 16),
)

# Halpe-26 skeleton (AlphaPose's default joint set — the body/foot rows
# of the reference's `l_pair` table, `alphapose/utils/vis.py:94-109`).
HALPE26_EDGES = (
    (0, 1), (0, 2), (1, 3), (2, 4),                       # head
    (5, 18), (6, 18), (5, 7), (7, 9), (6, 8), (8, 10),    # arms
    (17, 18), (18, 19), (19, 11), (19, 12),               # spine/hips
    (11, 13), (12, 14), (13, 15), (14, 16),               # legs
    (20, 24), (21, 25), (23, 25), (22, 24), (15, 24), (16, 25),  # feet
)


def _project(rotation, translation, focal, center, points):
    cam = points @ rotation.T + translation
    z = cam[:, 2:3]
    xy = cam[:, :2] / np.maximum(z, 1e-9)
    return xy * focal + center, cam[:, 2]


def _rasterize(img: np.ndarray, verts: np.ndarray, faces: np.ndarray,
               base_colors: np.ndarray, rotation: np.ndarray,
               translation: np.ndarray, focal: np.ndarray,
               center: np.ndarray, alpha: float) -> np.ndarray:
    """Painter's-algorithm fill: ONE global far->near sort over every
    face in `faces` (base_colors (F, 3) 0-255), so occlusion is correct
    across everything drawn in the same call."""
    import cv2

    h, w = img.shape[:2]
    pix, depth = _project(rotation, translation, focal, center, verts)

    tri_pix = pix[faces]                    # (F, 3, 2)
    tri_depth = depth[faces].mean(axis=1)   # (F,)

    # Cull behind-camera, offscreen, and non-finite faces (un-converged
    # or random-weight inputs can carry NaN verts; int-casting NaN is
    # undefined).
    valid = (depth[faces] > 1e-6).all(axis=1)
    with np.errstate(invalid="ignore"):
        inside = ((tri_pix[..., 0] > -w) & (tri_pix[..., 0] < 2 * w) &
                  (tri_pix[..., 1] > -h) & (tri_pix[..., 1] < 2 * h)
                  ).all(axis=1)
    valid &= inside & np.isfinite(tri_pix).all(axis=(1, 2))
    tri_pix = np.nan_to_num(tri_pix, posinf=0.0, neginf=0.0)

    # Lambert shading from the face normal vs the view direction.
    tri_w = verts[faces]                    # (F, 3, 3)
    n = np.cross(tri_w[:, 1] - tri_w[:, 0], tri_w[:, 2] - tri_w[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    view_dir = rotation[2]                  # camera z-axis in world frame
    shade = np.abs(n @ view_dir)
    shade = 0.35 + 0.65 * shade             # ambient + diffuse

    order = np.argsort(-tri_depth)          # far -> near
    order = order[valid[order]]

    layer = img.copy()
    pts = np.round(tri_pix).astype(np.int32)
    for f in order:
        c = tuple(int(v) for v in (base_colors[f] * shade[f]))
        cv2.fillConvexPoly(layer, pts[f], c, lineType=cv2.LINE_AA)

    # Alpha blend only where the mesh drew.
    mask = np.any(layer != img, axis=2, keepdims=True)
    out = np.where(mask, (alpha * layer + (1 - alpha) * img), img)
    return out.astype(img.dtype)


def render_mesh_overlay(img: np.ndarray, verts: np.ndarray,
                        faces: np.ndarray, rotation: np.ndarray,
                        translation: np.ndarray, focal: np.ndarray,
                        center: np.ndarray, color=(0.65, 0.74, 0.86),
                        alpha: float = 0.9) -> np.ndarray:
    """Composite the mesh over `img` (uint8 BGR or RGB, returned same)."""
    base = np.tile(np.asarray(color, np.float64) * 255.0,
                   (len(faces), 1))
    return _rasterize(img, np.asarray(verts), np.asarray(faces), base,
                      rotation, translation, focal, center, alpha)


# Per-person mesh tints (BGR-ish pastels, cycled), mirroring the
# reference's distinct colors in `render_multiperson`
# (`utils.py:1030-1100`).
PERSON_COLORS = ((0.65, 0.74, 0.86), (0.86, 0.68, 0.60),
                 (0.62, 0.84, 0.66), (0.85, 0.83, 0.58),
                 (0.78, 0.62, 0.84), (0.60, 0.82, 0.84))


def render_multiperson_overlay(img: np.ndarray, verts_people,
                               faces: np.ndarray, rotation: np.ndarray,
                               translation: np.ndarray,
                               focal: np.ndarray, center: np.ndarray,
                               colors=None, alpha: float = 0.9
                               ) -> np.ndarray:
    """All people in ONE depth-sorted pass (the reference's
    `Renderer.render_multiperson`, `utils.py:1030-1100`): faces from
    different people interleave in the global far->near order, so
    inter-person occlusion is correct — sequential single-mesh calls
    would always paint later people over earlier ones.

    verts_people: (P, V, 3) array or list of (V, 3) arrays.
    """
    verts_people = [np.asarray(v) for v in verts_people]
    if not verts_people:
        return img.copy()
    faces = np.asarray(faces)
    if colors is None:
        colors = [PERSON_COLORS[p % len(PERSON_COLORS)]
                  for p in range(len(verts_people))]
    all_verts = np.concatenate(verts_people, axis=0)
    all_faces, all_colors = [], []
    off = 0
    for p, v in enumerate(verts_people):
        all_faces.append(faces + off)
        all_colors.append(np.tile(
            np.asarray(colors[p], np.float64) * 255.0,
            (len(faces), 1)))
        off += len(v)
    return _rasterize(img, all_verts, np.concatenate(all_faces),
                      np.concatenate(all_colors), rotation, translation,
                      focal, center, alpha)


def draw_keypoints(img: np.ndarray, keypoints: np.ndarray,
                   conf_thresh: float = 0.2) -> np.ndarray:
    """Draw a skeleton (x, y, conf) onto the image in place.

    The edge table follows the joint count: 26 -> Halpe-26 (AlphaPose's
    native set), 17 -> COCO17, and any other count resolves through the
    skeleton registry (`viz/skeletons.py` — halpe-68/136, wholebody-133,
    mpii-16, hands); unknown counts fall back to COCO17 with extra
    joints still getting circles.
    """
    import cv2

    kp = np.asarray(keypoints, np.float64)
    # Non-finite or absurd coords (un-converged nets, padded rows)
    # would overflow cv2's int32 point parsing — drop them instead.
    ok = (np.isfinite(kp[:, :2]).all(axis=1)
          & (np.abs(kp[:, :2]) < 1e8).all(axis=1)
          & (kp[:, 2] > conf_thresh))
    pts = np.round(np.clip(np.nan_to_num(kp[:, :2]), -1e8, 1e8)
                   ).astype(np.int32)
    if len(kp) == 26:
        edges = HALPE26_EDGES
    elif len(kp) == 17:
        edges = COCO17_EDGES
    else:
        from .skeletons import skeleton_for
        edges = skeleton_for(len(kp)).limbs
    for a, b in edges:
        if a < len(kp) and b < len(kp) and ok[a] and ok[b]:
            cv2.line(img, tuple(int(v) for v in pts[a]),
                     tuple(int(v) for v in pts[b]),
                     (0, 255, 255), 2, cv2.LINE_AA)
    for j in range(len(kp)):
        if ok[j]:
            cv2.circle(img, tuple(int(v) for v in pts[j]), 3,
                       (0, 0, 255), -1, cv2.LINE_AA)
    return img


def save_overlays(out_dir: str, frame, cameras, verts: np.ndarray,
                  faces: np.ndarray, joints: Optional[np.ndarray] = None
                  ) -> None:
    """Write one overlay jpg per live view of the frame."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    R = np.asarray(cameras.rotation)
    t = np.asarray(cameras.translation)
    f = np.asarray(cameras.focal)
    c = np.asarray(cameras.center)
    for v, img_path in enumerate(frame.img_paths):
        if img_path is None or not os.path.exists(img_path):
            continue
        img = cv2.imread(img_path)
        if img is None:
            continue
        out = render_mesh_overlay(img, verts, faces, R[v], t[v], f[v],
                                  c[v])
        if frame.view_mask[v] > 0:
            draw_keypoints(out, frame.keypoints[v, 0])
        cv2.imwrite(os.path.join(out_dir, f"{v:02d}.jpg"), out)


def save_overlays_multi(out_dir: str, frame, cameras, verts_people,
                        faces: np.ndarray,
                        live: Optional[np.ndarray] = None) -> None:
    """Multi-person counterpart of `save_overlays`: every live person's
    mesh in one jointly depth-sorted render per view, plus each
    person's keypoints where annotated.

    verts_people: (P, V, 3); live: (P,) person-present mask.
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    P = len(verts_people)
    if live is None:
        live = np.ones((P,), bool)
    keep = [p for p in range(P) if live[p]]
    R = np.asarray(cameras.rotation)
    t = np.asarray(cameras.translation)
    f = np.asarray(cameras.focal)
    c = np.asarray(cameras.center)
    for v, img_path in enumerate(frame.img_paths):
        if img_path is None or not os.path.exists(img_path):
            continue
        img = cv2.imread(img_path)
        if img is None:
            continue
        out = render_multiperson_overlay(
            img, [verts_people[p] for p in keep], faces,
            R[v], t[v], f[v], c[v],
            colors=[PERSON_COLORS[p % len(PERSON_COLORS)]
                    for p in keep])
        if frame.view_mask[v] > 0:
            for p in keep:
                if frame.person_mask[v, p] > 0:
                    draw_keypoints(out, frame.keypoints[v, p])
        cv2.imwrite(os.path.join(out_dir, f"{v:02d}.jpg"), out)
