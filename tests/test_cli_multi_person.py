"""CLI multi-person mode: synthetic 2-person workspace end to end.

Generates two true bodies, projects them through the bundled demo
cameras, writes OpenPose-format JSONs (2 people per view) + tiny
images, and runs the real driver with `num_people: 2` +
`interpenetration: true`.  Checks per-person pkls and that the two
recovered bodies sit at distinct positions matching the ground truth
ordering.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.join(os.path.dirname(__file__), "..")
CAMS = "/root/reference/data/3DOH50K_Parameters.txt"


@pytest.mark.skipif(not os.path.exists(CAMS), reason="demo cams missing")
def test_cli_two_people(tmp_path):
    import jax.numpy as jnp

    from mvsmplfitting_tpu.data.keypoints import save_keypoints_json
    from mvsmplfitting_tpu.models import vposer as vposer_lib
    from mvsmplfitting_tpu.models.assets import synthetic_smpl
    from mvsmplfitting_tpu.models.camera import (
        load_cameras_txt, project_points,
    )
    from mvsmplfitting_tpu.models.smpl import SMPLParams, smpl_forward

    rng = np.random.default_rng(11)
    assets = synthetic_smpl()
    vw_path = os.path.join(REPO, "assets", "vposer_weights.npz")
    vw = (vposer_lib.load_npz(vw_path) if os.path.exists(vw_path)
          else vposer_lib.random_weights())
    cams = load_cameras_txt(CAMS)
    V = int(cams.rotation.shape[0])

    truths = []
    for dx in (-0.35, 0.35):
        z = jnp.asarray(0.2 * rng.standard_normal(32), jnp.float32)
        true = SMPLParams(
            betas=jnp.asarray(0.3 * rng.standard_normal(10), jnp.float32),
            global_orient=jnp.asarray([0.1, 0.2, 0.0]),
            body_pose=jnp.zeros(69),
            # The demo cameras converge on world point ~(0.15, -0.97,
            # -13.75) (~30 m depth): bodies there project inside every
            # view, so the overlay assertion below is meaningful.
            transl=jnp.asarray([0.15 + dx, -0.97, -13.75]),
            scale=jnp.asarray(1.0))
        _, joints = smpl_forward(assets, true,
                                 vposer_lib.decode(vw, z))
        gt2d = np.asarray(project_points(cams, joints))   # (V, K, 2)
        truths.append((true, gt2d))

    # Workspace layout matching the data-layer contract.
    work = str(tmp_path)
    for v in range(V):
        cam_name = f"Camera{v:02d}"
        img_dir = os.path.join(work, "data", "images", "0000", cam_name)
        kp_dir = os.path.join(work, "data", "keypoints", "0000",
                              cam_name)
        os.makedirs(img_dir)
        os.makedirs(kp_dir)
        # Image must cover the demo cameras' principal points
        # (cx ~1023, cy ~770) or every projected face is culled and the
        # overlay assertion below is vacuous.
        cv2.imwrite(os.path.join(img_dir, "00001.jpg"),
                    np.zeros((1536, 2048, 3), np.uint8))
        people = np.stack([
            np.concatenate([gt2d[v],
                            np.ones((gt2d.shape[1], 1), np.float32)],
                           axis=1)
            for _, gt2d in truths])                        # (2, K, 3)
        save_keypoints_json(
            os.path.join(kp_dir, "00001_keypoints.json"), people)

    cfg = os.path.join(work, "multi.yaml")
    with open(cfg, "w") as f:
        f.write(f"""
data_folder: "{work}/data"
cam_param: "{CAMS}"
output_folder: "{work}/out"
model_type: "smpl"
use_vposer: true
num_people: 2
# Interpenetration off here: with the truth bodies overlapping, the
# 4500-weight collision term moves the optimum ~0.5-0.9 m from truth
# by design, which is not a stable recovery assertion.  The
# SDF-coupled joint refinement is covered by test_multi_person.py.
interpenetration: false
maxiters: 10
save_meshes: false
save_images: true
""")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "mvsmplfitting_tpu.cli.main",
         "--config", cfg],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2 people" in proc.stdout, proc.stdout[-500:]

    res = []
    for p in range(2):
        path = os.path.join(work, "out", "results", "0000", "00001",
                            f"{p:03d}.pkl")
        assert os.path.exists(path), proc.stdout[-500:]
        with open(path, "rb") as f:
            res.append(pickle.load(f))

    # Multi-person overlays written (one jointly depth-sorted render
    # per view, `viz/overlay.py:save_overlays_multi`).
    img_dir = os.path.join(work, "out", "images", "0000", "00001")
    overlays = sorted(os.listdir(img_dir)) if os.path.isdir(img_dir) \
        else []
    assert len(overlays) == V, (overlays, proc.stdout[-500:])
    painted = cv2.imread(os.path.join(img_dir, overlays[0]))
    assert painted is not None and painted.sum() > 0

    # Both converged onto their own detections: x-order preserved and
    # positions near truth (noise-free observations, no collision
    # term -> tight recovery).
    x0 = float(res[0]["transl"][0, 0])
    x1 = float(res[1]["transl"][0, 0])
    assert x0 < x1, (x0, x1)
    for p, (true, _) in enumerate(truths):
        err = np.linalg.norm(np.asarray(res[p]["transl"][0]) -
                             np.asarray(true.transl))
        assert err < 0.15, (p, err)
