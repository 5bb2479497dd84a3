"""HybrIK learnability proof through the REAL 3D-SMPL pipeline.

Counterpart of `tools/pose_train_demo.py` for the 3D stack: synthetic
scenes where every joint IS a visible image feature — a fixed-color
disc at the joint's projected (u, v) whose RADIUS encodes its relative
depth — run through the production target transform
(`detect/augment3d.hybrik_train_sample` == the reference's
`simple_transform_3d_smpl.py` semantics), the jitted HybrIK train step
(`detect/train.make_hybrik_train_step`), and the production integral
decode.  A coordinate- or depth-normalization bug anywhere in that
chain keeps the held-out errors at chance.

Usage (chip or CPU):
    timeout 1700 python tools/hybrik_train_demo.py [steps] [batch]
Reports held-out (u, v) pixel error and depth error (mm) before/after.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

INP = 128                  # crop size fed to the net
IMG_W, IMG_H = 320, 320
FOCAL = 1000.0
DEPTH_MM = 400.0           # joint depths span +-DEPTH_MM around root
J = 29

# Fixed per-joint colors (distinct hues so the net can identify
# joints; same trick as pose_train_demo).
_rng_colors = np.random.default_rng(42)
COLORS = _rng_colors.uniform(60, 255, (J, 3)).astype(np.float32)


def make_scene(rng):
    """One synthetic person: 29 camera-space joints around a root at
    ~3 m, projected discs whose radius encodes depth."""
    root = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                     rng.uniform(2.6, 3.4)], np.float32)
    offsets = rng.uniform(-0.45, 0.45, (J, 3)).astype(np.float32)
    offsets[0] = 0
    cam29 = root[None] + offsets
    u = cam29[:, 0] / cam29[:, 2] * FOCAL + IMG_W / 2
    v = cam29[:, 1] / cam29[:, 2] * FOCAL + IMG_H / 2
    depth_mm = (cam29[:, 2] - root[2]) * 1000.0

    import cv2
    img = (rng.uniform(0, 60, (IMG_H, IMG_W, 3))).astype(np.float32)
    order = np.argsort(-depth_mm)          # far first, near on top
    for j in order:
        r = 4 + 7 * (depth_mm[j] + DEPTH_MM) / (2 * DEPTH_MM)
        cv2.circle(img, (int(u[j]), int(v[j])), int(round(r)),
                   tuple(float(c) for c in COLORS[j]), -1,
                   cv2.LINE_AA)

    j29 = np.stack([u, v, depth_mm], axis=1).astype(np.float32)
    lo = np.stack([u, v], 1).min(0) - 25
    hi = np.stack([u, v], 1).max(0) + 25
    label = {
        "bbox": [float(lo[0]), float(lo[1]), float(hi[0]),
                 float(hi[1])],
        "joint_img_17": j29[:17].copy(),
        "joint_vis_17": np.ones((17, 3), np.float32),
        "joint_relative_17": (cam29[:17] - cam29[0:1]) * 1000.0,
        "joint_img_29": j29,
        "joint_vis_29": np.ones((29, 3), np.float32),
        "joint_cam_29": cam29 * 1000.0,
        "beta": np.zeros(10, np.float32),
        "theta": np.zeros((24, 3), np.float32),
        "twist_phi": np.zeros((23, 2), np.float32),
        "twist_weight": np.zeros((23, 2), np.float32),
        "f": np.asarray([FOCAL, FOCAL], np.float32),
        "c": np.asarray([IMG_W / 2, IMG_H / 2], np.float32),
        "root_cam": root * 1000.0,
        "width": IMG_W, "height": IMG_H,
    }
    return img, label


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from mvsmplfitting_tpu.detect.augment3d import (Hybrik3DConfig,
                                                    hybrik_train_sample)
    from mvsmplfitting_tpu.detect.hybrik import Simple3DPoseSMPLCam
    from mvsmplfitting_tpu.detect.train import (init_train_state,
                                                lr_schedule,
                                                make_hybrik_train_step,
                                                make_optimizer)

    cfg = Hybrik3DConfig(input_hw=(INP, INP), occlusion=False,
                         rot=15.0)
    rng = np.random.default_rng(0)

    def make_batch(n, train=True, seed0=0):
        samples = []
        for i in range(n):
            img, label = make_scene(rng)
            samples.append(hybrik_train_sample(
                np.random.default_rng(seed0 + i), img, label, cfg,
                train=train))
        return ({k: jnp.asarray(np.stack([s[k] for s in samples]))
                 for k in samples[0]}, samples)

    model = Simple3DPoseSMPLCam(depth_dim=32, height_dim=INP // 4,
                                width_dim=INP // 4)
    held, _ = make_batch(32, train=False, seed0=9000)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    held["image"][:1])
    tx = make_optimizer("adam", lr_schedule(
        "multistep", 1e-3, iters_per_epoch=max(steps // 3, 1),
        total_epochs=3, milestones=(1, 2), factor=0.1))
    state = init_train_state(variables, tx)
    # uvd-focused demo: beta/theta are constants here (zero weights on
    # twist; beta=0), so the IK theta term is off (assets=None) and the
    # proof targets the integral uvd chain.
    step = make_hybrik_train_step(model, tx)

    fwd = jax.jit(lambda v, x: model.apply(v, x)["pred_uvd_jts"])

    def evaluate(params_vars):
        uvd = np.asarray(fwd(params_vars, held["image"]))
        tgt = np.asarray(held["target_uvd_29"]).reshape(-1, J, 3)
        w = np.asarray(held["target_weight_29"]).reshape(-1, J, 3)
        duv = (uvd[..., :2] - tgt[..., :2]) * INP        # px in crop
        dz = (uvd[..., 2] - tgt[..., 2]) * 2000.0        # mm
        m = w[..., 0] > 0
        return (float(np.abs(duv[m]).mean()),
                float(np.abs(dz[m]).mean()))

    e_uv0, e_z0 = evaluate({"params": state.params,
                            "batch_stats": state.batch_stats})
    print(f"before: held-out uv err {e_uv0:.1f}px  depth err "
          f"{e_z0:.0f}mm", flush=True)

    t0 = time.perf_counter()
    for i in range(steps):
        batch, _ = make_batch(batch_size, seed0=i * 131)
        state, loss, aux = step(state, batch)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i} loss {float(loss):.4f} "
                  f"uvd {float(aux['loss_uvd']):.4f} "
                  f"({(i + 1) * batch_size / (time.perf_counter() - t0):.1f} img/s)",
                  flush=True)

    e_uv1, e_z1 = evaluate({"params": state.params,
                            "batch_stats": state.batch_stats})
    print(f"after {steps} steps: held-out uv err {e_uv0:.1f} -> "
          f"{e_uv1:.1f}px  depth err {e_z0:.0f} -> {e_z1:.0f}mm")


if __name__ == "__main__":
    main()
