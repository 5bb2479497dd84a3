"""End-to-end pose-training proof: PCK climbs on a learnable task.

Builds a synthetic COCO workspace where each joint IS a visible image
feature (a distinct-colored disc on textured noise), trains the real
CLI path (`cli/train_pose.py`: COCO json -> augmentation -> heatmap
targets -> jitted train step), then decodes held-out heatmaps with the
production `heatmap_to_coords` and reports PCK@0.2 before/after.

A coordinate-space bug anywhere in the chain (augment affine, target
generation, decode inverse transform) would keep PCK at chance; only a
consistent pipeline lets the net localize the discs.  Prints one JSON
line.  Run: `python tools/pose_train_demo.py [--steps 300]`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

COLORS = [(255, 60, 60), (60, 255, 60), (60, 60, 255),
          (255, 255, 60), (255, 60, 255)]
J = len(COLORS)


def make_workspace(root: str, n_images: int, seed: int = 0):
    import cv2
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    H, W = 192, 144
    for i in range(n_images):
        img = rng.integers(0, 60, (H, W, 3), np.uint8)  # dim texture
        kp = np.zeros((J, 3), np.float32)
        for j, bgr in enumerate(COLORS):
            x = float(rng.uniform(14, W - 14))
            y = float(rng.uniform(14, H - 14))
            cv2.circle(img, (int(round(x)), int(round(y))), 5,
                       bgr[::-1], -1)
            kp[j] = [x, y, 2.0]
        name = f"s{i:05d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i, "file_name": name,
                       "width": W, "height": H})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [0.0, 0.0, float(W), float(H)],
                     "keypoints": [float(v) for v in kp.ravel()],
                     "num_keypoints": J})
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    ann = os.path.join(root, "gt.json")
    with open(ann, "w") as f:
        json.dump(gt, f)
    return ann, img_dir


def eval_pck(model, variables, ann, img_dir, tol_px: float = 10.0):
    """PCK@10px in IMAGE space: zero-augmentation crops through the
    SAME bbox->center/scale + affine geometry the train dataset uses,
    decoded with the production `heatmap_to_coords` inverse transform
    back to image coordinates."""
    import cv2
    import jax
    import jax.numpy as jnp

    from mvsmplfitting_tpu.detect.augment import (get_affine_transform,
                                                  warp_affine)
    from mvsmplfitting_tpu.detect.preprocess import (
        bbox_to_center_scale, heatmap_to_coords)

    with open(ann) as f:
        gt = json.load(f)
    crops, centers, scales, gts = [], [], [], []
    for im, a in zip(gt["images"], gt["annotations"]):
        img = cv2.imread(os.path.join(img_dir, im["file_name"]))
        img = img[..., ::-1].astype(np.float32) / 255.0
        W0, H0 = im["width"], im["height"]
        c, s = bbox_to_center_scale(
            np.asarray([[0, 0, W0, H0]], np.float32),
            aspect_ratio=96.0 / 128.0)
        trans = get_affine_transform(c[0], s[0], 0.0, (96, 128))
        crops.append(warp_affine(img, trans, (96, 128)))
        centers.append(c[0])
        scales.append(s[0])
        gts.append(np.asarray(a["keypoints"], np.float32
                              ).reshape(J, 3)[:, :2])
    x = jnp.asarray(np.stack(crops))
    hm = jax.jit(lambda v, xx: model.apply(v, xx))(variables, x)
    coords, _ = jax.jit(heatmap_to_coords)(
        hm, jnp.asarray(np.stack(centers)),
        jnp.asarray(np.stack(scales)))
    err = np.linalg.norm(np.asarray(coords) - np.stack(gts), axis=-1)
    return float((err < tol_px).mean()), float(err.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--images", type=int, default=192)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mvsf_jax_cache")

    from mvsmplfitting_tpu.detect.augment import PoseAugConfig
    from mvsmplfitting_tpu.detect.dataset import CocoPoseTrainDataset
    from mvsmplfitting_tpu.detect.train import (init_train_state,
                                                lr_schedule,
                                                make_optimizer,
                                                make_pose_train_step)
    from mvsmplfitting_tpu.detect.zoo import build_pose_model

    root = tempfile.mkdtemp(prefix="pose_demo_")
    ann, img_dir = make_workspace(root, args.images)
    eval_ann, eval_dir = make_workspace(
        os.path.join(root, "eval"), 32, seed=999)

    model = build_pose_model("fastpose", J)
    # jit the init: bare Module.init executes eagerly op by op — on
    # the tunneled TPU that is one round trip per parameter.
    v0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 128, 96, 3)))
    print("init done", flush=True)
    pck0, err0 = eval_pck(model, v0, eval_ann, eval_dir)
    print(f"pck before: {pck0:.4f}", flush=True)

    # Pre-stage augmented batches on the DEVICE: per-step host->device
    # copies through this environment's TPU tunnel are ~1 MB/s and
    # would dominate (on real TPU hosts the PCIe transfer pipelines —
    # see docs/BENCH_NOTES.md "Training-step throughput").
    # flip=False: the flip aug swaps left/right JOINT LABELS under a
    # mirror (correct for bodies); these discs are identified by color,
    # which a mirror does not change, so the swap would be label noise.
    ds = CocoPoseTrainDataset(ann, img_dir, (128, 96), (32, 24),
                              batch_size=args.batch, seed=0,
                              aug=PoseAugConfig(input_hw=(128, 96),
                                                flip=False))
    staged = []
    for epoch in range(4):                      # 4 distinct aug epochs
        for b in ds:
            staged.append(jax.tree_util.tree_map(jnp.asarray, b))
    print(f"staged {len(staged)} device batches", flush=True)

    # Milestones at ~60%/85% of the actual run (the factory's default
    # (50, 70)-EPOCH milestones hit step 300/420 here and park the lr
    # at 1e-5 for the rest of a long run).
    ipe = max(len(ds), 1)
    tx = make_optimizer("adam", lr_schedule(
        "multistep", 1e-3, ipe, max(args.steps // ipe, 1),
        milestones=(max(args.steps * 6 // (10 * ipe), 1),
                    max(args.steps * 17 // (20 * ipe), 2))))
    state = init_train_state(v0, tx)
    step_fn = make_pose_train_step(model, tx)
    t0 = time.time()
    loss = None
    for step in range(args.steps):
        state, loss, _ = step_fn(state, staged[step % len(staged)])
        if step % 50 == 0:
            print(f"step {step} loss {float(loss):.5f} "
                  f"({step * args.batch / max(time.time() - t0, 1e-9):.0f}"
                  " crops/s)", flush=True)
    print(f"final loss {float(loss):.5f}", flush=True)

    trained = {"params": state.params,
               "batch_stats": state.batch_stats}
    pck1, err1 = eval_pck(model, trained, eval_ann, eval_dir)
    # train-image PCK separates "overfit the staged crops" from a
    # pipeline bug: fresh zero-aug crops of the TRAIN images.
    pck_tr, err_tr = eval_pck(model, trained, ann, img_dir)
    print(f"train-image pck {pck_tr:.4f} err {err_tr:.1f}px",
          flush=True)
    print(json.dumps({
        "metric": "pose_train_demo_pck",
        "steps": args.steps,
        "pck_before": round(pck0, 4), "pck_after": round(pck1, 4),
        "mean_px_err_before": round(err0, 1),
        "mean_px_err_after": round(err1, 1),
    }))


if __name__ == "__main__":
    main()
