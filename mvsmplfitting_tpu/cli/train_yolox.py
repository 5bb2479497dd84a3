"""YOLOX detection training driver (the reference family's
`yolox/exp/yolox_base.py` training recipe: mosaic + SimOTA + SGD
nesterov + yoloxwarmcos LR + EMA, with the final `no_aug_epochs`
switching to plain letterbox batches and the L1 loss, as the torch
trainer does when it closes mosaic).

End to end on TPU: COCO instances json -> host-side mosaic/affine/HSV
(`detect/augment.py`) -> jitted SimOTA train step (`detect/train.py` +
`detect/yolox_loss.py`) with EMA + npz checkpoints.  With >1 device
the batch axis shards over a `jax.sharding` mesh and XLA
data-parallelizes the step (gradient all-reduce + global BN stats),
replacing the reference's torch.distributed world
(`yolox/utils/dist.py`).

    python -m mvsmplfitting_tpu.cli.train_yolox \
        --ann annotations/instances_train.json --img_root images \
        --depth 0.33 --width 0.5 --input_size 640x640 --batch 8
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann", required=True,
                   help="COCO instances GT json")
    p.add_argument("--img_root", required=True)
    p.add_argument("--depth", type=float, default=1.33,
                   help="depth multiplier (X=1.33, s=0.33)")
    p.add_argument("--width", type=float, default=1.25,
                   help="width multiplier (X=1.25, s=0.5)")
    p.add_argument("--input_size", default="640x640", help="HxW")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--no_aug_epochs", type=int, default=15,
                   help="final epochs without mosaic/mixup, with L1 "
                        "loss")
    p.add_argument("--no_mixup", action="store_true",
                   help="disable MixUp (the reference trainer's "
                        "enable_mixup=True default otherwise, "
                        "mosaicdetection.py:148-160)")
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--basic_lr_per_img", type=float, default=0.01 / 64,
                   help="lr = basic_lr_per_img * batch (yolox_base)")
    p.add_argument("--min_lr_ratio", type=float, default=0.05)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--max_labels", type=int, default=100)
    p.add_argument("--out", default="yolox_train_out")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N steps (0 = run all epochs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_ann", default=None,
                   help="COCO instances GT json for validation mAP")
    p.add_argument("--val_img_root", default=None,
                   help="validation image root (default: --img_root)")
    p.add_argument("--eval_interval", type=int, default=10,
                   help="evaluate every N epochs (and at the end)")
    return p.parse_args(argv)


def evaluate_detection(apply_fn, variables, ann: str, img_root: str,
                       input_hw, conf_thresh: float = 0.01,
                       nms_thresh: float = 0.65,
                       max_images: int = 0) -> float:
    """Validation box mAP (IoU 0.50:0.95) — the reference trainer's
    `COCOEvaluator.evaluate` + pycocotools scoring
    (`yolox/evaluators/coco_evaluator.py`), natively: letterbox each
    annotated image, sigmoided decode, per-anchor argmax class,
    class-aware NMS, inverse letterbox scale, `metrics.box_map`.
    """
    import json

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from ..detect.metrics import box_map
    from ..detect.preprocess import letterbox
    from ..detect.yolox import nms_xyxy

    with open(ann) as f:
        data = json.load(f)
    names = {int(im["id"]): im.get("file_name")
             for im in data.get("images", [])}
    cat_ids = sorted(c["id"] for c in data.get("categories", []))
    class_of = {cid: i for i, cid in enumerate(cat_ids)}
    gt_rows: dict = {}
    for a in data.get("annotations", []):
        if "bbox" not in a or a.get("iscrowd", 0):
            continue
        x, y, w, h = (float(v) for v in a["bbox"])
        if w <= 0 or h <= 0:
            continue
        cls = class_of.get(int(a.get("category_id", 1)), 0)
        gt_rows.setdefault(int(a["image_id"]), []).append(
            [x, y, x + w, y + h, cls])

    preds, gts = [], []
    for n, (iid, rows) in enumerate(sorted(gt_rows.items())):
        if max_images and n >= max_images:
            break
        name = names.get(iid) or f"{iid:012d}.jpg"
        img = cv2.imread(os.path.join(img_root, name))
        if img is None:
            continue
        inp, r = letterbox(img, input_hw)     # raw 0-255 BGR, like train
        out = np.asarray(apply_fn(variables, jnp.asarray(inp[None])))[0]
        cls_sc = out[:, 5:]
        ci = cls_sc.argmax(-1)
        sc = out[:, 4] * cls_sc.max(-1)
        m = sc >= conf_thresh
        xy, wh = out[m, :2], out[m, 2:4]
        xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
        ci, sc = ci[m], sc[m]
        if len(sc):
            # class-aware NMS: offset boxes per class so only
            # same-class boxes can suppress each other.
            keep = nms_xyxy(xyxy + ci[:, None] * 1e5, sc, nms_thresh)
            xyxy, ci, sc = xyxy[keep], ci[keep], sc[keep]
        preds.append({"boxes": xyxy / r, "scores": sc, "classes": ci})
        g = np.asarray(rows, np.float32).reshape(-1, 5)
        gts.append({"boxes": g[:, :4],
                    "classes": g[:, 4].astype(np.int64)})
    return box_map(preds, gts)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..detect.dataset import CocoDetTrainDataset
    from ..detect.train import (init_train_state, lr_schedule,
                                make_optimizer, make_yolox_train_step,
                                save_checkpoint)
    from ..detect.yolox import YOLOX
    from ..utils.profiling import Metrics

    hw = tuple(int(v) for v in args.input_size.split("x"))
    ds = CocoDetTrainDataset(args.ann, args.img_root, hw,
                             batch_size=args.batch,
                             max_labels=args.max_labels,
                             seed=args.seed,
                             enable_mixup=not args.no_mixup)
    if len(ds) == 0:
        raise SystemExit("no full batches: fewer annotated images "
                         f"than --batch {args.batch}")

    model = YOLOX(num_classes=ds.num_classes, depth_mul=args.depth,
                  width_mul=args.width, input_hw=hw,
                  train_outputs=True)
    lr = args.basic_lr_per_img * args.batch
    sched = lr_schedule("yoloxwarmcos", lr, iters_per_epoch=len(ds),
                        total_epochs=args.epochs,
                        warmup_epochs=args.warmup_epochs,
                        no_aug_epochs=args.no_aug_epochs,
                        min_lr_ratio=args.min_lr_ratio)
    sched_j = jax.jit(sched)   # see train_pose: no eager jnp on the
    # TPU path
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, *hw, 3)))
    tx = make_optimizer("sgd", sched, params=variables["params"],
                        weight_decay=args.weight_decay)
    state = init_train_state(variables, tx)
    step_aug = make_yolox_train_step(model, tx, hw, use_l1=False)
    step_l1 = make_yolox_train_step(model, tx, hw, use_l1=True)

    eval_apply = None
    if args.val_ann:
        # Same params, inference head (sigmoided decode) for validation.
        model_eval = YOLOX(num_classes=ds.num_classes,
                           depth_mul=args.depth, width_mul=args.width,
                           input_hw=hw, train_outputs=False)
        eval_apply = jax.jit(lambda v, x: model_eval.apply(v, x))

    devices = jax.devices()
    shard = None
    if len(devices) > 1 and args.batch % len(devices) == 0:
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P
        mesh = Mesh(np.asarray(devices), ("batch",))
        shard = NamedSharding(mesh, P("batch"))
        print(f"data-parallel over {len(devices)} devices")

    os.makedirs(args.out, exist_ok=True)
    metrics = Metrics(os.path.join(args.out, "train_metrics.jsonl"))
    step = 0
    t0 = time.time()
    for epoch in range(args.epochs):
        no_aug = epoch >= args.epochs - args.no_aug_epochs
        ds.mosaic = not no_aug
        step_fn = step_l1 if no_aug else step_aug
        for batch in ds:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            if shard is not None:
                jb = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, shard), jb)
            state, loss, aux = step_fn(state, jb)
            step += 1
            if step % 10 == 1 or (args.max_steps
                                  and step >= args.max_steps):
                loss = float(loss)
                lr_now = float(sched_j(step))
                print(f"epoch {epoch} step {step} loss {loss:.4f} "
                      f"num_fg {float(aux['num_fg']):.0f} "
                      f"lr {lr_now:.2e} "
                      f"({step * args.batch / (time.time() - t0):.1f} "
                      "img/s)", flush=True)
                metrics.log(epoch=epoch, step=step, loss=loss,
                            lr=lr_now, num_fg=float(aux["num_fg"]))
            if args.max_steps and step >= args.max_steps:
                break
        save_checkpoint(os.path.join(args.out, "last.npz"),
                        {"params": state.params,
                         "batch_stats": state.batch_stats})
        save_checkpoint(os.path.join(args.out, "ema.npz"), state.ema)
        done = args.max_steps and step >= args.max_steps
        if eval_apply is not None and (
                done or epoch == args.epochs - 1
                or (args.eval_interval
                    and (epoch + 1) % args.eval_interval == 0)):
            # Evaluate the EMA model, like the reference trainer.
            m = evaluate_detection(
                eval_apply, state.ema, args.val_ann,
                args.val_img_root or args.img_root, hw)
            print(f"epoch {epoch} val box mAP(0.50:0.95) {m:.4f}",
                  flush=True)
            metrics.log(epoch=epoch, step=step, val_box_map=m)
        if done:
            break
    print(f"done: {step} steps, checkpoints in {args.out}")


if __name__ == "__main__":
    main()
