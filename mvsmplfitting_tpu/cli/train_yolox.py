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
                   help="final epochs without mosaic, with L1 loss")
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
    return p.parse_args(argv)


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
                             seed=args.seed)
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
        if args.max_steps and step >= args.max_steps:
            break
    print(f"done: {step} steps, checkpoints in {args.out}")


if __name__ == "__main__":
    main()
