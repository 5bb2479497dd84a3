"""Pose-network training driver (the reference family's
`scripts/train.py` equivalent, parameterized like its train configs:
`configs/halpe_26/resnet/256x192_res50_lr1e-3_1x.yaml` TRAIN section).

End to end on TPU: COCO GT json -> host-side augmentation
(`detect/augment.py`) -> Gaussian heatmap targets -> jitted masked-MSE
train step (`detect/train.py`) with EMA + multistep LR + npz
checkpoints.  With >1 device the batch axis shards over a
`jax.sharding` mesh and XLA data-parallelizes the step (gradient
all-reduce + global BN stats), replacing the reference's
torch.distributed world.

    python -m mvsmplfitting_tpu.cli.train_pose \
        --ann annotations/person_keypoints_train.json --img_root images \
        --model fastpose --num_joints 17 --epochs 2 --batch 32
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann", required=True,
                   help="COCO person_keypoints GT json; comma-list "
                        "concatenates datasets (the reference's "
                        "ConcatDataset / halpe_coco_wholebody merges)")
    p.add_argument("--img_root", required=True,
                   help="image root; comma-list pairs with --ann")
    p.add_argument("--model", default="fastpose")
    p.add_argument("--num_joints", type=int, default=17)
    p.add_argument("--format", default=None,
                   help="keypoint format from the skeleton registry "
                        "(halpe26/halpe68/halpe136/coco_wholebody133/"
                        "mpii16/...) — sets the flip pairs and "
                        "half-body ids; default COCO-17 tables")
    p.add_argument("--input_size", default="256x192",
                   help="HxW crop size")
    p.add_argument("--heatmap_size", default="64x48")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "sgd", "rmsprop"])
    p.add_argument("--lr_step", default="50,70",
                   help="epoch milestones (LR_STEP)")
    p.add_argument("--lr_factor", type=float, default=0.1)
    p.add_argument("--sigma", type=float, default=2.0)
    p.add_argument("--loss_type", default="mse",
                   choices=["mse", "integral"],
                   help="MSELoss heatmap targets or L1JointRegression")
    p.add_argument("--norm_type", default="softmax",
                   choices=["softmax", "sigmoid"],
                   help="integral-loss heatmap normalization")
    p.add_argument("--out", default="pose_train_out")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N steps (0 = run all epochs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deconv", default="",
                   help="simplepose deconv filters, e.g. 256,256,256")
    p.add_argument("--conv_dim", type=int, default=0,
                   help="fastpose DUC conv dim override")
    return p.parse_args(argv)


def aug_for_format(fmt, num_joints, input_hw):
    """PoseAugConfig for a named keypoint format: flip pairs from the
    skeleton registry.  None -> dataset default (COCO-17 tables).

    Half-body ids: the reference's dataset classes declare per-format
    `lower_body_ids` (kept in the registry, golden-tested), but
    `CustomDataset.__init__` shadows them with instance attributes
    upper=(0..10) / lower=(11..16) for EVERY format
    (`datasets/custom.py:93-94`), and `SimpleTransform` reads the
    instance (`simple_transform.py:77-78`) — so the effective split is
    always the COCO-17 one.  Quirk reproduced here."""
    if fmt is None:
        return None
    from ..detect.augment import PoseAugConfig
    from ..viz.skeletons import skeleton_for
    spec = skeleton_for(num_joints, fmt)
    if spec.num_joints != num_joints:
        raise SystemExit(
            f"--format {fmt} is a {spec.num_joints}-joint set, got "
            f"--num_joints {num_joints}")
    return PoseAugConfig(
        input_hw=input_hw, flip_pairs=spec.flip_pairs,
        upper_body_ids=tuple(range(11)))


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..detect.dataset import CocoPoseTrainDataset
    from ..detect.train import (init_train_state, lr_schedule,
                                make_integral_train_step,
                                make_optimizer, make_pose_train_step,
                                save_checkpoint)
    from ..detect.zoo import build_pose_model
    from ..utils.profiling import Metrics

    hw = tuple(int(v) for v in args.input_size.split("x"))
    hm = tuple(int(v) for v in args.heatmap_size.split("x"))
    integral = args.loss_type == "integral"
    anns = args.ann.split(",")
    roots = args.img_root.split(",")
    ds = CocoPoseTrainDataset(anns if len(anns) > 1 else args.ann,
                              roots if len(roots) > 1 else args.img_root,
                              hw, hm,
                              batch_size=args.batch, sigma=args.sigma,
                              seed=args.seed,
                              num_joints=args.num_joints,
                              aug=aug_for_format(args.format,
                                                 args.num_joints, hw),
                              loss_type=("integral" if integral
                                         else "heatmap"))
    if len(ds) == 0:
        raise SystemExit("no full batches: fewer annotations than "
                         f"--batch {args.batch}")

    kw = {}
    if args.deconv:
        kw["deconv_filters"] = tuple(
            int(v) for v in args.deconv.split(","))
    if args.conv_dim:
        kw["conv_dim"] = args.conv_dim
    model = build_pose_model(args.model, args.num_joints, **kw)

    milestones = [int(v) for v in args.lr_step.split(",") if v]
    sched = lr_schedule("multistep", args.lr, iters_per_epoch=len(ds),
                        total_epochs=args.epochs,
                        milestones=milestones, factor=args.lr_factor)
    tx = make_optimizer(args.optimizer, sched)
    sched_j = jax.jit(sched)   # eager jnp per log line would
    # round-trip the TPU tunnel op by op
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, *hw, 3)))
    state = init_train_state(variables, tx)
    step_fn = (make_integral_train_step(model, tx,
                                        norm_type=args.norm_type)
               if integral else make_pose_train_step(model, tx))

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
        for batch in ds:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            if shard is not None:
                jb = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, shard), jb)
            state, loss, _ = step_fn(state, jb)
            step += 1
            if step % 20 == 1 or (args.max_steps
                                  and step >= args.max_steps):
                loss = float(loss)
                lr_now = float(sched_j(step))
                print(f"epoch {epoch} step {step} loss {loss:.6f} "
                      f"lr {lr_now:.2e} "
                      f"({step * args.batch / (time.time() - t0):.1f} "
                      "crops/s)", flush=True)
                metrics.log(epoch=epoch, step=step, loss=loss,
                            lr=lr_now)
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
