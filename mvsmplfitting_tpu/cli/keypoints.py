"""Keypoint-prediction CLI (= reference `code/keypoint_predict.py`).

Walks `data/images/<serial>/<CameraXX>/*.jpg`, runs the batched
detector + pose pipeline per frame across all cameras at once, and
writes OpenPose-format keypoint JSONs the fitting stage consumes.

    python -m mvsmplfitting_tpu.cli.keypoints \
        --data_folder <dir> [--yolox_ckpt x.pth] [--pose_ckpt y.pth]

Without checkpoints the networks run randomly initialized (useful only
for pipeline smoke tests; detections will be garbage).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default=None,
                   help="images/<serial>/<cam> tree (offline mode)")
    p.add_argument("--video", default=None,
                   help="video file / image dir / webcam index "
                        "(streaming mode: detect/stream.py)")
    p.add_argument("--out_video", default=None,
                   help="streaming mode: annotated output video")
    p.add_argument("--results_dir", default=None,
                   help="streaming mode: also write the aggregated "
                        "alphapose-results.json here")
    p.add_argument("--results_form", default=None,
                   choices=["cmu", "open"],
                   help="aggregated results format (default: the "
                        "alphapose-results.json list)")
    p.add_argument("--for_eval", action="store_true",
                   help="numeric COCO image ids in the results file")
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--img_folder", default="images")
    p.add_argument("--keyp_folder", default="keypoints")
    p.add_argument("--yolox_ckpt", default=None)
    p.add_argument("--pose_ckpt", default=None)
    p.add_argument("--det_thresh", type=float, default=0.1)
    p.add_argument("--pose_model", default="fastpose",
                   help="pose zoo net (detect/zoo.py)")
    p.add_argument("--pose_cfg", default=None,
                   help="AlphaPose model-config YAML (the reference's "
                        "configs/**/*.yaml, accepted verbatim — "
                        "detect/config.py); overrides --pose_model/"
                        "--num_joints")
    p.add_argument("--num_joints", type=int, default=26)
    p.add_argument("--flip_test", action="store_true",
                   help="mirrored-batch heatmap ensembling")
    p.add_argument("--format", default=None,
                   help="keypoint format for the flip-test pair table "
                        "(skeleton registry: halpe26/halpe136/...); "
                        "default = the reference predictor's COCO-17 "
                        "pairs regardless of joint count "
                        "(`alphapose_core.py:249-253` quirk)")
    p.add_argument("--pose_nms", action="store_true",
                   help="parametric pose NMS for crowded scenes")
    p.add_argument("--bf16", action="store_true",
                   help="run the conv graphs in bfloat16 on the MXU")
    p.add_argument("--smpl", action="store_true",
                   help="streaming mode: direct SMPL regression "
                        "(HybrIK) with mesh-overlay video + results "
                        "JSON instead of 2D keypoints (the reference's "
                        "writer_smpl.py demo)")
    p.add_argument("--smpl_ckpt", default=None,
                   help="HybrIK torch checkpoint (random init if "
                        "absent)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..detect.predictor import (KeypointPipeline, PersonDetector,
                                    PoseEstimator)
    from ..detect.preprocess import flip_pairs_for
    from ..detect.zoo import build_pose_model

    det_params = None
    if args.yolox_ckpt:
        from ..detect.convert import convert_yolox
        det_params = convert_yolox(args.yolox_ckpt)
    dtype = jnp.bfloat16 if args.bf16 else None
    detector = PersonDetector(det_params, conf_thresh=args.det_thresh,
                              compute_dtype=dtype)

    if args.video is not None and args.smpl:
        # The 2D pose net is never used here — don't init/compile it
        # (flax init is eager device work; on the pinned TPU platform
        # each wasted op is a tunnel round-trip).
        from ..detect.predictor import SmplPoseEstimator
        from ..detect.stream import parse_source, run_stream_smpl
        smpl_params = None
        if args.smpl_ckpt:
            from ..detect.convert import convert_hybrik
            smpl_params = convert_hybrik(args.smpl_ckpt)
        out_dir = args.data_folder or "."
        start = time.time()
        n = run_stream_smpl(
            parse_source(args.video), detector,
            SmplPoseEstimator(smpl_params, compute_dtype=dtype),
            out_json=os.path.join(out_dir, "smpl-results.json"),
            out_video=args.out_video, max_frames=args.max_frames)
        print(f"Processed {n} frame(s) in {time.time() - start:.2f}s")
        return 0

    if args.pose_cfg:
        from ..detect.config import (estimator_kwargs_from_config,
                                     model_spec_from_config)
        est_kw = estimator_kwargs_from_config(args.pose_cfg)
        pose_zoo_name = model_spec_from_config(args.pose_cfg)[0]
    else:
        est_kw = {"num_joints": args.num_joints,
                  "model": build_pose_model(args.pose_model,
                                            args.num_joints)}
        pose_zoo_name = args.pose_model.lower().replace("-", "_")
    pose_params = None
    if args.pose_ckpt:
        from ..detect.convert import POSE_CONVERTERS
        pose_params = POSE_CONVERTERS[pose_zoo_name](args.pose_ckpt)
    if args.format:
        est_kw["joint_pairs"] = flip_pairs_for(
            est_kw["num_joints"], args.format)
    pipeline = KeypointPipeline(
        detector,
        PoseEstimator(pose_params, flip_test=args.flip_test,
                      use_pose_nms=args.pose_nms,
                      compute_dtype=dtype, **est_kw))

    if args.video is not None:
        from ..detect.stream import parse_source, run_stream
        out_dir = (os.path.join(args.data_folder, args.keyp_folder)
                   if args.data_folder else "keypoints")
        start = time.time()
        n = run_stream(parse_source(args.video), pipeline.detector,
                       pipeline.pose,
                       out_json_dir=out_dir, out_video=args.out_video,
                       max_frames=args.max_frames,
                       results_dir=args.results_dir,
                       results_form=args.results_form,
                       for_eval=args.for_eval)
        print(f"Processed {n} frame(s) in {time.time() - start:.2f}s")
        return 0

    if args.data_folder is None:
        p.error("--data_folder or --video required")
    img_root = os.path.join(args.data_folder, args.img_folder)
    keyp_root = os.path.join(args.data_folder, args.keyp_folder)

    start = time.time()
    n = 0
    for serial in sorted(os.listdir(img_root)):
        sdir = os.path.join(img_root, serial)
        if not os.path.isdir(sdir):
            continue
        cams = sorted(d for d in os.listdir(sdir)
                      if os.path.isdir(os.path.join(sdir, d)))
        frames = {}
        for cam in cams:
            for fn in sorted(os.listdir(os.path.join(sdir, cam))):
                if fn.lower().endswith((".jpg", ".png")):
                    frames.setdefault(fn, []).append(
                        (cam, os.path.join(sdir, cam, fn)))
        for fn, entries in sorted(frames.items()):
            cam_names = [c for c, _ in entries]
            paths = [pth for _, pth in entries]
            pipeline.process_images(paths, keyp_root, serial, cam_names)
            n += 1
            print(f"{serial}/{fn}: {len(paths)} views")
    dt = time.time() - start
    print(f"Processed {n} frame(s) in {dt:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
