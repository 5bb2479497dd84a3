"""Multi-view SMPL fitting CLI.

Usage (mirrors the reference's `python code/main.py --config
cfg_files/fit_smpl.yaml`, `README.md:16`):

    python -m mvsmplfitting_tpu.cli.main --config <yaml> \
        [--data_folder ...] [--output_folder ...] [key=value ...]

The frame loop is the reference's `main.py:22-94` redesigned for TPU:
the whole 4-stage fit is one jitted program reused across frames, frame
data is padded/masked rather than Python-filtered, and sequences
warm-start branch-free.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__
from ..config import dump_config, load_config
from ..data.dataset import frame_to_observations
from ..data.results import FitOutputs, save_obj, save_result_pkl
from ..fitting import fit_frame, init_guess, warm_start
from ..models.smpl import smpl_forward
from ..session import build_session


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="TPU-native multi-view SMPL fitting")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_folder", type=str, default=None)
    p.add_argument("--cam_param", type=str, default=None)
    p.add_argument("--output_folder", type=str, default=None)
    p.add_argument("--model_folder", type=str, default=None)
    p.add_argument("--model_type", type=str, default=None)
    p.add_argument("--prior_folder", type=str, default=None)
    p.add_argument("--optim_type", type=str, default=None)
    p.add_argument("--maxiters", type=int, default=None)
    p.add_argument("--is_seq", action="store_true", default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="skip frames whose result pkl already exists")
    p.add_argument("--no_save_images", dest="save_images",
                   action="store_false", default=None)
    p.add_argument("--no_save_meshes", dest="save_meshes",
                   action="store_false", default=None)
    return p.parse_args(argv)


def _save_frame_outputs(cfg, sess, frame, result, result_root,
                        mesh_root, image_root):
    out = FitOutputs(
        betas=np.asarray(result.params.betas),
        global_orient=np.asarray(result.params.global_orient),
        transl=np.asarray(result.params.transl),
        scale=np.asarray(result.params.scale),
        body_pose=np.asarray(result.body_pose),
        pose_embedding=np.asarray(result.z),
        loss=float(result.loss))
    frame_dir = os.path.join(result_root, frame.serial, frame.frame_name)
    saved = save_result_pkl(os.path.join(frame_dir, "000.pkl"), out)

    if cfg.save_meshes or cfg.save_images:
        final_params = result.params.replace(
            body_pose=jnp.asarray(saved["body_pose"][0]),
            global_orient=jnp.asarray(saved["pose"][0, :3]))
        verts, joints = smpl_forward(sess.assets, final_params)
        if cfg.save_meshes:
            save_obj(os.path.join(mesh_root, frame.serial,
                                  frame.frame_name, "000.obj"),
                     np.asarray(verts), np.asarray(sess.assets.faces))
        if cfg.save_images:
            from ..viz.overlay import save_overlays
            save_overlays(os.path.join(image_root, frame.serial,
                                       frame.frame_name),
                          frame, sess.cameras, np.asarray(verts),
                          np.asarray(sess.assets.faces),
                          np.asarray(joints))


def run_multi_person(cfg, sess, result_root, mesh_root,
                     image_root) -> int:
    """Fit up to `num_people` per frame (vmapped solo fits + joint SDF
    refinement when interpenetration is on).  The reference has no
    such path — its solver asserts batch 1 (`non_linear_solver.py:56`);
    results land as <frame>/<p:03d>.pkl per person.

    People are index-matched across views (the data layer preserves
    each JSON's person order); cross-view identity association is the
    keypoint producer's job, as in the reference's file contract."""
    from ..data.dataset import frame_to_observations
    from ..fitting.multi_person import fit_people

    P = cfg.num_people
    fit_jit = jax.jit(lambda obs, h: fit_people(
        sess.fit_config, sess.assets, sess.cameras, obs,
        vposer_w=sess.vposer, gmm=sess.gmm, img_height=h,
        est_scale=not cfg.fix_scale, sdf_engine=cfg.sdf_engine))

    n_frames = 0
    for frame in sess.dataset:
        obs_list = [frame_to_observations(frame, sess.joint_weights,
                                          person=p) for p in range(P)]
        obs_people = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
        # A person absent from a view contributes zero-confidence rows
        # already (padded people); mask views accordingly.
        vm = jnp.asarray(frame.person_mask.T) * \
            jnp.asarray(frame.view_mask)[None, :]
        obs_people = obs_people.replace(view_mask=vm)
        live = frame.person_mask.max(axis=0)     # (P,) person present?

        t0 = time.time()
        results, coll_sums = fit_jit(obs_people,
                                     float(frame.img_hw[0]))
        jax.block_until_ready(results.loss)
        losses = np.asarray(results.loss)
        print(f"Processing: {frame.serial}/{frame.frame_name} — "
              f"{int(live.sum())} people, losses "
              f"{[round(float(l), 1) for l, m in zip(losses, live) if m]}"
              f" coll {np.round(np.asarray(coll_sums), 3).tolist()} "
              f"in {time.time() - t0:.2f}s")
        verts_people = None
        if cfg.save_images:
            verts_people = np.zeros(
                (P, sess.assets.v_template.shape[0], 3), np.float32)
        for p in range(P):
            if not live[p]:
                continue
            person = jax.tree.map(lambda a, p=p: a[p], results)
            frame_dir = os.path.join(result_root, frame.serial,
                                     frame.frame_name)
            out = FitOutputs(
                betas=np.asarray(person.params.betas),
                global_orient=np.asarray(person.params.global_orient),
                transl=np.asarray(person.params.transl),
                scale=np.asarray(person.params.scale),
                body_pose=np.asarray(person.body_pose),
                pose_embedding=np.asarray(person.z),
                loss=float(person.loss))
            saved = save_result_pkl(
                os.path.join(frame_dir, f"{p:03d}.pkl"), out)
            if cfg.save_meshes or cfg.save_images:
                final_params = person.params.replace(
                    body_pose=jnp.asarray(saved["body_pose"][0]),
                    global_orient=jnp.asarray(saved["pose"][0, :3]))
                verts, _ = smpl_forward(sess.assets, final_params)
                if cfg.save_meshes:
                    save_obj(os.path.join(mesh_root, frame.serial,
                                          frame.frame_name,
                                          f"{p:03d}.obj"),
                             np.asarray(verts),
                             np.asarray(sess.assets.faces))
                if cfg.save_images:
                    verts_people[p] = np.asarray(verts)
        if cfg.save_images:
            from ..viz.overlay import save_overlays_multi
            save_overlays_multi(
                os.path.join(image_root, frame.serial,
                             frame.frame_name),
                frame, sess.cameras, verts_people,
                np.asarray(sess.assets.faces), live=live)
        n_frames += 1
    return n_frames


def run_batched(cfg, sess, result_root, mesh_root, image_root) -> int:
    """Batched mode: fit `batch_frames` frames per device program
    (init + fit fused; see parallel/batched.py)."""
    from ..data.dataset import frame_to_observations
    from ..parallel.batched import BatchedFitInputs, batched_fit_frames

    frames = list(sess.dataset)
    n_done = 0
    B = cfg.batch_frames
    for i in range(0, len(frames), B):
        chunk = frames[i:i + B]
        pad = B - len(chunk)
        obs_list = [frame_to_observations(f, sess.joint_weights)
                    for f in chunk]
        obs_list += [obs_list[-1]] * pad          # pad with repeats
        heights = [float(f.img_hw[0]) for f in chunk]
        heights += [heights[-1]] * pad
        batch = BatchedFitInputs(
            obs=jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list),
            img_height=jnp.asarray(heights))
        t0 = time.time()
        out = batched_fit_frames(
            sess.fit_config, sess.assets, sess.cameras, batch,
            vposer_w=sess.vposer, gmm=sess.gmm,
            est_scale=not cfg.fix_scale)
        jax.block_until_ready(out.loss)
        print(f"  batch of {len(chunk)} fit in {time.time() - t0:.2f}s "
              f"(mean loss {float(np.mean(np.asarray(out.loss))):.2f})")
        for b, frame in enumerate(chunk):
            result = jax.tree.map(lambda a, b=b: a[b], out)
            _save_frame_outputs(cfg, sess, frame, result, result_root,
                                mesh_root, image_root)
            n_done += 1
    return n_done


def main(argv=None) -> int:
    args = parse_args(argv)
    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("config", "resume") and v is not None}
    cfg = load_config(args.config, **overrides)
    sess = build_session(cfg)

    out_root = cfg.output_folder
    result_root = os.path.join(out_root, cfg.result_folder)
    mesh_root = os.path.join(out_root, cfg.mesh_folder)
    image_root = os.path.join(out_root, "images")
    os.makedirs(out_root, exist_ok=True)
    dump_config(cfg, os.path.join(out_root, "conf.yaml"))

    if sess.synthetic_model:
        print("[warn] no SMPL pkl found under "
              f"{cfg.model_folder}; using the synthetic test model "
              "(fits run, parameters are not human-shaped)")

    fixed_scale = cfg.scale if (cfg.fix_scale and cfg.scale) else 1.0

    if cfg.num_people > 1:
        start = time.time()
        n_frames = run_multi_person(cfg, sess, result_root, mesh_root,
                                    image_root)
        elapsed = time.time() - start
        print(f"Processed {n_frames} frame(s) in {elapsed:.2f}s "
              f"({n_frames / max(elapsed, 1e-9):.3f} frames/s)")
        return 0

    if cfg.batch_frames > 1 and not cfg.is_seq:
        start = time.time()
        n_frames = run_batched(cfg, sess, result_root, mesh_root,
                               image_root)
        elapsed = time.time() - start
        print(f"Processed {n_frames} frame(s) in {elapsed:.2f}s "
              f"({n_frames / max(elapsed, 1e-9):.3f} frames/s)")
        return 0

    fit_jit = jax.jit(lambda obs, p, z, h, seq_start: fit_frame(
        sess.fit_config, sess.assets, sess.cameras, obs, p, z,
        vposer_w=sess.vposer, gmm=sess.gmm, img_height=h,
        seq_start=seq_start),
        static_argnames=("seq_start",))

    start = time.time()
    prev = None  # (params, z, loss) of previous frame for sequences
    n_frames = 0
    for frame in sess.dataset:
        out_pkl = os.path.join(result_root, frame.serial,
                               frame.frame_name, "000.pkl")
        if args.resume and os.path.exists(out_pkl):
            # Checkpoint/resume: results-as-checkpoint, like the
            # reference's warm-start pkls (`utils.py:859-864`).
            from ..data.results import load_result_pkl
            from ..models.smpl import SMPLParams
            prev_d = load_result_pkl(out_pkl)
            prev = (SMPLParams(
                betas=jnp.asarray(prev_d["betas"][0]),
                global_orient=jnp.asarray(prev_d["global_orient"][0]),
                body_pose=jnp.asarray(prev_d["body_pose"][0]),
                transl=jnp.asarray(prev_d["transl"][0]),
                scale=jnp.asarray(prev_d["scale"][0, 0])),
                jnp.asarray(prev_d["pose_embedding"][0]),
                jnp.asarray(prev_d["loss"]))
            print(f"Skipping (resume): {frame.serial}/{frame.frame_name}")
            n_frames += 1
            continue
        obs = frame_to_observations(frame, sess.joint_weights)
        print(f"Processing: {frame.serial}/{frame.frame_name} "
              f"({int(np.sum(frame.view_mask))} views)")

        guess = init_guess(
            sess.assets, sess.cameras, obs.gt2d, obs.conf, obs.view_mask,
            est_scale=not cfg.fix_scale, fixed_scale=fixed_scale,
            gt3d=obs.gt3d if cfg.use_3d else None)
        seq_start = prev is None or not cfg.is_seq
        if not seq_start:
            guess = warm_start(prev[0], prev[1], prev[2], guess)
        params, z = guess.params, guess.z
        if cfg.fix_shape and cfg.shape is not None:
            params = params.replace(
                betas=jnp.asarray(cfg.shape, jnp.float32))
        if not cfg.use_vposer:
            # sic: the reference's fix_params (`init_guess.py:190-212`,
            # called every frame at `main.py:81`) resets body_pose to
            # [1]*6 + [0]*63; with VPoser the model pose is unused so
            # only the non-VPoser path sees it.
            params = params.replace(body_pose=jnp.concatenate(
                [jnp.ones(6), jnp.zeros(63)]).astype(jnp.float32))

        t0 = time.time()
        result = fit_jit(obs, params, z, float(frame.img_hw[0]), seq_start)
        jax.block_until_ready(result.loss)
        stage_str = " ".join(f"{float(s):.1f}"
                             for s in np.asarray(result.stage_losses))
        from ..fitting.energy import reprojection_error_px
        from ..fitting import pack as pack_x
        err_px = float(reprojection_error_px(
            sess.fit_config.spec, sess.assets, sess.cameras, obs,
            sess.vposer, pack_x(sess.fit_config.spec, result.params,
                                result.z)))
        print(f"  stages [{stage_str}] final {float(result.loss):.3f} "
              f"reproj {err_px:.2f}px in {time.time() - t0:.2f}s")
        prev = (result.params, result.z, result.loss)
        n_frames += 1
        _save_frame_outputs(cfg, sess, frame, result, result_root,
                            mesh_root, image_root)

    elapsed = time.time() - start
    print(f"Processed {n_frames} frame(s) in {elapsed:.2f}s "
          f"({n_frames / max(elapsed, 1e-9):.3f} frames/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
