"""Mesh-sharded fitting tests on the 8-device virtual CPU mesh.

Validates that (a) frame-batched fits sharded over `frames` match the
unsharded single-frame fit, (b) camera-sharded normal-equation assembly
(psum over `cameras`) reproduces the single-device LM answer — the
collectives are exercised for real through shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.fitting import (
    FitConfig, Observations, fit_frame, init_guess, pack,
)
from mvsmplfitting_tpu.fitting.lm import LMOptions
from mvsmplfitting_tpu.models import vposer as vposer_lib
from mvsmplfitting_tpu.models.assets import synthetic_smpl
from mvsmplfitting_tpu.parallel.batched import (
    BatchedFitInputs, batched_fit_frames,
)
from mvsmplfitting_tpu.parallel.camera_shard import camera_sharded_fit
from mvsmplfitting_tpu.parallel.mesh import MeshLayout, make_mesh

from test_fitting import make_problem
from test_triangulate import make_cameras


@pytest.fixture(scope="module")
def assets():
    return synthetic_smpl()


@pytest.fixture(scope="module")
def vposer_w():
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    return (vposer_lib.load_npz(path) if os.path.exists(path)
            else vposer_lib.random_weights())


def _broadcast(tree, B):
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), tree)


class TestFrameSharding:
    def test_eight_device_mesh_exists(self):
        assert len(jax.devices()) == 8

    def test_batched_matches_single(self, assets, vposer_w, rng):
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        # Two stages / few iters: the point is sharding equivalence,
        # not convergence, and CPU compiles of the full 4-stage graph
        # are slow.
        cfg = FitConfig(lm=LMOptions(max_iters=5),
                        pose_weights=(57.4,),
                        shape_weights=(10.0,),
                        coll_weights=(0.0,))
        B = 8
        mesh = make_mesh(MeshLayout(frames=8, cameras=1))
        batch = BatchedFitInputs(obs=_broadcast(obs, B),
                                 img_height=jnp.full((B,), 1080.0))
        out = batched_fit_frames(cfg, assets, cam, batch,
                                 vposer_w=vposer_w, mesh=mesh)

        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        single = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                           vposer_w=vposer_w, img_height=1080.0)
        # vmapped-vs-single SVD/reduction orders differ slightly and the
        # LM trajectory amplifies them; equivalence is statistical.
        np.testing.assert_allclose(np.asarray(out.loss),
                                   np.full(B, float(single.loss)),
                                   rtol=1e-2)


class TestCameraSharding:
    @pytest.mark.parametrize("layout", [(2, 2)])
    def test_psum_assembly_matches_single_device(self, assets, vposer_w,
                                                 rng, layout,
                                                 monkeypatch):
        # Pin BOTH sides to the XLA closed-form Jacobian: the sharded
        # side is vmapped (so the fused kernel would fire) while the
        # single-device reference is unbatched (XLA closed form), and
        # at a 5-iteration mid-descent snapshot their reassociation-
        # level differences blow up 2x (the documented twitchiness).
        # This test checks PSUM ASSEMBLY, not Jacobian-impl trajectory
        # equivalence (that's test_joint_kernel / the analytic-vs-ad
        # test below).
        from mvsmplfitting_tpu.ops import joint_kernel as JK
        monkeypatch.setattr(JK, "_DEFAULT_ON", False)
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        frames_ax, cams_ax = layout
        B = 2 * frames_ax
        mesh = make_mesh(
            MeshLayout(frames=frames_ax, cameras=cams_ax),
            devices=jax.devices()[:frames_ax * cams_ax])
        # Exactness-anchor solver opts: camera_sharded_fit's internal
        # loop is classic LM, so the single-device reference must not
        # run the speculative library default (r5 flip) — a 5-iter
        # mid-descent snapshot under DIFFERENT accept rules diverges
        # 2x without either side being wrong.
        cfg = FitConfig(lm=LMOptions(max_iters=5, speculative=False,
                                     linsolve="chol"),
                        pose_weights=(57.4,),
                        shape_weights=(10.0,),
                        coll_weights=(0.0,))

        obs_b = _broadcast(obs, B)
        x_sharded, loss_sharded = camera_sharded_fit(
            cfg, assets, cam, obs_b, mesh, vposer_w=vposer_w,
            img_height=1080.0)

        # Single-device reference: same config, same staged LM.
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        single = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                           vposer_w=vposer_w, img_height=1080.0)
        x_single = pack(cfg.spec, single.params, single.z)

        assert loss_sharded.shape == (B,)
        np.testing.assert_allclose(
            np.asarray(loss_sharded),
            np.full(B, float(single.loss)), rtol=5e-3)
        np.testing.assert_allclose(np.asarray(x_sharded[0]),
                                   np.asarray(x_single), atol=5e-2)

    def test_analytic_jacobian_matches_ad_sharded(self, vposer_w, rng):
        """Camera-sharded LM with the closed-form Jacobian blocks
        (energy._analytic_core pushed through the local/replicated row
        tails) must reproduce the AD-Jacobian sharded fit."""
        from mvsmplfitting_tpu.models.joint_model import with_joint_model
        assets = with_joint_model(synthetic_smpl())
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        B = 4
        mesh = make_mesh(MeshLayout(frames=2, cameras=2),
                         devices=jax.devices()[:4])
        obs_b = _broadcast(obs, B)

        losses = {}
        for jac in ("ad", "analytic"):
            cfg = FitConfig(lm=LMOptions(max_iters=8, jac=jac),
                            pose_weights=(57.4,), shape_weights=(10.0,),
                            coll_weights=(0.0,))
            _, losses[jac] = camera_sharded_fit(
                cfg, assets, cam, obs_b, mesh, vposer_w=vposer_w,
                img_height=1080.0)
        np.testing.assert_allclose(np.asarray(losses["analytic"]),
                                   np.asarray(losses["ad"]), rtol=1e-3)

    def test_scan_stages_and_dynamic_cap_match_unrolled(
            self, assets, vposer_w, rng):
        """The dryrun path (stages as one lax.scan + traced iteration
        cap) must run the same math as the unrolled Python-loop form,
        and the traced cap must actually bound the while_loop (a cap
        below max_iters changes the answer)."""
        cam, obs, true, _ = make_problem(assets, vposer_w, rng)
        B = 4
        mesh = make_mesh(MeshLayout(frames=2, cameras=2),
                         devices=jax.devices()[:4])
        cfg = FitConfig(lm=LMOptions(max_iters=5),
                        pose_weights=(404.0, 57.4),
                        shape_weights=(50.0, 10.0),
                        coll_weights=(0.0, 0.0))
        obs_b = _broadcast(obs, B)

        _, loss_unrolled = camera_sharded_fit(
            cfg, assets, cam, obs_b, mesh, vposer_w=vposer_w,
            img_height=1080.0)
        fit = jax.jit(lambda c, o, cap: camera_sharded_fit(
            cfg, assets, c, o, mesh, vposer_w=vposer_w,
            img_height=1080.0, max_iters_cap=cap, scan_stages=True))
        _, loss_scan = fit(cam, obs_b, jnp.asarray(5, jnp.int32))
        # Identical math in scan vs unrolled bodies is NOT bitwise
        # (XLA FMA contraction differs per loop form, <= ~4e-6 rel per
        # op — see CLAUDE.md); 5 LM iterations amplify it to ~1e-4.
        np.testing.assert_allclose(np.asarray(loss_scan),
                                   np.asarray(loss_unrolled), rtol=1e-3)

        # Same compiled program, smaller budget: must early-stop at a
        # different (worse-or-equal, here strictly different) loss.
        _, loss_capped = fit(cam, obs_b, jnp.asarray(1, jnp.int32))
        assert not np.allclose(np.asarray(loss_capped),
                               np.asarray(loss_scan), rtol=1e-6)
