"""One-off chip measurement: multi-person + SDF fit (BASELINE cfg 4).

Run on the real TPU (serialized — one TPU process at a time):
    timeout 1700 python tools/bench_multiperson.py [grid [mode [P]]]
mode: points (default — the gridless exact engine), or a grid-engine
schedule: 1/lagged, 0/exact, hybrid.  grid only affects grid modes.
P: number of people (default 2) in a 0.5 m-spaced overlapping line
(P=2 reproduces the original +-0.25 m fixture exactly).

The synthetic two-person-overlap problem from the r2 measurements
(`docs/BENCH_NOTES.md` multi-person rows): P=2 people 0.5 m apart,
6 views, full 4-stage schedule + joint SDF refinement at the given
collision grid.  Reports s/frame (host-synced), final losses and the
post-refinement collision sums.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvsmplfitting_tpu.fitting import FitConfig                # noqa: E402
from mvsmplfitting_tpu.fitting.energy import (EnergySpec,      # noqa: E402
                                              Observations)
from mvsmplfitting_tpu.fitting.multi_person import fit_people  # noqa: E402
from mvsmplfitting_tpu.models import vposer as vposer_lib      # noqa: E402
from mvsmplfitting_tpu.models.assets import synthetic_smpl     # noqa: E402
from mvsmplfitting_tpu.models.camera import (Camera,           # noqa: E402
                                             project_points)
from mvsmplfitting_tpu.models.joint_model import \
    with_joint_model                                           # noqa: E402
from mvsmplfitting_tpu.models.smpl import (SMPLParams,         # noqa: E402
                                           smpl_forward)


def make_cameras(num_views=6, radius=4.0):
    Rs, ts = [], []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views
        cam_pos = np.array([radius * np.sin(ang), 0.3,
                            radius * np.cos(ang)])
        z = -cam_pos / np.linalg.norm(cam_pos)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        Rs.append(R)
        ts.append(-R @ cam_pos)
    V = num_views
    return Camera(rotation=jnp.asarray(np.stack(Rs), jnp.float32),
                  translation=jnp.asarray(np.stack(ts), jnp.float32),
                  focal=jnp.full((V, 2), 1200.0),
                  center=jnp.full((V, 2), 540.0))


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    raw = sys.argv[2] if len(sys.argv) > 2 else "points"
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    engine = "points" if raw == "points" else "grid"
    lagged = ({"1": True, "lagged": True, "0": False, "exact": False}
              .get(raw, raw))
    rng = np.random.default_rng(7)
    assets = with_joint_model(synthetic_smpl())
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "vposer_weights.npz")
    vw = (vposer_lib.load_npz(path) if os.path.exists(path)
          else vposer_lib.random_weights())
    cam = make_cameras()

    obs_list = []
    offsets = [0.5 * (p - (P - 1) / 2.0) for p in range(P)]
    for dx in offsets:
        z = jnp.asarray(0.2 * rng.standard_normal(32), jnp.float32)
        true = SMPLParams(
            betas=jnp.asarray(0.3 * rng.standard_normal(10),
                              jnp.float32),
            global_orient=jnp.asarray([0.1, 0.2, 0.0]),
            body_pose=jnp.zeros(69),
            transl=jnp.asarray([dx, -0.1, 0.2]),
            scale=jnp.asarray(1.0))
        body_pose = vposer_lib.decode(vw, z)
        _, joints = smpl_forward(assets, true, body_pose)
        gt2d = project_points(cam, joints)
        K = gt2d.shape[1]
        obs_list.append(Observations(
            gt2d=gt2d, conf=jnp.ones((6, K)), view_mask=jnp.ones(6),
            joint_weights=jnp.ones(K)))
    obs_people = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)

    # Pallas voxelizer on the chip; jnp oracle on CPU smoke runs.
    spec = EnergySpec(interpenetration=True, coll_grid_size=grid,
                      use_pallas_sdf=jax.default_backend() != "cpu")
    # Full default 4-stage schedule; MVSF_LM_JAC=ad A/Bs the Jacobian
    # mode like the session driver does.
    from mvsmplfitting_tpu.fitting.lm import LMOptions
    cfg = FitConfig(spec=spec, lm=LMOptions(
        jac=os.environ.get("MVSF_LM_JAC", "analytic")))

    import functools

    # jit the WHOLE fit: un-jitted fit_people dispatches hundreds of
    # eager ops through the tunnel (the r3 chip sessions measured that
    # overhead at tens of seconds/frame — docs/BENCH_NOTES.md).
    from mvsmplfitting_tpu.fitting import energy as E

    @functools.partial(jax.jit, static_argnames=())
    def _run(obs):
        results, sums = fit_people(cfg, assets, cam, obs,
                                   vposer_w=vw, img_height=1080.0,
                                   lagged_sdf=lagged, sdf_engine=engine)
        solo_spec = cfg.spec.replace(interpenetration=False)

        def reproj(params, z, o):
            x = E.pack(solo_spec, params, z)
            return E.reprojection_error_px(solo_spec, assets, cam, o,
                                           vw, x)
        px = jax.vmap(reproj)(results.params, results.z, obs)
        return results.loss, sums, px

    def run():
        return _run(obs_people)

    def joint_energy(loss, sums):
        # Per-person data+prior energies plus the collision rows under
        # the final-stage weight — the exact objective of the joint
        # refinement solve (fit_people's joint_residual).
        w_coll = cfg.coll_weights[-1]
        return float(loss.sum() + ((w_coll * sums / P) ** 2).sum())

    print(f"grid={grid} engine={engine} lagged={lagged} P={P} "
          f"device={jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    loss, sums, px = jax.tree.map(np.asarray, run())
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={loss} coll_sums={sums} reproj_px={px} "
          f"joint_energy={joint_energy(loss, sums):.4g}", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, sums, px = jax.tree.map(np.asarray, run())
    dt = (time.perf_counter() - t0) / reps
    print(f"s/frame: {dt:.3f}  loss={loss} coll_sums={sums} "
          f"reproj_px={px} joint_energy={joint_energy(loss, sums):.4g}")
    print(json.dumps({"metric": "multi_person", "detail": {
        "s_per_frame": round(dt, 3), "engine": engine, "P": P,
        "loss": [round(float(v), 2) for v in loss],
        "coll_sums": [round(float(v), 5) for v in sums],
        "reproj_px": [round(float(v), 3) for v in px],
        "joint_energy": round(joint_energy(loss, sums), 2)}}))


if __name__ == "__main__":
    main()
