"""Benchmark: staged multi-view SMPL fitting throughput per chip.

Measures frames/s of the full fit (init + 4-stage LM anneal, 6 views,
17 joints, batched) on the default device (the TPU chip under the
driver; CPU with the env overrides).

`vs_baseline` compares against the ACTUAL reference pipeline measured
on this machine's CPU via the parity harness
(`tools/run_reference_cpu.py`, unmodified reference code, full demo
budget): 58.8 s of fitting per frame = 0.017 frames/s.  A same-energy
jitted-CPU stand-in is also measured live and reported in `detail` for
a conservative apples-to-apples number.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Measured 2026-08-17 on this machine (see docs/PARITY.md): unmodified
# reference pipeline, `Body fitting done after 58.8105 seconds`, 1 frame.
REFERENCE_CPU_FPS = 1.0 / 58.8

# Persistent compilation cache: repeat bench runs skip the multi-minute
# first compile through the TPU tunnel.  (TPU only — XLA:CPU AOT cache
# entries embed machine features and can SIGILL across runners.)
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/mvsf_jax_cache")


def _fit_fn(cfg, assets, vposer_w, cam):
    import jax

    from mvsmplfitting_tpu.fitting import fit_frame, init_guess

    def one_frame(obs):
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        r = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                      vposer_w=vposer_w, img_height=1080.0)
        return r.loss

    return one_frame


def sweep():
    """Extended measurements (BASELINE.json configs 2-3): camera-count
    sweep and Schur shared-shape sequence throughput.  Not part of the
    driver's single-line contract — run `python bench.py --sweep`."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_problem
    from mvsmplfitting_tpu.fitting import FitConfig
    from mvsmplfitting_tpu.fitting.lm import LMOptions

    cfg = FitConfig(lm=LMOptions(max_iters=40))
    out = {}
    for views in (2, 4, 8):
        assets, vw, cam, obs1 = _make_problem(num_views=views,
                                              num_frames=1)
        one = _fit_fn(cfg, assets, vw, cam)
        B = 128
        obs = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), obs1)
        f = jax.jit(jax.vmap(one))
        jax.block_until_ready(f(obs))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f(obs))
        fps = B / ((time.perf_counter() - t0) / 3)
        out[f"views{views}_fps"] = round(fps, 1)

    # Schur shared-shape sequence (config 2).
    from mvsmplfitting_tpu.fitting import init_guess
    from mvsmplfitting_tpu.parallel.schur import schur_sequence_fit
    assets, vw, cam, obs1 = _make_problem(num_views=6, num_frames=1)
    B = 64
    obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), obs1)
    guess = init_guess(assets, cam, obs1.gt2d, obs1.conf, obs1.view_mask)
    p0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), guess.params)
    z0 = jnp.broadcast_to(guess.z, (B, 32))
    f = jax.jit(lambda o, p, z: schur_sequence_fit(
        cfg, assets, cam, o, p, z, vposer_w=vw, img_height=1080.0))
    jax.block_until_ready(f(obs, p0, z0)[2])
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(f(obs, p0, z0)[2])
    out["schur_seq_fps"] = round(B / ((time.perf_counter() - t0) / 3), 1)
    print(json.dumps({"metric": "bench_sweep", "detail": out}))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_problem
    from mvsmplfitting_tpu.fitting import FitConfig
    from mvsmplfitting_tpu.fitting.lm import LMOptions

    BATCH = 128  # measured optimum (stragglers in the vmapped
    # while_loop erase gains beyond this)
    cfg = FitConfig(lm=LMOptions(max_iters=40))

    assets, vposer_w, cam, obs1 = _make_problem(num_views=6, num_frames=1)
    obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), obs1)

    dev = jax.devices()[0]
    one = _fit_fn(cfg, assets, vposer_w, cam)
    batched = jax.jit(jax.vmap(one), device=dev)

    # Warm-up / compile.
    loss = batched(obs)
    jax.block_until_ready(loss)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        loss = batched(obs)
        jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / reps
    fps = BATCH / dt

    # Reference-CPU stand-in: same fit, one frame at a time on CPU.
    try:
        cpu = jax.devices("cpu")[0]
        seq = jax.jit(one, device=cpu)
        l = seq(obs1)
        jax.block_until_ready(l)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            l = seq(obs1)
            jax.block_until_ready(l)
        base_fps = n / (time.perf_counter() - t0)
    except Exception:
        base_fps = float("nan")

    print(json.dumps({
        "metric": "smpl_fit_throughput",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 1),
        "detail": {
            "batch": BATCH,
            "views": 6,
            "stages": 4,
            "solver": "lm",
            "device": str(dev.platform),
            "reference_cpu_fps_measured": round(REFERENCE_CPU_FPS, 4),
            "same_energy_jitted_cpu_sequential_fps": round(base_fps, 3)
            if base_fps == base_fps else None,
            "vs_jitted_cpu_stand_in": round(fps / base_fps, 1)
            if base_fps == base_fps else None,
            "final_loss_mean": float(np.asarray(loss).mean()),
        },
    }))


if __name__ == "__main__":
    import sys

    if "--sweep" in sys.argv:
        sweep()
    else:
        main()
