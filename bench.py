"""Benchmark: staged multi-view SMPL fitting throughput per chip.

Measures frames/s of the full fit (init + 4-stage LM anneal, 6 views,
17 joints, batched) on the default device (the TPU chip under the
driver; CPU with the env overrides).  `vs_baseline` compares against a
reference-CPU stand-in measured in the same process: the same energy
and iteration budget run one-frame-at-a-time on one CPU core-set, the
way the reference's Python loop does (the reference itself publishes no
numbers and cannot run here — its SMPL pkl download is license-gated).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _fit_fn(cfg, assets, vposer_w, cam):
    import jax

    from mvsmplfitting_tpu.fitting import fit_frame, init_guess

    def one_frame(obs):
        guess = init_guess(assets, cam, obs.gt2d, obs.conf, obs.view_mask)
        r = fit_frame(cfg, assets, cam, obs, guess.params, guess.z,
                      vposer_w=vposer_w, img_height=1080.0)
        return r.loss

    return one_frame


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_problem
    from mvsmplfitting_tpu.fitting import FitConfig
    from mvsmplfitting_tpu.fitting.lm import LMOptions

    BATCH = 64
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
        "vs_baseline": round(fps / base_fps, 2) if base_fps == base_fps
        else None,
        "detail": {
            "batch": BATCH,
            "views": 6,
            "stages": 4,
            "solver": "lm",
            "device": str(dev.platform),
            "baseline_cpu_sequential_fps": round(base_fps, 3)
            if base_fps == base_fps else None,
            "final_loss_mean": float(np.asarray(loss).mean()),
        },
    }))


if __name__ == "__main__":
    main()
