"""One-off chip measurement: the straggler knee, fused vs unrolled.

Round-2 verdict weak #6: B=512 homogeneous dropped to ~300 fps vs
~389 at B=128 because the four unrolled per-stage while_loops each
wait for the batch's slowest lane; the fused single-while_loop staged
fit (`fitting/stages.py:lm_fit_staged`) was predicted to win on
heterogeneous batches but never measured at the knee.  Run on the
real TPU (serialized — one TPU process at a time):

    timeout 3000 python tools/bench_hetero_knee.py [B ...]

For each batch size (default 128 256 512) and each of
{unrolled, fused}: fps on the per-lane ±2px keypoint-jittered demo
batch (the honest mixed workload from bench.py) plus the homogeneous
broadcast batch for reference.  Evidence for flipping the production
default (verdict item 7).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import _fit_fn, _real_problem, _timed_fps  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    sizes = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    sess, obs1, img_h = _real_problem()
    print(f"device={jax.devices()[0]} sizes={sizes}", file=sys.stderr)

    out = {}
    for fused in (False, True):
        fit_cfg = sess.fit_config.replace(
            fused=fused,
            lm=sess.fit_config.lm.replace(max_iters=40))
        one = _fit_fn(fit_cfg, sess.assets, sess.vposer, sess.cameras,
                      gmm=sess.gmm, img_height=img_h)
        f = jax.jit(jax.vmap(one))
        for B in sizes:
            obs = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape), obs1)
            key = jax.random.PRNGKey(0)
            noise = 2.0 * jax.random.normal(key, obs.gt2d.shape,
                                            obs.gt2d.dtype)
            obs_h = obs.replace(
                gt2d=obs.gt2d + noise * (obs.conf[..., None] > 0))
            t0 = time.perf_counter()
            h_fps, dt, h_loss = _timed_fps(f, obs_h, B)
            compile_s = round(time.perf_counter() - t0 - 3 * dt, 1)
            fps, _, _ = _timed_fps(f, obs, B)
            name = f"{'fused' if fused else 'unrolled'}_b{B}"
            out[name] = {
                "hetero_fps": round(h_fps, 1),
                "homog_fps": round(fps, 1),
                "hetero_loss_mean": round(
                    float(np.asarray(h_loss).mean()), 2),
                "compile_plus_first_s": compile_s,
            }
            print(f"{name}: {out[name]}", file=sys.stderr)

    print(json.dumps({"metric": "hetero_knee", "detail": out}))


if __name__ == "__main__":
    main()
