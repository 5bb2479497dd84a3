"""One-off chip measurement: LM iteration cost vs per-fit overhead.

Fits the real demo batch at several ``max_iters`` budgets and
regresses batch time on the iteration count: the slope is the
marginal cost of one LM iteration (per batch), the intercept is the
fixed per-fit overhead (init guess, stage transitions, energy setup,
dispatch).  Tells where further throughput work should go — shrinking
the iteration (math/latency) or the scaffolding around it.

Run on the real TPU (serialized — one TPU process at a time):

    timeout 3000 python tools/bench_iteration_cost.py [batch]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sess, obs1, img_h = _real_problem()
    print(f"device={jax.devices()[0]} batch={batch}", file=sys.stderr)

    obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), obs1)

    budgets = [5, 10, 20, 40]
    rows = {}
    for it in budgets:
        fit_cfg = sess.fit_config.replace(
            lm=sess.fit_config.lm.replace(max_iters=it))
        one = _fit_fn(fit_cfg, sess.assets, sess.vposer, sess.cameras,
                      gmm=sess.gmm, img_height=img_h)
        f = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        fps, dt, loss = _timed_fps(f, obs, batch)
        rows[it] = {"fps": round(fps, 1), "batch_s": round(dt, 4),
                    "loss_mean": round(float(np.asarray(loss).mean()), 1),
                    "compile_plus_first_s": round(
                        time.perf_counter() - t0 - 3 * dt, 1)}
        print(f"max_iters={it}: {rows[it]}", file=sys.stderr)

    # 4 stages x max_iters is the per-stage budget; early exits make
    # the EFFECTIVE count smaller, so the slope is an upper bound on
    # marginal per-iteration cost only when budgets bind.  Regress on
    # the budget anyway and report both interpretations.
    x = np.array(budgets, np.float64)
    y = np.array([rows[i]["batch_s"] for i in budgets], np.float64)
    slope, intercept = np.polyfit(x, y, 1)
    print(json.dumps({
        "metric": "iteration_cost", "batch": batch,
        "per_budget": {str(k): v for k, v in rows.items()},
        "slope_ms_per_staged_iter_batch": round(1e3 * slope, 3),
        "intercept_ms_batch": round(1e3 * intercept, 2),
        "note": ("slope = marginal batch cost of raising the per-stage"
                 " LM budget by 1 (4 stages); intercept = fixed"
                 " per-fit scaffolding incl. dispatch"),
    }))


if __name__ == "__main__":
    main()
