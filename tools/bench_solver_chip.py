"""One-off chip measurement: linear-solver choice on the REAL demo fit.

Validates the session-3 production default (Jacobi-preconditioned
12-iter Newton-Schulz, speculative LM) against the exact Cholesky
anchor ON HARDWARE — the round-2 verdict's weak #2: the default had
only ever been CPU-verified.  Run on the real TPU (serialized — one
TPU process at a time):

    timeout 3000 python tools/bench_solver_chip.py [batch]

For each (linsolve, speculative) config: throughput at B=batch
(default 128) on the bundled demo frame through the real data layer,
final loss mean, and relative loss delta vs the chol/non-speculative
anchor.  A delta beyond ~1% would mean the schulz inverse is losing
accuracy on the production JtJ (the failure mode the r2
unpreconditioned form hit silently) — the evidence needed to confirm
or revert the default.
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

    configs = [
        ("chol", False),   # exact anchor (classic LM, Cholesky)
        ("chol", True),
        ("schulz", True),  # production default (session.py:137)
        ("schulz", False),
    ]
    out, anchor_loss = {}, None
    for linsolve, spec in configs:
        name = f"{linsolve}{'_spec' if spec else ''}"
        fit_cfg = sess.fit_config.replace(
            lm=sess.fit_config.lm.replace(
                max_iters=40, linsolve=linsolve, speculative=spec))
        one = _fit_fn(fit_cfg, sess.assets, sess.vposer, sess.cameras,
                      gmm=sess.gmm, img_height=img_h)
        f = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        fps, dt, loss = _timed_fps(f, obs, batch)
        loss_mean = float(np.asarray(loss).mean())
        row = {"fps": round(fps, 1), "loss_mean": round(loss_mean, 2),
               "compile_plus_first_s": round(
                   time.perf_counter() - t0 - 3 * dt, 1)}
        if anchor_loss is None:
            anchor_loss = loss_mean
        row["loss_vs_chol_anchor_pct"] = round(
            100.0 * (loss_mean - anchor_loss) / abs(anchor_loss), 3)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)

    print(json.dumps({"metric": "solver_chip_validation",
                      "batch": batch, "detail": out}))


if __name__ == "__main__":
    main()
