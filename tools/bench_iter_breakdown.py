"""One-off chip measurement: what one LM iteration spends its time on.

Times the three components of the per-iteration graph on the REAL demo
problem at the production batch — (a) one residual evaluation, (b) the
full linearize (primal + n JVP columns) with J^T J / J^T r assembly,
(c) the damped normal-equation solve (schulz / chol) — each chained
K times SEQUENTIALLY inside one jitted fori_loop (data-dependent
carry), so per-component latency is measured the way the while_loop
pays it, without per-call tunnel dispatch noise.

Run on the real TPU (serialized — one TPU process at a time):

    timeout 1700 python tools/bench_iter_breakdown.py [batch] [K]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import _real_problem  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mvsmplfitting_tpu.fitting import energy as E
    from mvsmplfitting_tpu.fitting.lm import _solve_spd
    from mvsmplfitting_tpu.fitting.stages import default_stages

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sess, obs1, img_h = _real_problem()
    cfg = sess.fit_config
    spec = cfg.spec
    weights = default_stages(cfg, jnp.asarray(img_h, jnp.float32))[-1]
    print(f"device={jax.devices()[0]} batch={batch} K={K}",
          file=sys.stderr)

    obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), obs1)
    mask = E.free_mask(spec)
    n = mask.shape[0]
    eye = jnp.eye(n)

    def res1(x, o):
        return E.residuals(spec, sess.assets, sess.cameras, o, weights,
                           sess.vposer, sess.gmm, x)

    x0 = jnp.tile(jnp.asarray(
        np.random.default_rng(0).normal(0, 0.05, (n,)), jnp.float32),
        (batch, 1))

    import os
    only = os.environ.get("MVSF_BREAKDOWN_ONLY", "")

    def timed(name, chained_fn, carry0, work_per_step=1):
        if only and only not in name:
            return None
        f = jax.jit(chained_fn)
        out = f(carry0)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(carry0)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        per = dt / (K * work_per_step) * 1e6
        print(f"{name}: {dt*1e3:.1f} ms total, {per:.1f} us/step",
              file=sys.stderr)
        return round(per, 2)

    out = {}

    # (a) one residual evaluation per step
    def chain_res(x):
        def body(_, x):
            r = jax.vmap(res1)(x, obs)
            return x * (1.0 + 0.0 * jnp.mean(r))
        return jax.lax.fori_loop(0, K, body, x)
    out["residual_eval_us"] = timed("residual_eval", chain_res, x0)

    # (b) linearize + normal-equation assembly per step
    def chain_lin(x):
        def body(_, x):
            def one(xi, oi):
                r, lin = jax.linearize(lambda v: res1(v, oi), xi)
                J = jax.vmap(lin)(eye).T * mask[None, :]
                return J.T @ J, J.T @ r
            JtJ, g = jax.vmap(one)(x, obs)
            return x + 0.0 * g * jnp.mean(JtJ)
        return jax.lax.fori_loop(0, K, body, x)
    out["linearize_assemble_us"] = timed("linearize+JtJ", chain_lin, x0)

    # (c) the damped SPD solve per step (data-dependent chain on g)
    rng = np.random.default_rng(1)
    Jf = rng.normal(0, 1, (batch, 4 * n, n))
    scales = 10.0 ** rng.uniform(-2, 2, (n,))
    A0 = jnp.asarray(
        np.einsum("bri,brj->bij", Jf * scales, Jf * scales)
        + 1e-3 * np.eye(n), jnp.float32)
    g0 = jnp.asarray(rng.normal(0, 1, (batch, n)), jnp.float32)

    for method in ("schulz", "chol"):
        def chain_solve(g, method=method):
            def body(_, g):
                dx = jax.vmap(
                    lambda A, b: _solve_spd(A, b, method,
                                            cfg.lm.schulz_iters))(A0, g)
                return dx / jnp.maximum(
                    jnp.linalg.norm(dx, axis=-1, keepdims=True), 1e-9)
            return jax.lax.fori_loop(0, K, body, g)
        out[f"solve_{method}_us"] = timed(f"solve[{method}]",
                                          chain_solve, g0)

    # (e,f,g) where does the tangent time go?  Decoder-only columns,
    # rest-only columns (decoder tangents absent from the graph), and
    # a bf16-everything Jacobian variant.
    from mvsmplfitting_tpu.models import vposer as V

    if sess.vposer is not None and cfg.spec.use_vposer:
        p = 32  # vposer latent block leads the packed vector

        def chain_dec(z):
            def body(_, z):
                def one(zi):
                    _, lin = jax.linearize(
                        lambda v: V.decode(sess.vposer, v), zi)
                    return jax.vmap(lin)(jnp.eye(p))
                Jd = jax.vmap(one)(z)
                return z * (1.0 + 0.0 * jnp.mean(Jd))
            return jax.lax.fori_loop(0, K, body, z)
        out["decode_tangents_us"] = timed(
            "decode_tangents(32col)", chain_dec, x0[:, :p])

        nrest = n - p
        eye_r = jnp.eye(nrest)

        def chain_rest(x):
            def body(_, x):
                def one(xi, oi):
                    zfix = xi[:p]

                    def res_rest(rest):
                        return res1(jnp.concatenate([zfix, rest]), oi)
                    _, lin = jax.linearize(res_rest, xi[p:])
                    J = jax.vmap(lin)(eye_r).T
                    return J.T @ J
                JtJ = jax.vmap(one)(x, obs)
                return x * (1.0 + 0.0 * jnp.mean(JtJ))
            return jax.lax.fori_loop(0, K, body, x)
        out["rest_tangents_us"] = timed(
            f"rest_tangents({nrest}col)", chain_rest, x0)

    # (h,i,j) sub-graphs of the residual: reduced joint model alone,
    # the full data rows (joint model + projection + gmof), and the
    # prior rows — each linearized at all n columns.
    def sub_lin(name, fn):
        def chain(x):
            def body(_, x):
                def one(xi, oi):
                    _, lin = jax.linearize(lambda v: fn(v, oi), xi)
                    Js = jax.vmap(lin)(eye)
                    return jnp.sum(Js * Js)
                s = jax.vmap(one)(x, obs)
                return x * (1.0 + 0.0 * jnp.mean(s))
            return jax.lax.fori_loop(0, K, body, x)
        out[name] = timed(name, chain, x0)

    def joints_only(x, o):
        return E._forward(spec, sess.assets, sess.vposer, x)[4].reshape(-1)

    def data_only(x, o):
        return E.data_residuals(spec, sess.assets, sess.cameras, o,
                                weights, sess.vposer, x)

    def prior_only(x, o):
        return E.prior_residuals(spec, weights, sess.gmm, sess.vposer, x)

    sub_lin("lin_joint_model_us", joints_only)
    sub_lin("lin_data_rows_us", data_only)
    sub_lin("lin_prior_rows_us", prior_only)

    def to_bf16(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)

    bf = {k: to_bf16(v) for k, v in dict(
        assets=sess.assets, cameras=sess.cameras, obs=obs,
        weights=weights, vposer=sess.vposer, gmm=sess.gmm).items()}

    def res_bf(x, o):
        return E.residuals(spec, bf["assets"], bf["cameras"], o,
                           bf["weights"], bf["vposer"], bf["gmm"], x)

    def chain_lin_bf(x):
        def body(_, x):
            def one(xi, oi):
                r, lin = jax.linearize(
                    lambda v: res_bf(v, oi), xi.astype(jnp.bfloat16))
                J = jax.vmap(lin)(
                    jnp.eye(n, dtype=jnp.bfloat16)).T.astype(jnp.float32)
                J = J * mask[None, :]
                return J.T @ J, J.T @ r.astype(jnp.float32)
            JtJ, g = jax.vmap(one)(x, bf["obs"])
            return x + 0.0 * g * jnp.mean(JtJ)
        return jax.lax.fori_loop(0, K, body, x)
    out["linearize_assemble_bf16_us"] = timed(
        "linearize+JtJ[bf16]", chain_lin_bf, x0)

    # (k) the analytic Jacobian path (energy.residual_jacobian):
    # closed-form chain/decoder Jacobians + shallow row tails.
    if E.analytic_jac_ok(spec, sess.assets):
        def chain_ana(x):
            def body(_, x):
                def one(xi, oi):
                    r, Jm = E.residual_jacobian(
                        spec, sess.assets, sess.cameras, oi, weights,
                        sess.vposer, sess.gmm, xi)
                    Jm = Jm * mask[None, :]
                    return Jm.T @ Jm, Jm.T @ r
                JtJ, g = jax.vmap(one)(x, obs)
                return x + 0.0 * g * jnp.mean(JtJ)
            return jax.lax.fori_loop(0, K, body, x)
        out["analytic_rJ_us"] = timed("analytic r+J+JtJ", chain_ana, x0)

        def chain_step_ana(x):
            def body(_, x):
                def one(xi, oi):
                    r, Jm = E.residual_jacobian(
                        spec, sess.assets, sess.cameras, oi, weights,
                        sess.vposer, sess.gmm, xi)
                    Jm = Jm * mask[None, :]
                    JtJ, g = Jm.T @ Jm, Jm.T @ r
                    diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
                    A = JtJ + 1e-3 * jnp.diag(diag) + 1e-12 * eye
                    dx = -_solve_spd(A, g, cfg.lm.linsolve,
                                     cfg.lm.schulz_iters) * mask
                    xn = xi + dx
                    rn = res1(xn, oi)
                    ok = jnp.sum(rn * rn) < jnp.sum(r * r)
                    return jnp.where(ok, xn, xi)
                return jax.vmap(one)(x, obs)
            return jax.lax.fori_loop(0, K, body, x)
        out["full_classic_step_analytic_us"] = timed(
            "full_classic_step[analytic]", chain_step_ana, x0)

        # split: decoder Jacobian / joint Jacobian / shallow row tails
        from mvsmplfitting_tpu.models import vposer as Vp
        from mvsmplfitting_tpu.models.joint_jac import joint_jacobian

        def chain_decjac(z):
            def body(_, z):
                bp, D = jax.vmap(
                    lambda zi: Vp.decode_jac(sess.vposer, zi))(z)
                return z * (1.0 + 0.0 * (jnp.mean(D) + jnp.mean(bp)))
            return jax.lax.fori_loop(0, K, body, z)
        out["ana_decode_jac_us"] = timed("ana decode_jac", chain_decjac,
                                         x0[:, :32])

        def chain_jjac(x):
            def body(_, x):
                def one(xi, oi):
                    params, z = E.unpack(spec, xi)
                    bp = Vp.decode(sess.vposer, z)
                    j, blk = joint_jacobian(sess.assets.joint_model,
                                            params, bp)
                    return jnp.sum(j) + sum(jnp.sum(v)
                                            for v in blk.values())
                s = jax.vmap(one)(x, obs)
                return x * (1.0 + 0.0 * jnp.mean(s))
            return jax.lax.fori_loop(0, K, body, x)
        out["ana_joint_jac_us"] = timed("ana joint_jacobian", chain_jjac,
                                        x0)

        def chain_rows(x):
            def body(_, x):
                def one(xi, oi):
                    params, z = E.unpack(spec, xi)
                    bp = Vp.decode(sess.vposer, z)
                    from mvsmplfitting_tpu.models.joint_model import (
                        joint_forward)
                    j = joint_forward(sess.assets.joint_model, params,
                                      bp)
                    r, lin = jax.linearize(
                        lambda q: E._data_rows_from_joints(
                            spec, sess.cameras, oi, weights, q), j)
                    Jd = jax.vmap(lin)(
                        jnp.zeros((n,) + j.shape, xi.dtype) + xi[0] * 0)
                    return jnp.sum(Jd) + jnp.sum(r)
                s = jax.vmap(one)(x, obs)
                return x * (1.0 + 0.0 * jnp.mean(s))
            return jax.lax.fori_loop(0, K, body, x)
        out["ana_data_rows_us"] = timed("ana data-rows lin", chain_rows,
                                        x0)

    # (d) one full classic-LM step equivalent (lin + solve + trial)
    def chain_step(x):
        def body(_, x):
            def one(xi, oi):
                r, lin = jax.linearize(lambda v: res1(v, oi), xi)
                J = jax.vmap(lin)(eye).T * mask[None, :]
                JtJ, g = J.T @ J, J.T @ r
                diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
                A = JtJ + 1e-3 * jnp.diag(diag) + 1e-12 * eye
                dx = -_solve_spd(A, g, cfg.lm.linsolve,
                                 cfg.lm.schulz_iters) * mask
                xn = xi + dx
                rn = res1(xn, oi)
                ok = jnp.sum(rn * rn) < jnp.sum(r * r)
                return jnp.where(ok, xn, xi)
            return jax.vmap(one)(x, obs)
        return jax.lax.fori_loop(0, K, body, x)
    out["full_classic_step_us"] = timed("full_classic_step",
                                        chain_step, x0)

    print(json.dumps({"metric": "iter_breakdown", "batch": batch,
                      "K": K, "per_step_us": out}))


if __name__ == "__main__":
    main()
