"""Chip gate for the fused Pallas joint-Jacobian kernel.

CPU interpret mode validates none of Mosaic (CLAUDE.md), so this tool
is the mandatory step before `ops/joint_kernel._DEFAULT_ON` can flip:

    timeout 1700 python tools/bench_joint_kernel.py [batch] [K]

It (a) compiles + runs the kernel on the REAL chip and checks
exactness against the XLA analytic form at the same operating point
(tolerance: fp32 reassociation, the documented fori/while-class
spread), then (b) times kernel-vs-XLA `joint_jacobian`, the analytic
r+J with both paths, and a full classic LM step — each chained K times
inside one jitted fori_loop (dependent carry), the same method as
`tools/bench_iter_breakdown.py`.
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
    from mvsmplfitting_tpu.models import vposer as Vp
    from mvsmplfitting_tpu.models.joint_jac import joint_jacobian
    from mvsmplfitting_tpu.ops import joint_kernel as JK

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sess, obs1, img_h = _real_problem()
    cfg = sess.fit_config
    spec = cfg.spec
    jm = sess.assets.joint_model
    weights = default_stages(cfg, jnp.asarray(img_h, jnp.float32))[-1]
    print(f"device={jax.devices()[0]} batch={batch} K={K}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    n = E.free_mask(spec).shape[0]
    x0 = jnp.tile(jnp.asarray(rng.normal(0, 0.05, (n,)), jnp.float32),
                  (batch, 1))
    obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), obs1)
    mask = E.free_mask(spec)

    def theta_of(x):
        params, z = E.unpack(spec, x)
        bp = Vp.decode(sess.vposer, z)
        return (jnp.concatenate([params.global_orient, bp]),
                params.betas, params.scale)

    th, be, sc = jax.vmap(theta_of)(x0)

    # ---- (a) exactness on the chip --------------------------------
    # The XLA reference must run full-fp32 matmuls for the comparison
    # to sit in the reassociation class (its default single-pass bf16
    # MXU precision carries ~4e-3 of its own error); the kernel pins
    # HIGHEST internally.  Timings below run at production precision.
    prec_ctx = jax.default_matmul_precision("highest")
    prec_ctx.__enter__()
    jk = jax.jit(lambda t, b, s: JK.joint_jacobian_batched(jm, t, b, s))
    t0 = time.perf_counter()
    j1, blk1 = jax.block_until_ready(jk(th, be, sc))
    compile_s = time.perf_counter() - t0

    def xla_one(t, b, s):
        from mvsmplfitting_tpu.models.smpl import SMPLParams
        params = SMPLParams(
            betas=b, global_orient=t[:3],
            body_pose=jnp.zeros((t.shape[0] - 3,), t.dtype),
            transl=jnp.zeros((3,), t.dtype), scale=s)
        return joint_jacobian(jm, params, t[3:])

    j0, blk0 = jax.block_until_ready(
        jax.jit(jax.vmap(xla_one))(th, be, sc))

    def relerr(a, b):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        s = max(np.abs(np.asarray(b)).max(), 1e-6)
        return float(d / s)

    errs = {"joints": relerr(j1, j0)}
    for kk in blk0:
        errs[kk] = relerr(blk1[kk], blk0[kk])
    max_err = max(errs.values())
    print(f"exactness (max rel, fp32 reassociation class): {errs}",
          file=sys.stderr)
    ok = max_err < 3e-5
    print(f"exactness {'OK' if ok else 'FAIL'} (max {max_err:.2e}), "
          f"kernel compile+first {compile_s:.1f}s", file=sys.stderr)
    prec_ctx.__exit__(None, None, None)

    # ---- (b) timings ----------------------------------------------
    def timed(name, chained_fn, carry0):
        f = jax.jit(chained_fn)
        out = f(carry0)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(carry0)
            jax.block_until_ready(out)
        per = (time.perf_counter() - t0) / reps / K * 1e6
        print(f"{name}: {per:.1f} us/step", file=sys.stderr)
        return round(per, 2)

    out = {"exact_max_rel": round(max_err, 9), "exact_ok": bool(ok),
           "kernel_compile_s": round(compile_s, 1)}

    def chain_jjac_kernel(x):
        def body(_, x):
            t, b, s = jax.vmap(theta_of)(x)
            j, blk = JK.joint_jacobian_batched(jm, t, b, s)
            acc = jnp.sum(j) + sum(jnp.sum(v) for v in blk.values())
            return x * (1.0 + 0.0 * acc)
        return jax.lax.fori_loop(0, K, body, x)
    out["kernel_jjac_us"] = timed("kernel joint_jacobian",
                                  chain_jjac_kernel, x0)

    def chain_jjac_xla(x):
        def body(_, x):
            t, b, s = jax.vmap(theta_of)(x)
            j, blk = jax.vmap(xla_one)(t, b, s)
            acc = jnp.sum(j) + sum(jnp.sum(v) for v in blk.values())
            return x * (1.0 + 0.0 * acc)
        return jax.lax.fori_loop(0, K, body, x)
    out["xla_jjac_us"] = timed("xla joint_jacobian", chain_jjac_xla, x0)

    # analytic r+J+JtJ with each path.  The chain builders return
    # FRESH function objects per flag: jax.jit's global trace cache is
    # keyed on function identity, so reusing one chain function across
    # the flag flip silently reuses the first flag's executable (the
    # r5 measurement trap — both "paths" timed identically).
    import mvsmplfitting_tpu.ops.joint_kernel as JKmod

    def make_chain_rj():
        def chain_rj(x):
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
        return chain_rj

    def make_chain_step():
        def chain_step(x):
            def body(_, x):
                def one(xi, oi):
                    r, Jm = E.residual_jacobian(
                        spec, sess.assets, sess.cameras, oi, weights,
                        sess.vposer, sess.gmm, xi)
                    Jm = Jm * mask[None, :]
                    JtJ, g = Jm.T @ Jm, Jm.T @ r
                    diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
                    A = JtJ + 1e-3 * jnp.diag(diag) + 1e-12 * jnp.eye(n)
                    dx = -_solve_spd(A, g, cfg.lm.linsolve,
                                     cfg.lm.schulz_iters) * mask
                    return xi + dx * 0.5
                return jax.vmap(one)(x, obs)
            return jax.lax.fori_loop(0, K, body, x)
        return chain_step

    for name, flag in (("kernel", True), ("xla", False)):
        JKmod._DEFAULT_ON = flag
        fn_rj, fn_step = make_chain_rj(), make_chain_step()
        # positive control: the flag must actually switch the graph
        n_pallas = str(jax.make_jaxpr(fn_rj)(x0)).count("pallas_call")
        assert (n_pallas > 0) == flag, (name, n_pallas)
        out[f"analytic_rj_{name}_us"] = timed(
            f"analytic r+J+JtJ [{name}]", fn_rj, x0)
        out[f"classic_step_{name}_us"] = timed(
            f"classic step [{name}]", fn_step, x0)
    JKmod._DEFAULT_ON = False

    print(json.dumps({"metric": "joint_kernel", "detail": out}))


if __name__ == "__main__":
    main()
