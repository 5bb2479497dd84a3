"""Levenberg-Marquardt solver over the least-squares energy (primary).

The fitting problem is a classic robustified nonlinear least squares with
~50 unknowns (32 vposer latent + 10 betas + 3 orient + 3 transl + 1
scale) against a few hundred residual rows.  The reference grinds it with
L-BFGS + strong-Wolfe line search in a Python loop
(`code/optimizers/lbfgs_ls.py`); on TPU the natural design is LM:

* the Jacobian comes from one `jax.jacfwd` of the residual vector —
  ~50 JVPs through the SMPL forward, i.e. a batch-50 model evaluation
  whose matmuls tile straight onto the MXU;
* the normal equations are a tiny dense solve (n x n, n ~ 50);
* damping adaptation is branch-free carried state inside a bounded
  `lax.while_loop`, so the whole multi-stage fit jits as one program and
  vmaps over a frame batch with no host round-trips.

Frozen parameters (fix_scale / fix_shape) are handled by masking their
Jacobian columns and pinning the diagonal, which reproduces the
reference's `requires_grad=False` freezing (`init_guess.py:190-212`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LMOptions:
    max_iters: int = struct.field(pytree_node=False, default=60)
    ftol: float = struct.field(pytree_node=False, default=1e-9)
    gtol: float = struct.field(pytree_node=False, default=1e-9)
    init_lambda: float = struct.field(pytree_node=False, default=1e-3)
    lambda_up: float = struct.field(pytree_node=False, default=10.0)
    lambda_down: float = struct.field(pytree_node=False, default=0.2)
    max_lambda: float = struct.field(pytree_node=False, default=1e10)
    min_lambda: float = struct.field(pytree_node=False, default=1e-10)
    # Speculative ("delayed gratification") mode: ONE residual
    # evaluation per iteration instead of two.  The step taken at
    # iteration k is judged by iteration k+1's linearization primal; a
    # worsening step rolls back and costs one iteration.  Cuts the
    # latency-bound per-iteration graph ~1/3 (the trial evaluation
    # disappears); acceptance decisions can differ from classic LM, so
    # convergence is validated end-to-end rather than bitwise.
    # Default ON: chip-validated at +36% over classic/chol at equal
    # final energies (BENCH_NOTES r3 solver table); exactness-anchored
    # tests pin speculative=False explicitly.  `fit_people` forces it
    # off internally (stiff collision refinement degrades under
    # speculative judging — multi_person.py:182-186).
    speculative: bool = struct.field(pytree_node=False, default=True)
    # Normal-equation solver: "lu" (jnp.linalg.solve), "chol"
    # (Cholesky — A is SPD by construction; measured +37% fit
    # throughput on the chip vs LU's sequential lowering), or
    # "schulz" (Newton-Schulz iterated inverse: pure batched matmuls,
    # no sequential triangular loops — +79% on the chip).  Default
    # "schulz" = the production path (chip r3: 395 fps vs chol 259 at
    # +0.64% loss); tests keep "chol" as the exactness anchor.
    linsolve: str = struct.field(pytree_node=False, default="schulz")
    # Newton-Schulz iteration count.  With Jacobi preconditioning and
    # the I/||A~||_1 init, 12 reaches fp32 round-off for cond(A~) up to
    # ~1e7 (measured); the earlier unpreconditioned A^T/(||A||_1
    # ||A||_inf) form needed 26 and still lost all accuracy on badly
    # row/column-scaled systems (rel err ~1 at cond 1e5+ with mixed
    # parameter scales).
    schulz_iters: int = struct.field(pytree_node=False, default=12)
    # Jacobian mode: "analytic" (closed-form chain generators + decoder
    # composition, `energy.residual_jacobian` — used when the energy
    # qualifies, see `energy.analytic_jac_ok`; callers fall back to
    # "ad" per stage otherwise) or "ad" (jax.linearize + n vmapped JVP
    # columns).  Chip r4: analytic classic step 1.82 ms vs AD 4.48 ms
    # at B=128 after the elementwise-chain rewrites; exactness vs AD is
    # tested, and `MVSF_LM_JAC=ad` flips the session default back for
    # A/B (docs/BENCH_NOTES.md r4).
    jac: str = struct.field(pytree_node=False, default="analytic")


def _solve_spd(A: jnp.ndarray, b: jnp.ndarray, method: str,
               schulz_iters: int = 12) -> jnp.ndarray:
    """Solve A x = b for damped-SPD A by the configured method."""
    if method == "chol":
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    if method == "schulz":
        # Jacobi-preconditioned Newton-Schulz: rescale to unit
        # diagonal (A~ = D^-1/2 A D^-1/2 — near the best diagonal
        # scaling for SPD A), then X_{k+1} = X_k (2I - A~ X_k) from
        # X_0 = I / ||A~||_1 (valid since lambda_max <= ||.||_1 for
        # symmetric matrices; the identity init's error spectrum is
        # 1 - lambda_i/||A~||_1, a factor ~cond better than the
        # classic A^T/(||A||_1 ||A||_inf) start).  Measured in fp32:
        # 12 iterations reach round-off for cond(A~) up to ~1e7; the
        # r1 unpreconditioned A^T form needed 26 and silently lost ALL
        # accuracy when parameter scales differed by >~1e2.  The whole
        # solve is batched matmuls (MXU) instead of XLA's sequential
        # LU/triangular-solve chains — the latency-friendly option for
        # these tiny ~50x50 systems.
        n = A.shape[0]
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(A), 1e-30))
        At = A / (d[:, None] * d[None, :])
        eye = jnp.eye(n, dtype=A.dtype)
        X = eye / jnp.maximum(jnp.sum(jnp.abs(At), 0).max(), 1e-30)
        I2 = 2.0 * eye
        for _ in range(schulz_iters):
            X = X @ (I2 - At @ X)
        return (X @ (b / d)) / d
    return jnp.linalg.solve(A, b)


def _spd_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a damped-SPD matrix via Cholesky (no LU pivoting —
    XLA's `jnp.linalg.inv` lowers to a sequential pivoted LU chain)."""
    n = A.shape[-1]
    L = jnp.linalg.cholesky(A)
    eye = jnp.eye(n, dtype=A.dtype)
    y = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


class _LMState(NamedTuple):
    x: jnp.ndarray
    loss: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def lm_fit(residual_fn: Callable[..., jnp.ndarray],
           x0: jnp.ndarray,
           mask: jnp.ndarray,
           opts: LMOptions = LMOptions(),
           aux_fn: Optional[Callable[[jnp.ndarray], object]] = None,
           jac_fn: Optional[Callable[[jnp.ndarray],
                                     Tuple[jnp.ndarray, jnp.ndarray]]]
           = None,
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize ``sum(residual_fn(x)**2)`` from ``x0``.

    Args:
      residual_fn: x (n,) -> r (m,); must be jit-traceable.  With
        `aux_fn`, the signature is ``residual_fn(x, aux)``.
      mask: (n,) 1.0 for free parameters, 0.0 for frozen.
      aux_fn: optional per-ITERATION auxiliary state, computed once
        from the iterate (under stop_gradient) and held fixed through
        the linearization AND the trial evaluation of that iteration.
        This is the lagged-SDF hook: voxelizing the collision grids
        once per LM iteration instead of once per residual evaluation
        halves the dominant voxelization cost while keeping the
        reference's sampling semantics (phi is gradient-detached there
        anyway, `sdf/sdf/sdf.py:17-19`).

    Returns:
      (x_final (n,), final loss ()).
    """
    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)
    if jac_fn is not None and aux_fn is not None:
        raise ValueError("jac_fn (analytic Jacobian) does not cover "
                         "aux-state residuals (lagged SDF)")

    if aux_fn is None:
        def res(x, aux):
            return residual_fn(x)

        def make_aux(x):
            return ()
    else:
        res = residual_fn

        def make_aux(x):
            return jax.tree.map(jax.lax.stop_gradient, aux_fn(x))

    def loss_of(x, aux):
        r = res(x, aux)
        return jnp.sum(r * r)

    def r_and_J(x, aux):
        if jac_fn is not None:
            r, J = jac_fn(x)
        else:
            # linearize shares the primal trace between r and the n JVPs
            # (one residual evaluation fewer per iteration than jacfwd +
            # a separate primal call).
            r, lin = jax.linearize(lambda v: res(v, aux), x)
            J = jax.vmap(lin)(eye).T                # (m, n)
        return r, J * mask[None, :]

    def step(state: _LMState) -> _LMState:
        aux = make_aux(state.x)
        r, J = r_and_J(state.x, aux)
        g = J.T @ r                       # (n,) gradient/2
        JtJ = J.T @ J

        # Marquardt scaling: lam * diag(JtJ) (with a floor so frozen /
        # flat directions stay well-posed).
        diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
        A = JtJ + state.lam * jnp.diag(diag) + 1e-12 * eye
        dx = -_solve_spd(A, g, opts.linsolve,
                         opts.schulz_iters) * mask

        new_x = state.x + dx
        new_loss = loss_of(new_x, aux)
        # Compare against the loss under THIS iteration's aux (the
        # carried loss may have been computed under a stale grid).
        loss_here = jnp.sum(r * r)
        accept = jnp.isfinite(new_loss) & (new_loss < loss_here)

        x = jnp.where(accept, new_x, state.x)
        loss = jnp.where(accept, new_loss, loss_here)
        lam = jnp.clip(
            jnp.where(accept, state.lam * opts.lambda_down,
                      state.lam * opts.lambda_up),
            opts.min_lambda, opts.max_lambda)

        # Stop rules mirroring the reference monitor (`fitting.py:99-117`):
        # relative f-change below ftol (only on accepted steps), max |grad|
        # below gtol, or NaN/Inf.  `loss_here` (this iteration's aux)
        # rather than the carried loss, so a lagged-aux refresh never
        # fakes an f-change.
        rel = jnp.abs(loss_here - new_loss) / jnp.maximum(
            jnp.maximum(jnp.abs(loss_here), jnp.abs(new_loss)), 1.0)
        small_f = accept & (rel <= opts.ftol)
        small_g = jnp.max(jnp.abs(g)) < opts.gtol
        bad = ~jnp.isfinite(new_loss) & ~jnp.isfinite(loss_here)
        done = state.done | small_f | small_g | bad
        return _LMState(x=x, loss=loss, lam=lam, it=state.it + 1, done=done)

    def cond(state: _LMState):
        return (state.it < opts.max_iters) & ~state.done

    if opts.speculative:
        return _lm_fit_speculative(res, make_aux, x0, mask, opts, eye,
                                   jac_fn=jac_fn)

    init = _LMState(x=x0, loss=loss_of(x0, make_aux(x0)),
                    lam=jnp.asarray(opts.init_lambda, x0.dtype),
                    it=jnp.zeros((), jnp.int32),
                    done=jnp.zeros((), jnp.bool_))
    final = jax.lax.while_loop(cond, step, init)
    return final.x, final.loss


def _lm_fit_speculative(res, make_aux, x0, mask, opts: LMOptions, eye,
                        jac_fn=None):
    """Single-evaluation-per-iteration LM (see LMOptions.speculative).

    Carried state: (x, x_prev, f_prev, lam, it, done, moved).  `x` may
    hold a PENDING step whose quality is unknown; the next iteration's
    linearization primal judges it: worse -> roll back to x_prev and
    bump lambda (that Jacobian is discarded — one wasted iteration per
    rejection); better -> shrink lambda and solve the next step from
    the already-computed linearization.
    """
    n = x0.shape[0]

    def step(state):
        x, x_prev, f_prev, lam, it, done, moved = state
        if jac_fn is not None:
            # lm_fit guarantees aux_fn is None here — no aux to build.
            r, J = jac_fn(x)
        else:
            aux = make_aux(x)
            r, lin = jax.linearize(lambda v: res(v, aux), x)
            J = jax.vmap(lin)(eye).T
        f = jnp.sum(r * r)

        worse = moved & ((f >= f_prev) | ~jnp.isfinite(f))
        rel = jnp.abs(f_prev - f) / jnp.maximum(
            jnp.maximum(jnp.abs(f_prev), jnp.abs(f)), 1.0)
        small_f = moved & ~worse & (rel <= opts.ftol)

        J = J * mask[None, :]
        g = J.T @ r
        JtJ = J.T @ J
        lam = jnp.clip(
            jnp.where(worse, lam * opts.lambda_up,
                      jnp.where(moved, lam * opts.lambda_down, lam)),
            opts.min_lambda, opts.max_lambda)
        diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
        A = JtJ + lam * jnp.diag(diag) + 1e-12 * eye
        dx = -_solve_spd(A, g, opts.linsolve,
                         opts.schulz_iters) * mask

        small_g = ~worse & (jnp.max(jnp.abs(g)) < opts.gtol)
        done = done | small_f | small_g

        # Rollback keeps (x_prev, f_prev); acceptance commits (x, f)
        # as the new reference and speculates x + dx.
        new_x = jnp.where(worse | done, jnp.where(worse, x_prev, x),
                          x + dx)
        ref_x = jnp.where(worse, x_prev, x)
        ref_f = jnp.where(worse, f_prev, f)
        return (new_x, ref_x, ref_f, lam, it + 1, done, ~worse & ~done)

    init = (x0, x0, jnp.asarray(jnp.inf, x0.dtype),
            jnp.asarray(opts.init_lambda, x0.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
            jnp.zeros((), jnp.bool_))
    x, ref_x, ref_f, *_ = jax.lax.while_loop(
        lambda s: (s[4] < opts.max_iters) & ~s[5], step, init)

    # The final x may hold an unjudged pending step — settle it with
    # one extra evaluation (once per fit, not per iteration).
    r_fin = res(x, make_aux(x))
    f_fin = jnp.sum(r_fin * r_fin)
    better = jnp.isfinite(f_fin) & (f_fin <= ref_f)
    return (jnp.where(better, x, ref_x), jnp.where(better, f_fin, ref_f))


def lm_fit_staged(residual_fn: Callable[[jnp.ndarray, object],
                                        jnp.ndarray],
                  x0: jnp.ndarray,
                  mask: jnp.ndarray,
                  weights_table,
                  num_stages: int,
                  opts: LMOptions = LMOptions(),
                  jac_fn: Optional[Callable[[jnp.ndarray, object],
                                            Tuple[jnp.ndarray,
                                                  jnp.ndarray]]] = None,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All annealing stages in ONE `lax.while_loop` — the fused form.

    `residual_fn(x, weights)` is traced once; per-iteration weights are
    gathered from `weights_table` (a StageWeights pytree with a leading
    stage axis) by the carried stage index.  A stage advances when its
    relative-improvement / gradient / iteration budget trips, resetting
    the damping.  The accept test compares against sum(r^2) of the
    primal residual already computed for the Jacobian, so no stale
    carried loss crosses a weight switch.

    Compared to unrolling stages into 4 sequential loops this compiles
    ~4x less graph (minutes saved through the TPU tunnel) and runs the
    same math.

    Returns (x_final, per-stage final losses (num_stages,)).
    """
    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def w_at(s):
        return jax.tree.map(lambda a: a[s], weights_table)

    def step(state):
        x, lam, it, stage, stage_losses = state
        w = w_at(stage)

        def res(xv):
            return residual_fn(xv, w)

        if jac_fn is not None:
            r, J = jac_fn(x, w)
        else:
            r, lin = jax.linearize(res, x)
            J = jax.vmap(lin)(eye).T
        J = J * mask[None, :]
        loss_old = jnp.sum(r * r)
        g = J.T @ r
        JtJ = J.T @ J

        diag = jnp.maximum(jnp.diagonal(JtJ), 1e-8)
        A = JtJ + lam * jnp.diag(diag) + 1e-12 * eye
        dx = -_solve_spd(A, g, opts.linsolve,
                         opts.schulz_iters) * mask

        new_x = x + dx
        r_new = res(new_x)
        new_loss = jnp.sum(r_new * r_new)
        accept = jnp.isfinite(new_loss) & (new_loss < loss_old)

        x = jnp.where(accept, new_x, x)
        lam = jnp.clip(
            jnp.where(accept, lam * opts.lambda_down,
                      lam * opts.lambda_up),
            opts.min_lambda, opts.max_lambda)

        rel = jnp.abs(loss_old - new_loss) / jnp.maximum(
            jnp.maximum(jnp.abs(loss_old), jnp.abs(new_loss)), 1.0)
        cur_loss = jnp.where(accept, new_loss, loss_old)
        stage_done = ((accept & (rel <= opts.ftol)) |
                      (jnp.max(jnp.abs(g)) < opts.gtol) |
                      (it + 1 >= opts.max_iters) |
                      ~jnp.isfinite(new_loss))

        stage_losses = stage_losses.at[stage].set(cur_loss)
        stage = stage + stage_done.astype(jnp.int32)
        it = jnp.where(stage_done, 0, it + 1)
        lam = jnp.where(stage_done,
                        jnp.asarray(opts.init_lambda, x0.dtype), lam)
        return (x, lam, it, stage, stage_losses)

    def cond(state):
        return state[3] < num_stages

    init = (x0, jnp.asarray(opts.init_lambda, x0.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.full((num_stages,), jnp.inf, x0.dtype))
    x, _, _, _, stage_losses = jax.lax.while_loop(cond, step, init)
    return x, stage_losses
