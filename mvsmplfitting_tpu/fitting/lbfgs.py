"""L-BFGS with strong-Wolfe line search, fully jitted (parity solver).

The reference's default optimizer is a history-100 L-BFGS with a
cubic-interpolating strong-Wolfe line search driven from a Python loop
(`code/optimizers/lbfgs_ls.py`, `optim_factory.py:50-52`).  This module
implements the same algorithm (Nocedal & Wright Alg. 3.5/3.6 bracketing
+ zoom) as carried state inside `lax.while_loop`s, so the entire
optimization — including the data-dependent line search — compiles to
one XLA program: no host round-trips per iteration, vmappable over a
frame batch, shardable over a device mesh.

It exists for behavioral parity with the reference; the primary solver
is Levenberg-Marquardt (`lm.py`), which exploits the least-squares
structure the reference ignores.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LBFGSOptions:
    max_iters: int = struct.field(pytree_node=False, default=120)
    history: int = struct.field(pytree_node=False, default=16)
    lr: float = struct.field(pytree_node=False, default=1.0)
    ftol: float = struct.field(pytree_node=False, default=1e-9)
    gtol: float = struct.field(pytree_node=False, default=1e-9)
    tol_change: float = struct.field(pytree_node=False, default=1e-9)
    max_ls: int = struct.field(pytree_node=False, default=25)
    c1: float = struct.field(pytree_node=False, default=1e-4)
    c2: float = struct.field(pytree_node=False, default=0.9)


def _cubic_min(x1, f1, g1, x2, f2, g2, lo, hi):
    """Minimizer of the cubic through (x1,f1,g1),(x2,f2,g2), clamped.

    Standard cubic interpolation (same formula the torch line search
    uses); falls back to bisection when the cubic is degenerate.
    """
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_sq = d1 * d1 - g1 * g2
    ok = d2_sq >= 0
    d2 = jnp.sqrt(jnp.maximum(d2_sq, 0.0)) * jnp.sign(x2 - x1)
    t = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
    t = jnp.where(ok & jnp.isfinite(t), t, 0.5 * (lo + hi))
    return jnp.clip(t, lo, hi)


class _LSState(NamedTuple):
    phase: jnp.ndarray      # 0 bracketing, 1 zoom, 2 done
    it: jnp.ndarray
    t: jnp.ndarray
    f_t: jnp.ndarray
    g_t: jnp.ndarray        # full gradient at t
    gtd_t: jnp.ndarray
    t_prev: jnp.ndarray
    f_prev: jnp.ndarray
    gtd_prev: jnp.ndarray
    # zoom bracket: (lo, hi) endpoints with f and directional derivative
    bt: jnp.ndarray         # (2,)
    bf: jnp.ndarray         # (2,)
    bg: jnp.ndarray         # (2,)
    insuf: jnp.ndarray      # zoom making insufficient progress flag


def _strong_wolfe(eval_fn: Callable, x: jnp.ndarray, d: jnp.ndarray,
                  f0: jnp.ndarray, gtd0: jnp.ndarray, t0: jnp.ndarray,
                  opts: LBFGSOptions):
    """Find t satisfying the strong Wolfe conditions along d from x.

    eval_fn(t) -> (f, grad) at x + t*d.  Returns (t, f, grad).
    """
    c1, c2 = opts.c1, opts.c2

    def eval_t(t):
        f, g = eval_fn(t)
        return f, g, jnp.dot(g, d)

    f_a, g_a, gtd_a = eval_t(t0)

    init = _LSState(
        phase=jnp.zeros((), jnp.int32), it=jnp.ones((), jnp.int32),
        t=t0, f_t=f_a, g_t=g_a, gtd_t=gtd_a,
        t_prev=jnp.zeros_like(t0), f_prev=f0, gtd_prev=gtd0,
        bt=jnp.zeros((2,)), bf=jnp.zeros((2,)), bg=jnp.zeros((2,)),
        insuf=jnp.zeros((), jnp.bool_))

    def bracket_step(s: _LSState) -> _LSState:
        armijo_fail = (s.f_t > f0 + c1 * s.t * gtd0) | \
                      ((s.it > 1) & (s.f_t >= s.f_prev))
        wolfe_ok = jnp.abs(s.gtd_t) <= -c2 * gtd0
        ascending = s.gtd_t >= 0

        to_zoom = armijo_fail | (~wolfe_ok & ascending)
        done = ~armijo_fail & wolfe_ok

        # zoom bracket endpoints: on armijo failure (prev, t); on positive
        # slope (t, prev).
        bt = jnp.where(armijo_fail, jnp.stack([s.t_prev, s.t]),
                       jnp.stack([s.t, s.t_prev]))
        bf = jnp.where(armijo_fail, jnp.stack([s.f_prev, s.f_t]),
                       jnp.stack([s.f_t, s.f_prev]))
        bg = jnp.where(armijo_fail, jnp.stack([s.gtd_prev, s.gtd_t]),
                       jnp.stack([s.gtd_t, s.gtd_prev]))

        # Extrapolate: cubic on (t_prev, t) bounded to [t+0.01(t-tp), 10t].
        min_step = s.t + 0.01 * (s.t - s.t_prev)
        max_step = s.t * 10.0
        t_new = _cubic_min(s.t_prev, s.f_prev, s.gtd_prev,
                           s.t, s.f_t, s.gtd_t, min_step, max_step)
        f_new, g_new, gtd_new = eval_t(t_new)

        cont = ~to_zoom & ~done
        return _LSState(
            phase=jnp.where(done, 2, jnp.where(to_zoom, 1, 0)).astype(
                jnp.int32),
            it=s.it + 1,
            t=jnp.where(cont, t_new, s.t),
            f_t=jnp.where(cont, f_new, s.f_t),
            g_t=jnp.where(cont, g_new, s.g_t),
            gtd_t=jnp.where(cont, gtd_new, s.gtd_t),
            t_prev=jnp.where(cont, s.t, s.t_prev),
            f_prev=jnp.where(cont, s.f_t, s.f_prev),
            gtd_prev=jnp.where(cont, s.gtd_t, s.gtd_prev),
            bt=bt, bf=bf, bg=bg, insuf=s.insuf)

    def zoom_step(s: _LSState) -> _LSState:
        lo_t, hi_t = s.bt[0], s.bt[1]
        left = jnp.minimum(lo_t, hi_t)
        right = jnp.maximum(lo_t, hi_t)
        width = right - left
        t_new = _cubic_min(lo_t, s.bf[0], s.bg[0], hi_t, s.bf[1], s.bg[1],
                           left, right)
        # Safeguard against stagnating at the bracket edge (torch-style
        # 0.1*width nudge with an insufficient-progress latch).
        eps = 0.1 * width
        close = jnp.minimum(right - t_new, t_new - left) < eps
        nudged = jnp.where(t_new > 0.5 * (left + right),
                           right - eps, left + eps)
        t_new = jnp.where(s.insuf & close, nudged, t_new)
        insuf = close & ~s.insuf

        f_new, g_new, gtd_new = eval_t(t_new)
        armijo_fail = (f_new > f0 + c1 * t_new * gtd0) | (f_new >= s.bf[0])
        wolfe_ok = jnp.abs(gtd_new) <= -c2 * gtd0
        done = ~armijo_fail & wolfe_ok

        # Bracket update (Alg 3.6): on armijo failure, hi <- t_new;
        # otherwise lo <- t_new (and hi <- old lo if derivative sign says
        # the minimum is on the other side).
        flip = ~armijo_fail & (gtd_new * (hi_t - lo_t) >= 0)
        new_hi_t = jnp.where(armijo_fail, t_new,
                             jnp.where(flip, lo_t, hi_t))
        new_hi_f = jnp.where(armijo_fail, f_new,
                             jnp.where(flip, s.bf[0], s.bf[1]))
        new_hi_g = jnp.where(armijo_fail, gtd_new,
                             jnp.where(flip, s.bg[0], s.bg[1]))
        new_lo_t = jnp.where(armijo_fail, lo_t, t_new)
        new_lo_f = jnp.where(armijo_fail, s.bf[0], f_new)
        new_lo_g = jnp.where(armijo_fail, s.bg[0], gtd_new)

        # Track the best (lo) point as the running answer.
        take = done | ~armijo_fail
        return _LSState(
            phase=jnp.where(done, 2, 1).astype(jnp.int32),
            it=s.it + 1,
            t=jnp.where(take, t_new, s.t),
            f_t=jnp.where(take, f_new, s.f_t),
            g_t=jnp.where(take, g_new, s.g_t),
            gtd_t=jnp.where(take, gtd_new, s.gtd_t),
            t_prev=s.t_prev, f_prev=s.f_prev, gtd_prev=s.gtd_prev,
            bt=jnp.stack([new_lo_t, new_hi_t]),
            bf=jnp.stack([new_lo_f, new_hi_f]),
            bg=jnp.stack([new_lo_g, new_hi_g]),
            insuf=insuf)

    def body(s: _LSState) -> _LSState:
        return jax.lax.cond(s.phase == 0, bracket_step, zoom_step, s)

    def cond(s: _LSState):
        return (s.phase != 2) & (s.it < opts.max_ls)

    out = jax.lax.while_loop(cond, body, init)
    return out.t, out.f_t, out.g_t


class _State(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    S: jnp.ndarray          # (m, n) s-history ring buffer
    Y: jnp.ndarray          # (m, n)
    rho: jnp.ndarray        # (m,)
    count: jnp.ndarray      # entries written
    it: jnp.ndarray
    done: jnp.ndarray


def lbfgs_fit(value_and_grad_fn: Callable[[jnp.ndarray],
                                          Tuple[jnp.ndarray, jnp.ndarray]],
              x0: jnp.ndarray,
              mask: jnp.ndarray,
              opts: LBFGSOptions = LBFGSOptions(),
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize f from x0 with strong-Wolfe L-BFGS.

    Args:
      value_and_grad_fn: x -> (f, grad).
      mask: (n,) 1.0 free / 0.0 frozen parameter entries.

    Returns:
      (x_final, f_final).
    """
    n = x0.shape[0]
    m = opts.history

    def vg(x):
        f, g = value_and_grad_fn(x)
        return f, g * mask

    def direction(s: _State) -> jnp.ndarray:
        """Two-loop recursion over the ring buffer (newest-first)."""
        q = s.g

        def hist_idx(k):
            # k-th newest entry, k in [0, used)
            return (s.count - 1 - k) % m

        used = jnp.minimum(s.count, m)

        def loop1(k, carry):
            q, alpha = carry
            i = hist_idx(k)
            valid = k < used
            a = jnp.where(valid, s.rho[i] * jnp.dot(s.S[i], q), 0.0)
            q = q - a * s.Y[i]
            return q, alpha.at[k].set(a)

        q, alpha = jax.lax.fori_loop(
            0, m, loop1, (q, jnp.zeros((m,), x0.dtype)))

        # Initial Hessian scaling gamma = s.y / y.y of the newest pair.
        newest = hist_idx(0)
        ys = jnp.dot(s.S[newest], s.Y[newest])
        yy = jnp.dot(s.Y[newest], s.Y[newest])
        gamma = jnp.where(s.count > 0, ys / jnp.maximum(yy, 1e-20), 1.0)
        r = gamma * q

        def loop2(k, r):
            kk = m - 1 - k  # oldest-first
            i = hist_idx(kk)
            valid = kk < used
            b = jnp.where(valid, s.rho[i] * jnp.dot(s.Y[i], r), 0.0)
            return r + (alpha[kk] - b) * s.S[i]

        r = jax.lax.fori_loop(0, m, loop2, r)
        return -r

    def step(s: _State) -> _State:
        d = direction(s)
        gtd = jnp.dot(s.g, d)
        # Fall back to steepest descent on a non-descent direction.
        bad_dir = gtd > -1e-20
        d = jnp.where(bad_dir, -s.g, d)
        gtd = jnp.where(bad_dir, -jnp.dot(s.g, s.g), gtd)

        # First-iteration step: min(1, 1/|g|_1) * lr, like the reference.
        t0 = jnp.where(
            s.it == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(
                jnp.sum(jnp.abs(s.g)), 1e-20)) * opts.lr,
            jnp.asarray(opts.lr, x0.dtype))

        def eval_fn(t):
            return vg(s.x + t * d)

        t, f_new, g_new = _strong_wolfe(eval_fn, s.x, d, s.f, gtd, t0, opts)

        x_new = s.x + t * d
        sk = x_new - s.x
        yk = g_new - s.g
        ys = jnp.dot(yk, sk)
        write = ys > 1e-10
        slot = s.count % m
        S = jnp.where(write, s.S.at[slot].set(sk), s.S)
        Y = jnp.where(write, s.Y.at[slot].set(yk), s.Y)
        rho = jnp.where(write, s.rho.at[slot].set(1.0 / ys), s.rho)
        count = s.count + jnp.where(write, 1, 0)

        rel = jnp.abs(s.f - f_new) / jnp.maximum(
            jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0)
        done = (jnp.max(jnp.abs(g_new)) <= opts.gtol) | \
               (jnp.max(jnp.abs(t * d)) <= opts.tol_change) | \
               (rel <= opts.ftol) | ~jnp.isfinite(f_new)
        return _State(x=x_new, f=f_new, g=g_new, S=S, Y=Y, rho=rho,
                      count=count, it=s.it + 1, done=done)

    def cond(s: _State):
        return (s.it < opts.max_iters) & ~s.done

    f0, g0 = vg(x0)
    init = _State(
        x=x0, f=f0, g=g0,
        S=jnp.zeros((m, n), x0.dtype), Y=jnp.zeros((m, n), x0.dtype),
        rho=jnp.zeros((m,), x0.dtype),
        count=jnp.zeros((), jnp.int32), it=jnp.zeros((), jnp.int32),
        done=jnp.max(jnp.abs(g0)) <= opts.gtol)
    out = jax.lax.while_loop(cond, step, init)
    return out.x, out.f
