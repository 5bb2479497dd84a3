"""First-order solvers (adam / rmsprop / sgd) for the staged fit.

Completes the reference's optimizer factory surface
(`code/optimizers/optim_factory.py:27-65`): besides the primary LM
solver (`lm.py`) and the strong-Wolfe L-BFGS parity solver
(`lbfgs.py`), any of the reference's first-order optimizers can drive a
stage.  Hyper-parameter defaults mirror the factory's (lr=1e-3,
Adam betas 0.9/0.999, RMSprop alpha 0.99 + momentum 0.9, SGD Nesterov
momentum 0.9).

TPU-first construction: the optimizer is an optax gradient transform,
the whole stage is one `lax.while_loop` of value_and_grad steps with
the reference monitor's stop rules (ftol / gtol / NaN —
`fitting.py:99-117`) as carried state, so it jits/vmaps exactly like
the other solvers.  Frozen parameters are masked out of the update.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class GradientOptions:
    """Static options for a first-order stage (jit-key fields)."""

    optim_type: str = struct.field(pytree_node=False, default="adam")
    lr: float = struct.field(pytree_node=False, default=1e-3)
    max_iters: int = struct.field(pytree_node=False, default=300)
    ftol: float = struct.field(pytree_node=False, default=1e-9)
    gtol: float = struct.field(pytree_node=False, default=1e-7)
    # Factory defaults (`optim_factory.py:29-39`).
    momentum: float = struct.field(pytree_node=False, default=0.9)
    beta1: float = struct.field(pytree_node=False, default=0.9)
    beta2: float = struct.field(pytree_node=False, default=0.999)
    epsilon: float = struct.field(pytree_node=False, default=1e-8)
    rmsprop_alpha: float = struct.field(pytree_node=False, default=0.99)
    use_nesterov: bool = struct.field(pytree_node=False, default=True)


def make_transform(opts: GradientOptions) -> optax.GradientTransformation:
    """The optax equivalent of `create_optimizer` (`optim_factory.py:44-65`)."""
    t = opts.optim_type
    if t == "adam":
        return optax.adam(opts.lr, b1=opts.beta1, b2=opts.beta2,
                          eps=opts.epsilon)
    if t == "rmsprop":
        return optax.rmsprop(opts.lr, decay=opts.rmsprop_alpha,
                             eps=opts.epsilon, momentum=opts.momentum)
    if t == "sgd":
        return optax.sgd(opts.lr, momentum=opts.momentum,
                         nesterov=opts.use_nesterov)
    raise ValueError(f"Optimizer {t} not supported!")


def gradient_fit(fg: Callable[[jnp.ndarray],
                              Tuple[jnp.ndarray, jnp.ndarray]],
                 x0: jnp.ndarray,
                 mask: jnp.ndarray,
                 opts: GradientOptions = GradientOptions(),
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize a scalar energy with a first-order optimizer.

    Args:
      fg: x -> (loss, grad) (from `jax.value_and_grad`).
      mask: (n,) 1.0 free / 0.0 frozen entries.

    Returns:
      (x_final, final loss).
    """
    tx = make_transform(opts)

    def step(state):
        x, opt_state, prev_loss, it, done = state
        loss, g = fg(x)
        g = g * mask
        updates, opt_state = tx.update(g, opt_state, x)
        new_x = x + updates * mask

        rel = jnp.abs(prev_loss - loss) / jnp.maximum(
            jnp.maximum(jnp.abs(prev_loss), jnp.abs(loss)), 1.0)
        done = (done | (rel <= opts.ftol) |
                (jnp.max(jnp.abs(g)) < opts.gtol) | ~jnp.isfinite(loss))
        new_x = jnp.where(done, x, new_x)
        return (new_x, opt_state, loss, it + 1, done)

    def cond(state):
        return (state[3] < opts.max_iters) & ~state[4]

    init = (x0, tx.init(x0), jnp.asarray(jnp.inf, x0.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    x, _, _, _, _ = jax.lax.while_loop(cond, step, init)
    loss, _ = fg(x)
    return x, loss
