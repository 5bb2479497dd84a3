"""VPoser pose prior: latent decoder as pure JAX + torch-snapshot converter.

The fitting path only ever *decodes* (z (32,) -> 23 axis-angle body joint
rotations); the encoder is included for completeness (sequence warm-starts
or embedding initialization from a known pose).  Architecture matches the
snapshot bundled with the reference (`code/model/VPoser.py:176-283`):
fc(32->512) -> lrelu(0.2) -> fc(512->512) -> lrelu(0.2) -> fc(512->138)
-> 6D rotation decode -> matrices -> axis-angle.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.rotations import matrix_to_axis_angle, sixd_to_matrix

LATENT_DIM = 32
NUM_JOINTS = 23
HIDDEN = 512


@struct.dataclass
class VPoserWeights:
    dec_fc1_w: jnp.ndarray  # (32, 512)   stored input-major for x @ W
    dec_fc1_b: jnp.ndarray  # (512,)
    dec_fc2_w: jnp.ndarray  # (512, 512)
    dec_fc2_b: jnp.ndarray  # (512,)
    dec_out_w: jnp.ndarray  # (512, 138)
    dec_out_b: jnp.ndarray  # (138,)
    # Encoder (optional use; zeros if unavailable).
    enc_bn1_mean: jnp.ndarray
    enc_bn1_var: jnp.ndarray
    enc_bn1_w: jnp.ndarray
    enc_bn1_b: jnp.ndarray
    enc_fc1_w: jnp.ndarray
    enc_fc1_b: jnp.ndarray
    enc_bn2_mean: jnp.ndarray
    enc_bn2_var: jnp.ndarray
    enc_bn2_w: jnp.ndarray
    enc_bn2_b: jnp.ndarray
    enc_fc2_w: jnp.ndarray
    enc_fc2_b: jnp.ndarray
    enc_mu_w: jnp.ndarray
    enc_mu_b: jnp.ndarray


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, 0.2 * x)


def decode(weights: VPoserWeights, z: jnp.ndarray) -> jnp.ndarray:
    """Decode latent z (..., 32) -> body pose axis-angle (..., 69).

    The decoder produces 23 joint rotations (69 numbers); the SMPL body
    pose is exactly 23 joints, so no wrist appending is needed (the
    bundled snapshot is the "VPoser++" variant with wrists included).
    """
    x = _lrelu(z @ weights.dec_fc1_w + weights.dec_fc1_b)
    x = _lrelu(x @ weights.dec_fc2_w + weights.dec_fc2_b)
    x = x @ weights.dec_out_w + weights.dec_out_b  # (..., 138)
    mats = sixd_to_matrix(x.reshape(x.shape[:-1] + (NUM_JOINTS, 6)))
    aa = matrix_to_axis_angle(mats)  # (..., 23, 3)
    return aa.reshape(z.shape[:-1] + (NUM_JOINTS * 3,))


def decode_jac(weights: VPoserWeights, z: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode z (32,) -> (body_pose (69,), d body_pose / d z (69, 32)).

    The Jacobian is composed analytically through the MLP (two
    row-scaled matmuls instead of 32 forward-mode AD columns — the MLP
    tangents are the one FLOP-bound piece of the fitting iteration,
    docs/BENCH_NOTES.md r4), with the shallow 6D->matrix->axis-angle
    tail differentiated by AD per joint (6 columns of a tiny graph).
    Exact: tested against ``jax.jacfwd(decode)`` to fp32 round-off.
    """
    h1p = z @ weights.dec_fc1_w + weights.dec_fc1_b
    g1 = jnp.where(h1p >= 0, 1.0, 0.2)
    h1 = jnp.where(h1p >= 0, h1p, 0.2 * h1p)
    h2p = h1 @ weights.dec_fc2_w + weights.dec_fc2_b
    g2 = jnp.where(h2p >= 0, 1.0, 0.2)
    h2 = jnp.where(h2p >= 0, h2p, 0.2 * h2p)
    o = h2 @ weights.dec_out_w + weights.dec_out_b        # (138,)

    D1 = g1[:, None] * weights.dec_fc1_w.T                # (512, 32)
    D2 = g2[:, None] * (weights.dec_fc2_w.T @ D1)         # (512, 32)
    Do = weights.dec_out_w.T @ D2                         # (138, 32)

    def tail(o6):
        return matrix_to_axis_angle(sixd_to_matrix(o6))   # (6,) -> (3,)

    o6 = o.reshape(NUM_JOINTS, 6)
    aa = jax.vmap(tail)(o6)                               # (23, 3)
    Jt = jax.vmap(jax.jacfwd(tail))(o6)                   # (23, 3, 6)
    D = jnp.einsum("jab,jbZ->jaZ",
                   Jt, Do.reshape(NUM_JOINTS, 6, -1))
    return aa.reshape(-1), D.reshape(NUM_JOINTS * 3, -1)


def encode_mean(weights: VPoserWeights, body_pose: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    """Posterior mean for a body pose (..., 69) -> z (..., 32) (eval-mode BN)."""
    x = (body_pose - weights.enc_bn1_mean) * jax.lax.rsqrt(
        weights.enc_bn1_var + eps) * weights.enc_bn1_w + weights.enc_bn1_b
    x = _lrelu(x @ weights.enc_fc1_w + weights.enc_fc1_b)
    x = (x - weights.enc_bn2_mean) * jax.lax.rsqrt(
        weights.enc_bn2_var + eps) * weights.enc_bn2_w + weights.enc_bn2_b
    x = _lrelu(x @ weights.enc_fc2_w + weights.enc_fc2_b)
    return x @ weights.enc_mu_w + weights.enc_mu_b


def load_npz(path: str, dtype=jnp.float32) -> VPoserWeights:
    d = np.load(path)
    kw = {k: jnp.asarray(d[k], dtype) for k in d.files}
    return VPoserWeights(**kw)


def save_npz(path: str, weights: VPoserWeights) -> None:
    np.savez(path, **{k: np.asarray(v)
                      for k, v in vars(weights).items()})


def convert_torch_snapshot(snapshot_path: str,
                           out_npz: Optional[str] = None) -> VPoserWeights:
    """One-time conversion of a torch VPoser snapshot pkl to npz weights.

    Torch is only imported here; the fitting runtime never depends on it.
    The snapshot pickles a full nn.Module by class path `model.VPoser`, so
    stub classes are registered for unpickling and the state_dict is read.
    """
    import sys
    import types

    import torch
    import torch.nn as nn

    mod = types.ModuleType("model")
    vp_mod = types.ModuleType("model.VPoser")

    class VPoser(nn.Module):
        pass

    class ContinousRotReprDecoder(nn.Module):
        pass

    vp_mod.VPoser = VPoser
    vp_mod.ContinousRotReprDecoder = ContinousRotReprDecoder
    mod.VPoser = vp_mod
    sys.modules.setdefault("model", mod)
    sys.modules.setdefault("model.VPoser", vp_mod)

    m = torch.load(snapshot_path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def t(name):  # torch Linear stores (out, in); transpose to input-major
        return jnp.asarray(sd[name].T.copy(), jnp.float32)

    def v(name):
        return jnp.asarray(sd[name], jnp.float32)

    weights = VPoserWeights(
        dec_fc1_w=t("bodyprior_dec_fc1.weight"),
        dec_fc1_b=v("bodyprior_dec_fc1.bias"),
        dec_fc2_w=t("bodyprior_dec_fc2.weight"),
        dec_fc2_b=v("bodyprior_dec_fc2.bias"),
        dec_out_w=t("bodyprior_dec_out.weight"),
        dec_out_b=v("bodyprior_dec_out.bias"),
        enc_bn1_mean=v("bodyprior_enc_bn1.running_mean"),
        enc_bn1_var=v("bodyprior_enc_bn1.running_var"),
        enc_bn1_w=v("bodyprior_enc_bn1.weight"),
        enc_bn1_b=v("bodyprior_enc_bn1.bias"),
        enc_fc1_w=t("bodyprior_enc_fc1.weight"),
        enc_fc1_b=v("bodyprior_enc_fc1.bias"),
        enc_bn2_mean=v("bodyprior_enc_bn2.running_mean"),
        enc_bn2_var=v("bodyprior_enc_bn2.running_var"),
        enc_bn2_w=v("bodyprior_enc_bn2.weight"),
        enc_bn2_b=v("bodyprior_enc_bn2.bias"),
        enc_fc2_w=t("bodyprior_enc_fc2.weight"),
        enc_fc2_b=v("bodyprior_enc_fc2.bias"),
        enc_mu_w=t("bodyprior_enc_mu.weight"),
        enc_mu_b=v("bodyprior_enc_mu.bias"),
    )
    if out_npz:
        save_npz(out_npz, weights)
    return weights


def load_vposer(prior_folder: str, dtype=jnp.float32) -> VPoserWeights:
    """Resolve VPoser weights like the reference loader (`utils/prior.py`).

    Prefers a converted `vposer_weights.npz` next to / inside the folder;
    otherwise converts the newest `snapshots/*.pkl` torch snapshot.
    """
    npz = os.path.join(prior_folder, "vposer_weights.npz")
    if os.path.exists(npz):
        return load_npz(npz, dtype)
    snap_dir = os.path.join(prior_folder, "snapshots")
    if os.path.isdir(snap_dir):
        pkls = sorted(
            (os.path.join(snap_dir, p) for p in os.listdir(snap_dir)
             if p.endswith(".pkl")),
            key=os.path.getmtime)
        if pkls:
            return convert_torch_snapshot(pkls[-1])
    raise FileNotFoundError(f"No VPoser weights under {prior_folder}")


def random_weights(seed: int = 0) -> VPoserWeights:
    """Deterministic random weights for tests without the real snapshot."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(
            rng.standard_normal(shape) / np.sqrt(shape[0]), jnp.float32)

    return VPoserWeights(
        dec_fc1_w=r(LATENT_DIM, HIDDEN), dec_fc1_b=r(HIDDEN),
        dec_fc2_w=r(HIDDEN, HIDDEN), dec_fc2_b=r(HIDDEN),
        dec_out_w=r(HIDDEN, NUM_JOINTS * 6), dec_out_b=r(NUM_JOINTS * 6),
        enc_bn1_mean=jnp.zeros(69), enc_bn1_var=jnp.ones(69),
        enc_bn1_w=jnp.ones(69), enc_bn1_b=jnp.zeros(69),
        enc_fc1_w=r(69, HIDDEN), enc_fc1_b=r(HIDDEN),
        enc_bn2_mean=jnp.zeros(HIDDEN), enc_bn2_var=jnp.ones(HIDDEN),
        enc_bn2_w=jnp.ones(HIDDEN), enc_bn2_b=jnp.zeros(HIDDEN),
        enc_fc2_w=r(HIDDEN, HIDDEN), enc_fc2_b=r(HIDDEN),
        enc_mu_w=r(HIDDEN, LATENT_DIM), enc_mu_b=r(LATENT_DIM),
    )
