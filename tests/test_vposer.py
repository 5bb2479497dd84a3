"""VPoser decoder: parity against the bundled torch snapshot."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.models import vposer as vp

SNAPSHOT = "/root/reference/priors/snapshots/poser_epoch091.pkl"


def test_decode_shape_random_weights():
    w = vp.random_weights()
    z = jnp.zeros((32,))
    pose = vp.decode(w, z)
    assert pose.shape == (69,)
    # Batched
    pose_b = vp.decode(w, jnp.zeros((5, 32)))
    assert pose_b.shape == (5, 69)


def test_decode_finite_gradients():
    import jax
    w = vp.random_weights()
    g = jax.grad(lambda z: jnp.sum(vp.decode(w, z) ** 2))(jnp.ones(32) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.skipif(not os.path.exists(SNAPSHOT),
                    reason="bundled snapshot unavailable")
def test_decode_matches_torch_snapshot(tmp_path):
    """Convert the real snapshot, compare decode outputs vs torch."""
    import torch

    weights = vp.convert_torch_snapshot(
        SNAPSHOT, out_npz=str(tmp_path / "w.npz"))
    torch_model = torch.load(SNAPSHOT, map_location="cpu",
                             weights_only=False)
    torch_model.eval()

    rng = np.random.default_rng(7)
    z = rng.standard_normal((4, 32)).astype(np.float32)

    with torch.no_grad():
        # Reproduce the reference decode path in torch using the loaded
        # module's layers (decode() itself needs torchgeometry; avoid it by
        # checking the pre-rotation linear stack + our own rotation math).
        x = torch.nn.functional.leaky_relu(
            torch_model.bodyprior_dec_fc1(torch.from_numpy(z)), 0.2)
        x = torch.nn.functional.leaky_relu(
            torch_model.bodyprior_dec_fc2(x), 0.2)
        torch_out = torch_model.bodyprior_dec_out(x).numpy()

    # Full linear-stack check through our decode internals:
    def stack(zz):
        h = zz @ weights.dec_fc1_w + weights.dec_fc1_b
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = h @ weights.dec_fc2_w + weights.dec_fc2_b
        h = jnp.where(h >= 0, h, 0.2 * h)
        return h @ weights.dec_out_w + weights.dec_out_b

    # fp32 accumulation-order differences only (values reach ~500).
    np.testing.assert_allclose(
        np.asarray(stack(jnp.asarray(z))), torch_out, rtol=1e-5, atol=1e-3)

    # And the final axis-angle decode must be valid rotations of 23 joints.
    pose = np.asarray(vp.decode(weights, jnp.asarray(z)))
    assert pose.shape == (4, 69)
    assert np.all(np.isfinite(pose))
    # reload from npz gives identical results
    w2 = vp.load_npz(str(tmp_path / "w.npz"))
    np.testing.assert_allclose(
        np.asarray(vp.decode(w2, jnp.asarray(z))), pose, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(SNAPSHOT),
                    reason="bundled snapshot unavailable")
def test_decode_matches_torch_rotation_path():
    """End-to-end decode (incl. 6D->matrot->aa) vs a torch recompute."""
    import torch

    weights = vp.convert_torch_snapshot(SNAPSHOT)
    torch_model = torch.load(SNAPSHOT, map_location="cpu",
                             weights_only=False)
    torch_model.eval()
    rng = np.random.default_rng(3)
    z = rng.standard_normal((8, 32)).astype(np.float32)

    with torch.no_grad():
        x = torch.nn.functional.leaky_relu(
            torch_model.bodyprior_dec_fc1(torch.from_numpy(z)), 0.2)
        x = torch.nn.functional.leaky_relu(
            torch_model.bodyprior_dec_fc2(x), 0.2)
        x = torch_model.bodyprior_dec_out(x)
        # 6D -> rotation matrices (Gram-Schmidt, as the snapshot's decoder).
        r = x.view(-1, 3, 2)
        b1 = torch.nn.functional.normalize(r[:, :, 0], dim=1)
        dot = (b1 * r[:, :, 1]).sum(1, keepdim=True)
        b2 = torch.nn.functional.normalize(r[:, :, 1] - dot * b1, dim=-1)
        b3 = torch.cross(b1, b2, dim=1)
        mats = torch.stack([b1, b2, b3], dim=-1).numpy()  # (8*23, 3, 3)

    from scipy.spatial.transform import Rotation as R
    ref_aa = R.from_matrix(mats).as_rotvec().reshape(8, 69)
    ours = np.asarray(vp.decode(weights, jnp.asarray(z)))
    # Compare as rotations (angle wrapping differences allowed).
    np.testing.assert_allclose(
        R.from_rotvec(ours.reshape(-1, 3)).as_matrix(),
        R.from_rotvec(ref_aa.reshape(-1, 3)).as_matrix(), atol=1e-4)
