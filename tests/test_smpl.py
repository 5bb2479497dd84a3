"""SMPL model: LBS semantics, scale behavior, joint mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsmplfitting_tpu.models import assets as A
from mvsmplfitting_tpu.models import joints as J
from mvsmplfitting_tpu.models.smpl import (SMPLParams, lbs, rest_joints,
                                           smpl_forward)


@pytest.fixture(scope="module")
def model():
    return A.synthetic_smpl("smpl")


@pytest.fixture(scope="module")
def model_lsp():
    return A.synthetic_smpl("smpllsp")


def test_shapes(model):
    assert model.v_template.shape == (6890, 3)
    assert model.posedirs.shape == (207, 6890 * 3)
    assert model.j_regressor.shape == (24, 6890)
    assert model.lbs_weights.shape == (6890, 24)
    assert model.faces.shape[1] == 3


def test_zero_pose_identity(model):
    """Zero pose, zero betas, scale 1 must reproduce the template."""
    verts, joints24 = lbs(model, jnp.zeros(10), jnp.zeros(72), jnp.ones(()))
    np.testing.assert_allclose(
        np.asarray(verts), np.asarray(model.v_template), atol=1e-5)
    rest = np.asarray(model.j_regressor @ model.v_template)
    np.testing.assert_allclose(np.asarray(joints24), rest, atol=1e-5)


def test_scale_about_root(model):
    """Scale=s must scale the whole zero-pose body about the root joint."""
    s = 2.5
    verts1, j1 = lbs(model, jnp.zeros(10), jnp.zeros(72), jnp.ones(()))
    verts2, j2 = lbs(model, jnp.zeros(10), jnp.zeros(72), jnp.asarray(s))
    root = np.asarray(j1)[0]
    np.testing.assert_allclose(
        np.asarray(verts2), root + s * (np.asarray(verts1) - root), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j2), root + s * (np.asarray(j1) - root), atol=1e-4)


def test_global_orient_rotates_about_root(model):
    from mvsmplfitting_tpu.ops.rotations import rodrigues
    aa = jnp.asarray([0.3, -0.2, 0.5])
    pose = jnp.concatenate([aa, jnp.zeros(69)])
    verts0, j0 = lbs(model, jnp.zeros(10), jnp.zeros(72), jnp.ones(()))
    verts1, _ = lbs(model, jnp.zeros(10), pose, jnp.ones(()))
    R = np.asarray(rodrigues(aa))
    root = np.asarray(j0)[0]
    expect = root + (np.asarray(verts0) - root) @ R.T
    np.testing.assert_allclose(np.asarray(verts1), expect, atol=1e-4)


def test_child_joint_rotation_moves_subtree_only(model):
    """Rotating the left knee (joint 4) moves its subtree, not the torso."""
    pose = jnp.zeros(72).at[4 * 3].set(1.0)
    _, j0 = lbs(model, jnp.zeros(10), jnp.zeros(72), jnp.ones(()))
    _, j1 = lbs(model, jnp.zeros(10), pose, jnp.ones(()))
    moved = np.linalg.norm(np.asarray(j1) - np.asarray(j0), axis=1)
    subtree = {7, 10}  # L ankle, L foot (children of L knee)
    for j in range(24):
        if j in subtree:
            assert moved[j] > 1e-3, f"joint {j} should move"
        else:
            assert moved[j] < 1e-5, f"joint {j} should not move"


def test_forward_translation(model):
    p0 = SMPLParams.zeros()
    p1 = p0.replace(transl=jnp.asarray([1.0, -2.0, 3.0]))
    v0, k0 = smpl_forward(model, p0)
    v1, k1 = smpl_forward(model, p1)
    np.testing.assert_allclose(
        np.asarray(v1) - np.asarray(v0), np.tile([1, -2, 3], (6890, 1)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(k1) - np.asarray(k0),
        np.tile([1, -2, 3], (k0.shape[0], 1)), atol=1e-5)


def test_joint_counts(model, model_lsp):
    _, k = smpl_forward(model, SMPLParams.zeros())
    assert k.shape == (17, 3)  # coco17
    _, k = smpl_forward(model_lsp, SMPLParams.zeros())
    assert k.shape == (17, 3)  # lsp14 annotation map also has 17 entries


def test_forward_jits_and_differentiates(model):
    @jax.jit
    def f(betas):
        _, k = smpl_forward(model, SMPLParams.zeros().replace(betas=betas))
        return jnp.sum(k ** 2)

    g = jax.grad(f)(jnp.ones(10) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vmap_over_bodies(model):
    batch = jax.vmap(lambda t: smpl_forward(
        model, SMPLParams.zeros().replace(transl=t)))
    ts = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)),
                     jnp.float32)
    verts, joints = batch(ts)
    assert verts.shape == (4, 6890, 3)
    assert joints.shape == (4, 17, 3)


def test_rest_joints(model):
    k = rest_joints(model)
    assert k.shape == (17, 3)
    assert np.all(np.isfinite(np.asarray(k)))


def test_real_smpl_pkl_loader_missing_gives_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError):
        A.load_smpl(str(tmp_path), "smpl")
