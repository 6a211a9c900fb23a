import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syn3r_tpu.utils import se3


def random_rotmat(rng):
    # QR of a random matrix, sign-fixed to det=+1
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_quat_rotmat_roundtrip(seed):
    rng = np.random.default_rng(seed)
    m = random_rotmat(rng)
    q = se3.rotmat_to_quat(jnp.asarray(m, jnp.float32))
    m2 = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)


def test_quat_rotmat_batched():
    rng = np.random.default_rng(7)
    ms = np.stack([random_rotmat(rng) for _ in range(16)])
    qs = se3.rotmat_to_quat(jnp.asarray(ms, jnp.float32))
    m2 = se3.quat_to_rotmat(qs)
    np.testing.assert_allclose(np.asarray(m2), ms, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(3)
    q0 = se3.rotmat_to_quat(jnp.asarray(random_rotmat(rng), jnp.float32))
    q1 = se3.rotmat_to_quat(jnp.asarray(random_rotmat(rng), jnp.float32))
    np.testing.assert_allclose(np.asarray(se3.slerp(q0, q1, 0.0)),
                               np.asarray(q0), atol=1e-6)
    s1 = np.asarray(se3.slerp(q0, q1, 1.0))
    # slerp may return -q1 (same rotation)
    assert (np.allclose(s1, np.asarray(q1), atol=1e-5)
            or np.allclose(s1, -np.asarray(q1), atol=1e-5))
    # midpoint is equidistant in geodesic angle
    qm = se3.slerp(q0, q1, 0.5)
    rm = se3.quat_to_rotmat(qm)
    a0 = se3.rotation_angle_deg(se3.quat_to_rotmat(q0), rm)
    a1 = se3.rotation_angle_deg(se3.quat_to_rotmat(q1), rm)
    np.testing.assert_allclose(float(a0), float(a1), atol=0.1)  # f32 arccos


def test_slerp_identical_quats():
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    out = se3.slerp(q, q, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-6)


def test_interpolate_poses_endpoints_and_linearity():
    rng = np.random.default_rng(11)
    p0 = np.eye(4, dtype=np.float32)
    p0[:3, :3] = random_rotmat(rng)
    p0[:3, 3] = rng.normal(size=3)
    p1 = np.eye(4, dtype=np.float32)
    p1[:3, :3] = random_rotmat(rng)
    p1[:3, 3] = rng.normal(size=3)
    poses = np.asarray(se3.interpolate_poses(jnp.asarray(p0), jnp.asarray(p1), 25))
    assert poses.shape == (25, 4, 4)
    np.testing.assert_allclose(poses[0], p0, atol=1e-5)
    np.testing.assert_allclose(poses[-1], p1, atol=1e-5)
    # translations linear (natural cubic spline over 2 knots)
    expect = np.linspace(0, 1, 25)[:, None] * (p1[:3, 3] - p0[:3, 3]) + p0[:3, 3]
    np.testing.assert_allclose(poses[:, :3, 3], expect, atol=1e-5)
    # all rotations orthonormal
    for i in range(25):
        np.testing.assert_allclose(poses[i, :3, :3] @ poses[i, :3, :3].T,
                                   np.eye(3), atol=1e-5)


def test_se3_inverse():
    rng = np.random.default_rng(5)
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = random_rotmat(rng)
    p[:3, 3] = rng.normal(size=3)
    inv = np.asarray(se3.se3_inverse(jnp.asarray(p)))
    np.testing.assert_allclose(inv @ p, np.eye(4), atol=1e-5)


def test_jit_compatible():
    f = jax.jit(lambda a, b: se3.interpolate_poses(a, b, 25))
    out = f(jnp.eye(4), jnp.eye(4))
    assert out.shape == (25, 4, 4)
