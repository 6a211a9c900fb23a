"""SE(3) / quaternion math in pure JAX.

Provides the rigid-motion toolkit the reference gets from scipy
(``Slerp`` + ``CubicSpline`` in reference ``model/diffusionGS.py:1208-1234``)
and from COLMAP's qvec helpers (``solver_utils/colmap_loader.py:43-66``) —
here as closed-form, jit-able jnp functions so pose interpolation can live
on-device inside a compiled pipeline instead of round-tripping to scipy.

Conventions: quaternions are (w, x, y, z), unit-norm; rotation matrices act
on column vectors; poses are 4x4 homogeneous matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the numerically safest (largest pivot) with jnp.where — no
    data-dependent control flow, so it vectorizes and jits cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = _safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw, (m21 - m12) / (4 * qw + 1e-12),
                    (m02 - m20) / (4 * qw + 1e-12),
                    (m10 - m01) / (4 * qw + 1e-12)], axis=-1)

    qx = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx + 1e-12), qx,
                    (m01 + m10) / (4 * qx + 1e-12),
                    (m02 + m20) / (4 * qx + 1e-12)], axis=-1)

    qy = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy + 1e-12),
                    (m01 + m10) / (4 * qy + 1e-12), qy,
                    (m12 + m21) / (4 * qy + 1e-12)], axis=-1)

    qz = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz + 1e-12),
                    (m02 + m20) / (4 * qz + 1e-12),
                    (m12 + m21) / (4 * qz + 1e-12), qz], axis=-1)

    # Pick the branch with the largest pivot value.
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation between quaternions.

    q0, q1: (..., 4); t: scalar or broadcastable (...,). Shortest arc.
    Falls back to lerp when the quaternions are nearly parallel.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) else jnp.asarray(t)
    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def interpolate_poses(pose_start: jnp.ndarray, pose_end: jnp.ndarray,
                      num: int = 25) -> jnp.ndarray:
    """Interpolate ``num`` poses (4,4 each) between two camera poses.

    Rotation: quaternion slerp. Translation: linear — a natural cubic spline
    through exactly two knots is a straight line, which is what the
    reference's scipy ``CubicSpline(bc_type='natural')`` over two keyframes
    evaluates to (reference ``model/diffusionGS.py:1219-1230``). Endpoints
    reproduce the inputs exactly. Returns (num, 4, 4).
    """
    ts = jnp.linspace(0.0, 1.0, num)
    q0 = rotmat_to_quat(pose_start[:3, :3])
    q1 = rotmat_to_quat(pose_end[:3, :3])
    qs = slerp(q0[None].repeat(num, axis=0), q1[None].repeat(num, axis=0), ts)
    rots = quat_to_rotmat(qs)                                   # (num, 3, 3)
    trans = (1.0 - ts)[:, None] * pose_start[:3, 3] + ts[:, None] * pose_end[:3, 3]
    poses = jnp.tile(jnp.eye(4), (num, 1, 1))
    poses = poses.at[:, :3, :3].set(rots)
    poses = poses.at[:, :3, 3].set(trans)
    return poses


def se3_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transforms in closed form (no linalg.inv)."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    rt = jnp.swapaxes(r, -1, -2)
    inv = jnp.zeros_like(pose)
    inv = inv.at[..., :3, :3].set(rt)
    inv = inv.at[..., :3, 3:].set(
        -jnp.matmul(rt, t, precision=jax.lax.Precision.HIGHEST))
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def rotation_angle_deg(r0: jnp.ndarray, r1: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle in degrees between rotation matrices (..., 3, 3)."""
    rel = jnp.swapaxes(r0, -1, -2) @ r1
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
