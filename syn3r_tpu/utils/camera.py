"""Camera model: a pytree of intrinsics + world-to-camera extrinsics.

Replaces the reference's FSGS ``scene/cameras.py`` Camera object (interface
reconstructed in SURVEY.md §2.5; usage at reference ``model/diffusionGS.py:
67-70,151-163``) with an immutable JAX pytree that jits/vmaps. Confidence is
carried per-camera and consumed as a loss weight by the GS trainer.

Conventions:
  - ``w2c`` is the 4x4 world->camera matrix ([R|t; 0 1]); ``c2w`` its inverse.
  - ``K`` is the 3x3 pinhole intrinsic (fx, fy, cx, cy), pixel units.
  - Image sizes are static Python ints (XLA static shapes).
  - +z looks forward (COLMAP/OpenCV convention).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from . import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    K: jnp.ndarray                     # (3, 3) intrinsics
    w2c: jnp.ndarray                   # (4, 4) world->camera
    confidence: jnp.ndarray            # () per-camera loss weight
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def c2w(self) -> jnp.ndarray:
        return se3.se3_inverse(self.w2c)

    @property
    def R(self) -> jnp.ndarray:
        return self.w2c[..., :3, :3]

    @property
    def t(self) -> jnp.ndarray:
        return self.w2c[..., :3, 3]

    @property
    def position(self) -> jnp.ndarray:
        """Camera center in world coordinates."""
        return self.c2w[..., :3, 3]

    @property
    def fov_x(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan2(0.5 * self.width, self.K[..., 0, 0])

    @property
    def fov_y(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan2(0.5 * self.height, self.K[..., 1, 1])

    def resized(self, width: int, height: int) -> "Camera":
        """Rescale intrinsics to a new image resolution (reference rescales
        to the fixed 1024x576 SVD working resolution, diffusionGS.py:72-73)."""
        sx = width / self.width
        sy = height / self.height
        scale = jnp.asarray([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]],
                            dtype=self.K.dtype)
        return dataclasses.replace(self, K=self.K * scale, width=width,
                                   height=height)

    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)


def make_camera(K, w2c, width: int, height: int,
                confidence: float = 1.0) -> Camera:
    return Camera(K=jnp.asarray(K, jnp.float32),
                  w2c=jnp.asarray(w2c, jnp.float32),
                  confidence=jnp.asarray(confidence, jnp.float32),
                  width=int(width), height=int(height))


def camera_from_fov(fov_x_rad: float, fov_y_rad: float, width: int,
                    height: int, w2c, confidence: float = 1.0) -> Camera:
    fx = 0.5 * width / math.tan(0.5 * fov_x_rad)
    fy = 0.5 * height / math.tan(0.5 * fov_y_rad)
    K = [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]]
    return make_camera(K, w2c, width, height, confidence)


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree —
    the idiomatic JAX replacement for the reference's Python camera lists
    (enables vmap/scan over views)."""
    assert len({(c.width, c.height) for c in cams}) == 1, "mixed resolutions"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def unproject(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Depth map (H, W) -> camera-space points (H, W, 3).

    Matches reference ``solver_utils/consistency.py:6-23``: pixel centers at
    integer coordinates, x = (u - cx)/fx * z.
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :].repeat(h, axis=0)
    v = jnp.arange(h, dtype=depth.dtype)[:, None].repeat(w, axis=1)
    x = (u - K[0, 2]) / K[0, 0]
    y = (v - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y, jnp.ones_like(depth)], axis=-1) * depth[..., None]


def transform_points(pts: jnp.ndarray, src_w2c: jnp.ndarray,
                     dst_w2c: jnp.ndarray) -> jnp.ndarray:
    """Map points (..., 3) from src camera frame to dst camera frame
    (reference ``solver_utils/consistency.py:25-42``)."""
    rel = jnp.matmul(dst_w2c, se3.se3_inverse(src_w2c),
                     precision=jax.lax.Precision.HIGHEST)
    # full f32 precision: on TPU the default matmul precision truncates to
    # bf16, which is far too coarse for pixel-accurate reprojection.
    return jnp.matmul(pts, rel[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + rel[:3, 3]


def project(pts: jnp.ndarray, K: jnp.ndarray,
            eps: float = 1e-8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space points (..., 3) -> (pixel uv (..., 2), depth (...,))."""
    z = pts[..., 2]
    zsafe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u = K[0, 0] * pts[..., 0] / zsafe + K[0, 2]
    v = K[1, 1] * pts[..., 1] / zsafe + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def covisibility_weight(cam_a: Camera, cam_b: Camera,
                        alpha: float = 1.0, beta: float = 1.0) -> jnp.ndarray:
    """Covisibility score 1 - exp(-a|t|)exp(-b*angle) used by the reference's
    FPS keyframe selection (diffusionGS.py:185-217). Higher = further apart."""
    t = jnp.linalg.norm(cam_a.position - cam_b.position)
    ang = jnp.radians(se3.rotation_angle_deg(cam_a.R, cam_b.R))
    return 1.0 - jnp.exp(-alpha * t) * jnp.exp(-beta * ang)


def look_at_w2c(eye: jnp.ndarray, target: jnp.ndarray,
                up: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Build a w2c matrix for a camera at ``eye`` looking at ``target``
    (OpenCV convention: +z forward, +y down). Used by synthetic test scenes
    and the orbit-trajectory demo (reference ``model/SVD_1pass.py:886-936``)."""
    if up is None:
        up = jnp.asarray([0.0, -1.0, 0.0])
    fwd = target - eye
    fwd = fwd / (jnp.linalg.norm(fwd) + 1e-12)
    right = jnp.cross(up, fwd) * -1.0  # OpenCV: x right when y down, z fwd
    right = right / (jnp.linalg.norm(right) + 1e-12)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # world->cam rotation rows
    t = -R @ eye
    w2c = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return w2c
