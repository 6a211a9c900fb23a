"""Differentiable Gaussian-splatting rasterizer, TPU-native.

Replaces the reference's CUDA ``diff-gaussian-rasterization-confidence``
extension (reference README.md:50; consumed via ``GSTrainer.render_view``,
``model/diffusionGS.py:154-172``). Per-camera *confidence* stays a loss-side
weight (SURVEY.md §2.6) — the kernel renders color/depth/alpha.

TPU-first formulation (not a CUDA port): the per-pixel log-density of a 2D
Gaussian is a bilinear form in pixel features [x^2, xy, y^2, x, y, 1], so a
whole chunk of K depth-sorted Gaussians evaluates against all pixels as ONE
(P, 6) @ (6, K) MXU matmul. Front-to-back alpha compositing is then a
log-domain exclusive cumsum over the chunk axis (transmittance) and a second
(P, K) @ (K, 5) matmul accumulating [r, g, b, depth, alpha]. The sequential
dependency across chunks is a lax.scan with sqrt-decomposition remat
(jax.checkpoint per chunk-group) so the backward pass stays in HBM budget.
There is no atomic scatter, no per-pixel sort, no warp divergence — just
dense MXU work in depth order, which XLA pipelines.

`rasterize_pixels` is resolution-agnostic: callers pass any (P, 2) pixel
block, which is how the tiled/partitioned variants shard work across chips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState, covariance_3d, eval_sh
from ..utils.camera import Camera

_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99


class ScreenGaussians(NamedTuple):
    """Per-camera projected Gaussians (all capacity slots, invalid zeroed)."""
    center: jnp.ndarray   # (N, 2) pixel-space mean
    conic: jnp.ndarray    # (N, 3) inverse 2D covariance (a, b, c)
    rgb: jnp.ndarray      # (N, 3)
    depth: jnp.ndarray    # (N,) camera-space z
    opacity: jnp.ndarray  # (N,)
    radius: jnp.ndarray   # (N,) 3-sigma screen radius (pixels)
    valid: jnp.ndarray    # (N,) bool


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray      # (H, W, 3)
    depth: jnp.ndarray    # (H, W) alpha-weighted accumulated depth
    alpha: jnp.ndarray    # (H, W)


def project_gaussians(state: GaussianState, camera: Camera,
                      sh_degree: int = 3, near: float = 0.2,
                      center_offset: jnp.ndarray | None = None) -> ScreenGaussians:
    """EWA projection of 3D Gaussians to screen space.

    ``center_offset`` (N, 2), normally zeros, exists so trainers can take
    d(loss)/d(screen center) for densification statistics (the CUDA
    rasterizer's viewspace-point gradients) via jax.grad on the offset.
    """
    R = camera.w2c[:3, :3]
    tvec = camera.w2c[:3, 3]
    fx, fy = camera.K[0, 0], camera.K[1, 1]
    cx, cy = camera.K[0, 2], camera.K[1, 2]

    t = jnp.matmul(state.means, R.T,
                   precision=jax.lax.Precision.HIGHEST) + tvec   # (N, 3)
    tz = t[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)

    # Screen-space center (pixel-index convention matches utils.camera).
    u = fx * t[:, 0] / tz_safe + cx
    v = fy * t[:, 1] / tz_safe + cy
    center = jnp.stack([u, v], axis=-1)
    if center_offset is not None:
        center = center + center_offset

    # EWA: cov2d = J W Sigma W^T J^T with frustum-clamped Jacobian.
    lim_x = 1.3 * 0.5 * camera.width / fx
    lim_y = 1.3 * 0.5 * camera.height / fy
    txz = jnp.clip(t[:, 0] / tz_safe, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(t[:, 1] / tz_safe, -lim_y, lim_y) * tz_safe
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz_safe, zero, -fx * txz / tz_safe ** 2], axis=-1),
        jnp.stack([zero, fy / tz_safe, -fy * tyz / tz_safe ** 2], axis=-1),
    ], axis=-2)                                                  # (N, 2, 3)
    T = jnp.einsum("nij,jk->nik", J, R,
                   precision=jax.lax.Precision.HIGHEST)          # (N, 2, 3)
    sigma = covariance_3d(state.log_scales, state.quats)         # (N, 3, 3)
    cov2d = jnp.einsum("nij,njk,nlk->nil", T, sigma, T,
                       precision=jax.lax.Precision.HIGHEST)      # (N, 2, 2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # View-dependent color from SH.
    cam_pos = camera.position
    dirs = state.means - cam_pos
    dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1,
                                        keepdims=True) + 1e-12)
    rgb = jnp.maximum(eval_sh(state.sh, dirs, sh_degree) + 0.5, 0.0)

    valid = state.active & (tz > near) & (det > 0)
    opacity = jnp.where(valid, jax.nn.sigmoid(state.opacity_logits[:, 0]), 0.0)
    return ScreenGaussians(center=center, conic=conic, rgb=rgb, depth=tz,
                           opacity=opacity, radius=radius, valid=valid)


def _gaussian_matmul_features(sg: ScreenGaussians):
    """Pack per-Gaussian quantities for the two compositing matmuls.

    power(p, g) = -0.5 [a dx^2 + 2b dx dy + c dy^2]
                = [x^2, xy, y^2, x, y, 1] . G_g
    """
    a, b, c = sg.conic[:, 0], sg.conic[:, 1], sg.conic[:, 2]
    gx, gy = sg.center[:, 0], sg.center[:, 1]
    G = jnp.stack([
        -0.5 * a,
        -b,
        -0.5 * c,
        a * gx + b * gy,
        b * gx + c * gy,
        -0.5 * (a * gx * gx + 2.0 * b * gx * gy + c * gy * gy),
    ], axis=-1)                                                  # (N, 6)
    C = jnp.concatenate([sg.rgb, sg.depth[:, None],
                         jnp.ones_like(sg.depth)[:, None]], axis=-1)  # (N, 5)
    # Zero the features of invalid Gaussians. Their opacity is already 0,
    # but 0 * exp(NaN/Inf power) = NaN would otherwise leak through the
    # matmuls (padding slots can hold arbitrary parameter values).
    v = sg.valid[:, None]
    return jnp.where(v, G, 0.0), jnp.where(v, C, 0.0)


def pixel_features(ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """[x^2, xy, y^2, x, y, 1] features for pixel coordinates (P,)."""
    one = jnp.ones_like(xs)
    return jnp.stack([xs * xs, xs * ys, ys * ys, xs, ys, one], axis=-1)


@functools.partial(jax.jit, static_argnames=("chunk", "group"))
def rasterize_pixels(sg: ScreenGaussians, pix: jnp.ndarray,
                     chunk: int = 256, group: int = 8) -> jnp.ndarray:
    """Composite depth-sorted Gaussians over a block of pixels.

    pix: (P, 2) float pixel coordinates (x, y). Returns (P, 5):
    [r, g, b, accumulated depth, alpha].
    """
    n = sg.center.shape[0]
    n_pad = -(-n // chunk) * chunk
    depth_key = jnp.where(sg.valid & (sg.opacity > 0), sg.depth, jnp.inf)
    depth_key = jnp.pad(depth_key, (0, n_pad - n), constant_values=jnp.inf)
    order = jnp.argsort(depth_key)

    G, C = _gaussian_matmul_features(sg)
    pad1 = ((0, n_pad - n), (0, 0))
    G = jnp.pad(G, pad1)[order]
    C = jnp.pad(C, pad1)[order]
    O = jnp.pad(sg.opacity, (0, n_pad - n))[order]

    n_chunks = n_pad // chunk
    n_groups = -(-n_chunks // group)
    gpad = n_groups * group - n_chunks
    G = jnp.pad(G, ((0, gpad * chunk), (0, 0))).reshape(n_groups, group, chunk, 6)
    C = jnp.pad(C, ((0, gpad * chunk), (0, 0))).reshape(n_groups, group, chunk, 5)
    O = jnp.pad(O, (0, gpad * chunk)).reshape(n_groups, group, chunk)

    P = pixel_features(pix[:, 1], pix[:, 0])                     # (P, 6)

    def chunk_body(carry, data):
        accum, logT = carry
        Gc, Cc, Oc = data
        # Full f32 matmul precision: pixel features reach ~1e6 (x^2), so
        # reduced-precision MXU passes would corrupt the Gaussian power.
        # (A later Pallas variant uses tile-local coordinates — the power is
        # translation-invariant — to make 3-pass bf16 exact enough.)
        power = jnp.dot(P, Gc.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        power = jnp.minimum(power, 0.0)
        alpha = Oc[None, :] * jnp.exp(power)                     # (P, K)
        alpha = jnp.minimum(alpha, _ALPHA_MAX)
        alpha = jnp.where(alpha < _ALPHA_MIN, 0.0, alpha)
        l1ma = jnp.log1p(-alpha)
        excl = jnp.cumsum(l1ma, axis=1) - l1ma                   # exclusive
        w = alpha * jnp.exp(logT[:, None] + excl)
        accum = accum + jnp.dot(w, Cc, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        logT = logT + jnp.sum(l1ma, axis=1)
        return (accum, logT), None

    def group_body(carry, gdata):
        inner = functools.partial(jax.lax.scan, chunk_body)
        carry, _ = jax.checkpoint(inner)(carry, gdata)
        return carry, None

    init = (jnp.zeros((pix.shape[0], 5), jnp.float32),
            jnp.zeros((pix.shape[0],), jnp.float32))
    (accum, logT), _ = jax.lax.scan(group_body, init, (G, C, O))
    return jnp.concatenate([accum[:, :4],
                            (1.0 - jnp.exp(logT))[:, None]], axis=-1)


def rasterize(sg: ScreenGaussians, height: int, width: int,
              bg: jnp.ndarray | None = None, chunk: int = 256,
              group: int = 8) -> RenderOutput:
    """Full-frame rasterization. bg: (3,) background color (default black)."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None].repeat(width, 1).ravel()
    xs = jnp.arange(width, dtype=jnp.float32)[None, :].repeat(height, 0).ravel()
    out = rasterize_pixels(sg, jnp.stack([xs, ys], -1), chunk=chunk, group=group)
    rgb = out[:, :3].reshape(height, width, 3)
    depth = out[:, 3].reshape(height, width)
    alpha = out[:, 4].reshape(height, width)
    if bg is not None:
        rgb = rgb + (1.0 - alpha[..., None]) * bg
    return RenderOutput(rgb=rgb, depth=depth, alpha=alpha)


def render(state: GaussianState, camera: Camera, sh_degree: int = 3,
           bg: jnp.ndarray | None = None, near: float = 0.2,
           chunk: int = 256, group: int = 8,
           center_offset: jnp.ndarray | None = None) -> RenderOutput:
    """Project + rasterize in one call (the ``render_view`` equivalent)."""
    sg = project_gaussians(state, camera, sh_degree=sh_degree, near=near,
                           center_offset=center_offset)
    return rasterize(sg, camera.height, camera.width, bg=bg, chunk=chunk,
                     group=group)
