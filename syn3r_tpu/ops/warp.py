"""Forward (splatting) and inverse (gather) image warping + depth consistency.

TPU-native re-implementation of the reference's geometry core
(``solver_utils/forward_warp.py``, ``solver_utils/consistency.py``):

  - ``forward_warp``: softmax-style z-weighted bilinear *scatter* splatting.
    The reference uses ``np.add.at`` on CPU (forward_warp.py:99-107); here the
    scatter-add is ``jnp.at[].add`` which XLA lowers to an efficient on-device
    scatter — fully jit-able and differentiable.
  - ``inverse_warp``: backward warping of a source view into a target view
    using the target's rendered depth, with occlusion masks from depth
    agreement and a soft reprojection-error mask exp(-(err/bw)^3)
    (forward_warp.py:187-279).
  - ``consistency_check_with_depth``: two-view cycle reprojection error
    (consistency.py:44-91).

All images are channel-last (H, W, C) float32; depths (H, W); poses are 4x4
world->camera; intrinsics 3x3. Everything has static shapes and jits.

Note on sampling quirks: the reference normalizes grids as ``2x/W - 1`` /
``x/((W-1)/2) - 1`` but samples with torch's align_corners=False default,
which bakes in a ~half-pixel shift. We reproduce the same effective sample
locations for numeric parity (documented inline).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..utils import se3
from ..utils.camera import project, transform_points, unproject
from .grid_sample import sample_pixels


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of (x, y) pixel coordinates."""
    x = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)
    y = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Forward (scatter) warping
# ---------------------------------------------------------------------------

def bilinear_splat(frame: jnp.ndarray, depth: jnp.ndarray, flow: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None,
                   depth_weight_scale: float = 50.0,
                   max_depth: float = 5000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-weighted bilinear splatting of ``frame`` along ``flow``.

    Semantics of reference ``bilinear_splatting`` (forward_warp.py:41-129):
    each source pixel is scattered to the 4 integer neighbors of its target
    position with bilinear weights divided by ``exp(log(1+z)/log_max*50)``
    (a soft z-buffer: nearer pixels get exponentially more weight), then the
    accumulation is normalized.

    frame: (H, W, C); depth: (H, W) target-frame depth of each source pixel;
    flow: (H, W, 2) pixel displacement. Returns (warped (H, W, C),
    valid mask (H, W) bool).
    """
    h, w, c = frame.shape
    pos = pixel_grid(h, w, frame.dtype) + flow + 1.0   # +1: 1-px border
    x0 = jnp.floor(pos[..., 0])
    y0 = jnp.floor(pos[..., 1])
    # ceil, matching np.ceil (== floor for integral positions, not floor+1)
    x1 = jnp.ceil(pos[..., 0])
    y1 = jnp.ceil(pos[..., 1])
    px = jnp.clip(pos[..., 0], 0, w + 1)
    py = jnp.clip(pos[..., 1], 0, h + 1)
    x0c = jnp.clip(x0, 0, w + 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h + 1).astype(jnp.int32)
    x1c = jnp.clip(x1, 0, w + 1).astype(jnp.int32)
    y1c = jnp.clip(y1, 0, h + 1).astype(jnp.int32)

    w_nw = (1 - (py - y0c)) * (1 - (px - x0c))
    w_sw = (1 - (y1c - py)) * (1 - (px - x0c))
    w_ne = (1 - (py - y0c)) * (1 - (x1c - px))
    w_se = (1 - (y1c - py)) * (1 - (x1c - px))

    sat = jnp.clip(depth, 0.0, max_depth)
    logd = jnp.log1p(sat)
    zw = jnp.exp(logd / jnp.maximum(logd.max(), 1e-12) * depth_weight_scale)
    m = jnp.ones((h, w), frame.dtype) if mask is None else mask.astype(frame.dtype)
    base = m / zw

    acc_img = jnp.zeros((h + 2, w + 2, c), jnp.float32)
    acc_w = jnp.zeros((h + 2, w + 2), jnp.float32)
    for wt, yy, xx in ((w_nw, y0c, x0c), (w_sw, y1c, x0c),
                       (w_ne, y0c, x1c), (w_se, y1c, x1c)):
        wgt = (wt * base).astype(jnp.float32)
        acc_img = acc_img.at[yy, xx].add(frame.astype(jnp.float32) * wgt[..., None])
        acc_w = acc_w.at[yy, xx].add(wgt)

    img = acc_img[1:-1, 1:-1]
    wsum = acc_w[1:-1, 1:-1]
    valid = wsum > 0
    out = jnp.where(valid[..., None], img / jnp.where(valid, wsum, 1.0)[..., None], 0.0)
    return out.astype(frame.dtype), valid


def forward_warp(frame: jnp.ndarray, depth: jnp.ndarray, w2c_src: jnp.ndarray,
                 w2c_dst: jnp.ndarray, K_src: jnp.ndarray,
                 K_dst: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None):
    """Warp ``frame`` from the src camera to the dst camera by splatting
    (reference forward_warp.py:141-182). Returns (warped, valid, flow)."""
    if K_dst is None:
        K_dst = K_src
    pts_src = unproject(depth, K_src)                       # (H, W, 3)
    pts_dst = transform_points(pts_src, w2c_src, w2c_dst)
    uv, z = project(pts_dst, K_dst)
    flow = uv - pixel_grid(*depth.shape, frame.dtype)
    warped, valid = bilinear_splat(frame, z, flow, mask=mask)
    return warped, valid, flow


# ---------------------------------------------------------------------------
# Depth-consistency (cycle reprojection error)
# ---------------------------------------------------------------------------

def consistency_check_with_depth(depth1: jnp.ndarray, w2c1: jnp.ndarray,
                                 K1: jnp.ndarray, depth2: jnp.ndarray,
                                 w2c2: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """Two-view cycle reprojection error per pixel of view 1
    (reference consistency.py:44-91).

    Unproject depth1 -> transform into view 2 -> sample depth2 there ->
    re-scale the ray to the sampled depth -> transform back -> project ->
    distance to the original pixel.
    """
    h, w = depth1.shape
    pts1 = unproject(depth1, K1)
    pts2 = transform_points(pts1, w2c1, w2c2)
    uv2, _ = project(pts2, K2)
    # Reference normalizes by (w-1)/2 (align_corners=True convention) then
    # samples with torch's align_corners=False default => effective pixel
    # coordinate x*w/(w-1) - 0.5. Reproduce exactly:
    sx = uv2[..., 0] * (w / (w - 1.0)) - 0.5
    sy = uv2[..., 1] * (h / (h - 1.0)) - 0.5
    d12 = sample_pixels(depth2[..., None], sx, sy, mode="bilinear")[..., 0]
    z2 = pts2[..., 2:]
    zsafe = jnp.where(jnp.abs(z2) < 1e-8, 1e-8, z2)
    pts2_scaled = pts2 / zsafe * d12[..., None]
    pts1_cycle = transform_points(pts2_scaled, w2c2, w2c1)
    uv1, _ = project(pts1_cycle, K1)
    return jnp.linalg.norm(uv1 - pixel_grid(h, w, depth1.dtype), axis=-1)


# ---------------------------------------------------------------------------
# Inverse (gather) warping with uncertainty masks
# ---------------------------------------------------------------------------

class InverseWarpResult(NamedTuple):
    warped_img: jnp.ndarray        # (H, W, C) source image gathered at target
    warped_depth: jnp.ndarray      # (H, W) source depth gathered at target
    mask_warp: jnp.ndarray         # (H, W) bool: reprojected inside source
    mask_depth: jnp.ndarray        # (H, W) bool: normalized depth agreement <0.3
    mask_depth_strict: jnp.ndarray  # (H, W) bool: <0.1
    mask: jnp.ndarray              # mask_warp & mask_depth
    mask_reproj: jnp.ndarray       # (H, W) bool: cycle reproj err < bandwidth
    soft_mask_reproj: jnp.ndarray  # (H, W) float: exp(-(err/bandwidth)^3)


def inverse_warp(img: jnp.ndarray, depth_src: jnp.ndarray,
                 depth_dst: jnp.ndarray, w2c_src: jnp.ndarray,
                 w2c_dst: jnp.ndarray, K: jnp.ndarray,
                 bandwidth: float = 20.0) -> InverseWarpResult:
    """Backward-warp a source view to a target (pseudo) view using the
    *target's* rendered depth (reference forward_warp.py:187-279).

    img: (H, W, C) source image; depth_src: (H, W) source rendered depth;
    depth_dst: (H, W) target rendered depth; w2c_src/w2c_dst: 4x4 poses;
    K: shared 3x3 intrinsics.
    """
    h, w = depth_dst.shape
    pts_dst = unproject(depth_dst, K)
    pts_src = transform_points(pts_dst, w2c_dst, w2c_src)
    uv, _ = project(pts_src, K)
    x, y = uv[..., 0], uv[..., 1]

    # Reference builds grid = 2x/W - 1 and samples nearest with
    # align_corners=False -> effective coordinate x - 0.5, i.e. floor(x).
    sx, sy = x - 0.5, y - 0.5
    warped_img = sample_pixels(img, sx, sy, mode="nearest")
    warped_depth = sample_pixels(depth_src[..., None], sx, sy,
                                 mode="nearest")[..., 0]

    mask_warp = (x >= 0) & (x < w) & (y >= 0) & (y < h)

    # Depth-agreement mask, normalized by the warped depth's range with
    # zero-depth (holes) excluded from the min (set to 1e4 for min).
    nonzero = warped_depth > 0
    d_for_min = jnp.where(nonzero, warped_depth, 1e4)
    d_max = warped_depth.max()
    d_min = d_for_min.min()
    rng = jnp.maximum(d_max - d_min, 1e-12)
    norm_warped = jnp.where(nonzero, (warped_depth - d_min) / rng, 0.0)
    norm_dst = (depth_dst - d_min) / rng
    diff = jnp.abs(norm_warped - norm_dst)
    mask_depth = diff < 0.3
    mask_depth_strict = diff < 0.1

    reproj_err = consistency_check_with_depth(depth_dst, w2c_dst, K,
                                              depth_src, w2c_src, K)
    mask_reproj = (reproj_err < bandwidth) & mask_warp
    soft_mask_reproj = jnp.exp(-((reproj_err / bandwidth) ** 3))

    return InverseWarpResult(
        warped_img=warped_img,
        warped_depth=jnp.where(nonzero, warped_depth, 0.0),
        mask_warp=mask_warp,
        mask_depth=mask_depth,
        mask_depth_strict=mask_depth_strict,
        mask=mask_warp & mask_depth,
        mask_reproj=mask_reproj,
        soft_mask_reproj=soft_mask_reproj,
    )


def dilate_mask(mask: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Binary dilation with a size x size square kernel (the reference's 5x5
    max-pool dilation of occlusion masks, diffusionGS.py:1452-1465)."""
    import jax.lax as lax
    pad = size // 2
    m = mask.astype(jnp.float32)[None, ..., None]   # NHWC
    out = lax.reduce_window(m, -jnp.inf, lax.max, (1, size, size, 1),
                            (1, 1, 1, 1),
                            ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return out[0, ..., 0] > 0.5


def downsample_mask_to_latent(mask: jnp.ndarray, lat_h: int,
                              lat_w: int) -> jnp.ndarray:
    """Pixel-res mask -> latent-res mask by block mean — the reference's
    reshape(72, 8, 128, 8).mean trick (diffusionGS.py:851-857)."""
    h, w = mask.shape
    fh, fw = h // lat_h, w // lat_w
    return mask.astype(jnp.float32).reshape(lat_h, fh, lat_w, fw).mean(axis=(1, 3))
