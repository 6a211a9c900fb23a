"""Image resampling (gather) ops in pure JAX.

The reference leans on ``torch.nn.functional.grid_sample`` for backward
warping (``solver_utils/forward_warp.py:227-231``) and depth lookups
(``solver_utils/consistency.py:76``). On TPU a hand-rolled gather is the
right primitive: XLA lowers jnp take/gather + the bilinear blend into fused
vector code, with no kernel needed. We implement the exact torch sampling
semantics (normalized grids, align_corners on/off, zeros padding) so parity
tests against the reference numerics are possible, plus a pixel-coordinate
variant used internally.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather img[(iy, ix)] with zeros outside bounds.

    img: (H, W, C); ix/iy: int32 (...,). Returns (..., C).
    """
    h, w = img.shape[:2]
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    out = img[iyc, ixc]
    return jnp.where(valid[..., None], out, 0.0)


def sample_pixels(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  mode: str = "bilinear") -> jnp.ndarray:
    """Sample ``img`` (H, W, C) at float pixel coordinates x, y (...,).

    Zeros padding outside the image. Returns (..., C).
    """
    if mode == "nearest":
        # torch grid_sample nearest: round-half-away handled via floor(x+0.5)
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        return _gather_2d(img, ix, iy)
    if mode != "bilinear":
        raise ValueError(f"unknown mode {mode}")
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = _gather_2d(img, x0i, y0i)
    v01 = _gather_2d(img, x0i + 1, y0i)
    v10 = _gather_2d(img, x0i, y0i + 1)
    v11 = _gather_2d(img, x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (zeros padding).

    img: (H, W, C) channel-last; grid: (..., 2) normalized coords in [-1, 1],
    grid[..., 0] = x. Returns (..., C).
    """
    h, w = img.shape[:2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    return sample_pixels(img, x, y, mode=mode)
