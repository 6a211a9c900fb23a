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


def _binned_gather(feats, order, idx, entry_valid):
    """Per-tile feature compaction gather.

    feats: (N, F) unsorted per-gaussian features; order: (N,) depth
    permutation; idx: (T, cap) sorted-space slot indices. Returns
    (T, cap, F) with invalid entries zeroed. The transpose (backward) is a
    scatter-add of only T*cap rows — measured ~7 ms inside the full train
    step at 96 tiles x cap 512, CHEAPER than a scatter-free chunked
    gather-sum rewrite (which cost ~44 ms: (T, N, F)-shaped cotangent
    traffic dwarfs the small scatter). The forward compaction is the part
    that must avoid a (T, N)-sized scatter (see rasterize_tiled).
    """
    g = feats[jax.lax.stop_gradient(order)[idx]]             # (T, cap, F)
    return jnp.where(entry_valid[..., None], g, 0.0)


def _slots_from_cumsum(cs: jnp.ndarray, cap: int, block: int = 512):
    """idx[t, s] = first index where the inclusive hit-cumsum reaches s+1
    — i.e. the sorted-space position of tile t's s-th intersecting
    gaussian. Exact equivalent of a batched ``searchsorted(cs[t], s+1)``
    (returns N where a tile has fewer than s+1 hits), restructured for
    TPU: binary search over the (T, N) cumsum costs log2(N) strided
    gathers (measured 7.8 ms at 96x65536x512); instead search the (T,
    N/block) block-end table by a dense compare-and-count and resolve the
    offset inside the one candidate block the same way (measured 0.4 ms).
    """
    t, n = cs.shape
    n_pad = -(-n // block) * block
    if n_pad != n:
        # pad with the row maximum — keeps rows monotone, adds no hits
        cs = jnp.concatenate(
            [cs, jnp.repeat(cs[:, -1:], n_pad - n, axis=1)], axis=1)
    nb = n_pad // block
    slots = jnp.arange(1, cap + 1, dtype=cs.dtype)
    csb = cs.reshape(t, nb, block)
    ends = csb[:, :, -1]                                     # (T, nb)
    blk = jnp.sum((ends[:, None, :] < slots[None, :, None])
                  .astype(jnp.int32), axis=2)                # (T, cap)
    blk = jnp.minimum(blk, nb - 1)
    seg = jnp.take_along_axis(csb, blk[:, :, None], axis=1)  # (T, cap, blk)
    off = jnp.sum((seg < slots[None, :, None]).astype(jnp.int32), axis=2)
    # missing slots land at n_pad in the padded row — clamp to searchsorted's n
    return jnp.minimum(blk * block + off, n)


@functools.partial(jax.jit, static_argnames=("height", "width", "tile_h",
                                              "tile_w", "cap", "chunk",
                                              "group", "composite"))
def rasterize_tiled(sg: ScreenGaussians, height: int, width: int,
                    tile_h: int = 32, tile_w: int = 64, cap: int = 1024,
                    chunk: int = 256, group: int = 2,
                    bg: jnp.ndarray | None = None,
                    composite: str = "xla") -> RenderOutput:
    """Tile-culled rasterization — the production path.

    The dense path evaluates every Gaussian against every pixel; here each
    (tile_h x tile_w) tile composites only the depth-sorted Gaussians whose
    3-sigma screen bbox intersects it, compacted into a per-tile list of at
    most ``cap`` entries (overflow drops the REARMOST entries — the ones a
    saturated tile cannot see; size cap generously). Pixel coordinates are
    tile-local (the Gaussian power is translation invariant), which keeps
    the quadratic pixel features small.

    Scatter-free forward by construction: XLA:TPU serializes general
    scatters, so the compaction is expressed as gathers — slot s of tile t
    holds the gaussian at the first index where the per-tile hit cumsum
    reaches s+1, located by a blocked compare-and-count search
    (``_slots_from_cumsum``). The backward of the per-tile feature gather
    is XLA's default gather transpose, a scatter-add of only T*cap rows
    (vs the (T, N) scatter the forward avoids) — measured cheaper than any
    scatter-free rewrite of it (see ``_binned_gather``).
    """
    n = sg.center.shape[0]
    ty = -(-height // tile_h)
    tx = -(-width // tile_w)
    n_tiles = ty * tx

    depth_key = jnp.where(sg.valid & (sg.opacity > 0), sg.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    # the bbox/hit computation is integer-like bookkeeping — no gradients
    # flow through it (they flow through the gathered features below)
    center_s = jax.lax.stop_gradient(sg.center)[order]
    radius_s = jax.lax.stop_gradient(
        jnp.where(sg.valid, sg.radius, 0.0))[order]
    valid_s = (sg.valid & (sg.opacity > 0))[order]

    # tile intersection masks in depth-sorted column space: (T, N)
    x0 = center_s[:, 0] - radius_s
    x1 = center_s[:, 0] + radius_s
    y0 = center_s[:, 1] - radius_s
    y1 = center_s[:, 1] + radius_s
    tile_ix = jnp.arange(n_tiles) % tx
    tile_iy = jnp.arange(n_tiles) // tx
    tx0 = (tile_ix * tile_w).astype(jnp.float32)[:, None]
    ty0 = (tile_iy * tile_h).astype(jnp.float32)[:, None]
    hit = (valid_s[None, :]
           & (x1[None, :] >= tx0) & (x0[None, :] < tx0 + tile_w)
           & (y1[None, :] >= ty0) & (y0[None, :] < ty0 + tile_h))

    # Stable compaction (keeps depth order inside each tile list) without
    # a scatter: slot s of tile t holds the gaussian at the first index
    # where the inclusive hit-cumsum reaches s+1.
    cap = min(cap, n)
    hit_i = hit.astype(jnp.int32)
    cs = jnp.cumsum(hit_i, axis=1)                             # inclusive
    # Materialize the (T, N) cumsum exactly once: without the barrier
    # XLA's fusion duplication recomputes hit+cumsum inside every one of
    # the ~8 searchsorted/gather consumer fusions (measured 80 ms/step of
    # pure recompute at N=65k when an SSIM conv shares the graph).
    cs = jax.lax.optimization_barrier(cs)
    counts = cs[:, -1]
    idx = _slots_from_cumsum(cs, cap)
    idx = jnp.minimum(idx, n - 1)                              # (T, cap)
    idx = jax.lax.optimization_barrier(idx)
    entry_valid = jnp.arange(cap)[None, :] < jnp.minimum(counts, cap)[:, None]

    G, C = _gaussian_matmul_features(sg)                       # unsorted
    feats = jnp.concatenate([G, C, sg.opacity[:, None],
                             sg.center], axis=-1)              # (N, 14)
    tF = _binned_gather(feats, order, idx, entry_valid)
    tG = tF[..., 0:6]                                          # (T, cap, 6)
    tC = tF[..., 6:11]
    tO = tF[..., 11]
    tCx = tF[..., 12:14]                                       # (T, cap, 2)

    # shift gaussian features to tile-local coordinates: G depends on the
    # center only through terms linear/quadratic in (gx, gy); rebuilding
    # from conic + local center is simpler than shifting the packed form.
    a = -2.0 * tG[..., 0]
    b = -tG[..., 1]
    c = -2.0 * tG[..., 2]
    gx = tCx[..., 0] - tx0                                     # local
    gy = tCx[..., 1] - ty0
    tGl = jnp.stack([
        -0.5 * a, -b, -0.5 * c,
        a * gx + b * gy, b * gx + c * gy,
        -0.5 * (a * gx * gx + 2.0 * b * gx * gy + c * gy * gy),
    ], axis=-1)

    ys = jnp.arange(tile_h, dtype=jnp.float32)[:, None].repeat(tile_w, 1)
    xs = jnp.arange(tile_w, dtype=jnp.float32)[None, :].repeat(tile_h, 0)
    P = pixel_features(ys.ravel(), xs.ravel())                 # (px, 6)

    if composite == "pallas":
        from .pallas_rasterize import composite_tiles
        # K=128 keeps the backward kernel's ~8 live (K, px) f32 temps
        # within the 16 MB VMEM budget at px=2048. The kernel needs
        # cap % K == 0: zero-pad the per-tile lists up to a K multiple
        # (padding entries have opacity 0 and composite to nothing)
        # rather than shrinking K, which for odd caps degraded to K=1
        # (serializing the kernel) and blew the residual VMEM buffer.
        K = max(1, min(chunk, cap, 128))
        cap_p = -(-max(cap, 1) // K) * K
        if cap_p != cap:
            pad = [(0, 0), (0, cap_p - cap), (0, 0)]
            tGl = jnp.pad(tGl, pad)
            tC = jnp.pad(tC, pad)
            tO = jnp.pad(tO, pad[:2])
        kout = composite_tiles(P.T, tGl.transpose(0, 2, 1),
                               tC.transpose(0, 2, 1), tO[:, None, :], K)
        accum = kout[:, 0:4].transpose(0, 2, 1)                # (T, px, 4)
        alpha_t = 1.0 - jnp.exp(kout[:, 5])                    # (T, px)
        out = jnp.concatenate([accum, alpha_t[..., None]], axis=-1)
        out = out.reshape(ty, tx, tile_h, tile_w, 5)
        out = out.transpose(0, 2, 1, 3, 4).reshape(ty * tile_h,
                                                   tx * tile_w, 5)
        out = out[:height, :width]
        rgb = out[..., :3]
        alpha = out[..., 4]
        if bg is not None:
            rgb = rgb + (1.0 - alpha[..., None]) * bg
        return RenderOutput(rgb=rgb, depth=out[..., 3], alpha=alpha)

    chunk = min(chunk, cap)
    n_chunks = -(-cap // chunk)
    grp = min(group, n_chunks)
    n_groups = -(-n_chunks // grp)
    pad_rows = n_groups * grp * chunk - cap

    def tile_fn(Gt, Ct, Ot):
        if pad_rows:
            Gt = jnp.pad(Gt, ((0, pad_rows), (0, 0)))
            Ct = jnp.pad(Ct, ((0, pad_rows), (0, 0)))
            Ot = jnp.pad(Ot, ((0, pad_rows),))
        Gr = Gt.reshape(n_groups, grp, chunk, 6)
        Cr = Ct.reshape(n_groups, grp, chunk, 5)
        Or = Ot.reshape(n_groups, grp, chunk)

        def chunk_body(carry, data):
            accum, logT = carry
            Gc, Cc, Oc = data
            power = jnp.dot(P, Gc.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            power = jnp.minimum(power, 0.0)
            alpha = Oc[None, :] * jnp.exp(power)
            alpha = jnp.minimum(alpha, _ALPHA_MAX)
            alpha = jnp.where(alpha < _ALPHA_MIN, 0.0, alpha)
            l1ma = jnp.log1p(-alpha)
            excl = jnp.cumsum(l1ma, axis=1) - l1ma
            w = alpha * jnp.exp(logT[:, None] + excl)
            accum = accum + jnp.dot(w, Cc,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            return (accum, logT + jnp.sum(l1ma, axis=1)), None

        def group_body(carry, gdata):
            inner = functools.partial(jax.lax.scan, chunk_body)
            carry, _ = jax.checkpoint(inner)(carry, gdata)
            return carry, None

        init = (jnp.zeros((tile_h * tile_w, 5), jnp.float32),
                jnp.zeros((tile_h * tile_w,), jnp.float32))
        (accum, logT), _ = jax.lax.scan(group_body, init, (Gr, Cr, Or))
        return jnp.concatenate(
            [accum[:, :4], (1.0 - jnp.exp(logT))[:, None]], axis=-1)

    out = jax.vmap(tile_fn)(tGl, tC, tO)                       # (T, px, 5)
    out = out.reshape(ty, tx, tile_h, tile_w, 5)
    out = out.transpose(0, 2, 1, 3, 4).reshape(ty * tile_h, tx * tile_w, 5)
    out = out[:height, :width]
    rgb = out[..., :3]
    alpha = out[..., 4]
    if bg is not None:
        rgb = rgb + (1.0 - alpha[..., None]) * bg
    return RenderOutput(rgb=rgb, depth=out[..., 3], alpha=alpha)


def render(state: GaussianState, camera: Camera, sh_degree: int = 3,
           bg: jnp.ndarray | None = None, near: float = 0.2,
           chunk: int = 256, group: int = 8,
           center_offset: jnp.ndarray | None = None,
           method: str = "dense", tile_cap: int = 1024) -> RenderOutput:
    """Project + rasterize in one call (the ``render_view`` equivalent).

    method: 'dense' (exact, every gaussian vs every pixel — the reference
    implementation for tests), 'tiled' (culled, XLA composite) or 'pallas'
    (culled, in-VMEM Pallas composite — the production path)."""
    sg = project_gaussians(state, camera, sh_degree=sh_degree, near=near,
                           center_offset=center_offset)
    if method in ("tiled", "pallas"):
        return rasterize_tiled(sg, camera.height, camera.width, cap=tile_cap,
                               chunk=min(chunk, tile_cap), bg=bg,
                               composite="pallas" if method == "pallas"
                               else "xla")
    return rasterize(sg, camera.height, camera.width, bg=bg, chunk=chunk,
                     group=group)
