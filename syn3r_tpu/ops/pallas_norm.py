"""Pallas TPU kernels for GroupNorm / LayerNorm statistics.

Replaces the XLA-emitted normalization reductions inside the SVD UNet
(reference consumes torch GroupNorm/LayerNorm via diffusers; SURVEY.md
§2.8). Motivation (traced on a full 25x72x128 batch-3 UNet forward): XLA's
layout assignment gives the conv/transformer activations batch-on-sublane
layouts under which its reduce emitter runs ~20x below HBM bandwidth —
585 ms of a 2.9 s forward was norm statistics alone (e.g. 29.6 ms for ONE
442 MB GroupNorm stats+add fusion that streams in 0.68 ms with a sane
layout). A pallas_call pins its operands to the default layout, so the
kernels below both force the fast layout and fuse the whole normalize
(+ optional silu) into a single read-write pass.

All kernels are inference-path (the guided denoiser is gradient-free);
callers fall back to plain jnp off-TPU or for shapes the blocking doesn't
cover, so CPU tests and autodiff paths are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_reference(x3: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, num_groups: int, eps: float,
                         dtype, silu: bool = False) -> jnp.ndarray:
    """jnp GroupNorm over (B, S, C) with channel-major statistics.

    Math note: group mean/var are exact functions of per-channel
    first/second moments (equal counts per channel), so the full-lane
    per-channel spatial sums + a tiny (B, G, C/G) group-sum reproduce
    flax's nn.GroupNorm to f32 summation-order noise. Stats and affine in
    f32; output cast to ``dtype``."""
    b, s, c = x3.shape
    cg = c // num_groups
    xf = x3.astype(jnp.float32)
    n = s * cg
    s1 = xf.sum(axis=1)                              # (B, C)
    s2 = (xf * xf).sum(axis=1)
    gs1 = s1.reshape(b, num_groups, cg).sum(-1)      # (B, G)
    gs2 = s2.reshape(b, num_groups, cg).sum(-1)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=-1)[:, None]  # (B, 1, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)[:, None]
    y = (xf - mean_c) * rstd_c
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(dtype)


def layer_norm_reference(x2: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, eps: float,
                         dtype) -> jnp.ndarray:
    """jnp LayerNorm over the last axis of (R, C); f32 stats/affine."""
    xf = x2.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(dtype)


def _pick_block(n: int, channels: int,
                candidates=(2048, 1024, 768, 640, 576, 512, 384,
                            256, 128)) -> int | None:
    """Largest candidate dividing n whose block fits the VMEM budget
    (~8 MB for the bf16 block + its f32 working copy + output)."""
    budget = 8 * 1024 * 1024
    for c in candidates:
        if n % c == 0 and c * channels * 8 <= budget:
            return c
    return None


# ---------------------------------------------------------------------------
# GroupNorm: stats kernel + fused apply kernel
# ---------------------------------------------------------------------------

def _gn_stats_kernel(x_ref, s1_ref, s2_ref):
    # s1/s2 are whole-(B, C) VMEM blocks revisited by every grid step
    # (a (1, C) block would violate the 8-sublane block constraint);
    # row b accumulates across the S-steps of batch element b.
    b = pl.program_id(0)
    xb = x_ref[0].astype(jnp.float32)                    # (Sb, C)
    p1 = jnp.sum(xb, axis=0, keepdims=True)              # (1, C)
    p2 = jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s1_ref[pl.ds(b, 1), :] = jnp.zeros_like(p1)
        s2_ref[pl.ds(b, 1), :] = jnp.zeros_like(p2)

    s1_ref[pl.ds(b, 1), :] += p1
    s2_ref[pl.ds(b, 1), :] += p2


def _gn_apply_kernel(x_ref, a_ref, b_ref, y_ref, *, silu: bool):
    b = pl.program_id(0)
    xb = x_ref[0].astype(jnp.float32)                    # (Sb, C)
    y = xb * a_ref[pl.ds(b, 1), :] + b_ref[pl.ds(b, 1), :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def group_norm_pallas(x3: jnp.ndarray, scale: jnp.ndarray,
                      bias: jnp.ndarray, num_groups: int, eps: float,
                      dtype, silu: bool = False,
                      interpret: bool = False) -> jnp.ndarray | None:
    """GroupNorm over (B, S, C) with stats reduced over (S, C/G).

    Returns None when the shape doesn't fit the blocking (caller falls
    back to the jnp path). Affine is folded into the apply pass:
    y = x * (rstd * scale) + (bias - mean * rstd * scale), optionally
    followed by silu in the same pass.
    """
    b, s, c = x3.shape
    sb = _pick_block(s, c)
    if sb is None or c % num_groups:
        return None
    ns = s // sb
    cg = c // num_groups

    s1, s2 = pl.pallas_call(
        _gn_stats_kernel,
        grid=(b, ns),
        in_specs=[pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((b, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((b, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)],
        interpret=interpret,
    )(x3)

    n = s * cg
    gs1 = s1.reshape(b, num_groups, cg).sum(-1)
    gs2 = s2.reshape(b, num_groups, cg).sum(-1)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=-1)               # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    a = rstd_c * scale.astype(jnp.float32)[None]
    bb = bias.astype(jnp.float32)[None] - mean_c * a

    y = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        grid=(b, ns),
        in_specs=[pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        interpret=interpret,
    )(x3, a, bb)
    return y


# ---------------------------------------------------------------------------
# LayerNorm: single fused pass (stats are per-row local)
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    xb = x_ref[...].astype(jnp.float32)                  # (Rb, C)
    c = xb.shape[1]
    mean = jnp.mean(xb, axis=1, keepdims=True)           # (Rb, 1)
    var = jnp.mean(xb * xb, axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xb - mean) * rstd * g_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def layer_norm_pallas(x2: jnp.ndarray, scale: jnp.ndarray,
                      bias: jnp.ndarray, eps: float, dtype,
                      interpret: bool = False) -> jnp.ndarray | None:
    """LayerNorm over the last axis of (R, C) rows, one fused pass.

    Returns None when R doesn't block cleanly (caller falls back)."""
    r, c = x2.shape
    rb = _pick_block(r, c)
    if rb is None:
        return None
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), dtype),
        interpret=interpret,
    )(x2, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None])


# ---------------------------------------------------------------------------
# Differentiable public entry points
# ---------------------------------------------------------------------------
# The pallas kernels are forward-only; the backward recomputes via the jnp
# reference (same math), so the legacy grad-through-UNet path and any loss
# built on these norms still differentiates.
#
# USE_PALLAS default False: measured on the full batch-3 SVD UNet forward,
# the kernels win in isolation (GN 0.68 ms vs flax 2.78 ms at 75x9216x320)
# but every pallas_call pins its operands to the default layout, and XLA
# then re-lays-out the conv/attention tensors around all ~180 call sites
# (+~900 ms of copies/fusions; net 2.87 -> 3.21 s). Re-confirmed by the
# round-4 controlled A/B (scripts/ab_flags.py, 2026-08-20, twice): NORMS=1
# is 3.24 s vs 3.146 s baseline, and 3.093-3.101 s vs 3.051-3.056 s when
# stacked on the (winning, now-default) Pallas FFN — a consistent ~1.5-3%
# LOSS either way. The jnp reference (whose channel-major stats XLA
# compiles to the same speed in-graph) stays the production route.

USE_PALLAS = __import__("os").environ.get("SYN3R_PALLAS_NORMS", "0") == "1"


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm(x3, scale, bias, num_groups: int, eps: float, dtype,
               silu: bool = False):
    """GroupNorm over (B, S, C): Pallas on TPU when enabled and the shape
    blocks cleanly, jnp reference otherwise. Optionally fuses silu."""
    if USE_PALLAS and _on_tpu():
        y = group_norm_pallas(x3, scale, bias, num_groups, eps, dtype,
                              silu=silu)
        if y is not None:
            return y
    return group_norm_reference(x3, scale, bias, num_groups, eps, dtype,
                                silu=silu)


def _gn_fwd(x3, scale, bias, num_groups, eps, dtype, silu):
    return (group_norm(x3, scale, bias, num_groups, eps, dtype, silu),
            (x3, scale, bias))


def _gn_bwd(num_groups, eps, dtype, silu, res, g):
    x3, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_reference(x, s, b, num_groups, eps,
                                             dtype, silu), x3, scale, bias)
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x2, scale, bias, eps: float, dtype):
    """LayerNorm over (R, C) rows: fused Pallas pass on TPU when enabled,
    jnp reference otherwise."""
    if USE_PALLAS and _on_tpu():
        y = layer_norm_pallas(x2, scale, bias, eps, dtype)
        if y is not None:
            return y
    return layer_norm_reference(x2, scale, bias, eps, dtype)


def _ln_fwd(x2, scale, bias, eps, dtype):
    return layer_norm(x2, scale, bias, eps, dtype), (x2, scale, bias)


def _ln_bwd(eps, dtype, res, g):
    x2, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: layer_norm_reference(x, s, b, eps, dtype),
        x2, scale, bias)
    return vjp(g)


layer_norm.defvjp(_ln_fwd, _ln_bwd)
