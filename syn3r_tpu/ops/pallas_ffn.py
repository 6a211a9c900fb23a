"""Pallas TPU kernel for the SVD transformer GEGLU feed-forward.

The FeedForward of every spatial/temporal transformer block projects
C -> 8C (GEGLU pair), gates, and projects 4C -> C (reference diffusers
``FeedForward``/``GEGLU``; SURVEY.md §2.8). Under XLA the 8C-wide
intermediate is materialized in HBM — at SVD's 320-channel level that is a
(75·9216, 2560) bf16 tensor, 3.5 GB written by the first matmul and read
back by the second: ~7 GB of HBM traffic per FF call, ~28 ms traced, for
an op whose inputs and outputs are only ~0.9 GB. This kernel tiles the
rows, keeps BOTH weight matrices resident in VMEM (constant-index blocks
are fetched once), and never lets the 8C intermediate leave VMEM.

Numerics mirror the jnp path exactly: bf16 matmuls with f32 accumulation
cast back to the compute dtype, bias adds and the exact (erf) gelu in the
compute dtype — the same ops nn.Dense/GEGLU perform.

Inference-path kernel: callers (models.layers.FeedForward) route here only
on TPU for shapes that block cleanly, with a custom_vjp whose backward
recomputes through the jnp reference, so autodiff and CPU tests are
unaffected.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def geglu_ffn_reference(x2: jnp.ndarray, w1, b1, w2, b2,
                        dtype) -> jnp.ndarray:
    """jnp GEGLU FF on (R, C) rows — mirrors Dense(dtype)->split->
    a*gelu(g)->Dense(dtype)."""
    dt = dtype
    h = jnp.dot(x2.astype(dt), w1.astype(dt)) + b1.astype(dt)
    a, g = jnp.split(h, 2, axis=-1)
    prod = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(prod, w2.astype(dt)) + b2.astype(dt)


def _gelu_exact(x):
    """erf-gelu with an in-kernel erf: Mosaic lowers neither erfc (what
    jax.nn.gelu(approximate=False) uses) nor lax.erf, so erf is evaluated
    with the Abramowitz-Stegun 7.1.26 rational approximation in f32 (max
    abs error 1.5e-7 — two orders below bf16 resolution, so the kernel is
    bf16-indistinguishable from XLA's erf gelu)."""
    xf = x.astype(jnp.float32)
    z = xf * (1.0 / 2.0 ** 0.5)
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    y = 0.5 * xf * (1.0 + erf)
    return y.astype(x.dtype)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    dt = y_ref.dtype
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(dt)
    h = h + b1_ref[...]
    inner = h.shape[1] // 2
    a = h[:, :inner]
    g = h[:, inner:]
    prod = a * _gelu_exact(g)
    y = jax.lax.dot_general(prod, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(dt)
    y_ref[...] = y + b2_ref[...]


def _row_block(r: int, c: int) -> int | None:
    """Row tile: weights (16c² + 8c² bytes) + the 8C intermediate must fit
    VMEM. c=320 -> 512 rows (~11 MB total); c=640 -> 128 rows (~14 MB);
    c>=1280 -> weights alone exceed VMEM, caller falls back."""
    if c * c * 24 > 11 * 1024 * 1024:
        return None
    cap = 512 if c <= 320 else 128
    for rb in (cap, 256, 128, 64):
        if rb <= cap and r % rb == 0:
            return rb
    return None


def geglu_ffn_pallas(x2: jnp.ndarray, w1, b1, w2, b2, dtype,
                     interpret: bool = False) -> jnp.ndarray | None:
    """(R, C) @ GEGLU FF without materializing the 8C intermediate in HBM.

    Returns None when the shape doesn't block cleanly (caller falls back).
    """
    r, c = x2.shape
    two_i = w1.shape[1]
    i = two_i // 2
    if w2.shape != (i, c):
        return None
    rb = _row_block(r, c)
    if rb is None:
        return None
    dt = dtype
    return pl.pallas_call(
        _ffn_kernel,
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, two_i), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, two_i), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((i, c), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, c), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), dt),
        interpret=interpret,
    )(x2.astype(dt), w1.astype(dt), b1.astype(dt)[None],
      w2.astype(dt), b2.astype(dt)[None])


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


# ON by default: the controlled on-chip A/B (scripts/ab_flags.py, run
# twice 2026-08-20 with the tuned attention blocks in place) measures the
# full batch-3 SVD UNet forward at 3.051/3.056 s with the kernel vs
# 3.145/3.146 s without — a reproducible 2.9-3.0% win. (An earlier
# round-3 measurement had it losing to layout round-trips at the call
# boundaries; with the current graph the ~2x per-FF win [13.4 vs ~27 ms
# at the 320-channel level] survives the copies.) SYN3R_PALLAS_FFN=0
# opts out.
USE_PALLAS = __import__("os").environ.get("SYN3R_PALLAS_FFN", "1") == "1"

_disable_depth = 0


@contextlib.contextmanager
def pallas_disabled():
    """Trace-time escape hatch: while active, ``geglu_ffn`` always lowers
    the jnp reference path. The parallel layer traces its GSPMD-sharded
    UNet forwards under this — a pallas custom call carries no partition
    rule, so GSPMD would all-gather the sharded weights/activations at
    every FF call site (see parallel/tensor_parallel.py docstring)."""
    global _disable_depth
    _disable_depth += 1
    try:
        yield
    finally:
        _disable_depth -= 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def geglu_ffn(x2, w1, b1, w2, b2, dtype):
    """GEGLU FF on (R, C): fused Pallas kernel on TPU when enabled and the
    shape blocks cleanly, jnp reference otherwise. Differentiable
    (backward recomputes through the reference)."""
    if USE_PALLAS and not _disable_depth and _on_tpu():
        y = geglu_ffn_pallas(x2, w1, b1, w2, b2, dtype)
        if y is not None:
            return y
    return geglu_ffn_reference(x2, w1, b1, w2, b2, dtype)


def _ffn_fwd(x2, w1, b1, w2, b2, dtype):
    return geglu_ffn(x2, w1, b1, w2, b2, dtype), (x2, w1, b1, w2, b2)


def _ffn_bwd(dtype, res, g):
    _, vjp = jax.vjp(
        lambda *a: geglu_ffn_reference(*a, dtype), *res)
    return vjp(g)


geglu_ffn.defvjp(_ffn_fwd, _ffn_bwd)
