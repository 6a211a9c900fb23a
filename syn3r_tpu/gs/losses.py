"""Photometric losses for 3DGS test-time fitting.

The 3DGS-family objective (FSGS fork, missing submodule — flags visible at
reference ``bash_scripts/batch_llff_train.sh:39``, ``batch_dtu_train.sh:42``):
(1 - lambda_dssim) * L1 + lambda_dssim * (1 - SSIM), optionally + LPIPS
(``--lpips_weight``, ``opt.use_lpips_loss`` at reference
``model/diffusionGS.py:1690,1697``), all scaled by the per-camera
confidence weight (the fork's ``cam_confidence`` mechanism).

LPIPS requires pretrained VGG weights; it is gated behind a weights file
(no network egress in this environment) — see ``syn3r_tpu/models/lpips.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.image import ssim


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def dssim_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM (the 3DGS 11x11 gaussian-window form)."""
    return 1.0 - ssim(pred, target)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     lambda_dssim: float = 0.2,
                     confidence: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    loss = (1.0 - lambda_dssim) * l1_loss(pred, target) \
        + lambda_dssim * dssim_loss(pred, target)
    return confidence * loss


def pearson_depth_loss(pred_depth: jnp.ndarray, target_depth: jnp.ndarray,
                       valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """1 - Pearson correlation between rendered and target depth.

    The FSGS-family depth supervision form (upstream FSGS supervises
    rendered depth against monocular depth estimates with a Pearson
    correlation loss, which is invariant to the unknown scale/shift of the
    target depth). The SYN3R fork's ``--svd_depth_warmup`` /
    ``sample_svd_pseudo_interval`` flags (reference
    ``bash_scripts/batch_llff_train.sh:39``) imply the same term applied to
    SVD pseudo views; the submodule is absent so the exact weighting is
    reconstructed, not copied — see gs/trainer.py.

    ``valid``: optional (H, W) bool mask (e.g. target depth > 0).
    """
    p = pred_depth.ravel()
    t = target_depth.ravel()
    if valid is not None:
        v = valid.ravel().astype(p.dtype)
    else:
        v = jnp.ones_like(p)
    n = jnp.maximum(v.sum(), 1.0)
    pm = (p * v).sum() / n
    tm = (t * v).sum() / n
    pc = (p - pm) * v
    tc = (t - tm) * v
    cov = (pc * tc).sum() / n
    var_p = (pc * pc).sum() / n
    var_t = (tc * tc).sum() / n
    corr = cov * jax.lax.rsqrt(var_p * var_t + 1e-12)
    return 1.0 - corr
