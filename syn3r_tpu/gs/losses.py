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
