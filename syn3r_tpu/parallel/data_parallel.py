"""Data-parallel training/inference steps over a device mesh.

Scene/view data parallelism for the 3DGS fit: the Gaussian state is
replicated, the camera/image batch is sharded along the mesh's data axis,
per-view losses are averaged (XLA inserts the psum over ICI), and the Adam
update happens replicated. This is the multi-chip form of the reference's
bash-loop scene parallelism (SURVEY.md §2.7) — one scene's views, or many
scenes, spread across chips.

Also provides a sharded SVD-UNet denoise forward: the CFG x direction batch
axis is embarrassingly parallel and shards cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..gs import losses
from ..gs.trainer import AdamState, TrainConfig, TrainState, _position_lr, adam_update
from ..models import gaussians as G
from ..ops import rasterize as rz
from ..utils.camera import Camera
from .mesh import replicated, sharded


def make_dp_gs_train_step(mesh: Mesh, cfg: TrainConfig, extent: float):
    """Build a jitted data-parallel GS train step.

    step(ts, cameras, images) -> (ts, loss): cameras is a batched Camera
    pytree and images (V, H, W, 3); both sharded over the data axis, V a
    multiple of the mesh size. Gradients are the mean over all views.
    """
    rep = replicated(mesh)
    shd = sharded(mesh)

    def step(ts: TrainState, cameras: Camera, images: jnp.ndarray):
        g = ts.gaussians
        params = G.get_params(g)
        bg = jnp.asarray(cfg.bg_color, jnp.float32)

        def loss_fn(p):
            st = G.with_params(g, p)

            def per_view(cam, img):
                out = rz.render(st, cam, sh_degree=cfg.sh_degree, bg=bg,
                                chunk=cfg.chunk, group=cfg.group)
                return losses.photometric_loss(
                    out.rgb, img, lambda_dssim=cfg.lambda_dssim,
                    confidence=cam.confidence)

            return jax.vmap(per_view)(cameras, images).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lr_pos = _position_lr(cfg, extent, ts.step)
        lrs = {"means": lr_pos, "quats": cfg.rotation_lr,
               "log_scales": cfg.scaling_lr, "opacity_logits": cfg.opacity_lr,
               "sh_dc": cfg.feature_lr, "sh_rest": cfg.feature_lr / 20.0}
        new_params, new_adam = adam_update(params, grads, ts.adam, lrs)
        new_ts = TrainState(gaussians=G.with_params(g, new_params),
                            adam=new_adam, stats=ts.stats,
                            step=ts.step + 1, key=ts.key)
        return new_ts, loss

    step_jit = jax.jit(step)

    def prepare(ts: TrainState, cameras: Camera, images: jnp.ndarray):
        """device_put the operands with DP shardings (state replicated,
        views sharded); jit then propagates these through the step."""
        ts = jax.device_put(ts, rep)
        cameras = jax.tree.map(lambda x: jax.device_put(x, shd), cameras)
        images = jax.device_put(images, shd)
        return ts, cameras, images

    return step_jit, prepare


def make_dp_unet_forward(mesh: Mesh, unet, params):
    """Sharded SVD-UNet forward: batch axis (CFG x direction) over devices.

    Returns f(sample (B, F, h, w, 8), t, ehs (B, 1, D), tids (B, 3)).
    """
    rep = replicated(mesh)
    shd = sharded(mesh)

    params = jax.device_put(params, rep)

    from ..ops.pallas_ffn import pallas_disabled

    def _apply(s, t, e, i):
        # the Pallas GEGLU custom call has no partition rule; trace the
        # reference FF so the batch-sharded rows partition cleanly
        with pallas_disabled():
            return unet.apply(params, s, t, e, i)

    fwd = jax.jit(_apply)

    def run(sample, t, ehs, tids):
        sample = jax.device_put(sample, shd)
        ehs = jax.device_put(ehs, shd)
        tids = jax.device_put(tids, shd)
        return fwd(sample, t, ehs, tids)

    return run
