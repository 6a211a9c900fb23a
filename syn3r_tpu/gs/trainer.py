"""The 3DGS test-time trainer — capability equivalent of the reference's
FSGS ``GSTrainer`` (missing submodule; interface reconstructed in
SURVEY.md §2.5 from call sites in ``scripts/train.py:15,83`` and
``model/diffusionGS.py:127-175,471-482,1610-1645``).

TPU-first design:
  - One jitted train step: render -> confidence-weighted
    L1+DSSIM -> grads -> per-field Adam -> densify-stats update. The whole
    camera set lives on device as one batched pytree; per-iteration view
    selection is a dynamic index, so the step compiles once.
  - Adam is hand-rolled per field (not optax) so densification can zero
    the moments of rewritten slots exactly like the CUDA trainer's
    fresh-tensor reallocation.
  - Densify/prune runs as a jitted compaction at fixed capacity
    (gs/densify.py); the host doubles capacity when occupancy > 85%.
  - Confidence: per-camera scalar multiplying the loss — the semantics of
    the fork's ``cam_confidence``/``update_cameras(cam_confidences=)``
    (reference ``model/diffusionGS.py:163,1631``).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..ops import rasterize as rz
from ..utils.camera import Camera, make_camera
from . import losses
from .densify import DensifyStats, densify_and_prune, reset_opacity


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainConfig:
    iterations: int = 10_000
    # learning rates (3DGS defaults; position lr scaled by scene extent)
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    # loss
    lambda_dssim: float = 0.2
    # LPIPS training loss (reference toggles opt.use_lpips_loss around the
    # refine phase, model/diffusionGS.py:1690,1697; DL3DV passes
    # --lpips_weight 1, bash_scripts/batch_dl3dv_train.sh:84-87). Needs
    # converted VGG weights installed via GSTrainer.set_lpips().
    lpips_weight: float = 1.0
    # depth supervision on SVD pseudo views (the fork's --svd_depth_warmup
    # flag, batch_llff_train.sh:39; semantics reconstructed — submodule
    # absent): when > 0, pseudo-view iterations add a Pearson-correlation
    # loss between the rendered depth and the GS depth captured when the
    # pseudo view was generated (scale/shift-invariant, FSGS's depth form).
    svd_depth_warmup: int = 0
    depth_loss_weight: float = 0.05
    # densification
    densify_from_iter: int = 500
    densify_until_iter: int = 10_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    min_opacity: float = 0.005
    max_world_scale: Optional[float] = 0.1
    # screen-space big-point prune threshold in pixels (CUDA 3DGS's
    # max_radii2D > 20); both it and the world-scale prune engage only
    # after the first opacity reset (the trainer's size_threshold gate)
    max_screen_size: Optional[float] = 20.0
    capacity_growth_occupancy: float = 0.85
    # hard ceiling on capacity doubling (2^21 = ~2M Gaussians ≈ the most
    # a v5e chip trains comfortably). At the ceiling densification keeps
    # running at fixed capacity: candidates only fill slots freed by
    # pruning (scatter mode='drop' handles the overflow), so an
    # adversarial scene degrades gracefully instead of doubling until the
    # compile OOMs (observed: the textured protocol scene reached 2M and
    # _densify_step no longer fit HBM)
    max_capacity: int = 2 ** 21
    # FSGS proximity-guided Gaussian unpooling (the fork's
    # --use_proximity_densify; semantics reconstructed from the FSGS paper
    # — see gs/densify.densify_and_prune). The fork's default is ON (the
    # LLFF/DL3DV scripts pass 0 explicitly, batch_llff_train.sh:38, while
    # the DTU script passes nothing, batch_dtu_train.sh:39-42 — so DTU's
    # live path runs WITH it); the internal default here is off so the
    # toggle is always explicit, and cli/train.py mirrors the fork's
    # default-on surface.
    use_proximity_densify: bool = False
    proximity_threshold: float = 0.01
    # FSGS's MONOCULAR-depth pseudo-view regularization (upstream FSGS's
    # --sample_pseudo_interval / --start_sample_pseudo; visible at
    # reference bash_scripts/batch_llff_train.sh:39, which passes 1e20 =
    # DISABLED in every shipped config — implemented for trainer-surface
    # parity): every ``sample_pseudo_interval`` iterations after
    # ``start_sample_pseudo``, a virtual camera interpolated between
    # adjacent train cameras is rendered and a Pearson-correlation loss
    # between the rendered depth and a monocular depth estimate of the
    # rendered image is applied. The estimator is pluggable
    # (``set_mono_depth_fn`` — upstream uses a frozen DPT; no pretrained
    # weights in this environment), so the feature is inert until one is
    # installed AND the interval is finite.
    sample_pseudo_interval: int = 10 ** 20
    start_sample_pseudo: int = 2_000
    mono_depth_weight: float = 0.05
    mono_pseudo_per_pair: int = 10
    # pseudo (SVD) view sampling — the fork's sample_svd_pseudo_interval /
    # start_sample_svd_frame / pseudo_cam_sampling_rate flags
    # (batch_llff_train.sh:39). Reconstructed semantics (submodule absent):
    # an iteration is ELIGIBLE for a pseudo view when it >= start and
    # it % interval == 0; at an eligible iteration a pseudo view is drawn
    # with probability ``rate`` (LLFF: 2% of iterations), else a real
    # view. rate <= 0 means every eligible iteration uses a pseudo view
    # (pure interval cadence). Measured on the synthetic LLFF-shape
    # protocol: scaling the probability by the pseudo-view count instead
    # (an earlier reading) starves the real views (~96% pseudo at LLFF
    # values) and collapses the fit.
    sample_svd_pseudo_interval: int = 2
    start_sample_svd_iter: int = 2_000
    pseudo_cam_sampling_rate: float = 0.0
    # rasterizer: 'tiled' (culled production path) or 'dense' (reference)
    rasterizer: str = "tiled"
    tile_cap: int = 1024
    sh_degree: int = 3
    chunk: int = 256
    group: int = 8
    bg_color: tuple = (0.0, 0.0, 0.0)
    seed: int = 0


# ---------------------------------------------------------------------------
# Per-field Adam
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: dict
    nu: dict
    count: jnp.ndarray

    @staticmethod
    def init(params: dict) -> "AdamState":
        z = jax.tree.map(jnp.zeros_like, params)
        return AdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params),
                         count=jnp.zeros((), jnp.int32))


def _position_lr(cfg: TrainConfig, extent: float, step: jnp.ndarray):
    """3DGS log-linear decay."""
    t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
    return extent * jnp.exp((1 - t) * jnp.log(cfg.position_lr_init)
                            + t * jnp.log(cfg.position_lr_final))


def adam_update(params: dict, grads: dict, st: AdamState, lrs: dict,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-15) -> tuple[dict, AdamState]:
    count = st.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for k in params:
        mu = b1 * st.mu[k] + (1 - b1) * grads[k]
        nu = b2 * st.nu[k] + (1 - b2) * grads[k] ** 2
        step_val = lrs[k] * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        new_p[k] = params[k] - step_val
        new_mu[k], new_nu[k] = mu, nu
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


# ---------------------------------------------------------------------------
# Scene container
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ViewSet:
    """A batch of cameras + their target images, stacked on device."""
    cameras: Camera           # batched pytree (leading axis V)
    images: jnp.ndarray       # (V, H, W, 3) float32 in [0, 1]

    def __len__(self):
        return self.images.shape[0]

    def view(self, i: int) -> tuple[Camera, jnp.ndarray]:
        cam = jax.tree.map(lambda x: x[i], self.cameras)
        return cam, self.images[i]


def make_viewset(cams: list[Camera], images: np.ndarray) -> ViewSet:
    from ..utils.camera import stack_cameras
    return ViewSet(cameras=stack_cameras(cams),
                   images=jnp.asarray(images, jnp.float32))


def scene_extent(cams: Camera) -> float:
    """3DGS-style scene radius: 1.1 * max distance of any camera from the
    mean camera center (getNerfppNorm equivalent)."""
    pos = np.asarray(cams.position)
    center = pos.mean(axis=0, keepdims=True)
    return float(1.1 * np.linalg.norm(pos - center, axis=-1).max())


def order_cameras_tsp(cams: Camera) -> list[int]:
    """Greedy traveling-salesman ordering by camera position — the
    reference's 'SalesMan' ordered camera list
    (``model/diffusionGS.py:127-134``)."""
    pos = np.asarray(cams.position)
    n = len(pos)
    todo = set(range(1, n))
    order = [0]
    while todo:
        cur = pos[order[-1]]
        nxt = min(todo, key=lambda j: np.linalg.norm(pos[j] - cur))
        order.append(nxt)
        todo.remove(nxt)
    return order


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    gaussians: G.GaussianState
    adam: AdamState
    stats: DensifyStats
    step: jnp.ndarray
    key: jax.Array


class GSTrainer:
    """Per-scene Gaussian-splatting optimizer with the FSGS-fork surface:
    ``training`` / ``finetune`` / ``render_view`` / ``update_cameras`` /
    ``reset_optimizers`` / ``reset_gs`` / ``reset_gaussians_from_pcd`` /
    checkpointing."""

    def __init__(self, train_views: ViewSet, config: TrainConfig,
                 init_state: G.GaussianState,
                 model_path: str = "/tmp/syn3r_model",
                 test_views: Optional[ViewSet] = None):
        self.cfg = config
        self.train_views = train_views
        self.test_views = test_views
        self.pseudo_views: Optional[ViewSet] = None
        self.pseudo_depths: Optional[jnp.ndarray] = None  # (V, H, W) or None
        # LPIPS loss: off by default; the orchestrator toggles it around the
        # refine phase (reference model/diffusionGS.py:1690,1697).
        self.use_lpips_loss = False
        self._lpips_params: Optional[dict] = None
        # monocular-depth pseudo-view regularization (see TrainConfig)
        self._mono_depth_fn: Optional[callable] = None
        self._mono_pseudo_cams: Optional[Camera] = None
        self.model_path = model_path
        os.makedirs(model_path, exist_ok=True)
        self.extent = max(scene_extent(train_views.cameras), 1e-6)
        self.state = TrainState(
            gaussians=init_state,
            adam=AdamState.init(G.get_params(init_state)),
            stats=DensifyStats.zeros(init_state.capacity),
            step=jnp.zeros((), jnp.int32),
            key=jax.random.PRNGKey(config.seed),
        )
        self._rng = np.random.default_rng(config.seed)

    # -- jitted pieces ------------------------------------------------------

    def _step_math(self, ts: TrainState, camera: Camera,
                   image: jnp.ndarray, depth_target, depth_flag,
                   lpips_params, use_lpips: bool,
                   use_depth: bool) -> tuple[TrainState, dict]:
        """One optimization step as pure traced math (shared by the
        per-step jit and the batched-segment scan). ``depth_flag`` is a
        traced 0/1 scalar gating the depth term inside a scan where the
        pseudo-vs-real pick varies per iteration; ``use_depth`` statically
        removes the term's graph when no pseudo depths exist at all.
        ``pearson_depth_loss`` is finite (value and gradient) on an
        all-invalid target, so flag-gating is numerically safe."""
        cfg = self.cfg
        g = ts.gaussians
        params = G.get_params(g)
        offset0 = jnp.zeros((g.capacity, 2))
        bg = jnp.asarray(cfg.bg_color, jnp.float32)

        def loss_fn(p, offset):
            st = G.with_params(g, p)
            sg = rz.project_gaussians(st, camera, sh_degree=cfg.sh_degree,
                                      center_offset=offset)
            if cfg.rasterizer in ("tiled", "pallas"):
                out = rz.rasterize_tiled(
                    sg, camera.height, camera.width, cap=cfg.tile_cap,
                    bg=bg, chunk=min(cfg.chunk, cfg.tile_cap),
                    composite="pallas" if cfg.rasterizer == "pallas"
                    else "xla")
            else:
                out = rz.rasterize(sg, camera.height, camera.width, bg=bg,
                                   chunk=cfg.chunk, group=cfg.group)
            loss = losses.photometric_loss(out.rgb, image,
                                           lambda_dssim=cfg.lambda_dssim,
                                           confidence=camera.confidence)
            if use_lpips:
                from ..models.lpips import LPIPS
                lp = LPIPS().apply(lpips_params, out.rgb, image)
                loss = loss + camera.confidence * cfg.lpips_weight * lp
            if use_depth:
                pred_depth = jnp.where(out.alpha > 1e-6,
                                       out.depth / jnp.maximum(out.alpha,
                                                               1e-6), 0.0)
                dl = losses.pearson_depth_loss(pred_depth, depth_target,
                                               valid=depth_target > 0)
                loss = loss + depth_flag * cfg.depth_loss_weight * dl
            return loss, sg

        (loss, sg), (grads, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset0)

        lr_pos = _position_lr(cfg, self.extent, ts.step)
        lrs = {"means": lr_pos, "quats": cfg.rotation_lr,
               "log_scales": cfg.scaling_lr, "opacity_logits": cfg.opacity_lr,
               "sh_dc": cfg.feature_lr, "sh_rest": cfg.feature_lr / 20.0}
        new_params, new_adam = adam_update(params, grads, ts.adam, lrs)

        # densification statistics: screen-grad in the CUDA NDC convention
        # (pixel grad * W/2, H/2) so thresholds are transferable.
        scale = jnp.asarray([camera.width * 0.5, camera.height * 0.5])
        visible = sg.valid & (sg.radius > 0) \
            & (sg.center[:, 0] > -sg.radius) \
            & (sg.center[:, 0] < camera.width + sg.radius) \
            & (sg.center[:, 1] > -sg.radius) \
            & (sg.center[:, 1] < camera.height + sg.radius)
        new_stats = ts.stats.update(g_off * scale, sg.radius, visible)

        new_ts = TrainState(gaussians=G.with_params(g, new_params),
                            adam=new_adam, stats=new_stats,
                            step=ts.step + 1, key=ts.key)
        return new_ts, {"loss": loss}

    @functools.partial(jax.jit,
                       static_argnames=("self", "use_lpips", "use_depth"))
    def _train_step(self, ts: TrainState, camera: Camera,
                    image: jnp.ndarray, depth_target=None,
                    lpips_params=None, use_lpips: bool = False,
                    use_depth: bool = False) -> tuple[TrainState, dict]:
        return self._step_math(ts, camera, image, depth_target,
                               jnp.float32(1.0), lpips_params, use_lpips,
                               use_depth)

    @functools.partial(jax.jit,
                       static_argnames=("self", "use_lpips", "use_depth"))
    def _train_steps(self, ts: TrainState, all_cams: Camera,
                     all_images: jnp.ndarray, all_depths, idx_k: jnp.ndarray,
                     flags_k: jnp.ndarray, lpips_params=None,
                     use_lpips: bool = False,
                     use_depth: bool = False) -> tuple[TrainState,
                                                       jnp.ndarray]:
        """A whole SEGMENT of train steps in one dispatch (lax.scan).

        The per-iteration Python dispatch of ``_train_step`` costs more
        host time than the step's device time on this class of host
        (measured ~30 ms/iter wall vs 14.7 ms device at 65k gaussians);
        scanning k steps per dispatch removes it. ``idx_k``/``flags_k``
        are the host-pre-picked view indices into the merged
        train+pseudo arrays (RNG stream identical to the per-step path)
        and the pseudo-pick depth gates; views are gathered row-by-row
        inside the scan body, so the segment never materializes a
        (k, H, W, 3) batch in HBM."""

        def body(ts, xs):
            i, flag = xs
            cam = jax.tree.map(lambda x: x[i], all_cams)
            img = all_images[i]
            dep = all_depths[i] if use_depth else None
            ts, metrics = self._step_math(ts, cam, img, dep, flag,
                                          lpips_params, use_lpips,
                                          use_depth)
            return ts, metrics["loss"]

        return jax.lax.scan(body, ts, (idx_k, flags_k))

    @functools.partial(jax.jit, static_argnames=("self",))
    def _mono_pseudo_step(self, ts: TrainState, camera: Camera,
                          est_depth: jnp.ndarray) -> tuple[TrainState, dict]:
        """One monocular pseudo-view regularization step (FSGS's
        sample_pseudo_interval path, reconstructed — submodule absent):
        Pearson depth loss between the render at a virtual camera and a
        monocular estimate of that render. Updates params/Adam only (no
        densify statistics — the pseudo view has no photometric target)."""
        cfg = self.cfg
        g = ts.gaussians
        params = G.get_params(g)
        bg = jnp.asarray(cfg.bg_color, jnp.float32)

        def loss_fn(p):
            st = G.with_params(g, p)
            sg = rz.project_gaussians(st, camera, sh_degree=cfg.sh_degree)
            if cfg.rasterizer in ("tiled", "pallas"):
                out = rz.rasterize_tiled(
                    sg, camera.height, camera.width, cap=cfg.tile_cap,
                    bg=bg, chunk=min(cfg.chunk, cfg.tile_cap),
                    composite="pallas" if cfg.rasterizer == "pallas"
                    else "xla")
            else:
                out = rz.rasterize(sg, camera.height, camera.width, bg=bg,
                                   chunk=cfg.chunk, group=cfg.group)
            pred_depth = jnp.where(out.alpha > 1e-6,
                                   out.depth / jnp.maximum(out.alpha, 1e-6),
                                   0.0)
            dl = losses.pearson_depth_loss(pred_depth, est_depth,
                                           valid=est_depth > 0)
            return cfg.mono_depth_weight * dl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lr_pos = _position_lr(cfg, self.extent, ts.step)
        lrs = {"means": lr_pos, "quats": cfg.rotation_lr,
               "log_scales": cfg.scaling_lr, "opacity_logits": cfg.opacity_lr,
               "sh_dc": cfg.feature_lr, "sh_rest": cfg.feature_lr / 20.0}
        new_params, new_adam = adam_update(params, grads, ts.adam, lrs)
        new_ts = TrainState(gaussians=G.with_params(g, new_params),
                            adam=new_adam, stats=ts.stats, step=ts.step,
                            key=ts.key)
        return new_ts, {"loss": loss}

    def set_mono_depth_fn(self, fn):
        """Install the monocular depth estimator rgb (H, W, 3) ->
        depth (H, W) used by the sample_pseudo_interval path (upstream
        FSGS uses a frozen DPT)."""
        self._mono_depth_fn = fn
        self._mono_pseudo_cams = None

    def _get_mono_pseudo_cams(self) -> Camera:
        """Virtual cameras interpolated between TSP-adjacent train cameras
        (FSGS's getPseudoCameras equivalent), built once."""
        if self._mono_pseudo_cams is None:
            from ..utils import se3
            from ..utils.camera import make_camera, stack_cameras
            order = order_cameras_tsp(self.train_views.cameras)
            cams = []
            for a, b in zip(order[:-1], order[1:]):
                ca = jax.tree.map(lambda x: x[a], self.train_views.cameras)
                cb = jax.tree.map(lambda x: x[b], self.train_views.cameras)
                poses = se3.interpolate_poses(
                    ca.w2c, cb.w2c, self.cfg.mono_pseudo_per_pair + 2)
                for p in np.asarray(poses)[1:-1]:
                    cams.append(make_camera(np.asarray(ca.K), p,
                                            ca.width, ca.height))
            self._mono_pseudo_cams = stack_cameras(cams)
        return self._mono_pseudo_cams

    def _maybe_mono_pseudo(self, it: int):
        """Run the mono-depth pseudo step when due (gated: finite interval
        AND an installed estimator)."""
        cfg = self.cfg
        if (self._mono_depth_fn is None
                or cfg.sample_pseudo_interval >= 10 ** 9
                or cfg.sample_pseudo_interval <= 0
                or it < cfg.start_sample_pseudo
                or it % cfg.sample_pseudo_interval):
            return
        pcams = self._get_mono_pseudo_cams()
        i = int(self._rng.integers(pcams.K.shape[0]))
        cam = jax.tree.map(lambda x: x[i], pcams)
        rgb = self._render_jit(self.state.gaussians, cam).rgb
        est = jax.lax.stop_gradient(self._mono_depth_fn(rgb))
        self.state, _ = self._mono_pseudo_step(self.state, cam, est)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _densify_step(self, ts: TrainState) -> TrainState:
        cfg = self.cfg
        key, sub = jax.random.split(ts.key)
        new_g, changed = densify_and_prune(
            ts.gaussians, ts.stats, sub,
            grad_threshold=cfg.densify_grad_threshold,
            percent_dense=cfg.percent_dense, extent=self.extent,
            min_opacity=cfg.min_opacity,
            max_world_scale=cfg.max_world_scale,
            max_screen_size=cfg.max_screen_size,
            big_point_gate=ts.step > cfg.opacity_reset_interval,
            use_proximity=cfg.use_proximity_densify,
            proximity_threshold=cfg.proximity_threshold)
        # zero Adam moments of rewritten slots (fresh optimizer entries)
        def zero_changed(x):
            mask = changed.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(mask, 0.0, x)
        adam = AdamState(mu=jax.tree.map(zero_changed, ts.adam.mu),
                         nu=jax.tree.map(zero_changed, ts.adam.nu),
                         count=ts.adam.count)
        return TrainState(gaussians=new_g, adam=adam,
                          stats=DensifyStats.zeros(new_g.capacity),
                          step=ts.step, key=key)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _reset_opacity_step(self, ts: TrainState) -> TrainState:
        g = reset_opacity(ts.gaussians)
        # zero the opacity moments (the CUDA trainer replaces the tensor)
        adam = AdamState(
            mu={**ts.adam.mu,
                "opacity_logits": jnp.zeros_like(ts.adam.mu["opacity_logits"])},
            nu={**ts.adam.nu,
                "opacity_logits": jnp.zeros_like(ts.adam.nu["opacity_logits"])},
            count=ts.adam.count)
        return TrainState(gaussians=g, adam=adam, stats=ts.stats,
                          step=ts.step, key=ts.key)

    # -- capacity growth ----------------------------------------------------

    def _maybe_grow(self):
        g = self.state.gaussians
        occ = float(g.num_active) / g.capacity
        if occ <= self.cfg.capacity_growth_occupancy:
            return
        if g.capacity * 2 > self.cfg.max_capacity:
            return                       # ceiling: densify into freed slots
        new_cap = g.capacity * 2

        def pad(x):
            return jnp.pad(x, [(0, new_cap - g.capacity)]
                           + [(0, 0)] * (x.ndim - 1))

        self.state = TrainState(
            gaussians=G.GaussianState(
                **{f: pad(getattr(g, f)) for f in G.PARAM_FIELDS},
                active=pad(g.active)),
            adam=AdamState(mu=jax.tree.map(pad, self.state.adam.mu),
                           nu=jax.tree.map(pad, self.state.adam.nu),
                           count=self.state.adam.count),
            stats=DensifyStats.zeros(new_cap),
            step=self.state.step, key=self.state.key)

    # -- reference-surface API ----------------------------------------------

    @property
    def gaussians(self) -> G.GaussianState:
        return self.state.gaussians

    def _pick_view_index(self, it: int) -> tuple[int, bool]:
        """Returns (index into its source set, is_pseudo). Pseudo-sampling
        semantics documented at TrainConfig.pseudo_cam_sampling_rate. The
        RNG draw order is the contract — the batched segment path pre-picks
        with the identical stream."""
        cfg = self.cfg
        eligible = (self.pseudo_views is not None
                    and len(self.pseudo_views) > 0
                    and it >= cfg.start_sample_svd_iter
                    and cfg.sample_svd_pseudo_interval > 0
                    and it % cfg.sample_svd_pseudo_interval == 0)
        if eligible:
            n = len(self.pseudo_views)
            p = (1.0 if cfg.pseudo_cam_sampling_rate <= 0
                 else min(1.0, cfg.pseudo_cam_sampling_rate))
            if self._rng.random() < p:
                return int(self._rng.integers(n)), True
        return int(self._rng.integers(len(self.train_views))), False

    def _pick_view(self, it: int):
        """Returns (camera, image, pseudo_index or None)."""
        i, is_pseudo = self._pick_view_index(it)
        if is_pseudo:
            cam, img = self.pseudo_views.view(i)
            return cam, img, i
        cam, img = self.train_views.view(i)
        return cam, img, None

    def _merged_views(self):
        """Train + pseudo views merged into single device arrays for the
        batched segment path: (cameras, images (V,H,W,3), depths (V,H,W)).
        Returns None when the two sets' resolutions differ (then the
        per-step fallback runs)."""
        tv = self.train_views
        if self.pseudo_views is None or len(self.pseudo_views) == 0:
            depths = jnp.zeros(tv.images.shape[:3], jnp.float32)
            return tv.cameras, tv.images, depths
        pv = self.pseudo_views
        if tv.images.shape[1:] != pv.images.shape[1:]:
            return None
        cams = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                            tv.cameras, pv.cameras)
        images = jnp.concatenate([tv.images, pv.images], axis=0)
        if self.pseudo_depths is not None:
            depths = jnp.concatenate(
                [jnp.zeros(tv.images.shape[:3], jnp.float32),
                 jnp.asarray(self.pseudo_depths, jnp.float32)], axis=0)
        else:
            depths = jnp.zeros((images.shape[0],) + images.shape[1:3],
                               jnp.float32)
        return cams, images, depths

    def _next_boundary(self, it: int, end_iter: int, densify: bool,
                       log_every: int) -> int:
        """First iteration count (exclusive end) after ``it`` at which a
        host-side action (densify / opacity reset / capacity growth / log)
        may run. Breaking a segment where no action fires is a no-op, so
        boundaries are conservatively every interval multiple."""
        cfg = self.cfg
        nxt = end_iter
        intervals = []
        if densify:
            intervals += [cfg.densification_interval,
                          cfg.opacity_reset_interval]
        if log_every:
            intervals.append(log_every)
        if (self._mono_depth_fn is not None
                and 0 < cfg.sample_pseudo_interval < 10 ** 9):
            intervals.append(cfg.sample_pseudo_interval)
        for iv in intervals:
            if iv and iv > 0:
                nxt = min(nxt, ((it // iv) + 1) * iv)
        return max(nxt, it + 1)

    def _run_loop(self, start_iter: int, end_iter: int,
                  densify: bool = True, log_every: int = 0):
        cfg = self.cfg
        last_loss = float("nan")
        loss_dev = None
        use_lpips = bool(self.use_lpips_loss and self._lpips_params
                         is not None and cfg.lpips_weight > 0)
        use_depth = bool(cfg.svd_depth_warmup > 0
                         and self.pseudo_depths is not None
                         and self.pseudo_views is not None
                         and len(self.pseudo_views) > 0)
        merged = self._merged_views()
        n_train = len(self.train_views)
        lpips_p = self._lpips_params if use_lpips else None

        it = start_iter
        while it < end_iter:
            seg_end = self._next_boundary(it, end_iter, densify, log_every)
            k = seg_end - it
            if merged is not None and k > 1:
                idx = np.empty(k, np.int32)
                flags = np.zeros(k, np.float32)
                for j in range(k):
                    i, is_pseudo = self._pick_view_index(it + j)
                    idx[j] = i + n_train if is_pseudo else i
                    flags[j] = 1.0 if is_pseudo else 0.0
                cams, images, depths = merged
                self.state, losses_k = self._train_steps(
                    self.state, cams, images, depths if use_depth else None,
                    jnp.asarray(idx), jnp.asarray(flags), lpips_p,
                    use_lpips=use_lpips, use_depth=use_depth)
                loss_dev = losses_k[-1]
            else:
                for j in range(k):
                    cam, img, pseudo_i = self._pick_view(it + j)
                    ud = (pseudo_i is not None and use_depth)
                    depth_t = self.pseudo_depths[pseudo_i] if ud else None
                    self.state, metrics = self._train_step(
                        self.state, cam, img, depth_t, lpips_p,
                        use_lpips=use_lpips, use_depth=ud)
                    loss_dev = metrics["loss"]
            it = seg_end
            last = it - 1   # the iteration index the boundary checks see
            if densify and cfg.densify_from_iter <= last < cfg.densify_until_iter:
                if (last + 1) % cfg.densification_interval == 0:
                    self.state = self._densify_step(self.state)
                    self._maybe_grow()
                if (last + 1) % cfg.opacity_reset_interval == 0:
                    self.state = self._reset_opacity_step(self.state)
            self._maybe_mono_pseudo(last + 1)
            if log_every and (last + 1) % log_every == 0:
                last_loss = float(loss_dev)
                print(f"[gs] iter {last + 1} loss {last_loss:.4f} "
                      f"active {int(self.gaussians.num_active)}")
        return last_loss

    def training(self, start_iter: int = 0, epoch_indicator: int = 0,
                 log_every: int = 0):
        """Initial fit (reference ``gsTrainer.training``,
        diffusionGS.py:136-140)."""
        loss = self._run_loop(start_iter, self.cfg.iterations,
                              densify=True, log_every=log_every)
        self.save_checkpoint(self.cfg.iterations,
                             epoch=epoch_indicator if epoch_indicator else None)
        return loss

    def finetune(self, start_iter: int = 0, epoch: int = 0,
                 disable_densification: bool = False,
                 pseudo_cam_sampling_rate: float = None, log_every: int = 0):
        """Refinement on input + pseudo (SVD) views
        (reference ``gsTrainer.finetune``, diffusionGS.py:1640).
        ``pseudo_cam_sampling_rate`` overrides the config value for this
        phase (semantics at TrainConfig.pseudo_cam_sampling_rate)."""
        prev_rate = self.cfg.pseudo_cam_sampling_rate
        if pseudo_cam_sampling_rate is not None:
            self.cfg.pseudo_cam_sampling_rate = pseudo_cam_sampling_rate
        try:
            loss = self._run_loop(start_iter, self.cfg.iterations,
                                  densify=not disable_densification,
                                  log_every=log_every)
        finally:
            self.cfg.pseudo_cam_sampling_rate = prev_rate
        self.save_checkpoint(self.cfg.iterations, epoch=epoch)
        return loss

    def render_view(self, camera: Camera) -> dict:
        """Render color/depth/alpha for an arbitrary camera (reference
        ``render_view`` usage, diffusionGS.py:154-172). Depth is the
        alpha-normalized expected depth; holes are 0."""
        out = self._render_jit(self.state.gaussians, camera)
        alpha = out.alpha
        depth = jnp.where(alpha > 1e-6, out.depth / jnp.maximum(alpha, 1e-6),
                          0.0)
        return {"render": out.rgb, "depth": depth, "depth_acc": out.depth,
                "alpha": alpha}

    @functools.partial(jax.jit, static_argnames=("self",))
    def _render_jit(self, g: G.GaussianState, camera: Camera):
        return rz.render(g, camera, sh_degree=self.cfg.sh_degree,
                         bg=jnp.asarray(self.cfg.bg_color, jnp.float32),
                         chunk=self.cfg.chunk, group=self.cfg.group,
                         method=self.cfg.rasterizer,
                         tile_cap=self.cfg.tile_cap)

    def render_views_batch(self, cameras: Camera):
        """Render a BATCHED Camera pytree (leading axis on K/w2c/confidence,
        shared static width/height) in ONE dispatch — a ``lax.scan`` over
        cameras inside one jit, so P renders cost one host->device
        roundtrip instead of P (the axon remote runtime charges ~10ms+
        per dispatch; the orchestrator's densify phase issues hundreds).
        Sequential on device, so peak memory stays single-render.
        Returns (rgb (P, H, W, 3), depth (P, H, W)) with the same
        alpha-normalized depth as render_view."""
        return self._render_many_jit(self.state.gaussians, cameras)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _render_many_jit(self, g: G.GaussianState, cameras: Camera):
        def one(_, cam):
            out = self._render_jit(g, cam)  # nested jit inlines under trace
            alpha = out.alpha
            depth = jnp.where(alpha > 1e-6,
                              out.depth / jnp.maximum(alpha, 1e-6), 0.0)
            return None, (out.rgb, depth)

        _, (rgb, depth) = jax.lax.scan(one, None, cameras)
        return rgb, depth

    def set_lpips(self, params: dict):
        """Install converted LPIPS (VGG) params — see models/lpips.py.
        The loss itself is gated by ``use_lpips_loss`` (toggled by the
        orchestrator around refine, reference diffusionGS.py:1690,1697)."""
        self._lpips_params = params

    def update_cameras(self, views: np.ndarray, poses: np.ndarray,
                       K: np.ndarray, cam_confidences=None,
                       append: bool = True, depths: np.ndarray = None):
        """Install pseudo views (SVD outputs) as confidence-weighted train
        targets (reference ``update_cameras``, diffusionGS.py:1631).

        views: (V, H, W, 3) in [0,1]; poses: (V, 4, 4) w2c; K: (3, 3);
        depths: optional (V, H, W) GS depths captured at generation time,
        the supervision target for the svd_depth_warmup loss term.
        """
        v, h, w = views.shape[:3]
        if cam_confidences is None:
            cam_confidences = [1.0] * v
        elif np.isscalar(cam_confidences):
            cam_confidences = [float(cam_confidences)] * v
        cams = [make_camera(K, poses[i], w, h, float(cam_confidences[i]))
                for i in range(v)]
        new = make_viewset(cams, views)
        new_depths = (jnp.asarray(depths, jnp.float32)
                      if depths is not None else None)
        if append and self.pseudo_views is not None:
            imgs = jnp.concatenate([self.pseudo_views.images, new.images])
            cams_all = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]),
                self.pseudo_views.cameras, new.cameras)
            new = ViewSet(cameras=cams_all, images=imgs)
            if new_depths is not None and self.pseudo_depths is not None:
                new_depths = jnp.concatenate([self.pseudo_depths, new_depths])
            else:
                new_depths = None  # a mixed set can't index depths safely
        self.pseudo_views = new
        self.pseudo_depths = new_depths

    def reset_optimizers(self):
        """Fresh Adam + stats (reference ``reset_optimizers``,
        diffusionGS.py:1634)."""
        self.state = TrainState(
            gaussians=self.state.gaussians,
            adam=AdamState.init(G.get_params(self.state.gaussians)),
            stats=DensifyStats.zeros(self.state.gaussians.capacity),
            step=jnp.zeros((), jnp.int32), key=self.state.key)

    def reset_gs(self):
        """Hook mirroring the reference's pre-finetune state reset
        (diffusionGS.py:1635): restart the step counter so lr schedules and
        densify windows re-run for the finetune phase."""
        self.state = dataclasses.replace(self.state,
                                         step=jnp.zeros((), jnp.int32))

    def reset_gaussians_from_pcd(self, xyz: np.ndarray, rgb: np.ndarray,
                                 append_to_old_gaussians: bool = False):
        """Re-initialize Gaussians from a (DUSt3R) point cloud (reference
        diffusionGS.py:1683-1687)."""
        new = G.from_points(jnp.asarray(xyz, jnp.float32),
                            jnp.asarray(rgb, jnp.float32),
                            sh_degree=self.cfg.sh_degree)
        if append_to_old_gaussians:
            old = self.state.gaussians
            cap = G.next_capacity(int(old.num_active) + int(new.num_active))
            # compact actives to the front BEFORE any truncation: the new
            # points sit at the tail of the concat, so truncating first
            # (when old.capacity > cap) would silently drop them all.
            active_cat = jnp.concatenate([old.active, new.active])
            order = jnp.argsort(~active_cat, stable=True)
            merged = {}
            for f in G.PARAM_FIELDS + ("active",):
                cat = jnp.concatenate([getattr(old, f),
                                       getattr(new, f)])[order]
                n = cat.shape[0]
                merged[f] = cat[:cap] if n >= cap else jnp.pad(
                    cat, [(0, cap - n)] + [(0, 0)] * (cat.ndim - 1))
            new = G.GaussianState(**merged)
        self.state = TrainState(
            gaussians=new, adam=AdamState.init(G.get_params(new)),
            stats=DensifyStats.zeros(new.capacity),
            step=jnp.zeros((), jnp.int32), key=self.state.key)

    def find_nearest_cam(self, query: Camera, cams: Camera,
                         multi_view_max_angle: float = None,
                         multi_view_min_dis: float = None,
                         multi_view_max_dis: float = None) -> int:
        """Index of the camera closest in position to ``query``, optionally
        constrained to candidates within an angular/distance window
        (reference ``find_nearest_cam(cams, pseudo_cams,
        multi_view_max_angle, multi_view_min_dis, multi_view_max_dis)``,
        diffusionGS.py:475-482). Angle is between the cameras' viewing
        directions, in degrees; falls back to the unconstrained nearest
        camera when no candidate satisfies the window."""
        pos = np.asarray(cams.position)
        q = np.asarray(query.position)
        dist = np.linalg.norm(pos - q, axis=-1)
        ok = np.ones(len(pos), dtype=bool)
        if multi_view_min_dis is not None:
            ok &= dist >= multi_view_min_dis
        if multi_view_max_dis is not None:
            ok &= dist <= multi_view_max_dis
        if multi_view_max_angle is not None:
            # viewing direction = third row of the w2c rotation (camera z
            # axis in world coordinates)
            dirs = np.asarray(cams.w2c)[:, 2, :3]
            qdir = np.asarray(query.w2c)[2, :3]
            cosang = (dirs @ qdir) / (
                np.linalg.norm(dirs, axis=-1) * np.linalg.norm(qdir) + 1e-12)
            ang = np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))
            ok &= ang <= multi_view_max_angle
        if ok.any():
            dist = np.where(ok, dist, np.inf)
        return int(dist.argmin())

    # -- checkpointing (naming parity with reference, diffusionGS.py:1612-25)

    def _ckpt_name(self, iteration: int, epoch=None) -> str:
        if epoch is None:
            return f"chkpnt{iteration}.npz"
        return f"refine_{epoch}_chkpnt{iteration}.npz"

    def save_checkpoint(self, iteration: int, epoch=None):
        g = self.state.gaussians
        arrays = {f: np.asarray(getattr(g, f)) for f in G.PARAM_FIELDS}
        arrays["active"] = np.asarray(g.active)
        arrays["step"] = np.asarray(self.state.step)
        path = os.path.join(self.model_path, self._ckpt_name(iteration, epoch))
        np.savez(path, **arrays)
        np.savez(os.path.join(self.model_path, "chkpnt_latest.npz"), **arrays)
        return path

    def load_checkpoint(self, checkpoint: str):
        data = np.load(checkpoint)
        fields = {f: data[f] for f in G.PARAM_FIELDS}
        if fields["sh_rest"].ndim == 3:
            # legacy rank-3 checkpoint: normalize to the flat storage so
            # resumed training doesn't reintroduce the (15, 3)-minor-dims
            # 11.4x TPU padding blow-up (see GaussianState.sh_rest)
            fields["sh_rest"] = fields["sh_rest"].reshape(
                len(fields["sh_rest"]), -1)
        g = G.GaussianState(
            **{f: jnp.asarray(v) for f, v in fields.items()},
            active=jnp.asarray(data["active"]))
        self.state = TrainState(
            gaussians=g, adam=AdamState.init(G.get_params(g)),
            stats=DensifyStats.zeros(g.capacity),
            step=jnp.asarray(data["step"]), key=self.state.key)

    def latest_checkpoint(self) -> Optional[str]:
        """Newest refine_*_chkpnt*.npz else chkpnt_latest.npz (the
        reference's resume logic, diffusionGS.py:1612-1625)."""
        import glob
        refined = sorted(glob.glob(os.path.join(self.model_path,
                                                "refine_*_chkpnt*.npz")),
                         key=os.path.getmtime)
        if refined:
            return refined[-1]
        latest = os.path.join(self.model_path, "chkpnt_latest.npz")
        return latest if os.path.exists(latest) else None
