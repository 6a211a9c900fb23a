"""The refine-cycle orchestrator — the reference's ``DiffusionGS``
(``model/diffusionGS.py:38-1699``) rebuilt on the TPU-native stack.

One refine cycle (reference run(), :1668-1697):
  init_GS (3DGS fit on the input views) -> densify_views (per adjacent view
  pair: render endpoints, interpolate 25 poses, backward-warp conditioning,
  lambda schedule, guided SVD completion) -> optional gaussians reset from a
  densified point cloud -> refine_GS (finetune on input + confidence-
  weighted pseudo views). Two cycles by default.

Completion results are cached per (cycle, pair) like the reference's
``dense_views/interpolated_dense_views_cyc{c}_view{i}.pt`` files (here
.npz), so interrupted runs resume.

The diffusion step is pluggable: a GuidedSVDPipeline (with converted SVD
weights) or any callable with its signature — tests and weightless
environments use a warp-only completion.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gs.trainer import GSTrainer
from ..utils.camera import Camera, make_camera
from ..utils.image import (resize_bilinear, resize_cubic_antialiased,
                           resize_nearest)
from ..utils.profiling import PhaseTimer
from . import completion as C


def _leading_axis_shards(sharding) -> int:
    """Number of shards a NamedSharding splits its leading axis into (1
    when unsharded/None)."""
    if sharding is None or not len(sharding.spec):
        return 1
    spec0 = sharding.spec[0]
    if spec0 is None:
        return 1
    names = spec0 if isinstance(spec0, tuple) else (spec0,)
    return int(np.prod([sharding.mesh.shape[n] for n in names]))


@dataclasses.dataclass
class DiffusionGSConfig:
    diffusion_width: int = 1024
    diffusion_height: int = 576
    num_frames: int = 25
    num_inference_steps: int = 100
    refine_cycle_num: int = 2
    cam_confidence: float = 0.05
    disable_densification: bool = False
    pseudo_cam_sampling_rate: float = 0.02
    perturb_interp_poses: bool = True
    replace_endpoints: bool = True
    # densify pair topology (reference diffusionGS.py:227,244-250):
    # 'interpolate_gs_v2' (LLFF/DL3DV) runs N pairs (i, (i+1) % N) —
    # INCLUDING the wrap-around (last -> first); 'interpolate_loop0_gs'
    # (DTU) breaks before the wrap, giving N-1 pairs.
    densify_type: str = "interpolate_gs_v2"
    # conditioning warp variant (reference --interp_type, diffusionGS.py:
    # 506-509,812-815): 'backward_warp' (every shipped config) or
    # 'forward_warp' (endpoint splatting, binary masks — see
    # completion.prepare_pair_conditioning)
    interp_type: str = "backward_warp"
    # LPIPS loss is toggled ON for the refine phase only (reference
    # diffusionGS.py:1690,1697); needs GSTrainer.set_lpips() weights.
    use_lpips_loss: bool = False
    # capture GS depth at each pseudo pose for the svd_depth_warmup
    # supervision term (see gs/trainer.py TrainConfig)
    capture_pseudo_depth: bool = True
    # DUSt3R point-cloud densification (DL3DV path; <=1 disables, the
    # LLFF setting — reference diffusionGS.py:302, batch_llff_train.sh:39)
    num_views_for_pcd_densification: int = 1
    pcd_frame_quality_thresh: float = 0.3
    # keyframe selection for pcd densification, PER PAIR (reference
    # :274-284): evenly spaced linspace by default; FPS over the
    # covisibility metric when fps_keyframe_sampling (the DL3DV preset,
    # batch_dl3dv_train.sh:87). Each pair's last frame is dropped (:281
    # — it duplicates the next pair's first).
    fps_keyframe_sampling: bool = False
    # TSP-order the train views ("SalesMan", reference :62-66); every
    # shipped config leaves this on.
    reorg_train_views: bool = True
    # run the completion for ALL uncached pairs as ONE vmapped call,
    # optionally sharded over a mesh axis via pair_sharding (a
    # NamedSharding whose leading axis is the pair axis) — within-scene
    # multi-chip scaling: the reference's only parallelism is a bash loop
    # over scenes (SURVEY.md §2.7); here the N wrap-around pairs of one
    # scene spread over chips (LLFF: 3 pairs x 2 directions fills 6 of a
    # v5e-8's chips even single-scene).
    pair_parallel: bool = False
    pair_sharding: object = None
    # dump the reference's per-pair QC artifacts (uncertainty/cond/warp
    # PNGs, lambda heatmap, completion GIF — diffusionGS.py:871-884,
    # 1106-1109,1201-1202) under <save_dir>/debug/cyc{c}_pair{p}/
    save_debug: bool = False
    seed: int = 0


class DiffusionGS:
    """Test-time NVS loop: alternate 3DGS fitting and guided completion."""

    def __init__(self, trainer: GSTrainer, config: DiffusionGSConfig,
                 completion_fn: Optional[Callable] = None,
                 save_dir: Optional[str] = None,
                 dust3r_fn: Optional[Callable] = None,
                 flow_fn: Optional[Callable] = None):
        """completion_fn(image_start, cond_images, image_end, mask,
        lambda_ts, key) -> (F, H, W, 3) frames — a GuidedSVDPipeline or a
        stand-in. dust3r_fn(frames, c2w, K) -> (xyz, rgb) enables the
        DL3DV point-cloud densification branch (vision.dust3r.
        make_dust3r_fn); flow_fn(a, b) -> flow enables the GMFlow frame-
        quality gate."""
        self.trainer = trainer
        self.cfg = config
        self.completion_fn = completion_fn or self._warp_only_completion
        self.dust3r_fn = dust3r_fn
        self.flow_fn = flow_fn
        self.save_dir = save_dir or os.path.join(trainer.model_path,
                                                 "dense_views")
        os.makedirs(self.save_dir, exist_ok=True)
        self._rng = np.random.default_rng(config.seed)
        self.timer = PhaseTimer()

        # cache GS intrinsics/resolution from camera 0 and derive the
        # diffusion-resolution intrinsics (reference :67-73)
        cam0: Camera = jax.tree.map(lambda x: x[0],
                                    trainer.train_views.cameras)
        self.K_gs = jnp.asarray(cam0.K)
        self.gs_width, self.gs_height = (trainer.train_views.images.shape[2],
                                         trainer.train_views.images.shape[1])
        sx = config.diffusion_width / self.gs_width
        sy = config.diffusion_height / self.gs_height
        K = np.asarray(cam0.K)
        self.diffusion_K = jnp.asarray(
            [[K[0, 0] * sx, 0.0, K[0, 2] * sx],
             [0.0, K[1, 1] * sy, K[1, 2] * sy],
             [0.0, 0.0, 1.0]], jnp.float32)

    # ------------------------------------------------------------------

    def _warp_only_completion(self, image_start, cond_images, image_end,
                              mask, lambda_ts, key):
        """Diffusion-free fallback: the warped/GS-filled cond images ARE the
        pseudo frames. Lets the full refine loop run without SVD weights
        (and doubles as the no-diffusion ablation)."""
        del mask, lambda_ts, key
        return jnp.concatenate([image_start[None], cond_images,
                                image_end[None]], axis=0)

    def render_diffusion_res(self, pose: jnp.ndarray):
        """Render an arbitrary w2c pose at the diffusion resolution
        (reference render_GS + cv2 resizes, :142-175, :800-805)."""
        cfg = self.cfg
        cam = make_camera(self.diffusion_K, pose, cfg.diffusion_width,
                          cfg.diffusion_height)
        out = self.trainer.render_view(cam)
        return out["render"], out["depth"]

    def render_many_diffusion_res(self, poses: jnp.ndarray):
        """Render a (P, 4, 4) pose batch at the diffusion resolution in
        ONE dispatch (GSTrainer.render_views_batch) — the densify phase's
        pose probing + conditioning otherwise issue ~180 sequential
        host->device roundtrips per pair."""
        cfg = self.cfg
        p = poses.shape[0]
        cams = Camera(K=jnp.broadcast_to(self.diffusion_K, (p, 3, 3)),
                      w2c=jnp.asarray(poses, jnp.float32),
                      confidence=jnp.ones((p,), jnp.float32),
                      width=cfg.diffusion_width, height=cfg.diffusion_height)
        return self.trainer.render_views_batch(cams)

    def _ordered_train_indices(self) -> list[int]:
        if not self.cfg.reorg_train_views:
            return list(range(self.trainer.train_views.images.shape[0]))
        from ..gs.trainer import order_cameras_tsp
        return order_cameras_tsp(self.trainer.train_views.cameras)

    # ------------------------------------------------------------------

    def init_GS(self, cycle: int = 0, log_every: int = 0):
        return self.trainer.training(0, epoch_indicator=cycle,
                                     log_every=log_every)

    def densify_views(self, cycle: int, log_every: int = 0):
        """Per adjacent (TSP-ordered) view pair: interpolate poses, build
        conditioning, run completion; returns (frames (P, F, Hgs, Wgs, 3),
        poses (P, F, 4, 4)) with per-pair caching."""
        cfg = self.cfg
        order = self._ordered_train_indices()
        cams = self.trainer.train_views.cameras
        results: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}

        # pair topology (reference diffusionGS.py:227,244-250): gs_v2 wraps
        # around (N pairs, last->first included); loop0_gs stops at N-1.
        n = len(order)
        num_pairs = n if cfg.densify_type == "interpolate_gs_v2" else n - 1

        # phase 1: cache hits + conditioning for the uncached pairs (GS
        # renders + warps — cheap next to the diffusion)
        pending: list[tuple[int, str, object, jnp.ndarray]] = []
        for pi in range(num_pairs):
            cache = os.path.join(
                self.save_dir,
                f"interpolated_dense_views_cyc{cycle}_view{pi}.npz")
            if os.path.exists(cache):
                data = np.load(cache)
                expect = (cfg.num_frames, self.gs_height, self.gs_width, 3)
                if data["frames"].shape == expect:
                    results[pi] = (jnp.asarray(data["frames"]),
                                   jnp.asarray(data["poses"]))
                    continue
                # stale cache from a different num_frames/resolution run
                # (the reference would feed it through and crash later);
                # recompute instead
                print(f"[densify] ignoring stale cache {cache}: "
                      f"{data['frames'].shape} != {expect}")

            i, j = order[pi], order[(pi + 1) % n]
            pose_l = np.asarray(cams.w2c[i])
            pose_r = np.asarray(cams.w2c[j])
            poses = C.interpolate_pair_poses(pose_l, pose_r, cfg.num_frames)
            if cfg.perturb_interp_poses and cfg.num_frames > 2:
                # per-(cycle, pair) rng, like the completion keys below:
                # with the shared self._rng stream, a resumed run (cache
                # hits consume no draws) would perturb later pairs
                # differently than an uninterrupted one
                pair_rng = np.random.default_rng(
                    cfg.seed + 1000 * cycle + pi)
                interior = C.perturb_and_select_poses(
                    self.render_diffusion_res, self.diffusion_K,
                    poses[1:-1], [pose_l, pose_r], pair_rng,
                    render_many_fn=self.render_many_diffusion_res)
                poses = np.concatenate([poses[:1], interior, poses[-1:]])
            poses_j = jnp.asarray(poses)

            # Endpoint images are the ORIGINAL input photos, not GS
            # renders: reference render_GS(idx=...) returns
            # cam.get_image() for a train index (diffusionGS.py:152-154),
            # and warp_images_bw NEAREST-upsizes them to the diffusion
            # resolution (:1398-1441). Only the endpoint DEPTHS come from
            # the GS render (here rendered directly at diffusion res
            # instead of GS-res render + nearest resize — documented
            # TPU-first simplification; same pose, finer sampling).
            img_l = resize_nearest(self.trainer.train_views.images[i],
                                   cfg.diffusion_height, cfg.diffusion_width)
            img_r = resize_nearest(self.trainer.train_views.images[j],
                                   cfg.diffusion_height, cfg.diffusion_width)
            _, depth_l = self.render_diffusion_res(poses_j[0])
            _, depth_r = self.render_diffusion_res(poses_j[-1])
            cond = C.prepare_pair_conditioning(
                self.render_diffusion_res, self.diffusion_K, poses_j,
                img_l, depth_l, img_r, depth_r,
                num_steps=cfg.num_inference_steps,
                warp_mode=cfg.interp_type,
                render_many_fn=self.render_many_diffusion_res)
            pending.append((pi, cache, cond, poses_j))

        # phase 2: completion + post-process. Sequential mode streams
        # (completion -> cache per pair, preserving the reference's
        # interrupt-resume granularity); pair_parallel runs ALL pending
        # pairs as ONE vmapped call sharded over the pair axis.
        def finish(pi, cache, cond, poses_j, frames):
            if cfg.save_debug:
                from ..utils.debug_dump import dump_pair_debug
                dump_pair_debug(os.path.join(
                    self.save_dir, "debug", f"cyc{cycle}_pair{pi}"),
                    cond, frames)
            if cfg.replace_endpoints:
                frames = frames.at[0].set(cond.image_start)
                frames = frames.at[-1].set(cond.image_end)
            # resize to GS training resolution with PIL's default filter —
            # antialiased bicubic (reference :915-917 resizes via
            # PIL.Image.resize with no explicit resample)
            frames = jax.vmap(
                lambda f: resize_cubic_antialiased(f, self.gs_height,
                                                   self.gs_width))(frames)
            np.savez(cache, frames=np.asarray(frames),
                     poses=np.asarray(poses_j))
            results[pi] = (frames, poses_j)
            if log_every:
                print(f"[densify] cycle {cycle} pair {pi} done")

        keys = {pi: jax.random.PRNGKey(cfg.seed + 1000 * cycle + pi)
                for pi, _, _, _ in pending}
        if cfg.pair_parallel and len(pending) > 1:
            # With a mesh, run WAVES of pair-axis-extent pairs: the vmapped
            # pair axis is BATCHED, not sequential, so more pairs than
            # shards would put >1 full-size completion per chip
            # simultaneously and blow HBM (DL3DV: 9 pairs on a 4-extent
            # axis -> 3 waves of <=4, each chip holding ONE pair — the
            # PARITY.md v5e-8 wave model, executed literally). Each wave
            # pads to a multiple of the extent (device_put requires even
            # shards); padded slots recompute the wave's last pair and are
            # dropped below.
            shards = _leading_axis_shards(cfg.pair_sharding)
            wave = shards if cfg.pair_sharding is not None else len(pending)
            for w0 in range(0, len(pending), wave):
                batch = pending[w0:w0 + wave]
                pad = (-len(batch)) % shards
                rows = [c for _, _, c, _ in batch] + [batch[-1][2]] * pad
                krows = ([keys[pi] for pi, _, _, _ in batch]
                         + [keys[batch[-1][0]]] * pad)
                conds = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
                kb = jnp.stack(krows)
                if cfg.pair_sharding is not None:
                    conds = jax.tree.map(
                        lambda x: jax.device_put(x, cfg.pair_sharding),
                        conds)
                    kb = jax.device_put(kb, cfg.pair_sharding)
                frames_b = jax.vmap(
                    lambda c, k: self.completion_fn(
                        c.image_start, c.cond_images, c.image_end, c.masks,
                        c.lambda_ts, k))(conds, kb)
                for bi, (pi, cache, cond, poses_j) in enumerate(batch):
                    finish(pi, cache, cond, poses_j, frames_b[bi])
        else:
            for pi, cache, cond, poses_j in pending:
                frames = self.completion_fn(cond.image_start,
                                            cond.cond_images, cond.image_end,
                                            cond.masks, cond.lambda_ts,
                                            keys[pi])
                finish(pi, cache, cond, poses_j, frames)

        return (jnp.stack([results[pi][0] for pi in range(num_pairs)]),
                jnp.stack([results[pi][1] for pi in range(num_pairs)]))

    def densify_pcds(self, frames, poses, cycle: int):
        """DUSt3R point-cloud densification over FPS-selected keyframes
        (reference densify_views keyframe collection :274-336 +
        densify_pcds :347-435). frames (P, F, Hgs, Wgs, 3) at GS res;
        poses (P, F, 4, 4) w2c. Returns (xyz, rgb) or None."""
        cfg = self.cfg
        if cfg.num_views_for_pcd_densification <= 1 or self.dust3r_fn is None:
            return None
        p, f = frames.shape[:2]

        # keyframe selection PER PAIR (reference :274-284): FPS over the
        # covisibility metric when fps_keyframe_sampling (DL3DV preset),
        # evenly spaced linspace otherwise; sorted, last selected index
        # dropped (:281 — each pair's final frame duplicates the next
        # pair's first). Frame 0 of each pair is an input view
        # (input_flags, reference :272) — it bypasses the quality gate
        # below; the loop0 chain's very last frame is an appended input
        # keyframe too (:285-289).
        key_idx, input_flags = [], []
        for pi in range(p):
            if cfg.fps_keyframe_sampling:
                loc = sorted(C.fps_keyframes(
                    np.asarray(poses[pi]),
                    cfg.num_views_for_pcd_densification))
            else:
                loc = list(np.linspace(
                    0, f - 1, cfg.num_views_for_pcd_densification,
                    dtype=int))
            for i in loc[:-1]:
                key_idx.append(pi * f + int(i))
                input_flags.append(int(i) == 0)
        if cfg.densify_type == "interpolate_loop0_gs":
            key_idx.append((p - 1) * f + f - 1)
            input_flags.append(True)
        flat_frames = np.asarray(frames).reshape(-1, *frames.shape[2:])
        flat_poses = np.asarray(poses).reshape(-1, 4, 4)
        flat_frames = flat_frames[key_idx]
        flat_poses = flat_poses[key_idx]

        # frame-quality gate on the key frames: GMFlow fwd-bwd consistency
        # vs the GS render (reference :374-385); input frames always pass
        # (reference :386 ``or input_flags[i]``). Skipped without a flow_fn.
        if self.flow_fn is not None:
            from ..vision.gmflow import correspondence_mask
            # all gate renders in ONE dispatch (the flow net itself still
            # runs per frame — its cost dwarfs the render anyway)
            rendered_all, _ = self.render_many_gs_res(
                jnp.asarray(flat_poses))
            keep = []
            for i in range(len(flat_frames)):
                if input_flags[i]:
                    keep.append(True)
                    continue
                _, _, mean = correspondence_mask(
                    self.flow_fn, jnp.asarray(flat_frames[i]),
                    rendered_all[i])
                keep.append(float(mean) > cfg.pcd_frame_quality_thresh)
            keep = np.asarray(keep)
            if keep.sum() >= 2:
                flat_frames = flat_frames[keep]
                flat_poses = flat_poses[keep]

        from ..utils.se3 import se3_inverse
        c2w = np.asarray(se3_inverse(jnp.asarray(flat_poses)))
        K_gs = np.asarray(self.K_gs)
        # DUSt3R input convention: width-512 frames with intrinsics scaled
        # by 512/W (reference diffusionGS.py:394) — the public checkpoints
        # are trained at this resolution.
        scale = 512.0 / self.gs_width
        h512 = max(int(round(self.gs_height * scale)), 1)
        K512 = K_gs.copy()
        K512[:2] *= scale
        frames512 = jax.vmap(
            lambda f: resize_bilinear(f, h512, 512, antialias=True))(
                jnp.asarray(flat_frames))
        xyz, rgb = self.dust3r_fn(frames512, c2w, K512)
        # uniform downsample to ~100k points then statistical outlier
        # removal, matching the reference post-process exactly
        # (diffusionGS.py:323-327: uniform_down_sample(every_k=N//100000)
        # + remove_statistical_outlier(nb_neighbors=20, std_ratio=3.0)) —
        # without the cap the GS reset would ingest the full multi-
        # million-point cloud and balloon the Gaussian capacity.
        xyz, rgb = np.asarray(xyz), np.asarray(rgb)
        every_k = max(1, len(xyz) // 100_000)
        xyz, rgb = xyz[::every_k], rgb[::every_k]
        from ..utils.pcd import remove_statistical_outliers
        xyz, rgb = remove_statistical_outliers(xyz, rgb, k=20, std_ratio=3.0)
        from ..utils.ply import write_ply_points
        write_ply_points(os.path.join(self.save_dir,
                                      f"dense_views_cyc{cycle}.ply"),
                         xyz, rgb)
        return xyz, rgb

    def render_gs_res(self, pose: jnp.ndarray):
        """Render a pose at the GS training resolution."""
        cam = make_camera(self.K_gs, pose, self.gs_width, self.gs_height)
        out = self.trainer.render_view(cam)
        return out["render"], out["depth"]

    def render_many_gs_res(self, poses: jnp.ndarray):
        """Render a (P, 4, 4) pose batch at the GS training resolution in
        ONE dispatch (see render_many_diffusion_res)."""
        p = poses.shape[0]
        cams = Camera(K=jnp.broadcast_to(self.K_gs, (p, 3, 3)),
                      w2c=jnp.asarray(poses, jnp.float32),
                      confidence=jnp.ones((p,), jnp.float32),
                      width=self.gs_width, height=self.gs_height)
        return self.trainer.render_views_batch(cams)

    def _refine_view_stack(self, frames, poses):
        """Flatten (P, F, ...) pair stacks into the pseudo-view set refine
        trains on (reference densify_views :272-289): each pair contributes
        frames[:-1] — its final frame duplicates the next pair's first
        (wrap-around) or the next chain link's start, so keeping it would
        double-count the input views in the pseudo sampling distribution —
        and the DTU 'interpolate_loop0_gs' chain appends the very last
        pair's final frame back (it has no successor pair, :285-289)."""
        p, f = frames.shape[:2]
        flat_f = np.asarray(frames[:, :-1]).reshape(
            p * (f - 1), *frames.shape[2:])
        flat_p = np.asarray(poses[:, :-1]).reshape(p * (f - 1), 4, 4)
        if self.cfg.densify_type == "interpolate_loop0_gs":
            flat_f = np.concatenate([flat_f, np.asarray(frames[-1, -1:])])
            flat_p = np.concatenate([flat_p, np.asarray(poses[-1, -1:])])
        return flat_f, flat_p

    def refine_GS(self, frames, poses, cycle: int, load_ckpt: bool = False,
                  log_every: int = 0):
        """Install pseudo views and finetune (reference :1610-1645).
        LPIPS is toggled on for the refine phase only (reference
        :1690,1697)."""
        cfg = self.cfg
        tr = self.trainer
        if load_ckpt:
            ckpt = tr.latest_checkpoint()
            if ckpt:
                tr.load_checkpoint(ckpt)
        flat_frames, flat_poses = self._refine_view_stack(frames, poses)
        K_gs = np.asarray(self.K_gs)
        depths = None
        if cfg.capture_pseudo_depth and tr.cfg.svd_depth_warmup > 0:
            # all pseudo-pose depths in ONE dispatch + one transfer
            # (a render + np.asarray per pose serialized the device
            # against the host loop — ~72 roundtrips at LLFF shape)
            depths = np.asarray(
                self.render_many_gs_res(jnp.asarray(flat_poses))[1])
        tr.update_cameras(flat_frames, flat_poses, K_gs,
                          cam_confidences=cfg.cam_confidence, append=False,
                          depths=depths)
        tr.reset_optimizers()
        tr.reset_gs()
        tr.use_lpips_loss = cfg.use_lpips_loss
        try:
            return tr.finetune(
                0, cycle, disable_densification=cfg.disable_densification,
                pseudo_cam_sampling_rate=cfg.pseudo_cam_sampling_rate,
                log_every=log_every)
        finally:
            tr.use_lpips_loss = False

    def run(self, refine_cycles: Optional[int] = None, log_every: int = 0):
        """The full test-time loop (reference run(), :1668-1697)."""
        cycles = (refine_cycles if refine_cycles is not None
                  else self.cfg.refine_cycle_num)
        with self.timer.phase("init_gs", sync=True):
            self.init_GS(0, log_every=log_every)
        for cyc in range(cycles):
            # Resume from the latest checkpoint BEFORE the pcd reset. The
            # reference nominally loads it inside refine_GS (:1614-1625),
            # AFTER run() applies reset_gaussians_from_pcd (:1685-1687) —
            # but its load_checkpoint lives in the missing FSGS submodule;
            # a full-model restore there would silently discard the
            # cycle>=1 pcd append and defeat densify_pcds' documented
            # purpose. Loading first is state-identical for uninterrupted
            # runs (the in-memory state IS the latest checkpoint) and
            # keeps the pcd densification live on resumed ones.
            if cyc > 0:
                ckpt = self.trainer.latest_checkpoint()
                if ckpt:
                    self.trainer.load_checkpoint(ckpt)
            with self.timer.phase("densify", sync=True):
                frames, poses = self.densify_views(cyc, log_every=log_every)
            with self.timer.phase("densify_pcd", sync=True):
                pcd = self.densify_pcds(frames, poses, cyc)
            if pcd is not None:
                self.trainer.reset_gaussians_from_pcd(
                    pcd[0], pcd[1], append_to_old_gaussians=(cyc > 0))
            with self.timer.phase("refine", sync=True):
                self.refine_GS(frames, poses, cycle=cyc,
                               load_ckpt=False, log_every=log_every)
        if log_every:
            print("[timing]", self.timer.report())
        return self.trainer
