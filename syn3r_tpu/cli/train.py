"""Training entry point — the reference's ``scripts/train.py`` surface.

Per-scene test-time optimization: load a COLMAP scene, fit 3DGS, run the
refine-cycle loop with guided SVD completion (or the warp-only fallback
when no SVD weights are available).

Flags mirror the reference CLI (scripts/train.py:28-70) plus the GS
optimization knobs its FSGS fork adds (visible in bash_scripts, SURVEY.md
§2.4)."""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("syn3r-tpu train")
    # scene / IO
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--images", default="images")
    p.add_argument("--resolution", "-r", type=int, default=1)
    p.add_argument("--n_views", type=int, default=3)
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--rand_pcd", action="store_true")
    # diffusion / refine loop (reference scripts/train.py:28-70)
    p.add_argument("--diffusion_type", default="2PassProbUncertainPost",
                   choices=["2PassProbUncertain", "2PassProbUncertainPost"])
    p.add_argument("--densify_type", default="interpolate_gs_v2",
                   choices=["interpolate_gs_v2", "interpolate_loop0_gs"],
                   help="pair topology: gs_v2 = N wrap-around pairs "
                        "(LLFF/DL3DV), loop0_gs = N-1 pairs (DTU) — "
                        "reference diffusionGS.py:227,244-250")
    p.add_argument("--interp_type", default="backward_warp",
                   choices=["backward_warp", "forward_warp"],
                   help="conditioning warp (reference diffusionGS.py:"
                        "506-509): backward_warp = uncertainty-fused "
                        "(every shipped config); forward_warp = endpoint "
                        "splatting with binary masks")
    p.add_argument("--refine_cycle_num", type=int, default=2)
    p.add_argument("--cam_confidence", type=float, default=0.05)
    # NOTE: accepted for reference-CLI parity but a deliberate no-op: in
    # the reference's live path the clamp is hard-coded to 0.4 inside the
    # scheduler (scheduling_euler_discrete.py:767) and this flag only fed
    # dead 1-pass code — see SURVEY.md §2.8.
    p.add_argument("--weight_clamp", type=float, default=0.2,
                   help="no-op, kept for reference-CLI parity (the live "
                        "clamp is hard-coded 0.4 in the scheduler)")
    p.add_argument("--pseudo_cam_sampling_rate", type=float, default=0.02)
    p.add_argument("--num_views_for_pcd_densification", type=int, default=4)
    p.add_argument("--fps_keyframe_sampling", type=int, default=0,
                   help="if > 0, FPS (covisibility metric) keyframe "
                        "selection for pcd densification instead of "
                        "linspace (the DL3DV preset)")
    p.add_argument("--reorg_train_views", type=int, default=1,
                   help="TSP-order the train views (reference "
                        "diffusionGS.py:62-66); every shipped config "
                        "leaves this on")
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--guidance_reuse_cfg_uncond", type=int, default=0,
                   help="opt-in speed knob: reuse the CFG pass's uncond "
                        "row as the guidance x0 (one batch-2 UNet forward "
                        "per step/direction instead of batch-3, ~1/3 of "
                        "the step FLOPs saved; documented divergence from "
                        "the reference via the time-context batch quirk)")
    p.add_argument("--diffusion_width", type=int, default=1024)
    p.add_argument("--diffusion_height", type=int, default=576)
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--svd_weights", default=None,
                   help="dir with converted SVD/CLIP/VAE params (.npz); "
                        "without it the warp-only completion runs")
    p.add_argument("--dust3r_weights", default=None,
                   help="converted DUSt3R params (.npz, convert_dust3r_"
                        "torch); enables the DL3DV pcd-densification "
                        "branch (reference use_dust3r)")
    p.add_argument("--gmflow_weights", default=None,
                   help="converted public-GMFlow params (.npz, convert_"
                        "gmflow_torch); enables the frame-quality "
                        "consistency gate")
    # GS optimization (FSGS-side flags)
    p.add_argument("--iterations", type=int, default=10_000)
    p.add_argument("--lambda_dssim", type=float, default=0.2)
    p.add_argument("--densify_grad_threshold", type=float, default=2e-4)
    p.add_argument("--percent_dense", type=float, default=0.01)
    p.add_argument("--sample_svd_pseudo_interval", type=int, default=2)
    p.add_argument("--start_sample_svd_frame", type=int, default=2000)
    p.add_argument("--use_proximity_densify", type=int, default=1,
                   help="FSGS proximity-guided Gaussian unpooling "
                        "(reconstructed semantics, gs/densify.py). Default "
                        "ON like the fork: the LLFF/DL3DV reference scripts "
                        "pass 0 explicitly (batch_llff_train.sh:38) while "
                        "DTU leaves it on (batch_dtu_train.sh:39-42)")
    p.add_argument("--proximity_threshold", type=float, default=0.01,
                   help="grow where mean 3-NN distance > this x scene "
                        "extent (proximity unpooling)")
    # fork-surface flags consumed only inside the missing FSGS submodule;
    # accepted for script-level CLI parity (every shipped config passes
    # them), with the equivalence documented:
    p.add_argument("--num_train_samples", type=int, default=None,
                   help="fork flag; equals --n_views in every shipped "
                        "config (batch_*_train.sh) — --n_views is "
                        "authoritative here")
    p.add_argument("--use_dust3r", type=int, default=0,
                   help="fork flag (FSGS-side dust3r init); 0 in every "
                        "shipped config — the live dust3r branch is "
                        "gated by --num_views_for_pcd_densification > 1 "
                        "and --dust3r_weights here")
    p.add_argument("--dataset", default="llff",
                   choices=["llff", "dtu", "dl3dv"],
                   help="accepted for script parity; only consumed by "
                        "dead code in the reference (diffusionGS.py:474,"
                        "604 inside _extrapolate_from*) — dataset "
                        "behavior here comes from the explicit flags")
    p.add_argument("--sample_pseudo_interval", type=int, default=10 ** 20,
                   help="FSGS monocular-depth pseudo-view interval (1e20 = "
                        "off, the value every reference config passes — "
                        "bash_scripts/batch_llff_train.sh:39); needs a "
                        "depth estimator via GSTrainer.set_mono_depth_fn")
    p.add_argument("--start_sample_pseudo", type=int, default=2000)
    p.add_argument("--svd_depth_warmup", type=int, default=0,
                   help="when > 0, add Pearson depth supervision on SVD "
                        "pseudo views (reconstructed FSGS-fork semantics)")
    p.add_argument("--lpips_weight", type=float, default=1.0)
    p.add_argument("--lpips_weights", default=None,
                   help="converted LPIPS VGG params (.npz); enables the "
                        "LPIPS refine loss (reference opt.use_lpips_loss)")
    p.add_argument("--rasterizer", default="pallas",
                   choices=["pallas", "tiled", "dense"],
                   help="pallas = in-VMEM composite kernels (production "
                        "on TPU); tiled = XLA composite; dense = exact "
                        "reference path")
    p.add_argument("--tile_cap", type=int, default=1024)
    p.add_argument("--disable_densification", action="store_true")
    p.add_argument("--save_debug", action="store_true",
                   help="dump the reference's per-pair QC artifacts "
                        "(uncertainty/cond PNGs, lambda heatmap, "
                        "completion GIF) under <model_path>/dense_views/"
                        "debug/ (reference diffusionGS.py:871-884)")
    p.add_argument("--scene_parallel", default="auto",
                   choices=["auto", "off", "on"],
                   help="within-scene multi-chip scaling (beyond the "
                        "reference, whose only parallelism is a bash loop "
                        "over scenes): all (view-pair, direction) "
                        "completion units of one scene run concurrently "
                        "on a (pair, dir) device mesh — LLFF 3 pairs x 2 "
                        "directions fill 6 of a v5e-8's chips "
                        "(parallel/mesh.make_scene_topology; PARITY.md "
                        "'>=3x target'). auto = engage when >1 device is "
                        "visible; on = require it")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=1000)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Honor JAX_PLATFORMS explicitly: on this jax build the env var is NOT
    # applied when a platform plugin (the axon TPU) is registered, so
    # subprocess workers (batch --parallel, tests) that export
    # JAX_PLATFORMS=cpu would still grab the TPU tunnel — and two
    # concurrent clients of the single-chip tunnel deadlock in the remote
    # compile queue (observed: both fleet workers stuck in a socket wait).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp

    from ..gs.scene import load_colmap_scene
    from ..gs.trainer import GSTrainer, TrainConfig, make_viewset
    from ..models import gaussians as G
    from ..pipeline.orchestrator import DiffusionGS, DiffusionGSConfig

    scene = load_colmap_scene(args.source_path, images_dir=args.images,
                              resolution=args.resolution,
                              n_views=args.n_views, llffhold=args.llffhold,
                              rand_pcd=args.rand_pcd, seed=args.seed)
    print(f"[scene] {len(scene.train_cameras)} train / "
          f"{len(scene.test_cameras)} test views, "
          f"{len(scene.points_xyz)} points")

    views = make_viewset(scene.train_cameras, scene.train_images)
    test_views = (make_viewset(scene.test_cameras, scene.test_images)
                  if len(scene.test_cameras) else None)
    init = G.from_points(jnp.asarray(scene.points_xyz),
                         jnp.asarray(scene.points_rgb))
    cfg = TrainConfig(
        iterations=args.iterations, lambda_dssim=args.lambda_dssim,
        densify_grad_threshold=args.densify_grad_threshold,
        percent_dense=args.percent_dense,
        sample_svd_pseudo_interval=args.sample_svd_pseudo_interval,
        start_sample_svd_iter=args.start_sample_svd_frame,
        sample_pseudo_interval=args.sample_pseudo_interval,
        start_sample_pseudo=args.start_sample_pseudo,
        pseudo_cam_sampling_rate=args.pseudo_cam_sampling_rate,
        svd_depth_warmup=args.svd_depth_warmup,
        lpips_weight=args.lpips_weight,
        use_proximity_densify=bool(args.use_proximity_densify),
        proximity_threshold=args.proximity_threshold,
        rasterizer=args.rasterizer, tile_cap=args.tile_cap, seed=args.seed)
    trainer = GSTrainer(views, cfg, init, model_path=args.model_path,
                        test_views=test_views)
    if args.lpips_weights:
        from ..utils.params import load_params
        trainer.set_lpips(load_params(args.lpips_weights))

    pair_sh = dir_sh = None
    if args.scene_parallel != "off":
        from ..parallel.mesh import make_scene_topology
        pair_sh, dir_sh = make_scene_topology()
        if pair_sh is not None:
            print(f"[scene_parallel] (pair, dir) mesh "
                  f"{pair_sh.mesh.devices.shape} over "
                  f"{pair_sh.mesh.devices.size} devices")
        elif args.scene_parallel == "on":
            raise SystemExit("--scene_parallel on requires >= 2 devices")

    completion_fn = None
    if args.svd_weights:
        completion_fn = _load_svd_completion(args, direction_sharding=dir_sh)
    dust3r_fn = None
    if args.dust3r_weights:
        from ..utils.params import load_params
        from ..vision.dust3r import Dust3R, make_dust3r_fn
        dust3r_fn = make_dust3r_fn(Dust3R(),
                                   load_params(args.dust3r_weights))
    flow_fn = None
    if args.gmflow_weights:
        from ..utils.params import load_params
        from ..vision.gmflow_public import GMFlowPublic, make_flow_fn
        flow_fn = make_flow_fn(GMFlowPublic(),
                               load_params(args.gmflow_weights))

    dcfg = DiffusionGSConfig(
        diffusion_width=args.diffusion_width,
        diffusion_height=args.diffusion_height,
        num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        refine_cycle_num=args.refine_cycle_num,
        cam_confidence=args.cam_confidence,
        densify_type=args.densify_type,
        interp_type=args.interp_type,
        disable_densification=args.disable_densification,
        pseudo_cam_sampling_rate=args.pseudo_cam_sampling_rate,
        use_lpips_loss=bool(args.lpips_weights),
        num_views_for_pcd_densification=args.num_views_for_pcd_densification,
        fps_keyframe_sampling=bool(args.fps_keyframe_sampling),
        reorg_train_views=bool(args.reorg_train_views),
        save_debug=args.save_debug,
        pair_parallel=pair_sh is not None,
        pair_sharding=pair_sh,
        seed=args.seed)
    runner = DiffusionGS(trainer, dcfg, completion_fn=completion_fn,
                         dust3r_fn=dust3r_fn, flow_fn=flow_fn)
    runner.run(log_every=args.log_every)
    print(f"[done] checkpoints in {args.model_path}")


def _load_svd_completion(args, direction_sharding=None):
    """Build a GuidedSVDPipeline from converted weight files."""
    import numpy as np
    import jax.numpy as jnp

    from ..diffusion.pipeline import (GuidedSVDConfig, GuidedSVDPipeline,
                                      SVDModels)
    from ..models.clip import CLIPVisionModelWithProjection
    from ..models.svd_unet import UNetSpatioTemporalConditionModel
    from ..models.vae import AutoencoderKLTemporalDecoder
    from ..utils.params import load_params

    import jax

    d = args.svd_weights
    models = SVDModels(
        unet=UNetSpatioTemporalConditionModel(dtype=jnp.bfloat16),
        # bf16 weights: the reference loads the fp16 checkpoint
        # (diffusionGS.py:1089); halves HBM so the full-res guided vjp fits
        unet_params=jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            load_params(os.path.join(d, "unet.npz"))),
        vae=AutoencoderKLTemporalDecoder(),
        vae_params=load_params(os.path.join(d, "vae.npz")),
        clip=CLIPVisionModelWithProjection(dtype=jnp.bfloat16),
        clip_params=load_params(os.path.join(d, "clip.npz")),
    )
    variant = ("post" if args.diffusion_type == "2PassProbUncertainPost"
               else "prob")
    cfg = GuidedSVDConfig(num_inference_steps=args.num_inference_steps,
                          variant=variant,
                          guidance_reuse_cfg_uncond=bool(
                              args.guidance_reuse_cfg_uncond),
                          direction_sharding=direction_sharding)
    return GuidedSVDPipeline(models, cfg)


if __name__ == "__main__":
    main()
