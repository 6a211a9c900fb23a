"""Batch runner — the reference's bash-script layer (``bash_scripts/``).

Loops scenes of a dataset with the per-dataset hyperparameters the
reference hard-codes in its shell matrix (SURVEY.md §2.4), skipping scenes
whose final checkpoint already exists (the reference's coarse resumability,
batch_llff_train.sh:27-30), then optionally renders + evaluates.

Presets:
  llff : 3 views, 2PassProbUncertainPost, cam_confidence 0.05, no DUSt3R
  dtu  : 3 views, 2PassProbUncertain, lambda_dssim 0.5, resolution 4
  dl3dv: 9 views, 2PassProbUncertainPost, cam_confidence 0.2, rand_pcd,
         images_4, DUSt3R pcd densification
"""

from __future__ import annotations

import argparse
import os

PRESETS = {
    "llff": ["--n_views", "3", "--diffusion_type", "2PassProbUncertainPost",
             "--cam_confidence", "0.05", "--pseudo_cam_sampling_rate",
             "0.02", "--refine_cycle_num", "2",
             "--num_views_for_pcd_densification", "1",
             "--sample_svd_pseudo_interval", "1",
             "--start_sample_svd_frame", "2000",
             "--svd_depth_warmup", "1",
             "--densify_grad_threshold", "0.0002",
             "--percent_dense", "0.001"],
    "dtu": ["--n_views", "3", "--diffusion_type", "2PassProbUncertain",
            "--cam_confidence", "0.05", "--lambda_dssim", "0.5",
            "--resolution", "4", "--refine_cycle_num", "2"],
    "dl3dv": ["--n_views", "9", "--diffusion_type",
              "2PassProbUncertainPost", "--cam_confidence", "0.2",
              "--rand_pcd", "--images", "images_4",
              "--num_views_for_pcd_densification", "4",
              "--refine_cycle_num", "2"],
}

LLFF_SCENES = ["fern", "flower", "fortress", "horns", "leaves", "orchids",
               "room", "trex"]


def main(argv=None):
    p = argparse.ArgumentParser("syn3r-tpu batch")
    p.add_argument("--dataset", choices=list(PRESETS), required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--scenes", nargs="*", default=None,
                   help="default: all subdirs (llff: the standard 8)")
    p.add_argument("--eval", action="store_true",
                   help="render + metrics after each scene")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra flags forwarded to cli.train")
    args = p.parse_args(argv)

    scenes = args.scenes
    if not scenes:
        if args.dataset == "llff":
            scenes = [s for s in LLFF_SCENES
                      if os.path.isdir(os.path.join(args.data_root, s))]
        else:
            scenes = sorted(d for d in os.listdir(args.data_root)
                            if os.path.isdir(os.path.join(args.data_root, d)))

    from . import metrics as metrics_cli
    from . import render as render_cli
    from . import train as train_cli

    for scene in scenes:
        src = os.path.join(args.data_root, scene)
        out = os.path.join(args.out_root, scene)
        final_ckpt = os.path.join(out, "refine_1_chkpnt10000.npz")
        if os.path.exists(final_ckpt):
            print(f"[batch] skip {scene}: {final_ckpt} exists")
            continue
        print(f"[batch] === {scene} ===")
        train_cli.main(["-s", src, "-m", out] + PRESETS[args.dataset]
                       + list(args.extra))
        if args.eval:
            render_cli.main(["-s", src, "-m", out])
            metrics_cli.main(["-m", out])
    if args.eval:
        from .summarize import summarize
        print(summarize(args.out_root))


if __name__ == "__main__":
    main()
