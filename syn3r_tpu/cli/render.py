"""Render entry point — the reference's ``FSGS/render.py`` surface
(missing submodule; call convention from bash_scripts/batch_llff_eval.sh:
25-31): load a checkpoint, render the test views (and optionally an
interpolated video path), write renders/ and gt/ folders the metrics tool
consumes."""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser("syn3r-tpu render")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file; default = newest in model_path")
    p.add_argument("--images", default="images")
    p.add_argument("--resolution", "-r", type=int, default=1)
    p.add_argument("--n_views", type=int, default=3)
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--video", action="store_true",
                   help="also render an interpolated camera path")
    p.add_argument("--video_frames", type=int, default=90)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ..gs.scene import load_colmap_scene
    from ..gs.trainer import GSTrainer, TrainConfig, make_viewset
    from ..models import gaussians as G
    from ..utils import se3

    scene = load_colmap_scene(args.source_path, images_dir=args.images,
                              resolution=args.resolution,
                              n_views=args.n_views, llffhold=args.llffhold)
    views = make_viewset(scene.train_cameras, scene.train_images)
    init = G.from_points(jnp.asarray(scene.points_xyz),
                         jnp.asarray(scene.points_rgb))
    tr = GSTrainer(views, TrainConfig(), init, model_path=args.model_path)
    ckpt = args.checkpoint or tr.latest_checkpoint()
    if ckpt is None:
        raise SystemExit(f"no checkpoint found in {args.model_path}")
    tr.load_checkpoint(ckpt)
    name = os.path.splitext(os.path.basename(ckpt))[0]

    out_dir = os.path.join(args.model_path, "test", f"ours_{name}")
    os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)

    def save(arr, path):
        Image.fromarray(
            (np.clip(np.asarray(arr), 0, 1) * 255).astype(np.uint8)
        ).save(path)

    for i, cam in enumerate(scene.test_cameras):
        out = tr.render_view(cam)
        save(out["render"], os.path.join(out_dir, "renders", f"{i:05d}.png"))
        save(scene.test_images[i], os.path.join(out_dir, "gt",
                                                f"{i:05d}.png"))
    print(f"[render] {len(scene.test_cameras)} test views -> {out_dir}")

    if args.video:
        vid_dir = os.path.join(out_dir, "video")
        os.makedirs(vid_dir, exist_ok=True)
        cams = scene.train_cameras
        k = 0
        per_seg = max(args.video_frames // max(len(cams) - 1, 1), 2)
        for a in range(len(cams) - 1):
            poses = se3.interpolate_poses(cams[a].w2c, cams[a + 1].w2c,
                                          per_seg)
            for p in poses[:-1]:
                cam = cams[0].replace(w2c=jnp.asarray(p))
                save(tr.render_view(cam)["render"],
                     os.path.join(vid_dir, f"{k:05d}.png"))
                k += 1
        print(f"[render] video path: {k} frames -> {vid_dir}")


if __name__ == "__main__":
    main()
