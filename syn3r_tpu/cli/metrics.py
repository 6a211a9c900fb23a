"""Metrics entry point — the reference's ``FSGS/metrics.py`` surface.

Computes PSNR / SSIM (/ LPIPS when weights are available) over each
``test/ours_*/renders`` vs ``gt`` folder under model_path, appending to
``eval_res.txt`` in the block format ``scripts/summarize_dl3dv.py`` parses:

    ours_chkpnt10000.pth
      SSIM : 0.8123
      PSNR : 24.55
      LPIPS: 0.1712

DTU masked evaluation (``metrics_dtu.py``): pass --masks <dir> with
per-view binary masks; metrics are computed over mask>0.5 pixels only.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser():
    p = argparse.ArgumentParser("syn3r-tpu metrics")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", default=None)  # parity, unused
    p.add_argument("--masks", default=None,
                   help="dir of per-view masks (DTU protocol)")
    p.add_argument("--lpips_weights", default=None,
                   help="converted LPIPS params (.npz); omit to skip LPIPS")
    return p


def evaluate_dirs(render_dir: str, gt_dir: str, masks_dir=None,
                  lpips_fn=None) -> dict:
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.image import psnr, ssim

    names = sorted(os.listdir(render_dir))
    ps, ss, lp = [], [], []
    for n in names:
        r = np.asarray(Image.open(os.path.join(render_dir, n)),
                       np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, n)),
                       np.float32) / 255.0
        if masks_dir:
            mpath = os.path.join(masks_dir, n)
            if os.path.exists(mpath):
                m = np.asarray(Image.open(mpath).convert("L"),
                               np.float32) / 255.0
                m = (m > 0.5)[..., None]
                r = np.where(m, r, 0.0)
                g = np.where(m, g, 0.0)
        r, g = jnp.asarray(r), jnp.asarray(g)
        ps.append(float(psnr(r, g)))
        ss.append(float(ssim(r, g)))
        if lpips_fn is not None:
            lp.append(float(lpips_fn(r, g)))
    out = {"PSNR": float(np.mean(ps)), "SSIM": float(np.mean(ss))}
    out["LPIPS"] = float(np.mean(lp)) if lp else float("nan")
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    lpips_fn = None
    if args.lpips_weights:
        from ..models.lpips import load_lpips_fn
        lpips_fn = load_lpips_fn(args.lpips_weights)

    res_path = os.path.join(args.model_path, "eval_res.txt")
    blocks = []
    for method_dir in sorted(glob.glob(os.path.join(args.model_path, "test",
                                                    "ours_*"))):
        rdir = os.path.join(method_dir, "renders")
        gdir = os.path.join(method_dir, "gt")
        if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
            continue
        stats = evaluate_dirs(rdir, gdir, masks_dir=args.masks,
                              lpips_fn=lpips_fn)
        name = os.path.basename(method_dir).replace("ours_", "")
        # reference naming keeps the torch extension in eval_res.txt
        block = (f"ours_{name}.pth\n"
                 f"  SSIM : {stats['SSIM']:.7f}\n"
                 f"  PSNR : {stats['PSNR']:.7f}\n"
                 f"  LPIPS: {stats['LPIPS']:.7f}\n")
        blocks.append(block)
        print(block, end="")
    with open(res_path, "a") as f:
        f.writelines(blocks)
    print(f"[metrics] appended to {res_path}")


if __name__ == "__main__":
    main()
