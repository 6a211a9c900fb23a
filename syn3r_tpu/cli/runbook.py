"""One-command weights runbook (BASELINE.md north star).

Takes a local HF snapshot of stable-video-diffusion-img2vid-xt, converts
it, runs one scene twice — GS-only baseline and the full guided-diffusion
loop — evaluates both, and prints the PSNR/SSIM/LPIPS delta:

    python -m syn3r_tpu.cli.runbook \
        --hf_snapshot /path/to/stable-video-diffusion-img2vid-xt \
        --scene /data/nerf_llff_data/fern --out /tmp/fern_runbook

The moment weights land in the (currently egress-blocked) environment,
this is the single command that produces the north-star evidence. Stages
are individually selectable (--stages convert,baseline,full,report) and
resume off existing outputs, so a crashed run continues where it stopped.
"""

from __future__ import annotations

import argparse
import json
import os


def _parse_eval(model_dir: str) -> dict:
    """Read the eval_res.txt block written by cli.metrics."""
    path = os.path.join(model_dir, "eval_res.txt")
    out = {}
    block = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("ours_"):
                block = line.rstrip(":")
                out[block] = {}
            elif block and ":" in line:
                k, v = line.split(":", 1)
                try:
                    out[block][k.strip()] = float(v)
                except ValueError:
                    pass
    return out


def _best_block(res: dict) -> tuple[str, dict]:
    """Prefer the last refine checkpoint, else the plain one."""
    for name in sorted(res, reverse=True):
        if name.startswith("ours_refine"):
            return name, res[name]
    name = next(iter(res))
    return name, res[name]


def main(argv=None):
    p = argparse.ArgumentParser("syn3r-tpu runbook")
    p.add_argument("--hf_snapshot", required=True,
                   help="local stable-video-diffusion-img2vid-xt dir "
                        "(unet/ vae/ image_encoder/ subdirs)")
    p.add_argument("--scene", required=True, help="COLMAP scene dir")
    p.add_argument("--out", required=True)
    p.add_argument("--n_views", type=int, default=3)
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--iterations", type=int, default=10_000)
    p.add_argument("--refine_cycle_num", type=int, default=2)
    p.add_argument("--lpips", default=None,
                   help="optional torch lpips vgg state dict for the "
                        "refine loss + LPIPS eval")
    p.add_argument("--stages", default="convert,baseline,full,report",
                   help="comma list of: convert baseline full report")
    p.add_argument("--preset", default="llff",
                   choices=["llff", "dtu", "dl3dv", "none"],
                   help="cli.batch preset whose train flags seed the run "
                        "(default llff — the weights-day command needs no "
                        "extra flags); 'none' for bare defaults")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra flags forwarded to cli.train (win over the "
                        "preset — argparse keeps the last occurrence)")
    args = p.parse_args(argv)
    stages = set(args.stages.split(","))
    os.makedirs(args.out, exist_ok=True)
    weights_dir = os.path.join(args.out, "weights")

    from . import convert_weights as convert_cli
    from . import metrics as metrics_cli
    from . import render as render_cli
    from . import train as train_cli

    # 1. convert ---------------------------------------------------------
    if "convert" in stages:
        done = all(os.path.exists(os.path.join(weights_dir, f))
                   for f in ("unet.npz", "vae.npz", "clip.npz"))
        if done:
            print(f"[runbook] convert: {weights_dir} already populated")
        else:
            cargv = ["--svd_dir", args.hf_snapshot, "--out_dir", weights_dir]
            if args.lpips:
                cargv += ["--lpips", args.lpips]
            convert_cli.main(cargv)

    # the full dataset preset (cli.batch PRESETS — the reference's bash
    # hyperparameter matrix), so the runbook trains with the EXACT LLFF
    # protocol flags (proximity densify off, svd depth warmup, pseudo
    # sampling) rather than bare cli.train defaults
    from .batch import PRESETS
    preset = [] if args.preset == "none" else list(PRESETS[args.preset])
    common = preset + ["-s", args.scene, "--n_views", str(args.n_views),
                       "--llffhold", str(args.llffhold),
                       "--iterations", str(args.iterations)] \
        + list(args.extra)

    def run_and_eval(model_dir, extra):
        if not os.path.exists(os.path.join(model_dir, "eval_res.txt")):
            train_cli.main(["-m", model_dir] + common + extra)
            render_cli.main(["-s", args.scene, "-m", model_dir])
            margv = ["-m", model_dir]
            if args.lpips:
                margv += ["--lpips_weights",
                          os.path.join(weights_dir, "lpips.npz")]
            metrics_cli.main(margv)
        else:
            print(f"[runbook] {model_dir}: eval_res.txt exists, skipping")

    # 2. GS-only baseline ------------------------------------------------
    base_dir = os.path.join(args.out, "gs_only")
    if "baseline" in stages:
        run_and_eval(base_dir, ["--refine_cycle_num", "0"])

    # 3. full guided run -------------------------------------------------
    full_dir = os.path.join(args.out, "full")
    if "full" in stages:
        extra = ["--refine_cycle_num", str(args.refine_cycle_num),
                 "--svd_weights", weights_dir]
        if args.lpips:
            extra += ["--lpips_weights",
                      os.path.join(weights_dir, "lpips.npz")]
        run_and_eval(full_dir, extra)

    # 4. report ----------------------------------------------------------
    if "report" in stages:
        base = _parse_eval(base_dir)
        full = _parse_eval(full_dir) if os.path.exists(
            os.path.join(full_dir, "eval_res.txt")) else None
        bname, bm = _best_block(base)
        print(f"[runbook] GS-only   ({bname}): "
              + " ".join(f"{k}={v:.3f}" for k, v in bm.items()))
        report = {"gs_only": bm}
        if full:
            fname, fm = _best_block(full)
            print(f"[runbook] guided    ({fname}): "
                  + " ".join(f"{k}={v:.3f}" for k, v in fm.items()))
            delta = {k: fm[k] - bm[k] for k in fm if k in bm}
            print("[runbook] delta     : "
                  + " ".join(f"{k}={v:+.3f}" for k, v in delta.items()))
            report["full"] = fm
            report["delta"] = delta
        with open(os.path.join(args.out, "runbook_report.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(f"[runbook] report -> {args.out}/runbook_report.json")


if __name__ == "__main__":
    main()
