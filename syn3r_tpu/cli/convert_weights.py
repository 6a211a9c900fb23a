"""Convert HF Stable-Video-Diffusion checkpoints to this framework's
param files.

Input: a local snapshot of ``stabilityai/stable-video-diffusion-img2vid-xt``
(the reference pulls it from the hub at runtime, diffusionGS.py:1089) laid
out as ``unet/``, ``vae/``, ``image_encoder/`` with .safetensors or
.bin weights. Output: ``unet.npz``, ``vae.npz``, ``clip.npz`` consumed by
``cli.train --svd_weights``.

Optionally converts an lpips torch state dict (--lpips) to ``lpips.npz``.
"""

from __future__ import annotations

import argparse
import glob
import os


def _load_state_dict(model_dir: str) -> dict:
    """Read all .safetensors (preferred) or torch .bin files in a dir."""
    sd = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        import numpy as np
        from safetensors import safe_open
        for path in st_files:
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    t = f.get_tensor(k)
                    # HF fp16 snapshots: convert at fp32 like the .bin
                    # branch (models cast to bf16 at load time anyway).
                    if t.dtype == np.float16:
                        t = t.astype(np.float32)
                    sd[k] = t
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_dir, "*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no weights in {model_dir}")
    import torch
    for path in bin_files:
        data = torch.load(path, map_location="cpu", weights_only=True)
        sd.update({k: v.float().numpy() for k, v in data.items()})
    return sd


def main(argv=None):
    p = argparse.ArgumentParser("syn3r-tpu convert-weights")
    p.add_argument("--svd_dir", required=True,
                   help="local stable-video-diffusion-img2vid-xt snapshot")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--lpips", default=None,
                   help="optional torch lpips(net='vgg') state dict (.pth)")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from ..models.clip import convert_clip_torch
    from ..models.convert import torch_to_flax
    from ..utils.params import save_params

    for sub, converter, out in (
            ("unet", torch_to_flax, "unet.npz"),
            ("vae", torch_to_flax, "vae.npz"),
            ("image_encoder", convert_clip_torch, "clip.npz")):
        sd = _load_state_dict(os.path.join(args.svd_dir, sub))
        params = converter(sd)
        path = os.path.join(args.out_dir, out)
        save_params({"params": params}, path)
        print(f"[convert] {sub}: {len(sd)} tensors -> {path}")

    if args.lpips:
        import torch
        from ..models.lpips import convert_lpips_torch
        sd = torch.load(args.lpips, map_location="cpu", weights_only=True)
        sd = {k: v.float().numpy() for k, v in sd.items()}
        save_params({"params": convert_lpips_torch(sd)},
                    os.path.join(args.out_dir, "lpips.npz"))
        print("[convert] lpips -> lpips.npz")


if __name__ == "__main__":
    main()
