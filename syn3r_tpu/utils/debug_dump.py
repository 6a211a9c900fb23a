"""Human-eyeballable debug artifacts — the reference's primary QC surface
(``model/diffusionGS.py:871-884`` dumps per-pair uncertainty/cond/warp
PNGs, ``:1201-1202`` the lambda-schedule heatmap, ``:1106-1109`` the
generated frames + mp4). Here the same set lands under
``<save_dir>/debug/cyc{c}_pair{p}/`` when ``DiffusionGSConfig.save_debug``
is on; the video is a GIF (PIL-only, no ffmpeg dependency in this image).
"""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img) -> np.ndarray:
    a = np.asarray(img, np.float32)
    if a.ndim == 2:
        a = a[..., None].repeat(3, axis=-1)
    return (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img) -> None:
    """img: (H, W, 3) or (H, W) float in [0, 1]."""
    from PIL import Image
    Image.fromarray(_to_u8(img)).save(path)


def save_heatmap_png(path: str, mat, upscale: int = 4) -> None:
    """(rows, cols) float matrix -> blue-to-red heatmap PNG, nearest-
    upscaled so latent-res masks and the (steps, frames) lambda schedule
    are legible."""
    from PIL import Image
    a = np.asarray(mat, np.float32)
    lo, hi = float(a.min()), float(a.max())
    t = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
    rgb = np.stack([t, 0.25 + 0.0 * t, 1.0 - t], axis=-1)
    im = Image.fromarray(_to_u8(rgb))
    if upscale > 1:
        im = im.resize((im.width * upscale, im.height * upscale),
                       resample=0)  # NEAREST
    im.save(path)


def save_gif(path: str, frames, fps: float = 7.0) -> None:
    """frames: (F, H, W, 3) float in [0, 1] -> animated GIF."""
    from PIL import Image
    ims = [Image.fromarray(_to_u8(f)) for f in np.asarray(frames)]
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)


def dump_pair_debug(out_dir: str, cond, frames) -> list[str]:
    """The reference's per-pair artifact set: endpoint + warped cond
    images, latent-res uncertainty masks (heatmaps), the lambda_ts
    schedule heatmap, and the completed frames as PNGs + completion.gif.
    ``cond`` is a ``completion.PairConditioning``; ``frames`` the
    completion output at diffusion resolution. Returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written = []

    def w(name, fn, *a):
        p = os.path.join(out_dir, name)
        fn(p, *a)
        written.append(p)

    w("endpoint_start.png", save_png, cond.image_start)
    w("endpoint_end.png", save_png, cond.image_end)
    cond_images = np.asarray(cond.cond_images)
    masks = np.asarray(cond.masks)
    for i in range(cond_images.shape[0]):
        w(f"cond_{i:02d}.png", save_png, cond_images[i])
        w(f"uncertainty_{i:02d}.png", save_heatmap_png, masks[i])
    w("lambda_ts.png", save_heatmap_png, cond.lambda_ts, 4)
    frames = np.asarray(frames)
    for i in range(frames.shape[0]):
        w(f"generated_{i:02d}.png", save_png, frames[i])
    w("completion.gif", save_gif, frames)
    return written
