"""Point-cloud bootstrap tool — the reference's
``scripts/generate_pcd_for_gs.py`` surface: turn posed RGB-D views into a
COLMAP ``points3D.bin`` for Gaussian initialization (open3d-free: the
unproject/merge runs through this framework's camera math)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def depth_to_pointcloud(image01: np.ndarray, depth: np.ndarray,
                        K: np.ndarray, w2c: np.ndarray,
                        stride: int = 2, max_depth: float = 100.0):
    """(H, W, 3) [0,1] + (H, W) depth -> world points + colors."""
    import jax.numpy as jnp

    from ..utils.camera import unproject
    from ..utils.se3 import se3_inverse

    d = jnp.asarray(depth[::stride, ::stride], jnp.float32)
    rgb = image01[::stride, ::stride].reshape(-1, 3)
    Ks = np.asarray(K, np.float32).copy()
    Ks[:2] /= stride
    pts_cam = np.asarray(unproject(d, jnp.asarray(Ks))).reshape(-1, 3)
    valid = (pts_cam[:, 2] > 1e-4) & (pts_cam[:, 2] < max_depth)
    c2w = np.asarray(se3_inverse(jnp.asarray(w2c, jnp.float32)))
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    return pts_w[valid], rgb[valid]


def merge_views(views, voxel: float = 0.0):
    """views: list of (xyz, rgb). Optional voxel downsample (uniform grid
    mean — the open3d uniform_down_sample/outlier-removal equivalent)."""
    xyz = np.concatenate([v[0] for v in views])
    rgb = np.concatenate([v[1] for v in views])
    if voxel > 0 and len(xyz):
        keys = np.floor(xyz / voxel).astype(np.int64)
        _, idx = np.unique(keys, axis=0, return_index=True)
        xyz, rgb = xyz[idx], rgb[idx]
    return xyz, rgb


# canonical home is utils/pcd.py (the pipeline layer uses it too);
# re-exported here for the CLI surface and back-compat
from ..utils.pcd import remove_statistical_outliers  # noqa: F401


def write_colmap_points(xyz: np.ndarray, rgb01: np.ndarray, path: str):
    from ..utils import colmap
    pts = colmap.ColmapPoints3D(
        xyz.astype(np.float64),
        np.clip(rgb01 * 255.0, 0, 255).astype(np.uint8),
        np.zeros(len(xyz)))
    colmap.write_points3d_binary(pts, path)


def main(argv=None):
    p = argparse.ArgumentParser("syn3r-tpu generate-pcd")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--depths", nargs="+", required=True,
                   help=".npy depth maps matching --images")
    p.add_argument("--sparse_dir", required=True,
                   help="COLMAP sparse dir providing cameras + poses")
    p.add_argument("--out", required=True, help="output points3D.bin")
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--voxel", type=float, default=0.0)
    args = p.parse_args(argv)

    from PIL import Image

    from ..utils import colmap
    cams, imgs, _ = colmap.read_model(args.sparse_dir)
    by_name = {im.name: im for im in imgs.values()}

    views = []
    for img_path, depth_path in zip(args.images, args.depths):
        name = os.path.basename(img_path)
        im = by_name[name]
        K = cams[im.camera_id].K()
        rgb = np.asarray(Image.open(img_path).convert("RGB"),
                         np.float32) / 255.0
        depth = np.load(depth_path)
        views.append(depth_to_pointcloud(rgb, depth, K, im.w2c(),
                                         stride=args.stride))
    xyz, rgb = merge_views(views, voxel=args.voxel)
    xyz, rgb = remove_statistical_outliers(xyz, rgb)
    write_colmap_points(xyz, rgb, args.out)
    print(f"[pcd] wrote {len(xyz)} points -> {args.out}")


if __name__ == "__main__":
    main()
