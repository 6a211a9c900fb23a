"""PLY point-cloud I/O, including the 3DGS interchange format.

Covers the reference's plyfile/trimesh usages: dense point clouds written
per cycle (``dense_views_cyc{c}.ply``, reference diffusionGS.py:336) and
the standard 3DGS ``point_cloud.ply`` layout (x,y,z, nx,ny,nz, f_dc_*,
f_rest_*, opacity, scale_*, rot_*) so fitted Gaussians can be opened in
any 3DGS viewer and checkpoints from CUDA 3DGS tooling can be imported.
Pure Python struct/numpy — no plyfile dependency.
"""

from __future__ import annotations

import numpy as np


def write_ply_points(path: str, xyz: np.ndarray, rgb01=None) -> None:
    n = len(xyz)
    props = ["property float x", "property float y", "property float z"]
    if rgb01 is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if rgb01 is None:
            f.write(np.asarray(xyz, "<f4").tobytes())
        else:
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"),
                                     ("z", "<f4"), ("r", "u1"), ("g", "u1"),
                                     ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = np.asarray(xyz, "<f4").T
            c = np.clip(np.asarray(rgb01) * 255, 0, 255).astype("u1")
            rec["r"], rec["g"], rec["b"] = c.T
            f.write(rec.tobytes())


def read_ply_points(path: str):
    """Minimal binary-little-endian reader -> (xyz, rgb01 or None)."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    n = 0
    props: list[tuple[str, str]] = []
    for line in header:
        parts = line.split()
        if parts[:2] == ["element", "vertex"]:
            n = int(parts[2])
        elif parts and parts[0] == "property" and len(parts) == 3:
            props.append((parts[1], parts[2]))
    typemap = {"float": "<f4", "float32": "<f4", "uchar": "u1",
               "uint8": "u1", "double": "<f8"}
    dtype = np.dtype([(name, typemap[t]) for t, name in props])
    rec = np.frombuffer(data[head_end:head_end + n * dtype.itemsize], dtype)
    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
    rgb = None
    if "red" in rec.dtype.names:
        rgb = np.stack([rec["red"], rec["green"], rec["blue"]],
                       axis=1).astype(np.float32) / 255.0
    return xyz, rgb


def save_gaussians_ply(path: str, state) -> None:
    """Write a GaussianState in the standard 3DGS point_cloud.ply layout."""
    act = np.asarray(state.active)
    xyz = np.asarray(state.means)[act]
    sh_dc = np.asarray(state.sh_dc)[act]          # (N, 1, 3)
    sh_rest = np.asarray(state.sh_rest)[act]
    if sh_rest.ndim == 2:       # flat (N, 3(K-1)) production storage
        sh_rest = sh_rest.reshape(len(sh_rest), -1, 3)
    opacity = np.asarray(state.opacity_logits)[act]
    scales = np.asarray(state.log_scales)[act]
    rots = np.asarray(state.quats)[act]
    n = len(xyz)
    k_rest = sh_rest.shape[1] * 3

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(k_rest)]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    dtype = np.dtype([(nm, "<f4") for nm in names])
    rec = np.zeros(n, dtype=dtype)
    rec["x"], rec["y"], rec["z"] = xyz.T
    for i in range(3):
        rec[f"f_dc_{i}"] = sh_dc[:, 0, i]
    # 3DGS stores f_rest planar: all coeffs of channel 0, then 1, then 2
    rest_planar = sh_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(k_rest):
        rec[f"f_rest_{i}"] = rest_planar[:, i]
    rec["opacity"] = opacity[:, 0]
    for i in range(3):
        rec[f"scale_{i}"] = scales[:, i]
    for i in range(4):
        rec[f"rot_{i}"] = rots[:, i]
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "\n".join(f"property float {nm}" for nm in names)
              + "\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def load_gaussians_ply(path: str, capacity=None):
    """Read a 3DGS point_cloud.ply into a GaussianState."""
    import jax.numpy as jnp

    from ..models.gaussians import GaussianState, next_capacity
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    n = int(next(ln.split()[2] for ln in header
                 if ln.startswith("element vertex")))
    names = [ln.split()[2] for ln in header if ln.startswith("property")]
    rec = np.frombuffer(data[head_end:], dtype=np.dtype(
        [(nm, "<f4") for nm in names]), count=n)
    k_rest = sum(1 for nm in names if nm.startswith("f_rest_")) // 3
    cap = capacity or next_capacity(n)

    def pad(x, fill=0.0):
        return np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1),
                      constant_values=fill).astype(np.float32)

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], 1)
    sh_dc = np.stack([rec[f"f_dc_{i}"] for i in range(3)], 1)[:, None]
    rest = np.stack([rec[f"f_rest_{i}"] for i in range(3 * k_rest)], 1)
    # flat (N, 3(K-1)) coefficient-major storage (see GaussianState.sh_rest)
    sh_rest = rest.reshape(n, 3, k_rest).transpose(0, 2, 1).reshape(n, -1)
    quats = np.stack([rec[f"rot_{i}"] for i in range(4)], 1)
    pad_quats = pad(quats)
    pad_quats[n:, 0] = 1.0
    return GaussianState(
        means=jnp.asarray(pad(xyz)),
        quats=jnp.asarray(pad_quats),
        log_scales=jnp.asarray(pad(
            np.stack([rec[f"scale_{i}"] for i in range(3)], 1), fill=-10.0)),
        opacity_logits=jnp.asarray(pad(rec["opacity"][:, None], fill=-100.0)),
        sh_dc=jnp.asarray(pad(sh_dc)),
        sh_rest=jnp.asarray(pad(sh_rest)),
        active=jnp.asarray(np.arange(cap) < n),
    )
