"""3D Gaussian state: the only optimized object in the whole framework.

Replaces the reference's FSGS ``GaussianModel`` (missing submodule; interface
reconstructed in SURVEY.md §2.5). TPU-first choices:

  - The state is a flat pytree of fixed-capacity arrays plus an ``active``
    mask. Densify/prune change the *live count*, never the array shapes —
    capacity grows by power-of-two bucket doubling so XLA recompiles at most
    log2(N_max) times (SURVEY.md §7 hard-part #2).
  - Parameters are stored pre-activation (log-scale, logit-opacity, raw
    quaternion) exactly like 3DGS so optimizer semantics match.
  - Spherical harmonics follow the standard real-SH basis (degree <= 3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.knn import knn_mean_sq_dist

# Real spherical harmonics constants (standard basis, degree 0..3).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    means: jnp.ndarray           # (N, 3)
    quats: jnp.ndarray           # (N, 4) unnormalized wxyz
    log_scales: jnp.ndarray      # (N, 3)
    opacity_logits: jnp.ndarray  # (N, 1)
    sh_dc: jnp.ndarray           # (N, 1, 3) degree-0 SH
    # higher-degree SH, stored FLAT (N, 3*(K-1)) in production: the rank-3
    # (N, K-1, 3) form puts the tiny (15, 3) pair in XLA:TPU's tiled minor
    # dims — a measured 11.4x memory expansion (T(4,128) pads 15x3 to
    # 16x128) that OOM'd _densify_step's 3x-capacity gather at 2M capacity
    # (17.13 GB program, 12 GB of it ONE padded gather temp). Rank-2
    # arrays get the transposed {0,1} layout (capacity in lanes) like
    # quats and pad ~1x. The ``sh`` property accepts either rank, so
    # hand-built rank-3 states (tests, old checkpoints) still work.
    sh_rest: jnp.ndarray         # (N, 3*(K-1)) flat — or legacy (N, K-1, 3)
    active: jnp.ndarray          # (N,) bool — live vs padding slots

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return self.active.sum()

    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)

    @property
    def sh(self) -> jnp.ndarray:
        rest = self.sh_rest
        if rest.ndim == 2:                 # flat production storage
            rest = rest.reshape(rest.shape[0], -1, 3)
        return jnp.concatenate([self.sh_dc, rest], axis=1)

    def replace(self, **kw) -> "GaussianState":
        return dataclasses.replace(self, **kw)


PARAM_FIELDS = ("means", "quats", "log_scales", "opacity_logits",
                "sh_dc", "sh_rest")


def get_params(state: GaussianState) -> dict:
    """The differentiable/optimizable leaves (excludes the bool mask)."""
    return {f: getattr(state, f) for f in PARAM_FIELDS}


def with_params(state: GaussianState, params: dict) -> GaussianState:
    return state.replace(**params)


def next_capacity(n: int, minimum: int = 4096) -> int:
    """Power-of-two bucket >= n (bounds XLA recompiles under densification)."""
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) raw quats -> (N, 3, 3); normalizes internally (differentiable).

    rsqrt(sum + eps) instead of /norm: an all-zero quaternion (padding slot)
    must yield finite (zero) gradients, not the NaN that d|q|/dq at 0 gives.
    """
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    m = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return m.reshape(-1, 3, 3)


def covariance_3d(log_scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T, (N, 3, 3)."""
    R = quat_to_rotmat(quats)
    s2 = jnp.exp(2.0 * log_scales)            # (N, 3)
    return jnp.einsum("nij,nj,nkj->nik", R, s2, R)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate real SH colors. sh: (N, K, 3); dirs: (N, 3) unit vectors.

    Returns (N, 3) with the standard 3DGS +0.5 offset applied by the caller.
    """
    res = SH_C0 * sh[:, 0]
    if degree >= 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        res = res - SH_C1 * y * sh[:, 1] + SH_C1 * z * sh[:, 2] \
            - SH_C1 * x * sh[:, 3]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = (res + SH_C2[0] * xy * sh[:, 4] + SH_C2[1] * yz * sh[:, 5]
               + SH_C2[2] * (2.0 * zz - xx - yy) * sh[:, 6]
               + SH_C2[3] * xz * sh[:, 7] + SH_C2[4] * (xx - yy) * sh[:, 8])
    if degree >= 3:
        res = (res + SH_C3[0] * y * (3 * xx - yy) * sh[:, 9]
               + SH_C3[1] * xy * z * sh[:, 10]
               + SH_C3[2] * y * (4 * zz - xx - yy) * sh[:, 11]
               + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12]
               + SH_C3[4] * x * (4 * zz - xx - yy) * sh[:, 13]
               + SH_C3[5] * z * (xx - yy) * sh[:, 14]
               + SH_C3[6] * x * (xx - 3 * yy) * sh[:, 15])
    return res


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term + 0.5 offset: sh0 = (rgb - 0.5) / C0."""
    return (rgb - 0.5) / SH_C0


def from_points(xyz: jnp.ndarray, rgb: jnp.ndarray, sh_degree: int = 3,
                capacity: int | None = None,
                initial_opacity: float = 0.1) -> GaussianState:
    """Initialize Gaussians from a colored point cloud (the 3DGS recipe:
    isotropic scale = sqrt(mean sq dist of 3 NNs) via the KNN op, identity
    rotation, opacity 0.1, DC-only SH from colors)."""
    n = xyz.shape[0]
    cap = capacity or next_capacity(n)
    k_sh = (sh_degree + 1) ** 2

    mean_sq = knn_mean_sq_dist(jnp.asarray(xyz, jnp.float32), k=3)
    scales = jnp.sqrt(jnp.clip(mean_sq, 1e-7, None))
    log_scales = jnp.log(scales)[:, None].repeat(3, axis=1)

    inv_sig = jnp.log(initial_opacity / (1.0 - initial_opacity))

    def pad(x, fill=0.0):
        padding = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x.astype(jnp.float32), padding, constant_values=fill)

    quats = jnp.zeros((cap, 4)).at[:, 0].set(1.0)  # identity incl. padding
    return GaussianState(
        means=pad(jnp.asarray(xyz, jnp.float32)),
        quats=quats.at[:n].set(jnp.zeros((n, 4)).at[:, 0].set(1.0)),
        log_scales=pad(log_scales, fill=-10.0),
        opacity_logits=pad(jnp.full((n, 1), inv_sig), fill=-100.0),
        sh_dc=pad(rgb_to_sh_dc(jnp.asarray(rgb, jnp.float32))[:, None]),
        sh_rest=pad(jnp.zeros((n, (k_sh - 1) * 3))),
        active=jnp.arange(cap) < n,
    )


def random_init(key: jax.Array, n: int, extent: float = 1.3,
                sh_degree: int = 3, capacity: int | None = None) -> GaussianState:
    """Random point-cloud init (the reference's ``--rand_pcd`` path,
    bash_scripts/batch_dl3dv_train.sh:86)."""
    k1, k2 = jax.random.split(key)
    xyz = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    rgb = jax.random.uniform(k2, (n, 3))
    return from_points(xyz, rgb, sh_degree=sh_degree, capacity=capacity)
