"""Device-mesh helpers.

The reference has no distributed code at all (SURVEY.md §2.7) — its
parallelism is bash loops over scenes. Here multi-chip scaling is native:
XLA collectives over ICI via jax.sharding. The natural axes for this
workload are scene/view data-parallelism and the {cond,uncond}x{fwd,bwd}
batch split of guided denoising.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_a: int, n_b: int, axes=("dir", "model")) -> Mesh:
    """2D mesh for composed parallelism — e.g. v5e-8 as (dir=2, model=4):
    the guided denoise's two directions sharded over ``axes[0]`` while the
    UNet's attention/FF params are Megatron-sharded over ``axes[1]``
    (parallel/tensor_parallel.py). Pure GSPMD composition: no pipeline
    code changes, the params' and activations' shardings meet in jit."""
    import numpy as np
    devices = jax.devices()
    assert len(devices) >= n_a * n_b, (n_a, n_b, len(devices))
    return Mesh(np.asarray(devices[:n_a * n_b]).reshape(n_a, n_b), axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))
