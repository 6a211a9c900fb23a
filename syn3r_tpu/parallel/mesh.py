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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))
