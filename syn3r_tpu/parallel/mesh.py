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


def make_scene_topology(devices=None):
    """The production within-scene placement (PARITY.md "≥3x target"):
    a (pair, dir) mesh where every (view-pair, direction) completion unit
    of one scene runs on its own chip — LLFF's 3 wrap-around pairs x 2
    directions fill 6 of a v5e-8's chips. Returns (pair_sharding,
    direction_sharding), or (None, None) on a single device.

    The pair axis feeds ``DiffusionGSConfig.pair_sharding`` (the
    orchestrator pads the pair count to the axis extent); the dir axis
    feeds ``GuidedSVDConfig.direction_sharding`` (which also keeps the
    per-chip UNet batch at the single-direction size that fits v5e HBM —
    the direction-BATCHED single-chip variant measured 17.8 GB vs 15.75).
    """
    import numpy as np
    devices = jax.devices() if devices is None else list(devices)
    d = len(devices)
    if d < 2:
        return None, None
    pairs = d // 2 if d >= 4 else 1
    mesh = Mesh(np.asarray(devices[:pairs * 2]).reshape(pairs, 2),
                ("pair", "dir"))
    return NamedSharding(mesh, P("pair")), NamedSharding(mesh, P("dir"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))
