"""Flat .npz <-> nested flax params serialization.

Converted model weights are stored as flat npz files keyed by
'/'-joined paths — simple, robust, no orbax dependency for frozen nets.
"""

from __future__ import annotations

import numpy as np


def save_params(params: dict, path: str) -> None:
    flat = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(params.get("params", params))
    np.savez(path, **flat)


def load_params(path: str) -> dict:
    import jax.numpy as jnp
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return {"params": tree}
