"""torch state_dict -> flax params conversion for the SVD stack.

The flax modules in this package name their submodules to mirror the
diffusers state-dict layout ("down_blocks.0.resnets.1.conv1.weight" maps to
params['down_blocks_0']['resnets_1']['conv1']['kernel']), so conversion is
a mechanical walk: numeric path segments merge into their parent name,
tensors transpose by rank (conv OIHW->HWIO, linear OI->IO).

Input is a dict of numpy arrays (load the HF checkpoint with safetensors or
torch, then ``{k: v.numpy() for k, v in sd.items()}``) — this module never
imports torch.
"""

from __future__ import annotations

import numpy as np


def _merge_numeric(parts: list[str]) -> list[str]:
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _convert_tensor(path: list[str], arr: np.ndarray):
    """Returns (leaf_name, converted_array)."""
    leaf = path[-1]
    if leaf == "weight":
        if arr.ndim == 5:    # Conv3d (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
            return "kernel", arr.transpose(2, 3, 4, 1, 0)
        if arr.ndim == 4:    # Conv2d (O, I, kh, kw) -> (kh, kw, I, O)
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:    # Linear (O, I) -> (I, O)
            return "kernel", arr.transpose(1, 0)
        if arr.ndim == 1:    # Group/LayerNorm gain
            return "scale", arr
    return leaf, arr  # bias, mix_factor, ...


def torch_to_flax(state_dict: dict[str, np.ndarray]) -> dict:
    """Flat torch state dict -> nested flax params dict (pure numpy)."""
    params: dict = {}
    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        parts = _merge_numeric(key.split("."))
        leaf, val = _convert_tensor(parts, arr)
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = val.astype(np.float32)
    return params


def flatten_keys(tree: dict, prefix: str = "") -> list[str]:
    out = []
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(flatten_keys(v, path))
        else:
            out.append(path)
    return sorted(out)


def assert_tree_match(converted: dict, expected: dict):
    """Raise with a readable diff if param trees disagree (shapes + keys)."""
    ck = flatten_keys(converted)
    ek = flatten_keys(expected)
    missing = sorted(set(ek) - set(ck))
    extra = sorted(set(ck) - set(ek))
    if missing or extra:
        raise ValueError(
            f"param tree mismatch:\n  missing ({len(missing)}): "
            f"{missing[:12]}\n  extra ({len(extra)}): {extra[:12]}")

    def walk(c, e, path=""):
        for k, v in e.items():
            cv = c[k]
            if isinstance(v, dict):
                walk(cv, v, f"{path}/{k}")
            elif tuple(np.shape(cv)) != tuple(np.shape(v)):
                raise ValueError(f"shape mismatch at {path}/{k}: "
                                 f"{np.shape(cv)} vs {np.shape(v)}")

    walk(converted, expected)
