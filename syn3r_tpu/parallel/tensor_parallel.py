"""Tensor-parallel (Megatron-pattern) sharding for the SVD UNet.

The reference has no distributed code (SURVEY.md §2.7); on TPU the guided
denoise loop's latency lever beyond the 2-way direction split is sharding
the UNet itself over the ICI mesh. This is done the idiomatic XLA way: the
module code is untouched — parameters get GSPMD sharding annotations and
the SPMD partitioner inserts the collectives.

Pattern (Megatron-LM):
  - column-parallel (output features sharded): attention q/k/v projections,
    feed-forward in-projection. The per-device matmul produces a disjoint
    slice of heads / hidden units; no communication.
  - row-parallel (input features sharded): attention out-projection,
    feed-forward out-projection. Each device contracts its slice; XLA
    inserts ONE all-reduce (psum over ICI) per attention/FF block.
  - everything else (convs, norms, embeddings, biases of row-parallel
    layers) replicated: the spatio-temporal ResNet trunk interleaves
    GroupNorms (which need full channel statistics) between convs, so a
    Megatron pairing saves nothing there — the attention/FF stacks are
    where the sharded FLOPs pay.

Caveats (correct regardless — GSPMD reshards as needed; noted for perf):
  - SVD-XT's first level has 5 heads — not divisible by a 2/4-way model
    axis; GSPMD pads. Levels 2-4 (10/20/20 heads) split evenly.
  - The GEGLU in-projection's output is split into (value, gate) halves;
    sharding that axis makes the split cross shard boundaries, costing a
    collective-permute. An interleaved column permutation would remove it
    at the price of a layout-aware weight converter.
  - The fused Pallas GEGLU kernel (ops/pallas_ffn.py, now default-on for
    single-chip inference) is a custom call GSPMD cannot partition — with
    it lowered, the FF weights are all-gathered at each call, negating
    their sharding. ``make_tp_unet_forward`` therefore traces its forward
    under ``pallas_ffn.pallas_disabled()`` so the FF takes the plain-dot
    reference path, which partitions fine (as do the attention
    projections, the larger share of the sharded FLOPs).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import keystr


def unet_tp_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree implementing the Megatron pattern above.

    Matches the diffusers-style parameter paths of
    ``models/svd_unet.UNetSpatioTemporalConditionModel`` (both the spatial
    and temporal transformer blocks; attn1 self- and attn2 cross-attention).
    """
    col = NamedSharding(mesh, P(None, axis))       # (in, out-sharded)
    row = NamedSharding(mesh, P(axis, None))       # (in-sharded, out)
    vec_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        ks = keystr(path)
        if leaf.ndim == 2:
            if ("']['to_q']['kernel" in ks or "']['to_k']['kernel" in ks
                    or "']['to_v']['kernel" in ks):
                return col
            if "']['to_out_" in ks and ks.endswith("kernel']"):
                return row
            if ("']['ff']" in ks or "']['ff_in']" in ks):
                if "']['proj']['kernel" in ks:
                    return col
                if ks.endswith("kernel']") and "']['proj']" not in ks:
                    return row
        if leaf.ndim == 1 and ("']['ff']" in ks or "']['ff_in']" in ks) \
                and "']['proj']['bias" in ks:
            return vec_sh                           # column-parallel bias
        return rep

    return jax.tree_util.tree_map_with_path(spec, params)


def make_tp_unet_forward(mesh: Mesh, unet, params, axis: str = "model"):
    """Build a tensor-parallel UNet forward over ``mesh``'s ``axis``.

    Returns (run, params_tp): ``run(sample, t, ehs, tids)`` with replicated
    activations and TP-sharded parameters; outputs replicated. params_tp is
    the annotated parameter tree (each attention/FF weight holds 1/N of its
    sharded axis per device — the HBM saving matters at the 1.5B-param
    SVD-XT size).
    """
    specs = unet_tp_shardings(params, mesh, axis)
    params_tp = jax.device_put(params, specs)
    rep = NamedSharding(mesh, P())

    from ..ops.pallas_ffn import pallas_disabled

    def _apply(p, s, t, e, i):
        # traced (not run) under the context: the FF lowers the plain-dot
        # reference path, which GSPMD partitions (module docstring).
        with pallas_disabled():
            return unet.apply(p, s, t, e, i)

    fwd = jax.jit(_apply, out_shardings=rep)

    def run(sample, t, ehs, tids):
        return fwd(params_tp, jax.device_put(sample, rep), t,
                   jax.device_put(ehs, rep), jax.device_put(tids, rep))

    return run, params_tp
