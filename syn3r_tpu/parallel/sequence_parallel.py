"""Sequence-parallel (frame-axis) sharding for the SVD UNet.

The SVD "sequence" is the 25-video-frame axis (SURVEY.md §5: no
long-context machinery exists in the reference; its temporal attention is
a 25-token softmax per spatial location). On TPU the idiomatic way to
scale past what one chip's HBM holds — longer clips, or freeing HBM for
bigger spatial tiles — is to shard that frame axis over the ICI mesh:

  - spatial attention, 2D convs, norms, and the resnet trunk treat frames
    as pure batch → they partition along the sharded axis with ZERO
    communication;
  - only the temporal transformers and the (3,1,1) temporal convs couple
    frames → the GSPMD partitioner inserts the all-gather / halo-exchange
    collectives exactly there.

Like :mod:`tensor_parallel`, the module code is untouched — the sharding
lives in jit in/out annotations and XLA's SPMD partitioner places the
collectives. Parameters are replicated (they fit one chip; see
tensor_parallel for the sharded-parameter axis — the two compose as a
2D mesh ("seq", "model") if both are needed).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_unet_forward(mesh: Mesh, unet, params, axis: str = "seq"):
    """Build a frame-axis-sharded UNet forward over ``mesh``'s ``axis``.

    Returns ``run(sample, t, ehs, tids)``: sample (B, F, H, W, C) enters
    and leaves sharded over F; encoder states / time ids are tiny and stay
    replicated. F need not divide the axis size (GSPMD pads), but even
    shards are where the scaling is linear.
    """
    rep = NamedSharding(mesh, P())
    seq = NamedSharding(mesh, P(None, axis))     # (B, F, H, W, C) on F
    params_rep = jax.device_put(params, rep)

    from ..ops.pallas_ffn import pallas_disabled

    def _apply(p, s, t, e, i):
        # the Pallas GEGLU custom call has no partition rule — traced
        # under the escape hatch so the FF's rows (which carry the
        # sharded frame axis) partition instead of all-gathering
        with pallas_disabled():
            return unet.apply(p, s, t, e, i)

    fwd = jax.jit(
        _apply,
        in_shardings=(rep, seq, None, rep, rep),
        out_shardings=seq,
    )

    def run(sample, t, ehs, tids):
        return fwd(params_rep, jax.device_put(sample, seq), t,
                   jax.device_put(ehs, rep), jax.device_put(tids, rep))

    return run
