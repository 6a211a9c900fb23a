"""Sub-component timing of ONE L0 TransformerSpatioTemporalModel call.

profile_unet_step.py shows the L0 (72x128, c320, h5) spatio-temporal
transformer at ~290 ms/layer x 5 layers = ~46% of the whole batch-3 UNet
forward, while rough FLOP math says ~130 ms — this script times each piece
at the production shapes (batch 3 x 25 frames, bf16) to locate the rest:
GroupNorm, proj_in/out, the spatial block's LN / flash self-attn /
single-token cross-attn / GEGLU FF, the temporal-layout transposes, and
the temporal block's ff_in / packed-head attn / 1-token cross / ff.

Respects the single-chip lock convention: do not run concurrently with
bench/battery/other chip clients (remote compile queue deadlocks).
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--tiny" in sys.argv:
    # the smoke path must NOT touch the chip (a concurrent chip client
    # deadlocks the remote compile queue); env var alone is ignored on
    # this jax build, set the config too (see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import flax.linen as nn

from syn3r_tpu.utils.compile_cache import configure as _cc

_cc(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from syn3r_tpu.models.layers import (Attention, FeedForward, GroupNorm,
                                     LayerNorm, TimestepEmbedding,
                                     timestep_embedding)
from syn3r_tpu.models.svd_unet import (BasicTransformerBlock,
                                       TemporalBasicTransformerBlock,
                                       TransformerSpatioTemporalModel)

TINY = "--tiny" in sys.argv
B, F = 3, (25 if not TINY else 3)
H, W, C, HEADS = (72, 128, 320, 5) if not TINY else (18, 32, 64, 2)
S = H * W
BF = B * F
DTYPE = jnp.bfloat16
rng = jax.random.PRNGKey(0)


def _drain(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def chain_time(step, p, x0, iters=8):
    def run(n):
        t0 = time.time()
        x = x0
        for _ in range(n):
            x = step(p, x)
        _drain(x)
        return time.time() - t0

    run(1)
    t1 = run(1)
    t2 = run(1 + iters)
    return max(t2 - t1, 1e-9) / iters


def bench_module(name, mod, x, *extra, chain=None):
    """Times mod.apply(p, x, *extra); chain keeps output shape == input."""
    p = jax.jit(lambda k: mod.init(k, x, *extra))(rng)

    @jax.jit
    def step(p, x):
        y = mod.apply(p, x, *extra)
        return chain(x, y) if chain is not None else y

    dt = chain_time(step, p, x)
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def bench_fn(name, fn, x, iters=8):
    step = jax.jit(lambda p, x: fn(x))

    dt = chain_time(step, None, x, iters)
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    xs = jax.random.normal(rng, (BF, H, W, C), DTYPE)        # spatial
    xseq = xs.reshape(BF, S, C)                              # (BF, S, C)
    ctx = jax.random.normal(rng, (BF, 1, 1024), DTYPE)
    xt = jax.random.normal(rng, (B * S, F, C), DTYPE)        # temporal rows
    ctx_t = jax.random.normal(rng, (B * S, 1, 1024), DTYPE)

    total = 0.0
    # --- the whole layer, for reference ---
    whole = bench_module("WHOLE TransformerST", TransformerSpatioTemporalModel(
        HEADS, C // HEADS, dtype=DTYPE), xs, ctx, F, (1, 2))

    # --- pieces ---
    total += bench_module("GroupNorm (norm)", GroupNorm(dtype=DTYPE), xs)
    total += bench_module(
        "proj_in Dense CxC", nn.Dense(C, dtype=DTYPE), xseq,
        chain=lambda x, y: y)
    # spatial block pieces
    total += bench_module("spatial LayerNorm x3",
                          LayerNorm(dtype=DTYPE), xseq) * 3
    total += bench_module("spatial self-attn (flash)",
                          Attention(HEADS, C // HEADS, dtype=DTYPE), xseq)
    total += bench_module("spatial cross-attn (1 tok)",
                          Attention(HEADS, C // HEADS, dtype=DTYPE), xseq,
                          ctx)
    total += bench_module("spatial FF (GEGLU)",
                          FeedForward(dim_out=C, dtype=DTYPE), xseq)
    # the temporal-layout transposes
    def to_temporal(x):
        m = x.reshape(B, F, S, C).transpose(0, 2, 1, 3)
        return m.reshape(B * S, F, C)

    def from_temporal(m):
        m = m.reshape(B, S, F, C).transpose(0, 2, 1, 3)
        return m.reshape(BF, S, C)

    total += bench_fn("transpose to temporal", to_temporal, xseq)
    total += bench_fn("transpose from temporal", from_temporal, xt)
    # temporal block pieces
    total += bench_module("temporal ff_in (GEGLU)",
                          FeedForward(dim_out=C, dtype=DTYPE), xt)
    total += bench_module("temporal self-attn (packed)",
                          Attention(HEADS, C // HEADS, dtype=DTYPE), xt)
    total += bench_module("temporal cross-attn (1 tok)",
                          Attention(HEADS, C // HEADS, dtype=DTYPE), xt,
                          ctx_t)
    total += bench_module("temporal ff (GEGLU)",
                          FeedForward(dim_out=C, dtype=DTYPE), xt)
    total += bench_module("temporal LayerNorm x4",
                          LayerNorm(dtype=DTYPE), xt) * 4
    # time-pos embed MLP (tiny)
    frame_ids = jnp.tile(jnp.arange(F), B)
    temb = timestep_embedding(frame_ids, C).astype(DTYPE)
    total += bench_module("time_pos_embed MLP",
                          TimestepEmbedding(C * 4, out_dim=C, dtype=DTYPE),
                          temb)
    total += bench_module(
        "proj_out Dense CxC", nn.Dense(C, dtype=DTYPE), xseq,
        chain=lambda x, y: y)

    print(f"{'sum of pieces':34s} {total * 1e3:8.2f} ms "
          f"(whole layer: {whole * 1e3:.2f} ms, "
          f"unaccounted {100 * (whole - total) / whole:.0f}%)")


if __name__ == "__main__":
    main()
