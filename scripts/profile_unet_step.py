"""Component-level UNet step profile on the real chip.

The round bench reports ~35% MFU for the CFG (batch 2) UNet forward; this
script locates the other 65%. It times ONE instance of each block type at
the REAL fused-guided-step shapes (batch 3 = guidance uncond + CFG pair,
25 frames, 72x128 latents, bf16) per resolution level, then scales by the
per-level layer counts of the SVD-XT topology to estimate each level's
share of the whole forward, printed next to the measured full forward.

Levels (latents 72x128): down path activations per level
  L0 (72,128,320) h5 - L1 (36,64,640) h10 - L2 (18,32,1280) h20 -
  L3 (9,16,1280) no-attn; mid at (9,16,1280) h20.
Layer counts (svd_unet.py topology): down 2 res+2 attn per cross level,
up 3 res+3 attn (skip-concat inputs), mid 2 res+1 attn, L3 down 2 res /
up 3 res.

Run from anywhere: self-locates the repo root. Battery-run after bench.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from syn3r_tpu.utils.compile_cache import configure as _cc

_cc(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from syn3r_tpu.models.svd_unet import (SpatioTemporalResBlock,
                                       TransformerSpatioTemporalModel,
                                       UNetSpatioTemporalConditionModel)

TINY = "--tiny" in sys.argv  # CPU smoke test: shrunken shapes, same code
B, F = 3, (25 if not TINY else 3)
BF = B * F
DTYPE = jnp.bfloat16
TEMB_DIM = 1280         # block_out_channels[0] * 4
rng = jax.random.PRNGKey(0)


def _drain(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def chain_time(step, p, x0, iters=8):
    # params are a runtime ARGUMENT of the jitted step — closing over them
    # bakes them into the jaxpr as constants, which the axon remote-compile
    # transport rejects (HTTP 413) at real widths.
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


def time_res(h, w, c):
    mod = SpatioTemporalResBlock(c, dtype=DTYPE)
    x = jax.random.normal(rng, (BF, h, w, c), DTYPE)
    temb = jax.random.normal(rng, (BF, TEMB_DIM), DTYPE)
    p = jax.jit(lambda k: mod.init(k, x, temb, F))(rng)

    @jax.jit
    def step(p, x):
        y = mod.apply(p, x, temb, F)
        return y + 0 * x  # keep shapes chained

    return chain_time(step, p, x)


def time_attn(h, w, c, heads):
    mod = TransformerSpatioTemporalModel(heads, c // heads, dtype=DTYPE)
    x = jax.random.normal(rng, (BF, h, w, c), DTYPE)
    ctx = jax.random.normal(rng, (BF, 1, 1024), DTYPE)
    p = jax.jit(lambda k: mod.init(k, x, ctx, F, (1, 2)))(rng)

    @jax.jit
    def step(p, x):
        return mod.apply(p, x, ctx, F, (1, 2))

    return chain_time(step, p, x)


def time_full():
    unet = UNetSpatioTemporalConditionModel(dtype=DTYPE)
    x = jnp.zeros((B, F, 72, 128, 8), DTYPE)
    ehs = jnp.zeros((B, 1, 1024), DTYPE)
    tids = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]]), (B, 1))
    p = jax.jit(lambda k: unet.init(k, x, 1.0, ehs, tids))(rng)
    p = jax.tree.map(lambda v: v.astype(DTYPE), p)

    @jax.jit
    def step(p, x):
        # the UNet returns 4 channels; re-append the conditioning half so
        # the chained input keeps the 8-channel shape
        y = unet.apply(p, x, 1.0, ehs, tids, batch_groups=(1, 2))
        return jnp.concatenate([y, x[..., 4:]], axis=-1)

    x0 = jax.random.normal(rng, (B, F, 72, 128, 8), DTYPE)
    return chain_time(step, p, x0, iters=4)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    # (name, h, w, c, heads|None, count_in_full_forward)
    # counts: down(2) + up(3) per level (+1 up res for the extra skip
    # layer is already in the 3), mid shares L3 shape.
    levels = [
        ("L0 72x128 c320", 72, 128, 320, 5, (2, 3)),
        ("L1 36x64  c640", 36, 64, 640, 10, (2, 3)),
        ("L2 18x32  c1280", 18, 32, 1280, 20, (2, 3)),
        ("L3 9x16   c1280", 9, 16, 1280, None, (2 + 2, 3 + 1)),  # +mid res
    ]
    if TINY:  # CPU smoke test: one small level, skip the full forward
        levels = [("tiny 18x32 c64", 18, 32, 64, 2, (2, 3))]
    total_est = 0.0
    rows = []
    for name, h, w, c, heads, (n_dn, n_up) in levels:
        t_res = time_res(h, w, c)
        t_at = time_attn(h, w, c, heads) if heads else 0.0
        n = n_dn + n_up
        n_at = n if heads else 0
        est = n * t_res + n_at * t_at
        if name.startswith("L3"):
            est += 1 * time_attn(h, w, c, 20)  # the mid attention
        total_est += est
        rows.append((name, t_res * 1e3, t_at * 1e3, n, est * 1e3))
        # print incrementally so partial results survive a crash/timeout
        print(f"[level done] {name}: res {t_res * 1e3:.2f} ms, "
              f"attn {t_at * 1e3:.2f} ms", flush=True)
    t_full = time_full() if not TINY else total_est
    print(f"{'level':18s} {'res_ms':>7s} {'attn_ms':>8s} {'layers':>6s} "
          f"{'est_ms':>8s} {'share':>6s}")
    for name, r, a, n, e in rows:
        print(f"{name:18s} {r:7.2f} {a:8.2f} {n:6d} {e:8.1f} "
              f"{e / (total_est * 1e3):6.1%}")
    print(f"sum of parts: {total_est * 1e3:.1f} ms")
    print(f"full batch-3 forward: {t_full * 1e3:.1f} ms "
          f"(unaccounted: {(t_full - total_est) * 1e3:.1f} ms = "
          f"conv_in/out, up/downsamplers, skip concats, time embeds)")


if __name__ == "__main__":
    main()
