"""Block-size sweep for the 9216-token spatial flash attention.

profile_l0_transformer.py shows the L0 spatial self-attention as the
single biggest slice of the UNet forward (~220 ms of each 288 ms layer at
the fused batch-3 shapes). The flash kernel at 1024-cubed blocks measures
~37 TF/s; the d=64 contraction caps the MXU at ~50% of the 197 TF/s bf16
peak, so the realistic ceiling is ~98 TF/s — this sweeps (block_q,
block_k) pairs that divide 9216 to find how much of the remaining 2.6x is
block-shape. Also times the same shape through the newer splash-attention
kernel (MaxText's production choice) for comparison.

Respects the single-chip lock convention: don't run next to bench/battery.

Status: not yet measured. Two attempts (2026-08-19) stalled in remote
compile — the chip answers trivial matmuls in ~1.6 s, but a single flash
BlockSizes variant at this shape did not finish compiling within 10 min
through the tunnel (persistent cache misses on the batch-75 shape; round
2's cached entry was batch-25). Run on a healthy/local chip; applying a
winner is a one-line table in models/layers.py:_attention (block pick at
sq==9216).
"""
import itertools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from syn3r_tpu.utils.compile_cache import configure as _cc

_cc(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B, H, S, D = 75, 5, 9216, 64   # batch 3 x 25 frames, L0 spatial attention
DTYPE = jnp.bfloat16
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, H, S, D), DTYPE)
k = jax.random.normal(rng, (B, H, S, D), DTYPE)
v = jax.random.normal(rng, (B, H, S, D), DTYPE)
FLOPS = 2 * 2 * B * H * S * S * D   # qk + pv, 2 flops/MAC


def _drain(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def timeit(fn, iters=4):
    x = fn(q)
    _drain(x)
    t0 = time.time()
    x = fn(q)
    _drain(x)
    t1 = time.time() - t0
    t0 = time.time()
    xx = q
    for _ in range(iters):
        xx = fn(xx)
    _drain(xx)
    t2 = time.time() - t0
    return max(t2 - t1, 1e-9) / (iters - 1) if iters > 1 else t1


def flash_with(bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

    @jax.jit
    def fn(qq):
        out = flash_attention(qq, k, v, sm_scale=0.125, block_sizes=bs)
        return out.astype(DTYPE)

    return fn


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    results = []
    # logits block (block_q x block_k f32) must fit VMEM next to the
    # q/k/v slices: 1536x1536x4 = 9.4 MB is the practical cap. The
    # production config (1024, 1024) measured 37 TF/s standalone in round
    # 2; this trims the grid to the plausible improvements only.
    combos = [(1024, 1024), (1536, 1536), (1536, 1024), (1024, 1536),
              (768, 1536), (1536, 768)]
    for bq, bk in combos:
        if S % bq or S % bk:
            continue
        try:
            dt = timeit(flash_with(bq, bk))
        except Exception as e:  # noqa: BLE001 — kernel may reject a combo
            print(f"bq={bq:5d} bk={bk:5d}  FAILED {type(e).__name__}",
                  flush=True)
            continue
        tfs = FLOPS / dt / 1e12
        results.append((tfs, bq, bk))
        print(f"bq={bq:5d} bk={bk:5d}  {dt * 1e3:7.2f} ms  {tfs:6.1f} TF/s",
              flush=True)
    # splash attention comparison (dense full mask)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm)

        mask = sm.MultiHeadMask([sm.FullMask((S, S)) for _ in range(H)])
        kernel = sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1)

        @jax.jit
        def splash(qq):
            def one(qi, ki, vi):
                return kernel(qi * 0.125, ki, vi)
            return jax.vmap(one)(qq, k, v).astype(DTYPE)

        dt = timeit(splash)
        print(f"splash (default)   {dt * 1e3:7.2f} ms  "
              f"{FLOPS / dt / 1e12:6.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"splash FAILED: {type(e).__name__}: {e}", flush=True)
    if results:
        best = max(results)
        print(f"best: bq={best[1]} bk={best[2]} {best[0]:.1f} TF/s")


if __name__ == "__main__":
    main()
