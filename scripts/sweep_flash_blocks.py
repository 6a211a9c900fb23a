"""Block-size sweep for the 9216-token spatial flash attention.

profile_l0_transformer.py shows the L0 spatial self-attention as the
single biggest slice of the UNet forward (~220 ms of each 288 ms layer at
the fused batch-3 shapes). The flash kernel at 1024-cubed blocks measures
~37 TF/s; the d=64 contraction caps the MXU at ~50% of the 197 TF/s bf16
peak, so the realistic ceiling is ~98 TF/s — this sweeps (block_q,
block_k) pairs that divide 9216 to find how much of the remaining 2.6x is
block-shape. Also times the same shape through the newer splash-attention
kernel (MaxText's production choice) for comparison.

Takes the single-chip flock on /tmp/syn3r_tpu.lock at startup (same lock
bench.py and the battery use), so it is safe to launch next to them — it
just serializes.

Timing: N independent dispatches of the jitted fn on fixed inputs, one
block_until_ready at the end, total/N. k and v are jit ARGUMENTS (not
closed-over constants) so their handling is paid like production.
"""
import fcntl
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_lockf = open("/tmp/syn3r_tpu.lock", "w")
fcntl.flock(_lockf, fcntl.LOCK_EX)

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
    # host transfer of one element: the only reliable execution barrier on
    # the remote 'axon' platform (block_until_ready returns immediately).
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def timeit(fn, iters=8):
    _drain(fn(q, k, v))   # compile
    _drain(fn(q, k, v))   # warm
    t0 = time.perf_counter()
    outs = [fn(q, k, v) for _ in range(iters)]
    # one tiny reduce per output, one host transfer at the end: the device
    # runs the 8 dispatches back-to-back, we pay a single RTT in the
    # timed region.
    total = sum(jnp.sum(o.astype(jnp.float32).ravel()[:1]) for o in outs)
    float(total)
    return (time.perf_counter() - t0) / iters


def flash_with(bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

    @jax.jit
    def fn(qq, kk, vv):
        out = flash_attention(qq, kk, vv, sm_scale=0.125, block_sizes=bs)
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
              (768, 1536), (1536, 768),
              # extreme aspect ratios, same ~9.4 MB logits-block cap
              (2304, 1024), (1024, 2304), (3072, 768), (768, 3072),
              (4608, 512), (512, 4608)]
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
        def splash(qq, kk, vv):
            def one(qi, ki, vi):
                return kernel(qi * 0.125, ki, vi)
            return jax.vmap(one)(qq, kk, vv).astype(DTYPE)

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
