"""Strategy sweep for SVD's tiny temporal attention (25 frames/pixel).

profile_l0_transformer.py measures the current packed-head einsum path at
~35 ms per L0 call (rows=3*9216, h=5, f=25, d=64) — ~8 TF/s, dominated by
the HBM round-trip of the (rows, 125, 125) f32 logits and tiny-matmul MXU
feed. Candidates timed here at the production shape:

  A. current packed-head einsum (baseline)
  B. flash kernel on the packed layout: (rows, 1, 125->128, 64) with
     per-head segment ids (block-diagonal = head independence, pad column
     masked), sweeping block_b — VMEM-resident logits, no HBM round-trip
  C. plain per-head flash: (rows, 5, 25->128, 64) padded (26x logit
     waste but one kernel)

Takes the single-chip flock on /tmp/syn3r_tpu.lock at startup. Timing is
N independent dispatches on fixed inputs / N; k and v are jit arguments
so their pack/pad cost is measured like production pays it.

Applying a winner means switching _attention_packed_heads
(models/layers.py) to the winning strategy at the packed temporal shape.
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

from syn3r_tpu.models.layers import _attention_packed_heads

ROWS, H, F, D = 3 * 9216, 5, 25, 64
DTYPE = jnp.bfloat16
SCALE = 0.125
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (ROWS, H, F, D), DTYPE)
k = jax.random.normal(rng, (ROWS, H, F, D), DTYPE)
v = jax.random.normal(rng, (ROWS, H, F, D), DTYPE)


def _drain(x):
    # host transfer of one element: the only reliable execution barrier on
    # the remote 'axon' platform (block_until_ready returns immediately).
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1]))


def timeit(fn, iters=8):
    _drain(fn(q, k, v))   # compile
    _drain(fn(q, k, v))   # warm
    t0 = time.perf_counter()
    outs = [fn(q, k, v) for _ in range(iters)]
    total = sum(jnp.sum(o.astype(jnp.float32).ravel()[:1]) for o in outs)
    float(total)
    return (time.perf_counter() - t0) / iters


@jax.jit
def baseline(qq, kk, vv):
    return _attention_packed_heads(qq, kk, vv, SCALE).astype(DTYPE)


def packed_flash(block_b):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    hs = H * F                       # 125
    pad_to = 128
    p = pad_to - hs

    def pack(t):
        t2 = t.reshape(ROWS, hs, D)
        return jnp.pad(t2, ((0, 0), (0, p), (0, 0)))[:, None]

    seg_row = jnp.concatenate(
        [jnp.repeat(jnp.arange(1, H + 1), F),
         jnp.zeros((p,), jnp.int32)]).astype(jnp.int32)

    @jax.jit
    def fn(qq, kk, vv):
        qp, kp, vp = pack(qq), pack(kk), pack(vv)
        seg = jnp.broadcast_to(seg_row[None], (ROWS, pad_to))
        b = pad_to
        bs = BlockSizes(block_q=b, block_k_major=b, block_k=b,
                        block_b=block_b,
                        block_q_major_dkv=b, block_k_major_dkv=b,
                        block_k_dkv=b, block_q_dkv=b,
                        block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
        out = flash_attention(qp, kp, vp, sm_scale=SCALE,
                              segment_ids=SegmentIds(q=seg, kv=seg),
                              block_sizes=bs)
        return out[:, 0, :hs].reshape(ROWS, H, F, D).astype(DTYPE)

    return fn


def perhead_flash(block_b):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    pad_to = 128
    p = pad_to - F

    @jax.jit
    def fn(qq, kk, vv):
        qp = jnp.pad(qq, ((0, 0), (0, 0), (0, p), (0, 0)))
        kp = jnp.pad(kk, ((0, 0), (0, 0), (0, p), (0, 0)))
        vp = jnp.pad(vv, ((0, 0), (0, 0), (0, p), (0, 0)))
        seg = jnp.broadcast_to(
            (jnp.arange(pad_to) < F).astype(jnp.int32)[None],
            (ROWS, pad_to))
        b = pad_to
        bs = BlockSizes(block_q=b, block_k_major=b, block_k=b,
                        block_b=block_b,
                        block_q_major_dkv=b, block_k_major_dkv=b,
                        block_k_dkv=b, block_q_dkv=b,
                        block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
        out = flash_attention(qp, kp, vp, sm_scale=SCALE,
                              segment_ids=SegmentIds(q=seg, kv=seg),
                              block_sizes=bs)
        return out[:, :, :F].astype(DTYPE)

    return fn


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    dt = timeit(baseline)
    print(f"A baseline packed einsum        {dt * 1e3:7.2f} ms", flush=True)
    for bb in (1, 4, 16):
        try:
            dt = timeit(packed_flash(bb))
            print(f"B packed flash block_b={bb:2d}      {dt * 1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B packed flash block_b={bb:2d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    for bb in (1, 8):
        try:
            dt = timeit(perhead_flash(bb))
            print(f"C per-head flash block_b={bb:2d}    {dt * 1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"C per-head flash block_b={bb:2d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
