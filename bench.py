"""Round benchmark: SVD denoise throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/sec/chip of a full-resolution SVD-XT UNet forward
(batch 1, 25 frames, 72x128 latents, bf16) — the unit of work of the
reference's guided denoising loop (its hot loop B runs ~1000 such passes
per view pair, SURVEY.md §3.1). The reference publishes no numbers
(BASELINE.md), so vs_baseline is null until a GPU reference measurement
exists.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel

    dtype = jnp.bfloat16
    unet = UNetSpatioTemporalConditionModel(dtype=dtype)
    b, f, h, w = 1, 25, 72, 128
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (b, f, h, w, 8), dtype)
    ehs = jax.random.normal(rng, (b, 1, 1024), dtype)
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    params = jax.jit(lambda k: unet.init(k, sample, 1.0, ehs, tids))(rng)
    # NB: sum + host fetch per call — block_until_ready under-reports
    # through the axon remote tunnel.
    fwd = jax.jit(lambda p, x: unet.apply(p, x, 1.0, ehs, tids).sum())

    float(fwd(params, sample))  # compile
    n = 4
    t0 = time.time()
    for _ in range(n):
        float(fwd(params, sample))
    dt = (time.time() - t0) / n

    print(json.dumps({
        "metric": "svd_unet_denoise_frames_per_sec_per_chip",
        "value": round(f / dt, 3),
        "unit": "frames/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
