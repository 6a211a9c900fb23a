"""Round benchmark on the real chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: guided SVD denoise steps/sec — ONE direction of the
reference's hot loop B (grad-through-UNet guidance + CFG 2x UNet pass +
Euler update) at the full SVD-XT config, 25 frames, 72x128 latents, bf16
(reference SVD_2pass_prob_uncertain_post.py:671-829; the reference runs
2 directions x 100 steps per view pair).

extra carries the other north-star metrics (BASELINE.md):
  - gs_train_step_ms: full 3DGS train step (fwd+bwd+adam+densify stats,
    Pallas composite) at 504x378 / 65k gaussians
  - unet_fwd_mfu_pct: XLA-counted FLOPs of one CFG-2x UNet forward over
    measured time vs the v5e 197 TFLOP/s bf16 peak
  - denoise_frames_per_sec: 25 frames / guided step time
All timings chain each iteration's input to the previous output so the
remote-runtime dispatch queue cannot fake the numbers.
"""

import json
import time


def _chain_time(step, x0, iters):
    import jax
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def bench_guided_denoise():
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.diffusion import scheduler as S
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel

    f, hl, wl = 25, 72, 128
    dtype = jnp.bfloat16
    unet = UNetSpatioTemporalConditionModel(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    sample8 = jnp.zeros((1, f, hl, wl, 8), dtype)
    ehs1 = jnp.zeros((1, 1, 1024), dtype)
    tids1 = jnp.asarray([[6.0, 127.0, 0.02]])
    params = jax.jit(lambda k: unet.init(k, sample8, 1.0, ehs1, tids1))(rng)
    # bf16 weights — the reference loads the fp16 checkpoint
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sch = S.svd_schedule(100)
    guidance = jnp.linspace(1.0, 3.0, f)[:, None, None, None]
    cond = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32)
    mask = jnp.ones((f - 2, hl, wl), jnp.float32) * 0.5
    lam = jnp.ones((100, f), jnp.float32)
    img_lat = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32)
    clip_emb = jax.random.normal(rng, (2, 1, 1024), jnp.float32)
    tids2 = jnp.tile(tids1, (2, 1))

    def unet_fp32(p, x, t, e, ti):
        return unet.apply(p, x.astype(dtype), t, e.astype(dtype),
                          ti).astype(jnp.float32)

    unet_r = unet.clone(remat_blocks=True)

    def unet_remat(p, x, t, e, ti):
        return unet_r.apply(p, x.astype(dtype), t, e.astype(dtype),
                            ti).astype(jnp.float32)

    @jax.jit
    def guided_step(params, latents):
        step_i = 0
        t = sch.timesteps[step_i]
        sigma = sch.sigmas[step_i]

        def gloss(lat):
            scaled = S.scale_model_input(sch, lat, step_i)
            inp = jnp.concatenate([scaled, jnp.zeros_like(img_lat)],
                                  axis=-1)[None]
            eps = unet_remat(params, inp, t, jnp.zeros_like(clip_emb[:1]),
                             tids1)[0]
            x0 = S.pred_original_sample(eps, lat, sigma)
            tm = jax.lax.stop_gradient(
                S.top_k_masks(x0.transpose(0, 3, 1, 2),
                              cond.transpose(0, 3, 1, 2), mask,
                              lam[step_i]))
            return S.guidance_loss(x0.transpose(0, 3, 1, 2),
                                   cond.transpose(0, 3, 1, 2), tm)

        grad = jax.grad(gloss)(latents)
        latents = latents - S.normalize_guidance_grad(grad, sigma, lr=0.02)
        scaled = S.scale_model_input(sch, latents, step_i)
        inp = jnp.stack([
            jnp.concatenate([scaled, jnp.zeros_like(img_lat)], axis=-1),
            jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
        eps = unet_fp32(params, inp, t, clip_emb, tids2)
        eps = eps[0] + guidance * (eps[1] - eps[0])
        prev, _ = S.step_interp(sch, eps, latents, step_i)
        return prev

    import functools
    lat0 = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32) * sch.sigmas[0]
    dt = _chain_time(functools.partial(guided_step, params), lat0, iters=5)

    # CFG-2x UNet forward MFU (XLA-counted flops over measured time)
    @jax.jit
    def cfg_fwd(params, x):
        inp = jnp.stack([
            jnp.concatenate([x, jnp.zeros_like(img_lat)], axis=-1),
            jnp.concatenate([x, img_lat], axis=-1)], axis=0)
        return unet_fp32(params, inp, 1.0, clip_emb, tids2)[0]

    compiled = cfg_fwd.lower(params, lat0).compile()
    flops = compiled.cost_analysis()["flops"]
    dt_fwd = _chain_time(functools.partial(cfg_fwd, params), lat0, iters=5)
    mfu = flops / dt_fwd / 197e12 * 100.0
    return dt, dt_fwd, mfu


def bench_gs_step():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.gs.trainer import GSTrainer, TrainConfig, make_viewset
    from syn3r_tpu.models import gaussians as G
    from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c

    w, h, n = 504, 378, 65_536
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(-1.5, 1.5, (n, 2)),
                          rng.uniform(1.5, 4.0, (n, 1))], 1).astype(np.float32)
    state = G.from_points(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        capacity=n)
    cam = camera_from_fov(0.9, 0.7, w, h,
                          look_at_w2c(jnp.asarray([0.0, 0.0, 0.0]),
                                      jnp.asarray([0.0, 0.0, 2.5])))
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    views = make_viewset([cam], img)
    cfg = TrainConfig(rasterizer="pallas", tile_cap=512,
                      densify_from_iter=10 ** 9)
    tr = GSTrainer(views, cfg, state, model_path="/tmp/bench_gs_model")
    cam0, img0 = views.view(0)

    def step(ts):
        new_ts, _ = tr._train_step(ts, cam0, img0, None, None,
                                   use_lpips=False, use_depth=False)
        return new_ts

    return _chain_time(step, tr.state, iters=10)


def main():
    import jax
    # persistent compile cache: the guided-step vjp compiles in ~17 min on
    # this single-core host the first time, milliseconds after
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    dt_guided, dt_fwd, mfu = bench_guided_denoise()
    gs_dt = bench_gs_step()
    print(json.dumps({
        "metric": "guided_denoise_steps_per_sec",
        "value": round(1.0 / dt_guided, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "extra": {
            "denoise_frames_per_sec": round(25.0 / dt_guided, 2),
            "unet_cfg_fwd_ms": round(dt_fwd * 1e3, 1),
            "unet_fwd_mfu_pct": round(mfu, 1),
            "gs_train_step_ms": round(gs_dt * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
