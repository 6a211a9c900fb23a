"""End-to-end smoke tests of the guided SVD pipeline at tiny config."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.diffusion.pipeline import (GuidedSVDConfig, GuidedSVDPipeline,
                                          SVDModels)
from syn3r_tpu.models.clip import CLIPVisionModelWithProjection
from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder

F, H, W = 5, 32, 64
# tiny VAE has 3 levels -> 4x spatial downsample
LH, LW = H // 4, W // 4
STEPS = 3


@pytest.fixture(scope="module")
def tiny_models():
    rng = jax.random.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1, addition_time_embed_dim=32)
    vae = AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 32),
                                       layers_per_block=1)
    clip = CLIPVisionModelWithProjection(hidden=64, layers=2, heads=4,
                                         mlp_dim=128, patch=32,
                                         image_size=224, projection_dim=1024)
    lh, lw = LH, LW
    up = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, F, lh, lw, 8)), 1.0, jnp.zeros((1, 1, 1024)),
        jnp.zeros((1, 3))))(rng)
    vp = jax.jit(lambda k: vae.init(k, jnp.zeros((1, H, W, 3)), 1))(rng)
    cp = jax.jit(lambda k: clip.init(k, jnp.zeros((1, 224, 224, 3))))(rng)
    return SVDModels(unet=unet, unet_params=up, vae=vae, vae_params=vp,
                     clip=clip, clip_params=cp)


@pytest.mark.parametrize("variant", ["post", "prob"])
def test_pipeline_end_to_end(tiny_models, variant):
    cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                          variant=variant, decode_chunk_size=4,
                          compute_dtype=jnp.float32)
    pipe = GuidedSVDPipeline(tiny_models, cfg)
    rng = np.random.default_rng(0)
    start = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    end = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    conds = [jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
             for _ in range(F - 2)]
    lh, lw = LH, LW
    mask = jnp.asarray(rng.uniform(size=(F - 2, lh, lw)).astype(np.float32))
    lambda_ts = jnp.asarray(
        (rng.uniform(size=(STEPS, F)) > 0.4).astype(np.float32))

    frames = pipe(start, conds, end, mask, lambda_ts, jax.random.PRNGKey(1))
    assert frames.shape == (F, H, W, 3)
    arr = np.asarray(frames)
    assert np.isfinite(arr).all()
    assert 0.0 <= arr.min() and arr.max() <= 1.0
    # pipeline must not be a constant map: frames differ across time
    assert np.abs(arr[0] - arr[-1]).max() > 1e-5


def test_encode_conditioning_shapes(tiny_models):
    cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                          compute_dtype=jnp.float32)
    pipe = GuidedSVDPipeline(tiny_models, cfg)
    rng = np.random.default_rng(1)
    imgs = [jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
            for _ in range(F)]
    clip_s, clip_e, cond, ls, le = pipe.encode_conditioning(
        imgs[0], imgs[1:-1], imgs[-1], jax.random.PRNGKey(0))
    assert clip_s.shape == (2, 1, 1024)
    assert np.allclose(np.asarray(clip_s[0]), 0.0)  # uncond row zeros
    assert cond.shape == (F, LH, LW, 4)
    # frame 0 of cond latents is the start latent / factor_s
    np.testing.assert_allclose(np.asarray(cond[0]),
                               np.asarray(ls) / 5.6, rtol=1e-5)


def test_guidance_through_unet_optin(tiny_models):
    """The round-2 legacy grad-through-UNet guidance stays available
    behind the opt-in flag; it runs, produces finite output, and differs
    from the default detached closed-form gradient (different numerics by
    design)."""
    key = jax.random.PRNGKey(5)
    lat = jax.random.normal(key, (1, F, LH, LW, 4))
    clip_s = jax.random.normal(key, (2, 1, 1024))
    clip_e = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 1024))
    cond = jax.random.normal(key, (F, LH, LW, 4)) * 0.1
    mask = jnp.full((F - 2, LH, LW), 0.4)
    lam = jnp.ones((STEPS, F))

    def run(**kw):
        cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                              variant="post", compute_dtype=jnp.float32,
                              **kw)
        pipe = GuidedSVDPipeline(tiny_models, cfg)
        return np.asarray(pipe.denoise(lat, clip_s, clip_e, cond, mask,
                                       lam))

    legacy = run(guidance_through_unet=True)
    assert np.isfinite(legacy).all()
    default = run()
    assert np.abs(legacy - default).max() > 1e-6


def test_direction_parallel_matches_sequential(tiny_models):
    """The vmapped 2-direction denoise (multichip mode) equals the
    sequential path, with and without a mesh sharding constraint."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    key = jax.random.PRNGKey(3)
    lat = jax.random.normal(key, (1, F, LH, LW, 4))
    clip_s = jax.random.normal(key, (2, 1, 1024))
    clip_e = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 1024))
    cond = jax.random.normal(key, (F, LH, LW, 4)) * 0.1
    mask = jnp.full((F - 2, LH, LW), 0.4)
    lam = jnp.ones((STEPS, F))

    def run(**kw):
        cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                              variant="post", compute_dtype=jnp.float32,
                              **kw)
        pipe = GuidedSVDPipeline(tiny_models, cfg)
        return np.asarray(pipe.denoise(lat, clip_s, clip_e, cond, mask,
                                       lam))

    seq = run(direction_parallel=False)
    par = run(direction_parallel=True)
    np.testing.assert_allclose(par, seq, rtol=2e-4, atol=2e-5)

    mesh = Mesh(np.array(jax.devices()[:2]), ("dir",))
    shd = NamedSharding(mesh, P("dir"))
    par_sh = run(direction_parallel=True, direction_sharding=shd)
    np.testing.assert_allclose(par_sh, seq, rtol=2e-4, atol=2e-5)


def test_fused_guidance_cfg_matches_unfused(tiny_models):
    """The batch-3 fused guidance+CFG forward (default) must reproduce the
    two-call path: same math by the grouped time-context quirk (pinned
    bit-tight at the single-forward level in test_svd_models), with only
    XLA batched-matmul reassociation noise accumulating over the steps."""
    key = jax.random.PRNGKey(7)
    lat = jax.random.normal(key, (1, F, LH, LW, 4))
    clip_s = jax.random.normal(key, (2, 1, 1024))
    clip_e = jax.random.normal(jax.random.PRNGKey(8), (2, 1, 1024))
    cond = jax.random.normal(key, (F, LH, LW, 4)) * 0.1
    mask = jnp.full((F - 2, LH, LW), 0.4)
    lam = jnp.ones((STEPS, F))

    def run(**kw):
        cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                              variant="post", compute_dtype=jnp.float32,
                              **kw)
        pipe = GuidedSVDPipeline(tiny_models, cfg)
        return np.asarray(pipe.denoise(lat, clip_s, clip_e, cond, mask,
                                       lam))

    fused = run(fused_guidance_cfg=True)
    unfused = run(fused_guidance_cfg=False)
    np.testing.assert_allclose(fused, unfused, rtol=1e-3, atol=1e-5)


def test_guidance_reuse_cfg_uncond(tiny_models):
    """Opt-in batch-2 mode (guidance x0 from the CFG pass's uncond row).

    The reuse row differs from the dedicated batch-1 guidance forward ONLY
    through the time-context batch quirk (half the pixel rows attend to
    the COND clip row in temporal cross-attn). With ZERO clip embeddings
    both grouping variants see identical contexts everywhere, so the
    reuse mode must match the exact mode to batched-matmul noise; with
    nonzero embeddings it must diverge (proving the knob changes the
    guidance signal, as documented) while staying finite."""
    key = jax.random.PRNGKey(7)
    lat = jax.random.normal(key, (1, F, LH, LW, 4))
    cond = jax.random.normal(key, (F, LH, LW, 4)) * 0.1
    mask = jnp.full((F - 2, LH, LW), 0.4)
    lam = jnp.ones((STEPS, F))

    def run(clip_s, clip_e, **kw):
        cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                              variant="post", compute_dtype=jnp.float32,
                              **kw)
        pipe = GuidedSVDPipeline(tiny_models, cfg)
        return np.asarray(pipe.denoise(lat, clip_s, clip_e, cond, mask,
                                       lam))

    # zero embeddings: the quirk is inert -> exact agreement
    zs = jnp.zeros((2, 1, 1024))
    exact = run(zs, zs)
    reuse = run(zs, zs, guidance_reuse_cfg_uncond=True)
    np.testing.assert_allclose(reuse, exact, rtol=1e-3, atol=1e-5)

    # nonzero embeddings: documented divergence, finite output
    clip_s = jax.random.normal(key, (2, 1, 1024))
    clip_e = jax.random.normal(jax.random.PRNGKey(8), (2, 1, 1024))
    exact_n = run(clip_s, clip_e)
    reuse_n = run(clip_s, clip_e, guidance_reuse_cfg_uncond=True)
    assert np.isfinite(reuse_n).all()
    assert np.abs(reuse_n - exact_n).max() > 1e-6


def test_pipeline_vmap_pairs(tiny_models):
    """The whole pipeline __call__ is vmappable over a pair axis — the
    contract pair-parallel densify relies on (orchestrator pair_parallel:
    one batched completion call, pairs sharded over chips). Batched result
    must equal the per-pair calls."""
    cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                          compute_dtype=jnp.float32, latent_num=1)
    pipe = GuidedSVDPipeline(tiny_models, cfg)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.uniform(size=(H, W, 3)), jnp.float32),
                jnp.asarray(r.uniform(size=(F - 2, H, W, 3)), jnp.float32),
                jnp.asarray(r.uniform(size=(H, W, 3)), jnp.float32),
                jnp.full((F - 2, LH, LW), 0.4),
                jnp.ones((STEPS, F)))
    a, b = mk(1), mk(2)
    ref0 = pipe(*a, k1)
    ref1 = pipe(*b, k2)

    batched = jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)
    keys = jnp.stack([k1, k2])
    out = jax.vmap(lambda args, k: pipe(*args, k))(batched, keys)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1),
                               atol=2e-5)
