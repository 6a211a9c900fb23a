"""Pipeline-level golden parity: the full guided-denoise COMPOSITION vs the
reference torch pipeline run offline on CPU with tiny random-weight modules.

Covers what the per-component oracles cannot: CFG linspace, factor_s
plumbing, noise-aug sharing, fwd/bwd flip bookkeeping, the detached tiled
guidance inside the loop, per-step direction merge, and noise init
(reference model/SVD_2pass_prob_uncertain_post.py:418-859 and
model/SVD_2pass_prob_uncertain.py for the non-post variant).

Latent grid 40x72 (image 80x144, VAE factor 2): at this size the
reference's hard-coded absolute guidance-tile slices make tile 0 the FULL
frame and the stitch discards tiles 1-3, so the reference's per-tile-crop
UNet boundary deviation vanishes and the comparison is exact
(see scheduler.guidance_tile_bounds and
tests/test_scheduler.test_guidance_grad_reference_tile_collapse).
"""
import importlib.util
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.diffusion.pipeline import (GuidedSVDConfig, GuidedSVDPipeline,
                                          SVDModels)
from syn3r_tpu.models.clip import (CLIPVisionModelWithProjection,
                                   convert_clip_torch)
from syn3r_tpu.models.convert import assert_tree_match, torch_to_flax
from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder

F = 25            # the reference pipeline asserts num_frames == 25
H, W = 80, 144    # image size; tiny VAE below has factor 2 -> 40x72 latents
LH, LW = 40, 72
STEPS = 2
CTX = 32          # CLIP projection dim == UNet cross-attention dim


def _ref_module(name):
    import huggingface_hub
    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if "/root/reference/thirdparty/diffusers/src" not in sys.path:
        sys.path.insert(0, "/root/reference/thirdparty/diffusers/src")
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/model/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    _ref_module("SVD_2pass_prob_uncertain_post")
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False

needs_oracle = pytest.mark.skipif(not HAVE_ORACLE,
                                  reason="reference pipeline unavailable")


def _torch_models():
    """Tiny torch UNet/VAE/CLIP with the real SVD wiring."""
    import torch
    from transformers import CLIPImageProcessor, CLIPVisionConfig
    from transformers import CLIPVisionModelWithProjection as TorchCLIP
    from diffusers import (AutoencoderKLTemporalDecoder as TorchVAE,
                           UNetSpatioTemporalConditionModel as TorchUNet)

    torch.manual_seed(0)
    tu = TorchUNet(
        in_channels=8, out_channels=4,
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal",
                          "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal"),
        layers_per_block=1, cross_attention_dim=CTX,
        num_attention_heads=(2, 4), addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24, num_frames=F,
    ).eval()
    tv = TorchVAE(in_channels=3, out_channels=3,
                  down_block_types=("DownEncoderBlock2D",) * 2,
                  block_out_channels=(32, 64), layers_per_block=2,
                  latent_channels=4).eval()
    ccfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=224, patch_size=32,
                            projection_dim=CTX, hidden_act="gelu")
    tc = TorchCLIP(ccfg).eval()
    fe = CLIPImageProcessor(do_resize=False, do_center_crop=False,
                            do_rescale=False, do_normalize=True)
    return tu, tv, tc, fe


def _oracle_scheduler():
    from diffusers.schedulers.scheduling_euler_discrete import (
        EulerDiscreteScheduler)
    return EulerDiscreteScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", prediction_type="v_prediction",
        timestep_type="continuous", use_karras_sigmas=True, sigma_min=0.002,
        sigma_max=700.0, interpolation_type="linear",
        timestep_spacing="leading", steps_offset=1)


def _flax_models(tu, tv, tc):
    up = torch_to_flax({k: v.numpy() for k, v in tu.state_dict().items()})
    vp = torch_to_flax({k: v.numpy() for k, v in tv.state_dict().items()})
    cp = convert_clip_torch(
        {k: v.numpy() for k, v in tc.state_dict().items()})
    fu = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1, addition_time_embed_dim=8)
    fv = AutoencoderKLTemporalDecoder(block_out_channels=(32, 64),
                                      layers_per_block=2)
    fc = CLIPVisionModelWithProjection(hidden=32, layers=2, heads=4,
                                       mlp_dim=64, patch=32, image_size=224,
                                       projection_dim=CTX)
    # sanity: converted trees match the modules' own init structure
    rng = jax.random.PRNGKey(0)
    ui = fu.init(rng, jnp.zeros((1, F, LH, LW, 8)), 1.0,
                 jnp.zeros((1, 1, CTX)), jnp.zeros((1, 3)))
    assert_tree_match(up, ui["params"])
    vi = fv.init(rng, jnp.zeros((1, H, W, 3)), 1)
    assert_tree_match(vp, vi["params"])
    ci = fc.init(rng, jnp.zeros((1, 224, 224, 3)))
    assert_tree_match(cp, ci["params"])
    return SVDModels(unet=fu, unet_params={"params": up},
                     vae=fv, vae_params={"params": vp},
                     clip=fc, clip_params={"params": cp})


def _data(h=H, w=W, lh=LH, lw=LW):
    rng = np.random.default_rng(7)
    # uint8-quantized so the PIL round-trip inside the torch pipeline is
    # exact
    imgs8 = rng.integers(0, 256, size=(F, h, w, 3), dtype=np.uint8)
    mask = rng.uniform(size=(F - 2, lh, lw)).astype(np.float32)
    lam = (rng.uniform(size=(STEPS, F)) > 0.4).astype(np.float32)
    lat_noise = rng.normal(size=(1, F, 4, lh, lw)).astype(np.float32)
    return imgs8, mask, lam, lat_noise


def _run_reference(variant, imgs8, mask, lam, lat_noise, monkeypatch):
    import PIL.Image
    import torch

    h, w = imgs8.shape[1:3]
    mod = _ref_module(variant)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    tu, tv, tc, fe = _torch_models()
    pipe = mod.StableVideoDiffusionPipeline(
        vae=tv, image_encoder=tc, unet=tu, scheduler=_oracle_scheduler(),
        feature_extractor=fe)
    pils = [PIL.Image.fromarray(imgs8[i]) for i in range(F)]
    with torch.no_grad():
        out = pipe(
            image=[pils[0]], temp_cond=pils[1:], mask=torch.from_numpy(mask),
            lambda_ts=torch.from_numpy(lam), height=h, width=w,
            num_frames=F, num_inference_steps=STEPS,
            min_guidance_scale=1.0, max_guidance_scale=3.0,
            decode_chunk_size=8,
            generator=torch.Generator().manual_seed(11),
            latents=torch.from_numpy(lat_noise), output_type="latent",
            return_dict=False)
    return (tu, tv, tc), np.asarray(out[0] if isinstance(out, tuple)
                                    else out)


def _run_ours(torch_models, variant_key, imgs8, mask, lam, lat_noise,
              **cfg_overrides):
    import torch
    from diffusers.utils.torch_utils import randn_tensor

    h, w = imgs8.shape[1:3]
    models = _flax_models(*torch_models)
    cfg = GuidedSVDConfig(num_inference_steps=STEPS, num_frames=F,
                          variant=variant_key, compute_dtype=jnp.float32,
                          **cfg_overrides)
    pipe = GuidedSVDPipeline(models, cfg)
    imgs01 = imgs8.astype(np.float32) / 255.0
    # replicate the reference's single noise-aug draw (generator seed 11,
    # drawn at (1, 3, H, W) NCHW)
    noise = randn_tensor((1, 3, h, w),
                         generator=torch.Generator().manual_seed(11)) \
        .numpy()[0].transpose(1, 2, 0)
    clip_s, clip_e, cond, _, _ = pipe.encode_conditioning(
        jnp.asarray(imgs01[0]), [jnp.asarray(x) for x in imgs01[1:-1]],
        jnp.asarray(imgs01[-1]), noise=jnp.asarray(noise))
    lat0 = jnp.asarray(lat_noise.transpose(0, 1, 3, 4, 2))  # (1,F,h,w,4)
    out = pipe.denoise(lat0, clip_s, clip_e, cond, jnp.asarray(mask),
                       jnp.asarray(lam))
    return np.asarray(out).transpose(0, 3, 1, 2)            # (F,4,h,w)


@needs_oracle
@pytest.mark.slow
@pytest.mark.parametrize("variant", [
    ("SVD_2pass_prob_uncertain_post", "post"),
    ("SVD_2pass_prob_uncertain", "prob"),
])
def test_pipeline_composition_parity(variant, monkeypatch):
    ref_name, key = variant
    imgs8, mask, lam, lat_noise = _data()
    torch_models, ref_lat = _run_reference(ref_name, imgs8, mask, lam,
                                           lat_noise, monkeypatch)
    ours = _run_ours(torch_models, key, imgs8, mask, lam, lat_noise)
    assert ref_lat.shape[0] == 1
    np.testing.assert_allclose(ours, ref_lat[0], rtol=5e-3, atol=5e-4)


@needs_oracle
@pytest.mark.slow
def test_tile_boundary_deviation_quantified(monkeypatch):
    """Quantify the ONE documented production-size deviation of the post
    variant: the reference runs a separate UNet forward per guidance-tile
    CROP (a VRAM workaround, SVD_2pass_prob_uncertain_post.py:739-769), so
    its per-tile eps-hat carries conv-padding/attention boundary effects;
    this repo slices ONE full-frame pred_x0 (scheduler.guidance_grad_tiled
    docstring). At 48x80 latents all 4 reference tiles are live (absolute
    bounds h [0:40],[24:], w [0:72],[56:] with python-slice clamping), so
    the end-to-end latent delta after the full STEPS-step run IS that
    boundary deviation — everything else is parity-tested exactly at the
    tile-collapsing 40x72 size (test_pipeline_composition_parity).

    Pins the measured magnitude (recorded in PARITY.md): the deviation
    must stay well below the guidance grad's own scale, and above the
    exact-parity noise floor (proving the tiles really were live)."""
    h2, w2, lh2, lw2 = 96, 160, 48, 80
    imgs8, mask, lam, lat_noise = _data(h2, w2, lh2, lw2)
    torch_models, ref_lat = _run_reference(
        "SVD_2pass_prob_uncertain_post", imgs8, mask, lam, lat_noise,
        monkeypatch)
    ours = _run_ours(torch_models, "post", imgs8, mask, lam, lat_noise)
    assert ref_lat.shape[0] == 1
    ref = ref_lat[0]
    rel_rms = float(np.linalg.norm(ours - ref) / np.linalg.norm(ref))
    max_abs = float(np.abs(ours - ref).max())
    ref_scale = float(np.abs(ref).max())
    print(f"tile-crop deviation @48x80 latents, {STEPS} steps: "
          f"rel_rms={rel_rms:.2e} max_abs={max_abs:.3g} "
          f"(ref max |latent| {ref_scale:.3g})")
    assert rel_rms < 0.02, "tile-crop boundary deviation blew up"
    assert rel_rms > 1e-7, "tiles unexpectedly collapsed (nothing measured)"


@needs_oracle
@pytest.mark.slow
def test_guidance_reuse_divergence_quantified(monkeypatch):
    """Quantify the opt-in ``guidance_reuse_cfg_uncond`` knob's divergence
    from the reference semantics (GuidedSVDConfig docstring: the reused
    CFG-batch uncond row sees the COND clip context in half its temporal
    cross-attn rows via the reference's time-context batch quirk, while
    the dedicated batch-1 guidance pass sees uncond everywhere).

    test_pipeline.py pins bit-equality with ZERO clip embeddings (quirk
    dormant); here the tiny random CLIP produces a live nonzero embedding
    and the reference run is the exact-semantics oracle, so the end-to-end
    latent delta at the tile-collapsing 40x72 size IS the reuse divergence
    — the composition itself is exact at this size
    (test_pipeline_composition_parity). This is a STRUCTURAL magnitude at
    random weights (recorded in PARITY.md), not quality evidence; the
    knob stays off by default until a real-weights A/B."""
    imgs8, mask, lam, lat_noise = _data()
    torch_models, ref_lat = _run_reference(
        "SVD_2pass_prob_uncertain_post", imgs8, mask, lam, lat_noise,
        monkeypatch)
    ours = _run_ours(torch_models, "post", imgs8, mask, lam, lat_noise,
                     guidance_reuse_cfg_uncond=True)
    assert ref_lat.shape[0] == 1
    ref = ref_lat[0]
    rel_rms = float(np.linalg.norm(ours - ref) / np.linalg.norm(ref))
    max_abs = float(np.abs(ours - ref).max())
    print(f"reuse-uncond divergence @40x72 latents, {STEPS} steps: "
          f"rel_rms={rel_rms:.2e} max_abs={max_abs:.3g} "
          f"(ref max |latent| {float(np.abs(ref).max()):.3g})")
    assert rel_rms < 0.2, "reuse-uncond divergence blew up"
    assert rel_rms > 1e-7, "quirk unexpectedly dormant (nothing measured)"
