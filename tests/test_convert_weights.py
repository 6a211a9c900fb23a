"""Round-trip the convert-weights CLI on tiny torch checkpoints: the
converted params must drive the flax models to the torch outputs (the
full --svd_weights workflow, minus the real 1.5B checkpoint)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _oracle_available():
    try:
        import huggingface_hub
        if not hasattr(huggingface_hub, "cached_download"):
            huggingface_hub.cached_download = \
                huggingface_hub.hf_hub_download
        import sys
        if "/root/reference/thirdparty/diffusers/src" not in sys.path:
            sys.path.insert(0, "/root/reference/thirdparty/diffusers/src")
        import diffusers  # noqa
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _oracle_available(),
                    reason="reference diffusers unavailable")
def test_convert_cli_roundtrip(tmp_path):
    import torch
    from diffusers import UNetSpatioTemporalConditionModel as TorchUNet

    torch.manual_seed(0)
    tu = TorchUNet(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal",
                          "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal"),
        layers_per_block=1, cross_attention_dim=12,
        num_attention_heads=(2, 4), addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=12, num_frames=3).eval()
    unet_dir = tmp_path / "snapshot" / "unet"
    os.makedirs(unet_dir)
    torch.save(tu.state_dict(), unet_dir / "pytorch_model.bin")

    from syn3r_tpu.cli.convert_weights import _load_state_dict
    from syn3r_tpu.models.convert import torch_to_flax
    from syn3r_tpu.utils.params import load_params, save_params

    sd = _load_state_dict(str(unet_dir))
    save_params({"params": torch_to_flax(sd)}, str(tmp_path / "unet.npz"))
    params = load_params(str(tmp_path / "unet.npz"))

    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    fu = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1, addition_time_embed_dim=4)
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(1, 3, 8, 8, 8)).astype(np.float32)
    ehs = rng.normal(size=(1, 1, 12)).astype(np.float32)
    tids = np.array([[6.0, 127.0, 0.02]], np.float32)
    out = fu.apply(params, jnp.asarray(sample), 1.3, jnp.asarray(ehs),
                   jnp.asarray(tids))
    with torch.no_grad():
        ref = tu(torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)),
                 torch.tensor(1.3), torch.from_numpy(ehs),
                 torch.from_numpy(tids)).sample.numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 1, 4, 2, 3),
                               ref, rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(not _oracle_available(),
                    reason="reference diffusers unavailable")
def test_convert_cli_safetensors_sharded_fp16(tmp_path):
    """The branch real HF snapshots hit: sharded fp16 .safetensors files
    (+ index.json) in the exact hub layout of
    stabilityai/stable-video-diffusion-img2vid-xt (unet/ vae/
    image_encoder/), through the full convert_weights.main()."""
    import json

    import torch
    from diffusers import AutoencoderKLTemporalDecoder as TorchVAE
    from diffusers import UNetSpatioTemporalConditionModel as TorchUNet
    from safetensors.numpy import save_file
    from transformers import CLIPVisionConfig
    from transformers import CLIPVisionModelWithProjection as TorchCLIP

    torch.manual_seed(0)
    tu = TorchUNet(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal",
                          "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal"),
        layers_per_block=1, cross_attention_dim=12,
        num_attention_heads=(2, 4), addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=12, num_frames=3).eval()
    tv = TorchVAE(in_channels=3, out_channels=3,
                  down_block_types=("DownEncoderBlock2D",) * 2,
                  block_out_channels=(32, 64), layers_per_block=2,
                  latent_channels=4).eval()
    tc = TorchCLIP(CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=48, hidden_act="gelu")).eval()

    snap = tmp_path / "snapshot"

    def fp16_sd(model):
        return {k: v.detach().numpy().astype(np.float16)
                for k, v in model.state_dict().items()}

    # unet: two shards + index.json (the hub's >5GB layout)
    unet_dir = snap / "unet"
    os.makedirs(unet_dir)
    sd = fp16_sd(tu)
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model.fp16-00001-of-00002.safetensors":
            {k: sd[k] for k in keys[:half]},
        "diffusion_pytorch_model.fp16-00002-of-00002.safetensors":
            {k: sd[k] for k in keys[half:]},
    }
    weight_map = {}
    for fname, part in shards.items():
        save_file(part, str(unet_dir / fname))
        weight_map.update({k: fname for k in part})
    with open(unet_dir / "diffusion_pytorch_model.safetensors.index.json",
              "w") as f:
        json.dump({"metadata": {"total_size": sum(
            v.nbytes for v in sd.values())}, "weight_map": weight_map}, f)

    # vae + image_encoder: single fp16 files (the hub's small-model layout)
    vae_dir = snap / "vae"
    os.makedirs(vae_dir)
    save_file(fp16_sd(tv),
              str(vae_dir / "diffusion_pytorch_model.fp16.safetensors"))
    clip_dir = snap / "image_encoder"
    os.makedirs(clip_dir)
    save_file(fp16_sd(tc), str(clip_dir / "model.fp16.safetensors"))

    from syn3r_tpu.cli.convert_weights import main as convert_main
    out_dir = tmp_path / "converted"
    convert_main(["--svd_dir", str(snap), "--out_dir", str(out_dir)])

    from syn3r_tpu.models.clip import CLIPVisionModelWithProjection
    from syn3r_tpu.models.convert import assert_tree_match
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder
    from syn3r_tpu.utils.params import load_params

    rng = np.random.default_rng(0)

    # unet: structural match + forward parity vs the fp16-rounded torch net
    params = load_params(str(out_dir / "unet.npz"))
    fu = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1, addition_time_embed_dim=4)
    sample = rng.normal(size=(1, 3, 8, 8, 8)).astype(np.float32)
    ehs = rng.normal(size=(1, 1, 12)).astype(np.float32)
    tids = np.array([[6.0, 127.0, 0.02]], np.float32)
    init = fu.init(jax.random.PRNGKey(0), jnp.asarray(sample), 1.3,
                   jnp.asarray(ehs), jnp.asarray(tids))
    assert_tree_match(params["params"], init["params"])
    out = fu.apply(params, jnp.asarray(sample), 1.3, jnp.asarray(ehs),
                   jnp.asarray(tids))
    with torch.no_grad():
        ref = tu.half().float()(
            torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)),
            torch.tensor(1.3), torch.from_numpy(ehs),
            torch.from_numpy(tids)).sample.numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 1, 4, 2, 3),
                               ref, rtol=5e-3, atol=2e-3)

    # vae / clip: structural tree match of the converted files
    vparams = load_params(str(out_dir / "vae.npz"))
    fv = AutoencoderKLTemporalDecoder(block_out_channels=(32, 64),
                                      layers_per_block=2)
    vinit = fv.init(jax.random.PRNGKey(0),
                    jnp.zeros((2, 16, 16, 3), jnp.float32), 1)
    assert_tree_match(vparams["params"], vinit["params"])

    cparams = load_params(str(out_dir / "clip.npz"))
    fc = CLIPVisionModelWithProjection(hidden=64, layers=2, heads=4,
                                       mlp_dim=128, patch=8, image_size=32,
                                       projection_dim=48)
    cinit = fc.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert_tree_match(cparams["params"], cinit["params"])
