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
