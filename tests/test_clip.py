"""Parity of the Flax CLIP vision tower vs transformers' torch model."""
import numpy as np
import jax
import jax.numpy as jnp

from syn3r_tpu.models.clip import (CLIPVisionModelWithProjection,
                                   clip_normalize, convert_clip_torch)


def test_clip_vision_parity_tiny():
    import torch
    from transformers import CLIPVisionConfig
    from transformers import \
        CLIPVisionModelWithProjection as TorchCLIP

    cfg = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=48,
                           hidden_act="gelu")
    torch.manual_seed(0)
    tm = TorchCLIP(cfg).eval()

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(pixels)).image_embeds.numpy()

    params = convert_clip_torch(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    fm = CLIPVisionModelWithProjection(hidden=64, layers=2, heads=4,
                                       mlp_dim=128, patch=8, image_size=32,
                                       projection_dim=48)
    x = jnp.asarray(pixels.transpose(0, 2, 3, 1))
    init = fm.init(jax.random.PRNGKey(0), x)
    from syn3r_tpu.models.convert import assert_tree_match
    assert_tree_match(params, init["params"])
    out = fm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_clip_normalize():
    x = jnp.ones((1, 4, 4, 3)) * 0.5
    out = np.asarray(clip_normalize(x))
    assert abs(out[0, 0, 0, 0] - (0.5 - 0.48145466) / 0.26862954) < 1e-6
