"""LPIPS perceptual metric/loss (VGG variant) in Flax.

The reference uses the ``lpips`` pip package both as an eval metric
(FSGS metrics.py) and an optional training loss (``opt.use_lpips_loss``,
reference ``model/diffusionGS.py:1690,1697``; ``--lpips_weight`` for
DL3DV). The pretrained VGG16 + linear-head weights cannot be downloaded in
this environment, so usage is gated behind a converted weights file
(``convert_lpips_torch`` maps the torch ``lpips.LPIPS(net='vgg')`` state
dict; save with utils.params.save_params).

Architecture: VGG16 features after relu1_2/2_2/3_3/4_3/5_3, channel-unit-
normalized, squared diffs, learned 1x1 convs (no bias), spatial mean, sum.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_SLICE_ENDS = (2, 4, 7, 10, 13)   # conv counts at relu1_2/2_2/3_3/4_3/5_3
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        for c in _VGG_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                if conv_i in _SLICE_ENDS:
                    feats.append(x)
        return feats


class LPIPS(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        """a, b: (H, W, 3) or (B, H, W, 3) in [0, 1]. Returns scalar/batch."""
        if a.ndim == 3:
            a, b = a[None], b[None]
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        na = ((a * 2.0 - 1.0) - shift) / scale
        nb = ((b * 2.0 - 1.0) - shift) / scale
        net = VGG16Features(dtype=self.dtype, name="net")
        fa = net(na)
        fb = net(nb)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa / jnp.sqrt((xa ** 2).sum(-1, keepdims=True) + 1e-10)
            xb = xb / jnp.sqrt((xb ** 2).sum(-1, keepdims=True) + 1e-10)
            d = (xa - xb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lin_{i}")(d)
            total = total + w.mean(axis=(1, 2))[:, 0]
        return total.squeeze()


def convert_lpips_torch(state_dict) -> dict:
    """torch lpips.LPIPS(net='vgg') state dict -> flax params."""
    out = {"net": {}, }
    conv_i = 0
    # torch keys: net.sliceK.IDX.weight — ordered conv layers
    conv_keys = sorted(
        (k for k in state_dict if k.startswith("net.") and
         k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
    for k in conv_keys:
        w = np.asarray(state_dict[k])
        b = np.asarray(state_dict[k[:-len("weight")] + "bias"])
        out["net"][f"conv_{conv_i}"] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": b.astype(np.float32)}
        conv_i += 1
    for i in range(5):
        w = np.asarray(state_dict[f"lin{i}.model.1.weight"])
        out[f"lin_{i}"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}
    return out


def load_lpips_fn(weights_path: str):
    """Build a jitted lpips(a, b) from a converted .npz weights file."""
    import jax

    from ..utils.params import load_params
    params = load_params(weights_path)
    model = LPIPS()
    return jax.jit(lambda a, b: model.apply(params, a, b))
