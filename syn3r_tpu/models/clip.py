"""Flax CLIP vision encoder (CLIPVisionModelWithProjection).

The reference conditions SVD on CLIP ViT-H/14 image embeddings via
``transformers`` (reference ``model/SVD_2pass_prob_uncertain_post.py:1,
544-546``; HF checkpoint inside stable-video-diffusion-img2vid-xt).
transformers no longer ships Flax models, so this is a fresh Flax ViT:
patch conv + class token + learned positions, pre-LN, N standard
transformer layers, post-LN pooled CLS, linear projection (no bias).

SVD/ViT-H config: hidden 1280, 32 layers, 16 heads, mlp 5120, patch 14,
image 224, projection 1024, gelu.

Param names mirror the HF torch layout for mechanical conversion via
``models/convert.py``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        head_dim = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (head_dim ** -0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype,
                              name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionEmbeddings(nn.Module):
    hidden: int
    patch: int
    image_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        # pixels: (B, H, W, 3) CLIP-normalized
        b = pixels.shape[0]
        n_pos = (self.image_size // self.patch) ** 2 + 1
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden,))
        patches = nn.Conv(self.hidden, (self.patch, self.patch),
                          strides=(self.patch, self.patch), use_bias=False,
                          dtype=self.dtype, name="patch_embedding")(pixels)
        patches = patches.reshape(b, -1, self.hidden)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype)[None, None],
                              (b, 1, self.hidden)), patches], axis=1)
        pos = nn.Embed(n_pos, self.hidden, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(x.shape[1]))
        return x + pos[None]


class CLIPVisionModelWithProjection(nn.Module):
    hidden: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_dim: int = 5120
    patch: int = 14
    image_size: int = 224
    projection_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        """pixels (B, 224, 224, 3) -> image embeds (B, projection_dim)."""
        scope = self  # param names below mirror HF: vision_model.*
        x = CLIPVisionEmbeddings(self.hidden, self.patch, self.image_size,
                                 dtype=self.dtype,
                                 name="vision_model.embeddings")(pixels)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="vision_model.pre_layrnorm")(x)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.heads, self.mlp_dim, dtype=self.dtype,
                                 name=f"vision_model.encoder.layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="vision_model.post_layernorm")(x[:, 0])
        return nn.Dense(self.projection_dim, use_bias=False,
                        dtype=self.dtype, name="visual_projection")(pooled)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] (B, H, W, 3) -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, img01.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, img01.dtype)
    return (img01 - mean) / std


def convert_clip_torch(state_dict) -> dict:
    """HF torch CLIPVisionModelWithProjection state dict -> flax params."""
    import numpy as np
    out: dict = {}
    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        # merge encoder layer index; fold mlp fc names
        if "layers" in parts:
            i = parts.index("layers")
            parts[i] = f"layers_{parts[i + 1]}"
            del parts[i + 1]
        if "mlp" in parts:
            i = parts.index("mlp")
            parts[i] = f"mlp_{parts[i + 1]}"
            del parts[i + 1]
        # module path is everything up to the leaf; HF uses dots we keep
        # as single names for the top-level vision_model.* modules
        leaf = parts[-1]
        if "encoder" in parts:
            i = parts.index("encoder")
            mod = [".".join(parts[:i + 2])] + parts[i + 2:-1]
        elif parts[0] == "vision_model":
            mod = [".".join(parts[:2])] + parts[2:-1]
        else:
            mod = parts[:-1]
        if leaf == "weight":
            if "position_embedding" in parts:
                leaf, val = "embedding", arr
            elif arr.ndim == 4:
                leaf, val = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                leaf, val = "kernel", arr.transpose(1, 0)
            else:
                leaf, val = "scale", arr
        else:
            val = arr
        node = out
        for p in mod:
            node = node.setdefault(p, {})
        node[leaf] = val.astype(np.float32)
    return out
