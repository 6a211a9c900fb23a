"""Flax AutoencoderKLTemporalDecoder (the SVD VAE).

Fresh NHWC implementation of the reference's frozen VAE
(``models/autoencoders/autoencoder_kl_temporal_decoder.py``, SURVEY.md
§2.8): a standard SD KL encoder + a temporal decoder whose
SpatioTemporalResBlocks use merge_strategy='learned' with the
spatial/temporal mix switched, and a final (3,1,1) 3D conv over frames.

SVD config: block_out_channels (128, 256, 512, 512), latent 4 channels,
scaling_factor 0.18215.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Attention, GroupNorm, ResnetBlock2D, Upsample2D
from .svd_unet import SpatioTemporalResBlock


class VAEDownsample(nn.Module):
    """Stride-2 conv with the SD-VAE asymmetric (0,1) padding."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, eps=1e-6, dtype=self.dtype,
                              name=f"resnets_{i}")(x, None)
        if self.add_downsample:
            x = VAEDownsample(self.out_channels, dtype=self.dtype,
                              name="downsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    """resnet -> single-head spatial attention -> resnet (SD VAE mid)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, eps=1e-6, dtype=self.dtype,
                          name="resnets_0")(x, None)
        x = Attention(heads=1, dim_head=self.channels, qkv_bias=True,
                      norm_num_groups=32, residual_connection=True,
                      dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, eps=1e-6, dtype=self.dtype,
                          name="resnets_1")(x, None)
        return x


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, c in enumerate(ch):
            x = DownEncoderBlock2D(c, num_layers=self.layers_per_block,
                                   add_downsample=i < len(ch) - 1,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{i}")(x)
        x = UNetMidBlock2D(ch[-1], dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         silu=True, name="conv_norm_out")(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class MidBlockTemporalDecoder(nn.Module):
    """reference unet_3d_blocks.py:1766-1826."""
    channels: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        x = SpatioTemporalResBlock(
            self.channels, eps=1e-6, temporal_eps=1e-5,
            merge_strategy="learned", switch_spatial_to_temporal_mix=True,
            dtype=self.dtype, name="resnets_0")(x, None, num_frames)
        for i in range(1, self.num_layers):
            x = Attention(heads=1, dim_head=self.channels, qkv_bias=True,
                          norm_num_groups=32, residual_connection=True,
                          eps=1e-6, dtype=self.dtype,
                          name="attentions_0")(x)
            x = SpatioTemporalResBlock(
                self.channels, eps=1e-6, temporal_eps=1e-5,
                merge_strategy="learned",
                switch_spatial_to_temporal_mix=True, dtype=self.dtype,
                name=f"resnets_{i}")(x, None, num_frames)
        return x


class UpBlockTemporalDecoder(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, temporal_eps=1e-5,
                merge_strategy="learned",
                switch_spatial_to_temporal_mix=True, dtype=self.dtype,
                name=f"resnets_{i}")(x, None, num_frames)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class TemporalDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, num_frames: int):
        # z: (B*F, h, w, 4)
        ch = list(self.block_out_channels)
        x = nn.Conv(ch[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = MidBlockTemporalDecoder(ch[-1], num_layers=self.layers_per_block,
                                    dtype=self.dtype, name="mid_block")(
                                        x, num_frames)
        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            x = UpBlockTemporalDecoder(
                c, num_layers=self.layers_per_block + 1,
                add_upsample=i < len(rev) - 1, dtype=self.dtype,
                name=f"up_blocks_{i}")(x, num_frames)
        x = GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         silu=True, name="conv_norm_out")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        # final temporal smoothing conv over frames
        bf, h, w, c = x.shape
        b = bf // num_frames
        x = x.reshape(b, num_frames, h, w, c)
        x = nn.Conv(self.out_channels, (3, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype,
                    name="time_conv_out")(x)
        return x.reshape(bf, h, w, c)


class AutoencoderKLTemporalDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels,
                               self.layers_per_block, self.latent_channels,
                               dtype=self.dtype)
        self.decoder = TemporalDecoder(self.block_out_channels,
                                       self.layers_per_block,
                                       dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype)

    def encode_moments(self, x):
        """x: (B, H, W, 3) in [-1,1] -> (mean, logvar) each (B, h, w, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x):
        """Deterministic encode (DiagonalGaussian .mode())."""
        return self.encode_moments(x)[0]

    def encode_sample(self, x, key: jax.Array):
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, z, num_frames: int):
        """z: (B*F, h, w, 4) UNSCALED (caller divides by scaling_factor)."""
        return self.decoder(z, num_frames)

    def __call__(self, x, num_frames: int = 1):
        z = self.encode_mode(x)
        return self.decode(z, num_frames)
