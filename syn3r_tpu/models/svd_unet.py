"""Flax SVD spatio-temporal UNet (UNetSpatioTemporalConditionModel).

Fresh NHWC implementation of the architecture the reference uses frozen
from diffusers (``models/unets/unet_spatio_temporal_condition.py:32-490``,
``unet_3d_blocks.py:1879-2405``, ``resnet.py:547-802``,
``transformers/transformer_temporal.py:202-379``; structure documented in
SURVEY.md §2.8). Weight conversion from the HF torch checkpoint lives in
``models/convert.py``; tiny-config golden tests pin numerics against the
reference torch modules.

TPU-first notes:
  - channel-last everywhere; spatial tensors (B*F, H, W, C).
  - softmax in f32; all matmuls take the module compute dtype (bf16 on TPU).
  - the reference's time_context construction for temporal cross-attention
    interleaves batch and pixel rows (an upstream quirk, order hw-major vs
    query rows batch-major; transformer_temporal.py:311-317). Replicated
    verbatim — it is a no-op at batch 1 and part of observable behavior at
    the CFG batch of 2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (AlphaBlender, Attention, Downsample2D, FeedForward,
                     GroupNorm, LayerNorm,
                     ResnetBlock2D, TemporalResnetBlock, TimestepEmbedding,
                     Upsample2D, timestep_embedding)


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResnetBlock2D + temporal (3,1,1)-conv resnet, alpha-blended
    (reference resnet.py:640-724)."""
    out_channels: int
    eps: float = 1e-6
    temporal_eps: Optional[float] = None
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, num_frames: int):
        # x: (B*F, H, W, C); temb: (B*F, D) or None
        x = ResnetBlock2D(self.out_channels, eps=self.eps, dtype=self.dtype,
                          name="spatial_res_block")(x, temb)
        bf, h, w, c = x.shape
        b = bf // num_frames
        x5 = x.reshape(b, num_frames, h, w, c)
        temb5 = temb.reshape(b, num_frames, -1) if temb is not None else None
        xt = TemporalResnetBlock(
            self.out_channels, eps=self.temporal_eps or self.eps,
            dtype=self.dtype, name="temporal_res_block")(x5, temb5)
        x5 = AlphaBlender(
            merge_strategy=self.merge_strategy,
            switch_spatial_to_temporal_mix=self.switch_spatial_to_temporal_mix,
            name="time_mixer")(x5, xt)
        return x5.reshape(bf, h, w, c)


class BasicTransformerBlock(nn.Module):
    """Spatial transformer block: self-attn, cross-attn, GEGLU FF
    (reference attention.py:89-405, layer_norm config)."""
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.heads, self.dim_head, dtype=self.dtype,
                          name="attn1")(h)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.heads, self.dim_head, dtype=self.dtype,
                          name="attn2")(h, context)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dim_out=x.shape[-1], dtype=self.dtype,
                            name="ff")(h)
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """Per-pixel transformer over the frame axis
    (reference attention.py:407-530). Input (B*S, F, C)."""
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        res = x
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        h = FeedForward(dim_out=x.shape[-1], dtype=self.dtype,
                        name="ff_in")(h)
        x = h + res  # is_res: dim == time_mix_inner_dim in SVD
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.heads, self.dim_head, dtype=self.dtype,
                          name="attn1")(h)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.heads, self.dim_head, dtype=self.dtype,
                          name="attn2")(h, context)
        h = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dim_out=x.shape[-1], dtype=self.dtype,
                            name="ff")(h)
        return x


class TransformerSpatioTemporalModel(nn.Module):
    """Spatial + temporal transformer pair with learned time mixing
    (reference transformer_temporal.py:202-379)."""
    heads: int
    dim_head: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, num_frames: int,
                 batch_groups: Optional[Tuple[int, ...]] = None):
        # x: (B*F, H, W, C); context: (B*F, T, D) CLIP embeddings
        bf, height, width, channels = x.shape
        b = bf // num_frames
        inner = self.heads * self.dim_head

        # --- reference time_context quirk, replicated exactly ------------
        # The reference builds the temporal cross-attn context hw-major
        # ((hw, b) reshaped row-major) while the attention rows are
        # batch-major, so mix row r attends to tc_first[r % b] — i.e. the
        # time context interleaves batch elements across pixel rows
        # (transformer_temporal.py:311-317). ``batch_groups`` generalizes
        # this to CONCATENATED independent calls: groups (m0, m1, ...)
        # summing to b reproduce, mathematically exactly, what separate calls at batch
        # m0, m1, ... would compute — group-local rows r' of a group at
        # batch offset o attend to tc_first[o + (r' % m)]. This is the only
        # cross-batch coupling in the whole UNet, so fusing e.g. the
        # guidance (batch 1) and CFG (batch 2) passes into one batch-3 call
        # with groups (1, 2) preserves reference numerics exactly.
        tokens, d = context.shape[1], context.shape[2]
        tc_first = context.reshape(b, num_frames, tokens, d)[:, 0]  # (B,T,D)
        s = height * width
        groups = batch_groups if batch_groups is not None else (b,)
        if sum(groups) != b:
            raise ValueError(f"batch_groups {groups} != batch {b}")
        parts, off = [], 0
        for m in groups:
            parts.append(off + (jnp.arange(m * s) % m))
            off += m
        idx = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        time_context = tc_first[idx]                     # (B*S, T, D)
        # ------------------------------------------------------------------

        residual = x
        h = GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        h = h.reshape(bf, height * width, channels)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        frame_ids = jnp.tile(jnp.arange(num_frames), b)
        t_emb = timestep_embedding(frame_ids, channels).astype(self.dtype)
        emb = TimestepEmbedding(channels * 4, out_dim=channels,
                                dtype=self.dtype, name="time_pos_embed")(t_emb)
        emb = emb[:, None, :]                                    # (B*F, 1, C)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(self.heads, self.dim_head,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(h, context)
            mix = h + emb
            # (B*F, S, C) -> (B*S, F, C)
            s = height * width
            mix = mix.reshape(b, num_frames, s, inner).transpose(0, 2, 1, 3)
            mix = mix.reshape(b * s, num_frames, inner)
            mix = TemporalBasicTransformerBlock(
                self.heads, self.dim_head, dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}")(mix, time_context)
            mix = mix.reshape(b, s, num_frames, inner).transpose(0, 2, 1, 3)
            mix = mix.reshape(bf, s, inner)
            h = AlphaBlender(name="time_mixer")(h, mix)

        h = nn.Dense(channels, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(bf, height, width, channels) + residual


def _layer_classes(remat: bool):
    """(ResBlock, Transformer) classes, layer-granular remat when asked.
    static_argnums index the lifted core_fn (arg 0 = module scope), so the
    num_frames int of both layer types sits at index 3 (the transformer's
    batch_groups tuple at 4)."""
    if remat:
        return (nn.remat(SpatioTemporalResBlock, static_argnums=(3,)),
                nn.remat(TransformerSpatioTemporalModel,
                         static_argnums=(3, 4)))
    return SpatioTemporalResBlock, TransformerSpatioTemporalModel


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, num_frames: int):
        Res, _ = _layer_classes(self.remat)
        outputs = []
        for i in range(self.num_layers):
            x = Res(self.out_channels, eps=1e-5,
                    dtype=self.dtype,
                    name=f"resnets_{i}")(x, temb, num_frames)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 2
    add_downsample: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, num_frames: int,
                 batch_groups: Optional[Tuple[int, ...]] = None):
        Res, Attn = _layer_classes(self.remat)
        outputs = []
        for i in range(self.num_layers):
            x = Res(self.out_channels, eps=1e-6,
                    dtype=self.dtype,
                    name=f"resnets_{i}")(x, temb, num_frames)
            x = Attn(
                self.heads, self.out_channels // self.heads,
                dtype=self.dtype, name=f"attentions_{i}")(x, context,
                                                          num_frames,
                                                          batch_groups)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    heads: int
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, num_frames: int,
                 batch_groups: Optional[Tuple[int, ...]] = None):
        Res, Attn = _layer_classes(self.remat)
        x = Res(self.channels, eps=1e-5, dtype=self.dtype,
                name="resnets_0")(x, temb, num_frames)
        x = Attn(
            self.heads, self.channels // self.heads, dtype=self.dtype,
            name="attentions_0")(x, context, num_frames, batch_groups)
        x = Res(self.channels, eps=1e-5, dtype=self.dtype,
                name="resnets_1")(x, temb, num_frames)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states, temb, num_frames: int):
        Res, _ = _layer_classes(self.remat)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states.pop()], axis=-1)
            x = Res(self.out_channels, eps=1e-6,
                    dtype=self.dtype,
                    name=f"resnets_{i}")(x, temb, num_frames)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 3
    add_upsample: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states, temb, context, num_frames: int,
                 batch_groups: Optional[Tuple[int, ...]] = None):
        Res, Attn = _layer_classes(self.remat)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states.pop()], axis=-1)
            x = Res(self.out_channels, eps=1e-6,
                    dtype=self.dtype,
                    name=f"resnets_{i}")(x, temb, num_frames)
            x = Attn(
                self.heads, self.out_channels // self.heads,
                dtype=self.dtype, name=f"attentions_{i}")(x, context,
                                                          num_frames,
                                                          batch_groups)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNetSpatioTemporalConditionModel(nn.Module):
    """The SVD denoiser. Inputs follow the reference convention:

    sample: (B, F, H, W, C=8) noisy latents concat conditioning latents;
    timestep: scalar; encoder_hidden_states: (B, 1, 1024) CLIP image
    embedding; added_time_ids: (B, 3) [fps, motion_bucket_id, noise_aug].
    Returns (B, F, H, W, 4).
    """
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    addition_time_embed_dim: int = 256
    # per-block rematerialization: bounds the vjp's live activations to one
    # block at a time — required for the full-resolution guided-denoise
    # gradient (25 x 72x128) to fit HBM (a single whole-model checkpoint
    # still materializes the full activation chain during its recompute).
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_time_ids,
                 batch_groups: Optional[Tuple[int, ...]] = None):
        """``batch_groups``: optional static tuple summing to B. Marks the
        batch as a concatenation of independent sub-calls of those sizes;
        the temporal transformers then reproduce the reference's
        time-context batch quirk PER GROUP, making one fused call equal
        to the separate per-group calls (the quirk is the UNet's only
        cross-batch coupling). Used to fuse the guided denoiser's batch-1
        guidance pass with its batch-2 CFG pass into one batch-3 forward."""
        b, f, h, w, c = sample.shape
        ch = self.block_out_channels
        time_embed_dim = ch[0] * 4

        ts = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
        t_emb = timestep_embedding(ts, ch[0]).astype(self.dtype)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb)
        add_embeds = timestep_embedding(
            added_time_ids.reshape(-1), self.addition_time_embed_dim)
        add_embeds = add_embeds.reshape(b, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                      name="add_embedding")(add_embeds)

        x = sample.reshape(b * f, h, w, c)
        emb = jnp.repeat(emb, f, axis=0)                        # (B*F, D)
        context = jnp.repeat(encoder_hidden_states, f, axis=0)  # (B*F, 1, D)

        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)

        if self.remat_blocks:
            # static_argnums index the lifted core_fn whose arg 0 is the
            # module scope, so the num_frames int sits at (position in
            # __call__) + 1 and batch_groups right after; both must stay
            # static (reshape by frames / python loop over groups).
            CADown = nn.remat(CrossAttnDownBlockSpatioTemporal,
                              static_argnums=(4, 5))
            Down = nn.remat(DownBlockSpatioTemporal, static_argnums=(3,))
            Mid = nn.remat(UNetMidBlockSpatioTemporal,
                           static_argnums=(4, 5))
            Up = nn.remat(UpBlockSpatioTemporal, static_argnums=(4,))
            CAUp = nn.remat(CrossAttnUpBlockSpatioTemporal,
                            static_argnums=(5, 6))
        else:
            CADown = CrossAttnDownBlockSpatioTemporal
            Down = DownBlockSpatioTemporal
            Mid = UNetMidBlockSpatioTemporal
            Up = UpBlockSpatioTemporal
            CAUp = CrossAttnUpBlockSpatioTemporal

        res_stack = [x]
        n_blocks = len(ch)
        for i in range(n_blocks):
            if i < n_blocks - 1:
                x, outs = CADown(
                    ch[i], self.num_attention_heads[i],
                    num_layers=self.layers_per_block,
                    add_downsample=True, remat=self.remat_blocks,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}")(x, emb, context, f,
                                             batch_groups)
            else:
                x, outs = Down(
                    ch[i], num_layers=self.layers_per_block,
                    add_downsample=False, remat=self.remat_blocks,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}")(x, emb, f)
            res_stack.extend(outs)

        x = Mid(
            ch[-1], self.num_attention_heads[-1],
            remat=self.remat_blocks, dtype=self.dtype,
            name="mid_block")(x, emb, context, f, batch_groups)

        rev_ch = list(reversed(ch))
        rev_heads = list(reversed(self.num_attention_heads))
        for i in range(n_blocks):
            is_final = i == n_blocks - 1
            n_lay = self.layers_per_block + 1
            res = [res_stack.pop() for _ in range(n_lay)][::-1]
            if i == 0:
                x = Up(
                    rev_ch[i], num_layers=n_lay, add_upsample=not is_final,
                    remat=self.remat_blocks, dtype=self.dtype,
                    name=f"up_blocks_{i}")(x, res, emb, f)
            else:
                x = CAUp(
                    rev_ch[i], rev_heads[i], num_layers=n_lay,
                    add_upsample=not is_final, remat=self.remat_blocks,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}")(x, res, emb, context, f,
                                           batch_groups)

        x = GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                      silu=True, name="conv_norm_out")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.reshape(b, f, h, w, self.out_channels)
