"""Shared Flax building blocks for the SVD model stack.

Fresh NHWC/TPU-first implementations of the primitives the reference gets
from diffusers (``models/resnet.py``, ``models/attention.py``,
``models/embeddings.py`` — architecture documented in SURVEY.md §2.8).
Parameter names deliberately mirror the diffusers state-dict layout so
torch->flax weight conversion (models/convert.py) is mechanical.

Conventions: spatial tensors are (B, H, W, C) channel-last; sequences are
(B, S, C). Compute dtype is a module arg (bf16 on TPU); params stay f32.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings (diffusers ``get_timestep_embedding``)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


class GroupNorm(nn.Module):
    """Drop-in for nn.GroupNorm (same param tree: scale/bias).

    Routed through ``ops.pallas_norm.group_norm``: on TPU the stats and
    the normalize(+optional silu) run as Pallas kernels — XLA's layout
    assignment gives the UNet's conv activations batch-on-sublane layouts
    under which its own reduce emitter runs ~20x below HBM bandwidth
    (traced: 585 ms of a 2.9 s full UNet forward was norm statistics).
    Off-TPU (tests) the jnp channel-major reference runs. Stats and
    affine in f32 regardless of compute dtype; output cast to ``dtype``.
    ``silu=True`` fuses the activation into the same pass (no extra param,
    same param tree)."""
    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    silu: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_norm import group_norm
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x3 = x.reshape(x.shape[0], -1, c)
        y = group_norm(x3, scale, bias, self.num_groups, self.epsilon,
                       self.dtype, self.silu)
        return y.reshape(x.shape)


class LayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm (same param tree: scale/bias), routed
    through ``ops.pallas_norm.layer_norm`` (single fused pass on TPU —
    see GroupNorm's rationale; LN stats are per-row so no second pass is
    needed at all)."""
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_norm import layer_norm
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x2 = x.reshape(-1, c)
        y = layer_norm(x2, scale, bias, self.epsilon, self.dtype)
        return y.reshape(x.shape)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal features (linear_1/act/linear_2)."""
    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim or self.time_embed_dim, dtype=self.dtype,
                     name="linear_2")(x)
        return x


def _attention_dense(q, k, v, scale):
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def _attention_chunked(q, k, v, scale, q_chunk: Optional[int] = None):
    """Memory-bounded exact attention: scan over query chunks, full kv;
    each chunk rematerializes in the backward pass (without the checkpoint
    the scan's vjp stacks every chunk's softmax — gigabytes at SVD's
    2304-token mid levels). The fallback where flash attention's block
    divisibility doesn't hold, and for tests off-TPU."""
    b, h, sq, d = q.shape
    if q_chunk is None:
        # Bound the per-iteration f32 logit buffer (b, h, q_chunk, sk) to
        # ~256 MB. At a fixed 512 the dual-direction CFG batch (100 frames
        # x 10 heads x 2304 kv at SVD's mid level) materializes a 4.4 GB
        # chunk — the single biggest HBM allocation of the whole guided
        # step. Shapes are static at trace time so this is free.
        budget = 256 * 1024 * 1024
        q_chunk = budget // max(1, b * h * k.shape[2] * 4)
        q_chunk = max(64, min(512, (q_chunk // 64) * 64))
    n = -(-sq // q_chunk)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n * q_chunk - sq), (0, 0)))
    qc = qp.reshape(b, h, n, q_chunk, d).transpose(2, 0, 1, 3, 4)
    dense = jax.checkpoint(
        lambda qi, kk, vv: _attention_dense(qi, kk, vv, scale))

    def body(_, qi):
        return None, dense(qi, k, v)

    _, out = jax.lax.scan(body, None, qc)
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, n * q_chunk, d)
    return out[:, :, :sq]


def _attention_packed_heads(q, k, v, scale):
    """Tiny-sequence attention with all heads packed into ONE sequence.

    At SVD's temporal attention shape (rows, h=5, f=25, d=64) the per-head
    logits (..., 25, 25) pad the lane axis 25 -> 128 (5x wasted VPU/MXU
    work and HBM traffic; measured 21.7 ms / 0.7 TF/s per call at the CFG
    batch). Packing the head axis into the sequence gives (rows, 125, 125)
    logits — near-full 128-tiles — with an additive block-diagonal mask
    (-inf off-block) keeping heads independent: exp(-inf) = 0 exactly, the
    in-block max/sum are untouched, so the result is bit-equal to per-head
    attention. Measured 3.4 ms for the same call (6.3x).
    """
    b, h, s, d = q.shape
    hs = h * s
    qq = q.reshape(b, hs, d)
    kk = k.reshape(b, hs, d)
    vv = v.reshape(b, hs, d)
    blk = jnp.arange(hs) // s
    bias = jnp.where(blk[:, None] == blk[None, :], 0.0, -jnp.inf)
    attn = jnp.einsum("bqd,bkd->bqk", qq, kk,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32) + bias, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), vv)
    return out.reshape(b, h, s, d)


def _attention(q, k, v, scale):
    """Pick the attention implementation by sequence length and platform.

    Long self-attention (the 72x128=9216-token spatial attention of SVD)
    would materialize a ~42 GB logit tensor densely — on TPU it runs as the
    Pallas flash-attention kernel; elsewhere as chunked exact attention.
    Tiny sequences (the 25-frame temporal attention) pack heads into the
    sequence axis to avoid 25->128 lane padding (bit-equal, see
    _attention_packed_heads).
    """
    sq, sk = q.shape[2], k.shape[2]
    if sq == sk and sq <= 32 and q.shape[1] > 1:
        return _attention_packed_heads(q, k, v, scale)
    if sq < 512 and sk < 512:
        return _attention_dense(q, k, v, scale)
    platform = jax.devices()[0].platform
    # flash only for small head dims: at d=512 (the VAE mid attention) the
    # kernel's per-block VMEM exceeds the 16 MB budget. Any 128-multiple
    # block that divides the sequence works: 1024 for the 9216-token top
    # level, 768 for the 2304-token mid level (which would otherwise fall
    # back to chunked-exact and its f32 logit buffers).
    block = next((c for c in (1024, 768, 512) if sq % c == 0), None)
    if (platform in ("tpu", "axon") and sq == sk and block is not None
            and q.shape[3] <= 128):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        # v5e sweep at the production (75, 5, 9216, 64) bf16 shape
        # (scripts/sweep_flash_blocks.py, 2026-08-20): default blocks
        # 7.8 TF/s; every >=768 block combo plateaus at 53-58 TF/s with
        # (bq=1536, bk=1024) the repeat-measured best (58.1/57.6 vs
        # 57.1/57.2 for 1024-cubed); bq>1536 fails to compile, splash
        # 6.9 TF/s. The remaining gap to the ~98 TF/s d=64 ceiling is
        # intrinsic to the kernel at this head dim, not block shape.
        bq = 1536 if sq % 1536 == 0 else block
        bk = block
        # backward (dkv/dq) blocks stay at the proven cube: the sweep
        # timed the forward only, and the backward runs only in the
        # opt-in grad-through-UNet mode.
        b = block
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=b, block_k_major_dkv=b,
                        block_k_dkv=b, block_q_dkv=b,
                        block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
        return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)
    if (platform in ("tpu", "axon") and sq == sk and q.shape[3] <= 128
            and 128 < sq and -(-sq // 128) * 128 <= 1024):
        # 128-indivisible mid sequences (SVD's 18x32=576-token level):
        # zero-pad to the next 128 multiple and mask the pad columns with
        # flash segment ids (padded keys contribute exactly nothing; padded
        # query rows are sliced off) — exact numerics, single-block flash.
        # Measured 22.3 -> 5.9 ms at (75, 20, 576, 64) vs the chunked
        # fallback, whose 64-row q chunks starve the MXU.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)
        pad_to = -(-sq // 128) * 128
        p = pad_to - sq
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, p), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, p), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, p), (0, 0)))
        seg = (jnp.arange(pad_to) < sq).astype(jnp.int32)[None]
        seg = jnp.broadcast_to(seg, (q.shape[0], pad_to))
        b = pad_to
        bs = BlockSizes(block_q=b, block_k_major=b, block_k=b, block_b=1,
                        block_q_major_dkv=b, block_k_major_dkv=b,
                        block_k_dkv=b, block_q_dkv=b,
                        block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
        out = flash_attention(qp, kp, vp, sm_scale=scale,
                              segment_ids=SegmentIds(q=seg, kv=seg),
                              block_sizes=bs)
        return out[:, :, :sq]
    return _attention_chunked(q, k, v, scale)


class Attention(nn.Module):
    """Multi-head attention matching diffusers ``Attention`` semantics.

    - qkv projections without bias unless ``qkv_bias``; output projection
      with bias (``to_out.0``).
    - optional GroupNorm on the channel dim before projection (VAE mid).
    - optional residual connection (VAE mid).
    - softmax in f32 regardless of compute dtype.
    """
    heads: int
    dim_head: int
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    norm_num_groups: Optional[int] = None
    residual_connection: bool = False
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        # x: (B, S, C) or (B, H, W, C) (spatial -> flattened internally)
        spatial = x.ndim == 4
        if spatial:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        residual = x
        if self.norm_num_groups is not None:
            x = GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps,
                             dtype=self.dtype, name="group_norm")(x)
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_v")(ctx)

        if context is not None and ctx.shape[1] == 1:
            # Single-token cross-attention (SVD conditions on ONE CLIP
            # image embedding): softmax over one key is exactly 1.0, so
            # attention == broadcast of V and the whole q/k/logits path is
            # dead. Project the single token through to_out FIRST (linear,
            # so projecting then broadcasting is bit-equal to broadcasting
            # then projecting) and broadcast — q/k above stay declared for
            # the torch-checkpoint param tree but are DCE'd by XLA.
            out = nn.Dense(self.out_dim or x.shape[-1], dtype=self.dtype,
                           name="to_out_0")(v)
            out = jnp.broadcast_to(out, (x.shape[0], x.shape[1],
                                         out.shape[-1]))
        else:
            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.heads,
                                 self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = split(q), split(k), split(v)
            scale = 1.0 / math.sqrt(self.dim_head)
            out = _attention(q, k, v, scale)
            out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1],
                                                    inner)
            out = nn.Dense(self.out_dim or x.shape[-1], dtype=self.dtype,
                           name="to_out_0")(out)
        if self.residual_connection:
            out = out + residual
        if spatial:
            out = out.reshape(b, h, w, -1)
        return out


class _DenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's default initializers at this
    scope WITHOUT computing — lets FeedForward hand the raw weights to the
    fused Pallas GEGLU kernel while keeping the param tree (and converted
    checkpoints) identical to the nn.Dense composition."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _GEGLUParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(self.features, name="proj")(in_features)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers ``FeedForward`` with geglu).

    Routed through ``ops.pallas_ffn.geglu_ffn``: on TPU the C->8C
    projection, gate, and 4C->C projection run as ONE row-tiled Pallas
    kernel with both weight matrices resident in VMEM — XLA otherwise
    materializes the 8C-wide GEGLU intermediate in HBM (3.5 GB at SVD's
    320-channel level, ~7 GB of traffic per call). Param tree matches the
    nn.Dense composition (net_0/proj + net_2) exactly."""
    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_ffn import geglu_ffn
        c = x.shape[-1]
        inner = c * self.mult
        dim_out = self.dim_out or c
        w1, b1 = _GEGLUParams(inner * 2, name="net_0")(c)
        w2, b2 = _DenseParams(dim_out, name="net_2")(inner)
        x2 = x.reshape(-1, c)
        y = geglu_ffn(x2, w1, b1, w2, b2, self.dtype)
        return y.reshape(x.shape[:-1] + (dim_out,))


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv3x3 -> (+temb) -> GN -> silu -> conv3x3 + shortcut."""
    out_channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                      silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                      silu=True, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """3D-conv resnet over the frame axis, kernel (3,1,1).

    x: (B, F, H, W, C); temb: (B, F, temb_dim) or None.
    """
    out_channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                      silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0),
                    (0, 0)), dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, :, None, None, :]
        h = GroupNorm(num_groups=32, epsilon=self.eps, dtype=self.dtype,
                      silu=True, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0),
                    (0, 0)), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix (diffusers ``AlphaBlender``).

    With the SVD pipelines image_only_indicator is always zeros, so
    'learned_with_images' reduces to alpha = sigmoid(mix_factor); we keep
    the strategy switch for VAE ('learned' + switched mix).
    """
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        mix = self.param("mix_factor", lambda k: jnp.asarray([0.5]))
        alpha = jax.nn.sigmoid(mix[0]).astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x)
