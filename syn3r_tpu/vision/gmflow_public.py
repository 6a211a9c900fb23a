"""GMFlow with the PUBLIC checkpoint architecture (haofeixu/gmflow).

The reference consumes GMFlow only through the fwd-bwd consistency gate
(``generate_corresp_mask``, reference ``model/diffusionGS.py:377-385``; the
gmflow submodule itself is empty in the checkout). ``vision/gmflow.py``
keeps a simplified global-attention fallback; THIS module reproduces the
public ``GMFlow`` (sintel/things checkpoints: 1 scale, d_model=128, 6
transformer layers, attn_splits=2) so the released weights can be
converted:

  CNNEncoder        instance-norm ResNet: 7x7/2 stem + 3 residual stages
                    (64, 96, 128) to 1/8 resolution + 1x1 out conv
  FeatureTransformer 6 x [self-attn (no FFN) + cross-attn + FFN], swin
                    split-window attention (attn_splits=2), every odd layer
                    shifted by half a window with the standard swin mask;
                    DETR-style sine position embedding added once up front
  matching          global correlation softmax -> expected coords - grid
                    (bidirectional via the correlation transpose)
  SelfAttnPropagation  feature self-attention applied to the flow field
  upsampler         RAFT-style 9-neighbor convex upsampling mask (x8)

``convert_gmflow_torch`` maps the public state-dict names; InstanceNorm2d
is affine=False in the public model, so norms carry no weights.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------

def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): normalize each (H, W) slice per
    channel per sample. x: (B, H, W, C)."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = instance_norm(
                nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="downsample")(x))
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """Public gmflow backbone: stem 7x7/2 -> stages (64,/1)(96,/2)(128,/2)
    of two residual blocks each -> 1x1 output conv. Output 1/8 res."""
    output_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        for i, (planes, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            x = ResidualBlock(planes, stride, dtype=self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(planes, 1, dtype=self.dtype,
                              name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


# ---------------------------------------------------------------------------
# swin-window attention utilities (public gmflow/utils.py semantics)
# ---------------------------------------------------------------------------

def split_feature(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*K*K, H/K, W/K, C), windows ordered row-major."""
    b, h, w, c = x.shape
    k = num_splits
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_splits(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """Inverse of split_feature."""
    bkk, hk, wk, c = x.shape
    k = num_splits
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hk, k * wk, c)


def shift_window_attn_mask(h: int, w: int, num_splits: int) -> jnp.ndarray:
    """The standard swin shifted-window attention mask: windows that mix
    rolled regions get -100 between tokens from different regions.
    Returns (K*K, win, win) with win = (h/K)*(w/K)."""
    wh, ww = h // num_splits, w // num_splits
    sh, sw = wh // 2, ww // 2
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # pure-numpy window split (same layout as split_feature) — this runs
    # at trace time, so no jnp ops allowed
    win = img.reshape(1, num_splits, wh, num_splits, ww, 1) \
        .transpose(0, 1, 3, 2, 4, 5) \
        .reshape(num_splits * num_splits, wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


def swin_attention(q, k, v, num_splits: int, with_shift: bool,
                   h: int, w: int, attn_mask=None):
    """Single-head split-window attention (public
    single_head_split_window_attention). q/k/v: (B, H*W, C)."""
    b, _, c = q.shape
    scale = c ** 0.5

    def to_img(t):
        return t.reshape(b, h, w, c)

    qi, ki, vi = to_img(q), to_img(k), to_img(v)
    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        qi = jnp.roll(qi, (-sh, -sw), axis=(1, 2))
        ki = jnp.roll(ki, (-sh, -sw), axis=(1, 2))
        vi = jnp.roll(vi, (-sh, -sw), axis=(1, 2))
    qs = split_feature(qi, num_splits).reshape(b * num_splits ** 2, -1, c)
    ks = split_feature(ki, num_splits).reshape(b * num_splits ** 2, -1, c)
    vs = split_feature(vi, num_splits).reshape(b * num_splits ** 2, -1, c)
    scores = jnp.einsum("bnc,bmc->bnm", qs, ks,
                        preferred_element_type=jnp.float32) / scale
    if with_shift:
        scores = scores + jnp.tile(attn_mask, (b, 1, 1))
    prob = jax.nn.softmax(scores, axis=-1).astype(vs.dtype)
    out = jnp.einsum("bnm,bmc->bnc", prob, vs)
    out = merge_splits(out.reshape(b * num_splits ** 2, h // num_splits,
                                   w // num_splits, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, h * w, c)


def position_embedding_sine(h: int, w: int, num_pos_feats: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR PositionEmbeddingSine with normalize=True, scale=2*pi.
    Returns (H, W, 2*num_pos_feats) channel-last (y-part then x-part)."""
    scale = 2.0 * math.pi
    eps = 1e-6
    y = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x = np.cumsum(np.ones((h, w), np.float32), axis=1)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                     axis=-1).reshape(h, w, num_pos_feats)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                     axis=-1).reshape(h, w, num_pos_feats)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=-1))


def feature_add_position(f0, f1, attn_splits: int, channels: int):
    """Add the sine position embedding; with attn_splits > 1 it is computed
    per split window (public feature_add_position). f: (B, H, W, C)."""
    if attn_splits > 1:
        s0 = split_feature(f0, attn_splits)
        s1 = split_feature(f1, attn_splits)
        pos = position_embedding_sine(s0.shape[1], s0.shape[2],
                                      channels // 2)
        return (merge_splits(s0 + pos, attn_splits),
                merge_splits(s1 + pos, attn_splits))
    pos = position_embedding_sine(f0.shape[1], f0.shape[2], channels // 2)
    return f0 + pos, f1 + pos


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

class TransformerLayer(nn.Module):
    """Public TransformerLayer: qkv projections + merge + norm1, then
    (unless no_ffn) FFN on concat(source, message) + norm2; residual add.
    Single-head (public nhead=1)."""
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source, target, h: int, w: int, attn_splits: int,
                 attn_mask=None):
        d = source.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(source)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(target)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(target)
        if attn_splits > 1:
            msg = swin_attention(q, k, v, attn_splits, self.with_shift,
                                 h, w, attn_mask)
        else:
            scores = jnp.einsum("bnc,bmc->bnm", q, k,
                                preferred_element_type=jnp.float32) \
                / (d ** 0.5)
            msg = jnp.einsum(
                "bnm,bmc->bnc",
                jax.nn.softmax(scores, -1).astype(v.dtype), v)
        msg = nn.Dense(d, dtype=self.dtype, name="merge")(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm1")(msg)
        if not self.no_ffn:
            hcat = jnp.concatenate([source, msg], axis=-1)
            hcat = nn.Dense(2 * d * self.ffn_dim_expansion, use_bias=False,
                            dtype=self.dtype, name="mlp_0")(hcat)
            hcat = nn.gelu(hcat, approximate=False)
            msg = nn.Dense(d, use_bias=False, dtype=self.dtype,
                           name="mlp_2")(hcat)
            msg = nn.LayerNorm(dtype=self.dtype, name="norm2")(msg)
        return source + msg


class TransformerBlock(nn.Module):
    """self-attn (no FFN) + cross-attn with FFN."""
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source, target, h, w, attn_splits, attn_mask=None):
        source = TransformerLayer(no_ffn=True, with_shift=self.with_shift,
                                  dtype=self.dtype, name="self_attn")(
            source, source, h, w, attn_splits, attn_mask)
        return TransformerLayer(ffn_dim_expansion=self.ffn_dim_expansion,
                                with_shift=self.with_shift,
                                dtype=self.dtype, name="cross_attn_ffn")(
            source, target, h, w, attn_splits, attn_mask)


class FeatureTransformer(nn.Module):
    """6 blocks; odd blocks shifted. The two views are processed jointly by
    stacking (f0, f1) and (f1, f0) on the batch axis (public concat
    trick — exact same math, half the dispatches)."""
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f0, f1, attn_splits: int):
        b, h, w, c = f0.shape
        mask = (shift_window_attn_mask(h, w, attn_splits)
                if attn_splits > 1 else None)
        c0 = jnp.concatenate([f0, f1], 0).reshape(2 * b, h * w, c)
        c1 = jnp.concatenate([f1, f0], 0).reshape(2 * b, h * w, c)
        for i in range(self.num_layers):
            c0 = TransformerBlock(
                ffn_dim_expansion=self.ffn_dim_expansion,
                with_shift=(attn_splits > 1 and i % 2 == 1),
                dtype=self.dtype, name=f"layers_{i}")(
                c0, c1, h, w, attn_splits, mask)
            c1 = jnp.concatenate([c0[b:], c0[:b]], 0)
        return (c0[:b].reshape(b, h, w, c), c0[b:].reshape(b, h, w, c))


# ---------------------------------------------------------------------------
# matching + propagation + upsampling
# ---------------------------------------------------------------------------

def global_correlation_softmax(f0, f1, bidir: bool = False):
    """f: (B, H, W, C) -> flow (B, H, W, 2) in (x, y) pixel units at this
    resolution; bidir stacks the backward flow on the batch axis (public
    semantics: correlation transpose)."""
    b, h, w, c = f0.shape
    corr = jnp.einsum("bnc,bmc->bnm", f0.reshape(b, h * w, c),
                      f1.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32) / (c ** 0.5)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    grid = jnp.stack([xs, ys], -1)                       # (HW, 2) (x, y)
    if bidir:
        corr = jnp.concatenate([corr, corr.transpose(0, 2, 1)], 0)
    prob = jax.nn.softmax(corr, axis=-1)
    corresp = prob @ grid                                 # (B[, 2B], HW, 2)
    flow = corresp - grid[None]
    return flow.reshape(-1, h, w, 2)


class SelfAttnPropagation(nn.Module):
    """Query/key from features, value = flow (public SelfAttnPropagation
    global variant, prop_radius=-1)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature, flow):
        b, h, w, c = feature.shape
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(
            feature.reshape(b, h * w, c))
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(
            feature.reshape(b, h * w, c))
        v = flow.reshape(b, h * w, flow.shape[-1])
        scores = jnp.einsum("bnc,bmc->bnm", q, k,
                            preferred_element_type=jnp.float32) / (c ** 0.5)
        prob = jax.nn.softmax(scores, -1)
        return (prob @ v).reshape(b, h, w, v.shape[-1])


def convex_upsample(flow, mask_logits, factor: int = 8):
    """RAFT convex upsampling. flow: (B, h, w, 2); mask_logits:
    (B, h, w, 9*factor^2) from the upsampler conv (channel order
    (9, factor, factor) as in the public view(b, 1, 9, f, f, h, w))."""
    b, h, w, _ = flow.shape
    m = mask_logits.reshape(b, h, w, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)
    # 9-neighborhood of the (factor-scaled) flow, torch F.unfold order:
    # (dy, dx) row-major
    fpad = jnp.pad(flow * factor, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([fpad[:, dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)],
                      axis=3)                            # (B, h, w, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)    # (B,h,w,f,f,2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor,
                                                  w * factor, 2)


class GMFlowPublic(nn.Module):
    """Public gmflow (1 scale). call(img0, img1 (B, H, W, 3) in [0, 1])
    -> flow (B, H, W, 2) px, (x, y); bidir=True returns (fwd, bwd).

    The public model takes images in [0, 255] normalized by ImageNet
    stats inside its dataloader; the reference's wrapper handles that —
    here normalization is applied in __call__.
    """
    feature_channels: int = 128
    num_transformer_layers: int = 6
    attn_splits: int = 2
    upsample_factor: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img0, img1, bidir: bool = False):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x0 = (img0 - mean) / std
        x1 = (img1 - mean) / std
        backbone = CNNEncoder(self.feature_channels, dtype=self.dtype,
                              name="backbone")
        # public: both images stacked on batch for one backbone pass
        feats = backbone(jnp.concatenate([x0, x1], 0))
        f0, f1 = feats[:x0.shape[0]], feats[x0.shape[0]:]
        f0, f1 = feature_add_position(f0, f1, self.attn_splits,
                                      self.feature_channels)
        f0, f1 = FeatureTransformer(
            self.num_transformer_layers, self.feature_channels,
            dtype=self.dtype, name="transformer")(f0, f1, self.attn_splits)
        flow = global_correlation_softmax(f0, f1, bidir=bidir)
        feat = jnp.concatenate([f0, f1], 0) if bidir else f0
        flow = SelfAttnPropagation(dtype=self.dtype,
                                   name="feature_flow_attn")(feat, flow)
        # upsampler: conv(2+C -> 256) relu conv(256 -> 9*f^2)
        cat = jnp.concatenate([flow, feat], axis=-1)
        m = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                    name="upsampler_0")(cat)
        m = nn.relu(m)
        m = nn.Conv(9 * self.upsample_factor ** 2, (1, 1),
                    dtype=self.dtype, name="upsampler_2")(m)
        up = convex_upsample(flow, m, self.upsample_factor)
        if bidir:
            return up[:img0.shape[0]], up[img0.shape[0]:]
        return up


# ---------------------------------------------------------------------------
# weight conversion (public checkpoint layout)
# ---------------------------------------------------------------------------

def convert_gmflow_torch(state_dict: dict) -> dict:
    """Map the public gmflow checkpoint (key root sometimes 'model.') onto
    GMFlowPublic's param tree. InstanceNorm layers are affine=False in the
    public model — no params to map."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[6:] if k.startswith("model.") else k] = np.asarray(v)
    out: dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.ascontiguousarray(value.astype(np.float32))

    def conv(src, dst):
        put(dst + ("kernel",), sd[src + ".weight"].transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            put(dst + ("bias",), sd[src + ".bias"])

    def dense(src, dst):
        put(dst + ("kernel",), sd[src + ".weight"].T)
        if src + ".bias" in sd:
            put(dst + ("bias",), sd[src + ".bias"])

    def ln(src, dst):
        put(dst + ("scale",), sd[src + ".weight"])
        put(dst + ("bias",), sd[src + ".bias"])

    bb = ("backbone",)
    conv("backbone.conv1", bb + ("conv1",))
    for stage in (1, 2, 3):
        for blk in (0, 1):
            src = f"backbone.layer{stage}.{blk}"
            dst = bb + (f"layer{stage}_{blk}",)
            conv(src + ".conv1", dst + ("conv1",))
            conv(src + ".conv2", dst + ("conv2",))
            if src + ".downsample.0.weight" in sd:
                conv(src + ".downsample.0", dst + ("downsample",))
    conv("backbone.conv2", bb + ("conv2",))

    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("transformer.layers."))
    for i in range(n_layers):
        for sub, name in (("self_attn", "self_attn"),
                          ("cross_attn_ffn", "cross_attn_ffn")):
            src = f"transformer.layers.{i}.{sub}"
            dst = ("transformer", f"layers_{i}", name)
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                dense(src + f".{p}", dst + (p,))
            ln(src + ".norm1", dst + ("norm1",))
            if src + ".norm2.weight" in sd:
                ln(src + ".norm2", dst + ("norm2",))
                dense(src + ".mlp.0", dst + ("mlp_0",))
                dense(src + ".mlp.2", dst + ("mlp_2",))
    dense("feature_flow_attn.q_proj", ("feature_flow_attn", "q_proj"))
    dense("feature_flow_attn.k_proj", ("feature_flow_attn", "k_proj"))
    conv("upsampler.0", ("upsampler_0",))
    conv("upsampler.2", ("upsampler_2",))
    return out


def make_flow_fn(model: GMFlowPublic, params):
    """Bundle into the orchestrator's flow_fn(a, b) -> (H, W, 2) interface
    (single-direction; correspondence_mask calls it both ways)."""
    import functools

    @functools.partial(jax.jit)
    def fwd(a, b):
        return model.apply(params, a[None], b[None])[0]

    return fwd
