"""DUSt3R numerical oracle: a handwritten numpy implementation of the
PUBLIC CroCo/DUSt3R forward semantics (fused-qkv attention, 2D rotate-half
RoPE, norm_y cross-attention, linear head + pixel_shuffle + exp-norm
postprocess), evaluated against the Flax ``Dust3R`` with
``convert_dust3r_torch``-converted random weights in the public checkpoint
layout.

The reference repo's dust3r submodule is empty (SURVEY.md §0), so no torch
oracle exists; this file IS the executable specification of the public
conventions (naver/dust3r + naver/croco model code), written from the
published architecture. It pins every convention that would silently
produce garbage if wrong: qkv fusion order (3, heads, head_dim), RoPE
y-half/x-half split with duplicated cos/sin tables, cross-attn norm_y,
decoder intertwining, shared dec_norm, the head's pixel_shuffle channel
layout ((4, p, p)-major), and the exp-norm / 1+exp postprocess.
"""
import numpy as np
import jax
import jax.numpy as jnp

from syn3r_tpu.vision.dust3r import Dust3R, convert_dust3r_torch

P = 4              # patch size
EH, EW = 16, 32    # image size -> 4x8 = 32 tokens
ED, DD = 32, 32    # encoder/decoder dims
HEADS = 4          # head dim 8 (divisible by 4 for the 2D rope split)
DEPTH = 2


# ---------------------------------------------------------------------------
# numpy reference (public CroCo/DUSt3R semantics)
# ---------------------------------------------------------------------------

def np_ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_gelu(x):
    from scipy.special import erf
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_rope1d(t, pos, base=100.0):
    """t: (B, H, N, d); pos: (B, N). croco RoPE1D: freqs duplicated across
    the two sub-halves, rotate_half = cat(-x2, x1)."""
    d = t.shape[-1]
    inv = 1.0 / (base ** (np.arange(0, d, 2) / d))
    ang = pos[:, None, :, None] * inv                    # (B, 1, N, d/2)
    cos = np.cos(np.concatenate([ang, ang], -1))
    sin = np.sin(np.concatenate([ang, ang], -1))
    t1, t2 = t[..., :d // 2], t[..., d // 2:]
    rot = np.concatenate([-t2, t1], -1)
    return t * cos + rot * sin


def np_rope2d(tokens, positions):
    """tokens: (B, H, N, D); positions: (B, N, 2) as (y, x). First half of
    the head dim rotates with y, second with x (croco RoPE2D.forward)."""
    d = tokens.shape[-1] // 2
    y, x = tokens[..., :d], tokens[..., d:]
    return np.concatenate([np_rope1d(y, positions[..., 0]),
                           np_rope1d(x, positions[..., 1])], -1)


def np_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def _split_heads(t, heads):
    b, n, d = t.shape
    return t.reshape(b, n, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(t):
    b, h, n, hd = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def np_self_attn(x, sd, pre, heads, pos):
    """croco Attention: fused qkv reshaped (B, N, 3, heads, hd), rope on
    q and k, softmax(QK^T * hd^-0.5) V, out proj."""
    b, n, d = x.shape
    qkv = x @ sd[pre + ".qkv.weight"].T + sd[pre + ".qkv.bias"]
    qkv = qkv.reshape(b, n, 3, heads, d // heads).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = np_rope2d(q, pos)
    k = np_rope2d(k, pos)
    att = np_softmax(q @ k.transpose(0, 1, 3, 2) * (d // heads) ** -0.5)
    out = _merge_heads(att @ v)
    return out @ sd[pre + ".proj.weight"].T + sd[pre + ".proj.bias"]


def np_cross_attn(q_in, kv_in, sd, pre, heads, pos_q, pos_k):
    d = q_in.shape[-1]
    q = _split_heads(q_in @ sd[pre + ".projq.weight"].T
                     + sd[pre + ".projq.bias"], heads)
    k = _split_heads(kv_in @ sd[pre + ".projk.weight"].T
                     + sd[pre + ".projk.bias"], heads)
    v = _split_heads(kv_in @ sd[pre + ".projv.weight"].T
                     + sd[pre + ".projv.bias"], heads)
    q = np_rope2d(q, pos_q)
    k = np_rope2d(k, pos_k)
    att = np_softmax(q @ k.transpose(0, 1, 3, 2) * (d // heads) ** -0.5)
    out = _merge_heads(att @ v)
    return out @ sd[pre + ".proj.weight"].T + sd[pre + ".proj.bias"]


def np_mlp(x, sd, pre):
    h = np_gelu(x @ sd[pre + ".fc1.weight"].T + sd[pre + ".fc1.bias"])
    return h @ sd[pre + ".fc2.weight"].T + sd[pre + ".fc2.bias"]


def np_enc_block(x, sd, pre, heads, pos):
    x = x + np_self_attn(np_ln(x, sd[pre + ".norm1.weight"],
                               sd[pre + ".norm1.bias"]),
                         sd, pre + ".attn", heads, pos)
    x = x + np_mlp(np_ln(x, sd[pre + ".norm2.weight"],
                         sd[pre + ".norm2.bias"]), sd, pre + ".mlp")
    return x


def np_dec_block(x, y, sd, pre, heads, pos, pos_y):
    """croco DecoderBlock: self-attn, then cross-attn of norm2(x) against
    norm_y(y), then mlp."""
    x = x + np_self_attn(np_ln(x, sd[pre + ".norm1.weight"],
                               sd[pre + ".norm1.bias"]),
                         sd, pre + ".attn", heads, pos)
    y_ = np_ln(y, sd[pre + ".norm_y.weight"], sd[pre + ".norm_y.bias"])
    x = x + np_cross_attn(np_ln(x, sd[pre + ".norm2.weight"],
                                sd[pre + ".norm2.bias"]),
                          y_, sd, pre + ".cross_attn", heads, pos, pos_y)
    x = x + np_mlp(np_ln(x, sd[pre + ".norm3.weight"],
                         sd[pre + ".norm3.bias"]), sd, pre + ".mlp")
    return x


def np_patch_embed(img01, sd):
    """img01: (B, H, W, 3) in [0,1]. DUSt3R ImgNorm (mean .5, std .5), then
    stride-P conv, flattened row-major (gh, gw)."""
    x = img01 * 2.0 - 1.0
    w = sd["patch_embed.proj.weight"]                 # (O, 3, P, P)
    bsz, H, W, _ = x.shape
    gh, gw = H // P, W // P
    patches = x.reshape(bsz, gh, P, gw, P, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(bsz, gh * gw, P * P * 3)
    wf = w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)  # (O, P*P*3)
    return patches @ wf.T + sd["patch_embed.proj.bias"]


def np_head(tokens, sd, pre, gh, gw):
    """Linear head: proj -> (B, 4p^2, gh, gw) -> pixel_shuffle(p) with the
    torch (4, p, p)-major channel layout -> exp-norm pts, 1+exp conf."""
    b, s, _ = tokens.shape
    feat = tokens @ sd[pre + ".proj.weight"].T + sd[pre + ".proj.bias"]
    feat = feat.transpose(0, 2, 1).reshape(b, 4 * P * P, gh, gw)
    f = feat.reshape(b, 4, P, P, gh, gw).transpose(0, 1, 4, 2, 5, 3)
    f = f.reshape(b, 4, gh * P, gw * P).transpose(0, 2, 3, 1)  # (B,H,W,4)
    pts, conf = f[..., :3], f[..., 3]
    n = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = pts / np.maximum(n, 1e-8) * np.expm1(n)
    return pts, 1.0 + np.exp(conf)


def np_dust3r(img1, img2, sd):
    b, H, W, _ = img1.shape
    gh, gw = H // P, W // P
    ys = np.repeat(np.arange(gh), gw)
    xs = np.tile(np.arange(gw), gh)
    pos = np.broadcast_to(np.stack([ys, xs], -1)[None].astype(np.float32),
                          (b, gh * gw, 2))

    def encode(img):
        x = np_patch_embed(img, sd)
        for i in range(DEPTH):
            x = np_enc_block(x, sd, f"enc_blocks.{i}", HEADS, pos)
        return np_ln(x, sd["enc_norm.weight"], sd["enc_norm.bias"])

    f1, f2 = encode(img1), encode(img2)
    d1 = f1 @ sd["decoder_embed.weight"].T + sd["decoder_embed.bias"]
    d2 = f2 @ sd["decoder_embed.weight"].T + sd["decoder_embed.bias"]
    for i in range(DEPTH):
        n1 = np_dec_block(d1, d2, sd, f"dec_blocks.{i}", HEADS, pos, pos)
        n2 = np_dec_block(d2, d1, sd, f"dec_blocks2.{i}", HEADS, pos, pos)
        d1, d2 = n1, n2
    d1 = np_ln(d1, sd["dec_norm.weight"], sd["dec_norm.bias"])
    d2 = np_ln(d2, sd["dec_norm.weight"], sd["dec_norm.bias"])
    pts1, conf1 = np_head(d1, sd, "downstream_head1", gh, gw)
    pts2, conf2 = np_head(d2, sd, "downstream_head2", gh, gw)
    return pts1, conf1, pts2, conf2


# ---------------------------------------------------------------------------
# random public-layout state dict
# ---------------------------------------------------------------------------

def _state_dict(rng):
    sd = {}

    def t(name, *shape, scale=0.2):
        sd[name] = rng.normal(0, scale, shape).astype(np.float32)

    t("patch_embed.proj.weight", ED, 3, P, P)
    t("patch_embed.proj.bias", ED)
    for i in range(DEPTH):
        pre = f"enc_blocks.{i}"
        t(pre + ".norm1.weight", ED, scale=0.05)
        sd[pre + ".norm1.weight"] += 1.0
        t(pre + ".norm1.bias", ED)
        t(pre + ".attn.qkv.weight", 3 * ED, ED)
        t(pre + ".attn.qkv.bias", 3 * ED)
        t(pre + ".attn.proj.weight", ED, ED)
        t(pre + ".attn.proj.bias", ED)
        t(pre + ".norm2.weight", ED, scale=0.05)
        sd[pre + ".norm2.weight"] += 1.0
        t(pre + ".norm2.bias", ED)
        t(pre + ".mlp.fc1.weight", 4 * ED, ED)
        t(pre + ".mlp.fc1.bias", 4 * ED)
        t(pre + ".mlp.fc2.weight", ED, 4 * ED)
        t(pre + ".mlp.fc2.bias", ED)
    t("enc_norm.weight", ED, scale=0.05)
    sd["enc_norm.weight"] += 1.0
    t("enc_norm.bias", ED)
    t("decoder_embed.weight", DD, ED)
    t("decoder_embed.bias", DD)
    for stream in ("dec_blocks", "dec_blocks2"):
        for i in range(DEPTH):
            pre = f"{stream}.{i}"
            for nm in ("norm1", "norm2", "norm3", "norm_y"):
                t(pre + f".{nm}.weight", DD, scale=0.05)
                sd[pre + f".{nm}.weight"] += 1.0
                t(pre + f".{nm}.bias", DD)
            t(pre + ".attn.qkv.weight", 3 * DD, DD)
            t(pre + ".attn.qkv.bias", 3 * DD)
            t(pre + ".attn.proj.weight", DD, DD)
            t(pre + ".attn.proj.bias", DD)
            for nm in ("projq", "projk", "projv", "proj"):
                t(pre + f".cross_attn.{nm}.weight", DD, DD)
                t(pre + f".cross_attn.{nm}.bias", DD)
            t(pre + ".mlp.fc1.weight", 4 * DD, DD)
            t(pre + ".mlp.fc1.bias", 4 * DD)
            t(pre + ".mlp.fc2.weight", DD, 4 * DD)
            t(pre + ".mlp.fc2.bias", DD)
    t("dec_norm.weight", DD, scale=0.05)
    sd["dec_norm.weight"] += 1.0
    t("dec_norm.bias", DD)
    for h in ("downstream_head1", "downstream_head2"):
        t(h + ".proj.weight", 4 * P * P, DD, scale=0.05)
        t(h + ".proj.bias", 4 * P * P)
    return sd


def test_dust3r_full_activation_oracle():
    rng = np.random.default_rng(0)
    sd = _state_dict(rng)
    img1 = rng.uniform(size=(1, EH, EW, 3)).astype(np.float32)
    img2 = rng.uniform(size=(1, EH, EW, 3)).astype(np.float32)

    ref = np_dust3r(img1, img2, sd)

    model = Dust3R(patch=P, enc_dim=ED, enc_depth=DEPTH, enc_heads=HEADS,
                   dec_dim=DD, dec_depth=DEPTH, dec_heads=HEADS)
    params = convert_dust3r_torch(sd)
    out = model.apply({"params": params}, jnp.asarray(img1),
                      jnp.asarray(img2))

    np.testing.assert_allclose(np.asarray(out["pts1"]), ref[0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["conf1"]), ref[1],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["pts2"]), ref[2],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["conf2"]), ref[3],
                               rtol=2e-4, atol=2e-5)


def test_rope_against_torch_style():
    """rope_2d vs an independently-written torch-layout rope (embedding
    lookup form, as curope's python fallback does it)."""
    from syn3r_tpu.vision.dust3r import rope_2d
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 3, 10, 16)).astype(np.float32)
    pos = rng.integers(0, 7, size=(2, 10, 2)).astype(np.float32)
    ref = np_rope2d(q, pos)
    ours, _ = rope_2d(jnp.asarray(q), jnp.asarray(q), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)
