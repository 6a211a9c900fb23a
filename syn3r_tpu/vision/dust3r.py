"""DUSt3R in Flax: two-view pointmap regression + known-pose global
alignment.

The reference consumes DUSt3R through a thin wrapper (missing submodule;
interface reconstructed in SURVEY.md §2.5): ``make_pairs(imgs,
scene_graph='complete'|'oneref-0')`` and ``run(frames, c2w_poses=,
intrinsics=, preset_pairs=)`` -> merged point cloud, with poses/intrinsics
FIXED (the reference always supplies GS-known cameras,
``model/diffusionGS.py:401,431``; inputs at width 512).

Architecture (public DUSt3R/CroCo design): shared ViT encoder with 2D RoPE
(the reference's ``curope`` CUDA kernel is plain math here — SURVEY.md
§2.6), two intertwined decoders whose blocks self-attend over their own
view and cross-attend to the other view's tokens, and a regression head
mapping tokens to per-pixel 3D points + confidence in the FIRST view's
camera frame.

``global_align_known_poses`` is the test-time optimizer replacing the
reference's pose-preset global alignment: per-view log-depths and per-edge
log-scales minimize the confidence-weighted distance between world points
from depths and the (scaled, pose-transformed) pair predictions — an optax
Adam loop inside one jit.

``convert_dust3r_torch`` maps the public checkpoint layout onto this
module. Every conversion convention (fused-qkv split order, 2D rotate-half
RoPE, norm_y, decoder intertwining, the head's pixel_shuffle channel
permutation, exp-norm postprocess) is pinned by a full-model activation
oracle against a handwritten numpy implementation of the public CroCo/
DUSt3R forward (tests/test_dust3r_oracle.py) — the reference checkout's
dust3r submodule is empty, so that numpy spec is the strongest available
oracle until the real checkpoint can be downloaded.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..utils.camera import unproject
from ..utils.se3 import se3_inverse


# ---------------------------------------------------------------------------
# 2D rotary position embeddings (curope equivalent)
# ---------------------------------------------------------------------------

def rope_2d(q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray,
            base: float = 100.0):
    """Apply 2D RoPE. q/k: (B, heads, N, D); positions: (B, N, 2) (y, x).
    Half the head dim rotates with y, half with x.

    Convention matches the public CroCo/DUSt3R ``curope`` kernel: within
    each positional half, rotation uses the rotate-half form (x*cos +
    [-x2, x1]*sin with the cos/sin table duplicated across the two
    sub-halves), NOT interleaved pairs. Pinned by the numpy oracle in
    tests/test_dust3r_oracle.py (test_rope_against_torch_style)."""
    b, h, n, d = q.shape
    half = d // 2

    def rot(x, pos):
        dd = x.shape[-1]
        inv = 1.0 / (base ** (jnp.arange(0, dd, 2) / dd))
        ang = pos[..., None] * inv                       # (B, N, dd/2)
        cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1)[:, None]
        sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1)[:, None]
        x1, x2 = x[..., :dd // 2], x[..., dd // 2:]
        rot_half = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rot_half * sin

    def apply(x):
        return jnp.concatenate(
            [rot(x[..., :half], positions[..., 0]),
             rot(x[..., half:], positions[..., 1])], axis=-1)

    return apply(q), apply(k)


class RopeAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, pos_q=None, pos_k=None):
        d = x.shape[-1]
        hd = d // self.heads
        ctx = x if context is None else context
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(ctx)
        v = nn.Dense(d, dtype=self.dtype, name="v")(ctx)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if pos_q is not None:
            qr, _ = rope_2d(q, q, pos_q)
            q = qr
        if pos_k is not None:
            kr, _ = rope_2d(k, k, pos_k)
            k = kr
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(d * self.mult, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(x)


class EncoderBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + RopeAttention(self.heads, dtype=self.dtype, name="attn")(
            h, pos_q=pos, pos_k=pos)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + Mlp(dtype=self.dtype, name="mlp")(h)


class DecoderBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, other, pos, pos_other):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + RopeAttention(self.heads, dtype=self.dtype, name="attn")(
            h, pos_q=pos, pos_k=pos)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        # the other view's tokens get their own norm (CroCo norm_y) —
        # required for converted public checkpoints to be faithful
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_y")(other)
        x = x + RopeAttention(self.heads, dtype=self.dtype,
                              name="cross_attn")(h, context=y,
                                                 pos_q=pos, pos_k=pos_other)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        return x + Mlp(dtype=self.dtype, name="mlp")(h)


class Dust3R(nn.Module):
    """Two-view pointmap network. call(img1, img2 (B, H, W, 3) in [0,1])
    -> dict(pts1, conf1, pts2, conf2): both pointmaps in view 1's frame."""
    patch: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2):
        b, H, W, _ = img1.shape
        gh, gw = H // self.patch, W // self.patch
        ys = jnp.repeat(jnp.arange(gh), gw)
        xs = jnp.tile(jnp.arange(gw), gh)
        pos = jnp.broadcast_to(
            jnp.stack([ys, xs], -1)[None].astype(jnp.float32),
            (b, gh * gw, 2))

        # construct shared modules ONCE (the encoder weights are shared
        # between the two views), then apply per view
        embed = nn.Conv(self.enc_dim, (self.patch, self.patch),
                        strides=(self.patch, self.patch), dtype=self.dtype,
                        name="patch_embed")
        enc_blocks = [EncoderBlock(self.enc_heads, dtype=self.dtype,
                                   name=f"enc_{i}")
                      for i in range(self.enc_depth)]
        enc_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name="enc_norm")

        def encode(img):
            x = embed(img * 2.0 - 1.0).reshape(b, gh * gw, self.enc_dim)
            for blk in enc_blocks:
                x = blk(x, pos)
            return enc_norm(x)

        f1 = encode(img1)
        f2 = encode(img2)

        proj = nn.Dense(self.dec_dim, dtype=self.dtype, name="decoder_embed")
        d1, d2 = proj(f1), proj(f2)
        for i in range(self.dec_depth):
            n1 = DecoderBlock(self.dec_heads, dtype=self.dtype,
                              name=f"dec1_{i}")(d1, d2, pos, pos)
            n2 = DecoderBlock(self.dec_heads, dtype=self.dtype,
                              name=f"dec2_{i}")(d2, d1, pos, pos)
            d1, d2 = n1, n2

        def head(x, name):
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"{name}_norm")(x)
            out = nn.Dense(self.patch * self.patch * 4, dtype=self.dtype,
                           name=f"{name}_proj")(x)
            out = out.reshape(b, gh, gw, self.patch, self.patch, 4)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, 4)
            # DUSt3R post-process (public postprocess.py semantics):
            # exp-norm directions; conf mode ('exp', 1, inf) = 1 + exp(x)
            pts, conf = out[..., :3], out[..., 3]
            norm = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            pts = pts / jnp.maximum(norm, 1e-8) * jnp.expm1(norm)
            return pts, 1.0 + jnp.exp(jnp.minimum(conf, 30.0))

        pts1, conf1 = head(d1, "head1")
        pts2, conf2 = head(d2, "head2")
        return {"pts1": pts1, "conf1": conf1, "pts2": pts2, "conf2": conf2}


# ---------------------------------------------------------------------------
# public-checkpoint weight conversion
# ---------------------------------------------------------------------------

def convert_dust3r_torch(state_dict: dict) -> dict:
    """Map the public DUSt3R checkpoint layout (naver/dust3r,
    ``DUSt3R_ViTLarge_BaseDecoder_512_linear`` — CroCo ViT encoder with
    fused qkv, twin decoders ``dec_blocks``/``dec_blocks2`` with separate
    cross projq/projk/projv, shared ``dec_norm``, ``downstream_head{1,2}``
    linear heads) onto this module's param tree. Accepts numpy-valued
    state dicts; unknown keys (mask_token, DPT heads, ...) are ignored.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.ascontiguousarray(value.astype(np.float32))

    def ln(src, dst):
        put(dst + ("scale",), sd[src + ".weight"])
        put(dst + ("bias",), sd[src + ".bias"])

    def dense(src, dst):
        put(dst + ("kernel",), sd[src + ".weight"].T)
        if src + ".bias" in sd:
            put(dst + ("bias",), sd[src + ".bias"])

    def qkv(src, dst):
        w = sd[src + ".weight"]          # (3d, d)
        b = sd.get(src + ".bias")
        d = w.shape[1]
        for i, name in enumerate(("q", "k", "v")):
            put(dst + (name, "kernel"), w[i * d:(i + 1) * d].T)
            if b is not None:
                put(dst + (name, "bias"), b[i * d:(i + 1) * d])

    put(("patch_embed", "kernel"),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])

    n_enc = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("enc_blocks."))
    for i in range(n_enc):
        src = f"enc_blocks.{i}"
        dst = (f"enc_{i}",)
        ln(src + ".norm1", dst + ("norm1",))
        qkv(src + ".attn.qkv", dst + ("attn",))
        dense(src + ".attn.proj", dst + ("attn", "proj"))
        ln(src + ".norm2", dst + ("norm2",))
        dense(src + ".mlp.fc1", dst + ("mlp", "fc1"))
        dense(src + ".mlp.fc2", dst + ("mlp", "fc2"))
    ln("enc_norm", ("enc_norm",))
    dense("decoder_embed", ("decoder_embed",))

    n_dec = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("dec_blocks."))
    for stream, prefix in (("dec_blocks", "dec1"), ("dec_blocks2", "dec2")):
        for i in range(n_dec):
            src = f"{stream}.{i}"
            dst = (f"{prefix}_{i}",)
            ln(src + ".norm1", dst + ("norm1",))
            qkv(src + ".attn.qkv", dst + ("attn",))
            dense(src + ".attn.proj", dst + ("attn", "proj"))
            ln(src + ".norm2", dst + ("norm2",))
            ln(src + ".norm_y", dst + ("norm_y",))
            dense(src + ".cross_attn.projq", dst + ("cross_attn", "q"))
            dense(src + ".cross_attn.projk", dst + ("cross_attn", "k"))
            dense(src + ".cross_attn.projv", dst + ("cross_attn", "v"))
            dense(src + ".cross_attn.proj", dst + ("cross_attn", "proj"))
            ln(src + ".norm3", dst + ("norm3",))
            dense(src + ".mlp.fc1", dst + ("mlp", "fc1"))
            dense(src + ".mlp.fc2", dst + ("mlp", "fc2"))

    # shared final decoder norm feeds both heads (CroCo dec_norm)
    ln("dec_norm", ("head1_norm",))
    ln("dec_norm", ("head2_norm",))

    def head_dense(src, dst):
        """The torch linear head feeds F.pixel_shuffle, whose channel
        layout is (4, p, p)-MAJOR (feature c*p^2 + a*p + b); the flax head
        reshapes features as (p, p, 4) (feature a*4p + b*4 + c). Permute
        the proj output features accordingly — without this the converted
        head scrambles every patch (caught by
        tests/test_dust3r_oracle.py)."""
        w = sd[src + ".weight"]                      # (4p^2, D)
        p = int(round((w.shape[0] // 4) ** 0.5))
        a = np.arange(p)[:, None, None] * p
        bcol = np.arange(p)[None, :, None]
        c = np.arange(4)[None, None, :] * p * p
        perm = (c + a + bcol).reshape(-1)            # perm[f_flax] = f_torch
        put(dst + ("kernel",), w[perm].T)
        put(dst + ("bias",), sd[src + ".bias"][perm])

    head_dense("downstream_head1.proj", ("head1_proj",))
    head_dense("downstream_head2.proj", ("head2_proj",))
    return out


# ---------------------------------------------------------------------------
# pair construction + known-pose global alignment
# ---------------------------------------------------------------------------

def make_pairs(n_images: int, scene_graph: str = "complete") -> list:
    """Pair index list (reference make_pairs usage, diffusionGS.py:401,424)."""
    if scene_graph == "complete":
        return list(itertools.combinations(range(n_images), 2))
    if scene_graph.startswith("oneref-"):
        ref = int(scene_graph.split("-")[1])
        return [(ref, j) for j in range(n_images) if j != ref]
    raise ValueError(scene_graph)


@functools.partial(jax.jit, static_argnames=("iters",))
def global_align_known_poses(pair_pts, pair_conf, pair_view_idx, c2w, K,
                             init_depths, iters: int = 300,
                             lr: float = 1e-2):
    """Align pair pointmap predictions into a consistent scene with FIXED
    camera poses (the reference's preset-pose global alignment).

    pair_pts:  (E, H, W, 3) predicted points, each in the reference frame
               of its pair -> mapped to world by c2w[pair_cam] below.
    pair_conf: (E, H, W) confidences.
    pair_view_idx: (E, 2) int — [owning view v (whose pixels), reference
               cam r (whose frame the prediction lives in)].
    c2w: (V, 4, 4); K: (3, 3); init_depths: (V, H, W).

    Optimizes per-view log-depths + per-edge log-scales; returns
    (depths (V, H, W), scales (E,), final loss).
    """
    v_idx = pair_view_idx[:, 0]
    r_idx = pair_view_idx[:, 1]

    def world_from_depth(log_depth, view):
        d = jnp.exp(log_depth)
        pts_cam = unproject(d, K)
        c = c2w[view]
        return pts_cam @ c[:3, :3].T + c[:3, 3]

    def loss_fn(params):
        logd, logs = params["log_depths"], params["log_scales"]

        def edge_loss(e):
            pred = pair_pts[e] * jnp.exp(logs[e])
            c = c2w[r_idx[e]]
            pred_w = pred @ c[:3, :3].T + c[:3, 3]
            mine = world_from_depth(logd[v_idx[e]], v_idx[e])
            return (pair_conf[e] *
                    jnp.sum((pred_w - mine) ** 2, axis=-1)).mean()

        losses = jax.vmap(edge_loss)(jnp.arange(pair_pts.shape[0]))
        return losses.mean()

    params = {"log_depths": jnp.log(jnp.maximum(init_depths, 1e-3)),
              "log_scales": jnp.zeros((pair_pts.shape[0],))}
    opt = optax.adam(lr)
    state = opt.init(params)

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return (optax.apply_updates(params, updates), state), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None,
                                       length=iters)
    return (jnp.exp(params["log_depths"]), jnp.exp(params["log_scales"]),
            losses[-1])


def make_dust3r_fn(model: "Dust3R", params, align_iters: int = 300,
                   scene_graph: str = "complete", conf_thresh: float = 1.5,
                   stride: int = 2):
    """Bundle network + known-pose alignment into the orchestrator's
    pluggable interface: fn(frames (V,H,W,3) [0,1], c2w (V,4,4), K (3,3))
    -> (xyz (N,3), rgb (N,3)) — the reference's dust3r.run with preset
    poses/intrinsics (diffusionGS.py:431)."""
    import numpy as np

    def fn(frames, c2w, K):
        v, h, w = frames.shape[:3]
        pairs = make_pairs(v, scene_graph)
        pair_pts, pair_conf, pv = [], [], []
        for (i, j) in pairs:
            out = model.apply(params, frames[i:i + 1], frames[j:j + 1])
            # both pointmaps live in view i's frame
            pair_pts.append(out["pts1"][0])
            pair_conf.append(out["conf1"][0])
            pv.append((i, i))
            pair_pts.append(out["pts2"][0])
            pair_conf.append(out["conf2"][0])
            pv.append((j, i))
        init = jnp.full((v, h, w), 1.0)
        depths, _, _ = global_align_known_poses(
            jnp.stack(pair_pts), jnp.stack(pair_conf),
            jnp.asarray(pv, jnp.int32), jnp.asarray(c2w), jnp.asarray(K),
            init, iters=align_iters)
        # per-view confidence = mean over edges owning that view
        conf = np.zeros((v, h, w), np.float32)
        cnt = np.zeros(v)
        for e, (view, _) in enumerate(pv):
            conf[view] += np.asarray(pair_conf[e])
            cnt[view] += 1
        conf /= np.maximum(cnt[:, None, None], 1)
        return fuse_point_cloud(depths, frames, jnp.asarray(c2w),
                                jnp.asarray(K), conf=jnp.asarray(conf),
                                conf_thresh=conf_thresh, stride=stride)

    return fn


def fuse_point_cloud(depths, images, c2w, K, conf=None,
                     conf_thresh: float = 1.5, stride: int = 2):
    """Depths -> merged world point cloud (the reference's trimesh-scene
    output, filtered by confidence)."""
    import numpy as np
    pts_all, rgb_all = [], []
    for v in range(depths.shape[0]):
        d = depths[v, ::stride, ::stride]
        Ks = jnp.asarray(K).at[:2].mul(1.0 / stride)
        pc = unproject(d, Ks)
        c = c2w[v]
        pw = pc @ c[:3, :3].T + c[:3, 3]
        keep = d > 1e-4
        if conf is not None:
            keep = keep & (conf[v, ::stride, ::stride] > conf_thresh)
        pts_all.append(np.asarray(pw)[np.asarray(keep)])
        rgb_all.append(np.asarray(images[v, ::stride, ::stride])
                       [np.asarray(keep)])
    import numpy as np
    return np.concatenate(pts_all), np.concatenate(rgb_all)
